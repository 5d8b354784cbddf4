"""Dissect pe_fused_packed's ~23ms: matmul-only vs LRF-only vs full, at
p_blk 32/64, plus repeat runs to gauge chip noise.

cd /root/repo && python benchmarks/profile_r9.py
"""

from __future__ import annotations

import functools
import sys
import time
import os.path as osp

sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))

import numpy as np

RESULTS = {}


def timed(name, fn, *args, iters=10, warmup=2):
    import jax

    jfn = jax.jit(fn)
    t0 = time.perf_counter()
    out = jfn(np.float32(0.0), *args)
    leaf = jax.tree_util.tree_leaves(out)[0]
    float(np.asarray(leaf.reshape(-1)[0], dtype=np.float64))
    compile_s = time.perf_counter() - t0

    def chain(n):
        eps = np.float32(0.0)
        for _ in range(n):
            out = jfn(eps, *args)
            leaf = jax.tree_util.tree_leaves(out)[0]
            eps = (leaf.reshape(-1)[0] * 0).astype(np.float32)
        return out

    chain(warmup)
    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        out = chain(iters)
        leaf = jax.tree_util.tree_leaves(out)[0]
        float(np.asarray(leaf.reshape(-1)[0], dtype=np.float64))
        times.append((time.perf_counter() - t0) / iters)
    dt = min(times)
    RESULTS[name] = round(dt * 1e3, 2)
    spread = (max(times) - min(times)) / min(times) * 100
    print(f"{name:44s} {dt * 1e3:9.2f} ms  (+{spread:.0f}% spread, compile {compile_s:.1f}s)", flush=True)
    return dt


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/unopose_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from unopose_tpu.ops.pe_fused import _masked_lrf_block, pe_fused_packed

    B, N, S2 = 32, 2048, 256
    R1, R2 = 0.1, 0.2
    rng = np.random.default_rng(0)
    v = rng.normal(size=(B, N, 3))
    v /= np.linalg.norm(v, axis=-1, keepdims=True)
    pts = (0.5 * v + rng.normal(size=(B, N, 3)) * 2e-3).astype(np.float32)
    g2 = tuple(
        jnp.asarray(np.repeat(pts[..., i][:, :, None], S2, axis=2) + rng.normal(size=(B, N, S2)).astype(np.float32) * 0.02)
        for i in range(3)
    )
    w1 = jnp.asarray((rng.uniform(size=(B, N, S2)) < 0.2).astype(np.float32))
    cx, cy, cz = (jnp.asarray(pts[..., i]) for i in range(3))

    rngk = jax.random.PRNGKey(0)
    Ws1, bs1, Ws2, bs2 = [], [], [], []
    cin = 6
    for d in (32, 64, 128):
        k1a, k2a, rngk = jax.random.split(rngk, 3)
        Ws1.append(jax.random.normal(k1a, (cin, d)) * 0.1)
        bs1.append(jnp.zeros(d))
        Ws2.append(jax.random.normal(k2a, (cin, d)) * 0.1)
        bs2.append(jnp.zeros(d))
        cin = d

    print(f"backend: {jax.default_backend()}", flush=True)

    for pb in (32, 64, 128):
        timed(
            f"pe_fused_packed_pblk{pb}",
            lambda e, a, b, c, w: pe_fused_packed((a + e, b, c), w, jnp.ones_like(w), jnp.full(w.shape[:2], w.shape[-1], jnp.int32), (cx, cy, cz), Ws1, bs1, Ws2, bs2, R1, R2, p_blk=pb),
            *g2, w1,
        )

    # matmul-only variant: skip LRF, channels = rel coords twice
    def mk_variant(mode, p_blk):
        def kern(gx_ref, gy_ref, gz_ref, m_ref, cx_ref, cy_ref, cz_ref, w0_ref, w1_ref, w2_ref, out_ref):
            rx = gx_ref[0] - cx_ref[0]
            ry = gy_ref[0] - cy_ref[0]
            rz = gz_ref[0] - cz_ref[0]
            m1 = m_ref[0]
            if mode == "lrf_only":
                l1 = _masked_lrf_block(rx, ry, rz, m1, R1)
                l2 = _masked_lrf_block(rx, ry, rz, jnp.ones_like(rx), R2)
                out_ref[0] = (
                    jnp.stack([sum(l1), sum(l2)], axis=0).sum(0, keepdims=True).T
                    * jnp.ones((1, 256), jnp.float32)
                )[:, :256] * jnp.zeros((p_blk, 256), jnp.float32) + l1[0][:, :1]
                return
            if mode == "matmul_only":
                l1 = (rx, ry, rz)
                l2 = (rx, ry, rz)
            else:
                l1 = _masked_lrf_block(rx, ry, rz, m1, R1)
                l2 = _masked_lrf_block(rx, ry, rz, jnp.ones_like(rx), R2)
            sh = S2 // 2
            L = p_blk * sh
            ch1 = jnp.stack([rx, ry, rz, *l1], axis=0)
            ch2 = jnp.stack([rx, ry, rz, *l2], axis=0)
            h = jnp.concatenate(
                [
                    ch1[:, :, :sh].reshape(6, L),
                    ch1[:, :, sh:].reshape(6, L),
                    ch2[:, :, :sh].reshape(6, L),
                    ch2[:, :, sh:].reshape(6, L),
                ],
                axis=0,
            ).astype(jnp.bfloat16)
            for Wr in (w0_ref, w1_ref, w2_ref):
                z = jax.lax.dot_general(
                    Wr[...], h, dimension_numbers=(((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
                h = jnp.maximum(z, 0.0).astype(jnp.bfloat16)
            h = h.reshape(512, p_blk, sh)
            neg = jnp.bfloat16(-jnp.inf)
            m1a = (m1[:, :sh] > 0.0)[None]
            m1b = (m1[:, sh:] > 0.0)[None]
            f1 = jnp.max(jnp.maximum(jnp.where(m1a, h[0:128], neg), jnp.where(m1b, h[128:256], neg)), axis=2)
            f2 = jnp.max(jnp.maximum(h[256:384], h[384:512]), axis=2)
            out_ref[0] = jnp.concatenate([f1, f2], axis=0).T.astype(jnp.float32)

        def blkdiag4(W1, W2):
            cin, d = W1.shape
            Z = jnp.zeros((cin, d), W1.dtype)
            return jnp.concatenate(
                [
                    jnp.concatenate([W1, Z, Z, Z], axis=1),
                    jnp.concatenate([Z, W1, Z, Z], axis=1),
                    jnp.concatenate([Z, Z, W2, Z], axis=1),
                    jnp.concatenate([Z, Z, Z, W2], axis=1),
                ],
                axis=0,
            )

        weights = [blkdiag4(a, b).astype(jnp.bfloat16) for a, b in zip(Ws1, Ws2)]
        grid = (B, N // p_blk)
        blk_s2 = pl.BlockSpec((1, p_blk, S2), lambda b, j: (b, j, 0), memory_space=pltpu.VMEM)
        blk2 = pl.BlockSpec((1, p_blk, 1), lambda b, j: (b, j, 0), memory_space=pltpu.VMEM)
        full = lambda a: pl.BlockSpec(a.shape, lambda b, j: (0,) * a.ndim, memory_space=pltpu.VMEM)

        def run(e, a, b, c, w):
            return pl.pallas_call(
                kern,
                grid=grid,
                in_specs=[blk_s2] * 4 + [blk2] * 3 + [full(x) for x in weights],
                out_specs=pl.BlockSpec((1, p_blk, 256), lambda bb, j: (bb, j, 0), memory_space=pltpu.VMEM),
                out_shape=jax.ShapeDtypeStruct((B, N, 256), jnp.float32),
            )(a + e, b, c, w, cx[..., None], cy[..., None], cz[..., None], *weights)

        return run

    for mode in ("matmul_only", "full_nobias"):
        for pb in (32, 64):
            timed(f"{mode}_pblk{pb}", mk_variant(mode, pb), *g2, w1)

    print(RESULTS, flush=True)


if __name__ == "__main__":
    main()
