"""Scale-1 selection variants (B=32, the model's 2B-batched PE call).

After the budget sort, each chunk's r1 hits are a PREFIX of its 64 slots
(level sorts first). Cross-chunk compaction is then a 4-element cumsum +
a 64-from-256 per-row gather — no 256-wide sort needed at all.

  v0: current 4-operand 256-wide sort
  v1: packed single-operand sort + banked planar gather
  v2: arithmetic prefix compaction + take_along_axis + planar gather
  v3: arithmetic prefix compaction + onehot einsum + planar gather

cd /root/repo && python benchmarks/profile_r6.py
"""

from __future__ import annotations

import sys
import time
import os.path as osp

sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))

import numpy as np

RESULTS = {}


def _leaf0(tree):
    import jax

    leaves = [l for l in jax.tree_util.tree_leaves(tree) if hasattr(l, "dtype")]
    for l in leaves:
        if l.dtype.kind == "f":
            return l.reshape(-1)[0]
    return leaves[0].reshape(-1)[0].astype("float32")


def timed(name, fn, *args, iters=10, warmup=2):
    import jax

    jfn = jax.jit(fn)
    t0 = time.perf_counter()
    out = jfn(np.float32(0.0), *args)
    float(_leaf0(out))
    compile_s = time.perf_counter() - t0

    def chain(n):
        eps = np.float32(0.0)
        for _ in range(n):
            out = jfn(eps, *args)
            eps = _leaf0(out) * 0.0
        return float(_leaf0(out))

    chain(warmup)
    t0 = time.perf_counter()
    chain(iters)
    dt = (time.perf_counter() - t0) / iters
    RESULTS[name] = round(dt * 1e3, 2)
    print(f"{name:46s} {dt * 1e3:9.2f} ms   (compile {compile_s:.1f}s)", flush=True)
    return dt


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/unopose_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

    from unopose_tpu.ops.gather_pallas import gather_planar

    print(f"backend: {jax.default_backend()}", flush=True)
    B, N = 32, 2048
    C = 4
    K1, K2 = 64, 256
    S = K2 // C  # 64 slots per chunk
    rng = np.random.default_rng(0)

    # realistic inputs: idx_p (B, N, 256) point ids, m1slot prefix-structured
    idx_p = jax.device_put(rng.integers(0, N, size=(B, N, K2)).astype(np.int32))
    # per chunk, r1 hits form a prefix of random length 0..20
    c1 = rng.integers(0, 21, size=(B, N, C))
    m1_np = (np.arange(S)[None, None, None, :] < c1[..., None]).reshape(B, N, K2)
    m1slot = jax.device_put(m1_np)
    xp = jax.device_put(rng.normal(size=(B, N)).astype(np.float32))
    yp = jax.device_put(rng.normal(size=(B, N)).astype(np.float32))
    zp = jax.device_put(rng.normal(size=(B, N)).astype(np.float32))
    g2x = jax.device_put(rng.normal(size=(B, N, K2)).astype(np.float32))
    g2y = jax.device_put(rng.normal(size=(B, N, K2)).astype(np.float32))
    g2z = jax.device_put(rng.normal(size=(B, N, K2)).astype(np.float32))

    def v0(eps, g2x, g2y, g2z, m1slot):
        siota = jnp.arange(K2, dtype=jnp.int32)[None, None, :]
        key1 = jnp.where(m1slot, 2 * K2 - siota, K2 - siota).astype(jnp.int16)
        negk, ax, ay, az = jax.lax.sort(
            (-key1, g2x + eps, g2y, g2z), dimension=-1, is_stable=False, num_keys=1
        )
        valid1 = (-negk[..., :K1]).astype(jnp.int32) > K2
        return ax[..., :K1] + ay[..., :K1] + az[..., :K1] + valid1.astype(jnp.float32)

    timed("v0 4-operand sort", v0, g2x, g2y, g2z, m1slot)

    def v1(eps, idx_p, m1slot, xp, yp, zp):
        siota = jnp.arange(K2, dtype=jnp.int32)[None, None, :]
        key1 = jnp.where(m1slot, 2 * K2 - siota, K2 - siota)
        packed = key1 * jnp.int32(N) + idx_p
        top = jax.lax.sort(-packed, dimension=-1, is_stable=False)[..., :K1]
        idx1 = (-top) % N
        valid1 = (-top) // N > K2
        ax, ay, az = gather_planar(xp + eps, yp, zp, idx1)
        return ax + ay + az + valid1.astype(jnp.float32)

    timed("v1 packed sort + planar gather", v1, idx_p, m1slot, xp, yp, zp)

    def compact_src(m1slot):
        # (B, N, 64) source slot per output, + validity
        c1 = jnp.sum(m1slot.reshape(-1, N, C, S), axis=-1, dtype=jnp.int32)  # (B,N,C)
        cum = jnp.cumsum(c1, axis=-1)  # inclusive
        s_iota = jnp.arange(K1, dtype=jnp.int32)[None, None, :]
        # chunk of output slot s: number of chunks fully consumed before s
        ch = jnp.sum(s_iota[..., None, :] >= cum[..., :, None], axis=-2)  # (B,N,K1)
        start = jnp.concatenate([jnp.zeros_like(cum[..., :1]), cum[..., :-1]], axis=-1)
        chc = jnp.clip(ch, 0, C - 1)
        p = s_iota - jnp.take_along_axis(start, chc, axis=-1)
        src = chc * S + p
        valid = s_iota < cum[..., -1:]
        return jnp.where(valid, src, 0), valid

    def v2(eps, idx_p, m1slot, xp, yp, zp):
        src, valid1 = compact_src(m1slot)
        idx1 = jnp.take_along_axis(idx_p, src, axis=-1)
        ax, ay, az = gather_planar(xp + eps, yp, zp, idx1)
        return ax + ay + az + valid1.astype(jnp.float32)

    timed("v2 prefix compaction + take_along", v2, idx_p, m1slot, xp, yp, zp)

    def v3(eps, idx_p, m1slot, xp, yp, zp):
        src, valid1 = compact_src(m1slot)
        siota = jnp.arange(K2, dtype=jnp.int32)[None, None, None, :]
        onehot = (src[..., :, None] == siota).astype(jnp.float32)
        idx1 = jnp.einsum("bnks,bns->bnk", onehot, idx_p.astype(jnp.float32)).astype(jnp.int32)
        ax, ay, az = gather_planar(xp + eps, yp, zp, idx1)
        return ax + ay + az + valid1.astype(jnp.float32)

    timed("v3 prefix compaction + onehot einsum", v3, idx_p, m1slot, xp, yp, zp)

    # correctness cross-check on host: v2 vs v0 semantics (same SET in the
    # same prefix order: v0 sorts by (level desc, slot asc) which equals
    # chunk-major prefix order)
    a = jax.jit(v2)(np.float32(0.0), idx_p, m1slot, xp, yp, zp)
    siota = np.arange(K2, dtype=np.int32)[None, None, :]
    key1 = np.where(m1_np, 2 * K2 - siota, K2 - siota)
    order = np.argsort(-key1, axis=-1, kind="stable")[..., :K1]
    idx1_ref = np.take_along_axis(np.asarray(idx_p), order, axis=-1)
    valid_ref = np.take_along_axis(key1, order, axis=-1) > K2
    xg = np.asarray(xp)[np.arange(B)[:, None, None], idx1_ref]
    yg = np.asarray(yp)[np.arange(B)[:, None, None], idx1_ref]
    zg = np.asarray(zp)[np.arange(B)[:, None, None], idx1_ref]
    want = xg + yg + zg + valid_ref.astype(np.float32)
    got = np.asarray(a)
    ok = bool(np.allclose(np.where(valid_ref, got, 0), np.where(valid_ref, want, 0)))
    print(f"v2 matches v0 semantics on valid slots: {ok}", flush=True)
    RESULTS["v2_ok"] = ok

    import json

    print(json.dumps(RESULTS))


if __name__ == "__main__":
    main()
