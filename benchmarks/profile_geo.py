"""Disambiguate the geo-embedding cost (VPU transcendentals vs layout/HBM)
and sweep the fused-PE block size.

cd /root/repo && python benchmarks/profile_geo.py
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
    print(f"{name:44s} {dt * 1e3:9.2f} ms   (compile {compile_s:.1f}s)", flush=True)
    return dt


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/unopose_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

    B = 16
    rng = np.random.default_rng(0)
    print(f"backend: {jax.default_backend()}", flush=True)

    d197 = jnp.asarray(rng.uniform(0, 12, size=(B, 197, 197)).astype(np.float32))
    div = jnp.exp(jnp.arange(0, 256, 2, dtype=jnp.float32) * (-np.log(10000.0) / 256))
    W = jnp.asarray(rng.standard_normal((256, 256)).astype(np.float32) * 0.06).astype(jnp.bfloat16)

    def sin_reduce(eps, x):
        om = (x + eps)[..., None] * div
        return jnp.sum(jnp.sin(om)) + jnp.sum(jnp.cos(om))

    timed("sinusoid_reduce_only", sin_reduce, d197)

    def sin_proj(eps, x):
        om = (x + eps)[..., None] * div
        e = jnp.concatenate([jnp.sin(om), jnp.cos(om)], axis=-1).astype(jnp.bfloat16)
        return jnp.einsum("bnmd,dk->bnmk", e, W)

    timed("sinusoid_proj_bf16", sin_proj, d197)

    def sin_only_write(eps, x):
        om = (x + eps)[..., None] * div
        return jnp.concatenate([jnp.sin(om), jnp.cos(om)], axis=-1).astype(jnp.bfloat16)

    timed("sinusoid_write_bf16", sin_only_write, d197)

    # transcendental rate check: pure sin on same element count
    big = jnp.asarray(rng.uniform(0, 12, size=(B, 197, 197, 128)).astype(np.float32))

    def pure_sin(eps, x):
        return jnp.sum(jnp.sin(x + eps))

    timed("pure_sin_reduce_79M", pure_sin, big)

    # PE p_blk sweep
    from unopose_tpu.ops.ball_query import ball_group_planar
    from unopose_tpu.ops.pe_fused import pe_fused

    P = 2048
    pts = jnp.asarray(rng.uniform(-1, 1, size=(B, P, 3)).astype(np.float32))
    g2, d2_sel, valid2 = ball_group_planar(0.2, 256, pts, mode="subset")
    d2v = jnp.where(valid2, d2_sel, jnp.inf)
    mask1 = d2v < 0.1 * 0.1
    empty = ~jnp.any(mask1, axis=-1, keepdims=True)
    nearest = jnp.argmin(d2v, axis=-1)[..., None] == jnp.arange(256)
    mask1 = mask1 | (empty & nearest)
    center = (pts[..., 0], pts[..., 1], pts[..., 2])
    Ws1 = [jnp.asarray(rng.standard_normal((c, d)).astype(np.float32)) * 0.3 for c, d in ((6, 32), (32, 64), (64, 128))]
    bs1 = [jnp.zeros(d) for d in (32, 64, 128)]
    Ws2 = [jnp.asarray(rng.standard_normal((c, d)).astype(np.float32)) * 0.3 for c, d in ((6, 32), (32, 64), (64, 128))]
    bs2 = [jnp.zeros(d) for d in (32, 64, 128)]

    for pb in (32, 64, 128):
        def run_pe(eps, gx, gy, gz):
            return pe_fused((gx + eps, gy, gz), center, mask1, valid2, Ws1, bs1, Ws2, bs2, 0.1, 0.2, p_blk=pb)

        timed(f"pe_fused_kernel_pblk{pb}", run_pe, *g2)

    timed("ball_group_newlayout", lambda e, p: ball_group_planar(0.2, 256, p + e)[0][0], pts)

    print(RESULTS, flush=True)


if __name__ == "__main__":
    main()
