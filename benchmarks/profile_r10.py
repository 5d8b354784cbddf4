"""Round-2 residual stage internals: coarse solver pieces, fine solver,
FPS/LRF, geo embedding, linear attention — each on-chip at B=16 defaults.

cd /root/repo && python benchmarks/profile_r10.py
"""

from __future__ import annotations

import sys
import time
import os.path as osp

sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))

import numpy as np

RESULTS = {}


def timed(name, fn, *args, iters=10):
    import jax

    jfn = jax.jit(fn)
    out = jfn(np.float32(0.0), *args)
    leaf = [l for l in jax.tree_util.tree_leaves(out) if hasattr(l, "dtype")][0]
    float(np.asarray(leaf.reshape(-1)[0], dtype=np.float64))

    def chain(n):
        eps = np.float32(0.0)
        for _ in range(n):
            out = jfn(eps, *args)
            leaf = [l for l in jax.tree_util.tree_leaves(out) if hasattr(l, "dtype")][0]
            eps = (leaf.reshape(-1)[0] * 0).astype(np.float32)
        return out

    chain(3)
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        out = chain(iters)
        leaf = [l for l in jax.tree_util.tree_leaves(out) if hasattr(l, "dtype")][0]
        float(np.asarray(leaf.reshape(-1)[0], dtype=np.float64))
        ts.append((time.perf_counter() - t0) / iters)
    dt = min(ts)
    RESULTS[name] = round(dt * 1e3, 2)
    print(f"{name:44s} {dt * 1e3:8.2f} ms", flush=True)
    return dt


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/unopose_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

    from unopose_tpu.ops.fps import fps_pallas, gather_points
    from unopose_tpu.ops.lrf import global_lrf
    from unopose_tpu.ops.solver import (
        compute_coarse_Rt_overlap,
        compute_fine_Rt_overlap,
        searchsorted_cdf,
    )

    B, N1, N2, NF = 16, 196, 196, 2048
    rng = np.random.default_rng(0)
    print(f"backend: {jax.default_backend()}", flush=True)

    # --- fps + gather + global lrf (the fps_lrf stage, 2B clouds) ---
    pts32 = jnp.asarray(rng.normal(size=(2 * B, NF, 3)).astype(np.float32) * 0.3)
    timed("fps196_2B", lambda e, p: fps_pallas(p + e, 196), pts32)
    idx = jax.jit(lambda p: fps_pallas(p, 196))(pts32)
    timed("gather196_2B", lambda e, p: gather_points(p + e, idx), pts32)
    timed("global_lrf_2B", lambda e, p: global_lrf(p + e)[0], pts32)

    # --- coarse solver pieces ---
    atten = jnp.asarray(rng.normal(size=(B, N1 + 1, N2 + 1)).astype(np.float32))
    score = jnp.asarray(rng.uniform(size=(B, N1 + N2)).astype(np.float32))
    p1 = jnp.asarray(rng.normal(size=(B, N1, 3)).astype(np.float32) * 0.3)
    p2 = jnp.asarray(rng.normal(size=(B, N2, 3)).astype(np.float32) * 0.3)
    key = jax.random.PRNGKey(0)
    timed(
        "coarse_solver_full",
        lambda e, a, s, x, y: compute_coarse_Rt_overlap(key, a + e, s, x, y)[0],
        atten, score, p1, p2,
    )
    ps = jnp.asarray(rng.uniform(size=(B, N1 * N2)).astype(np.float32))
    cum = jnp.cumsum(ps, axis=1)
    cum = cum / cum[:, -1:]
    r = jax.random.uniform(key, (B, 18000), dtype=jnp.float32)
    timed("searchsorted_18k", lambda e, c, r: searchsorted_cdf(c + e * 0.0, r), cum, r)

    # --- fine solver ---
    fatt = jnp.asarray(rng.normal(size=(B, NF + 1, NF + 1)).astype(np.float32))
    fsc = jnp.asarray(rng.uniform(size=(B, 2 * NF)).astype(np.float32))
    fp1 = jnp.asarray(rng.normal(size=(B, NF, 3)).astype(np.float32) * 0.3)
    fp2 = jnp.asarray(rng.normal(size=(B, NF, 3)).astype(np.float32) * 0.3)
    timed(
        "fine_solver_full",
        lambda e, a, s, x, y: compute_fine_Rt_overlap(a + e, s, x, y)[0],
        fatt, fsc, fp1, fp2,
    )

    # --- geo embedding (fused kernel) at model config ---
    from unopose_tpu.models.embedding import GeometricStructureEmbedding

    ge = GeometricStructureEmbedding(
        hidden_dim=256, sigma_d=0.2, sigma_a=15, angle_k=3, reduction_a="max",
        d_index_max=float(2.1 * np.sqrt(3.0) / 0.2), fused_table=128, dtype=jnp.bfloat16,
    )
    gp = jnp.asarray(rng.normal(size=(2 * B, N1 + 1, 3)).astype(np.float32) * 0.3)
    gvars = ge.init(jax.random.PRNGKey(1), gp)
    timed("geo_fused_2B", lambda e, v, p: ge.apply(v, p + e), gvars, gp)

    # --- linear attention x6 at fine dims ---
    from unopose_tpu.models.attention import LinearTransformerLayer

    lt = LinearTransformerLayer(256, 4, 3.0, dtype=jnp.bfloat16)
    xd = jnp.asarray(rng.standard_normal((B, NF, 256)).astype(np.float32))
    xs = jnp.asarray(rng.standard_normal((B, N1, 256)).astype(np.float32))
    lt_vars = lt.init(jax.random.PRNGKey(2), xd, xs)

    def run_lt(eps, v, d, s):
        out = d + eps
        for _ in range(6):
            out = lt.apply(v, out, s)
        return out

    timed("linear_attn_x6", run_lt, lt_vars, xd, xs)

    print(RESULTS, flush=True)


if __name__ == "__main__":
    main()
