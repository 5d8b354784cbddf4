"""Round-2 late pass: PE internals at the PRODUCTION shape (one 2B=32 call,
N=2048) — grouping select vs fused MLP kernel — plus coarse-solver pieces.

cd /root/repo && python benchmarks/profile_r11.py
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
    print(f"{name:46s} {dt * 1e3:8.2f} ms", flush=True)
    return dt


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/unopose_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

    from unopose_tpu.models.matching import FinePositionalEncoding
    from unopose_tpu.ops.ball_query import (
        _first_k_budget_select,
        two_scale_group_first_k_packed,
    )
    from unopose_tpu.ops.pe_fused import pe_fused_packed
    from unopose_tpu.ops.solver import compute_coarse_Rt_overlap, searchsorted_cdf

    B2, P = 32, 2048  # production PE call: one 2B-batched cloud
    rng = np.random.default_rng(0)
    # LRF-normalized-looking surface cloud (unit ball-ish)
    pts = rng.uniform(-1, 1, size=(B2, P, 3)).astype(np.float32)
    pts /= np.linalg.norm(pts, axis=-1, keepdims=True).max(axis=1, keepdims=True)
    pts = jnp.asarray(pts)
    print(f"backend: {jax.default_backend()}", flush=True)

    # 1. grouping select alone (keys kernel + decode + pad + gather)
    timed(
        "group_packed_2Bx2048",
        lambda e, p: two_scale_group_first_k_packed(0.1, 64, 0.2, 256, p + e)[0][0],
        pts,
    )

    # 2. fused MLP kernel alone on pre-grouped inputs
    g2, w1, *_ = jax.jit(lambda p: two_scale_group_first_k_packed(0.1, 64, 0.2, 256, p))(pts)
    g2 = tuple(np.asarray(g) for g in g2)
    w1 = np.asarray(w1)
    center = tuple(np.asarray(pts[..., i]) for i in range(3))
    Ws1 = [rng.standard_normal((c, d)).astype(np.float32) * 0.1 for c, d in ((6, 32), (32, 64), (64, 128))]
    bs1 = [rng.standard_normal((d,)).astype(np.float32) * 0.01 for d in (32, 64, 128)]
    Ws2 = [w.copy() for w in Ws1]
    bs2 = [b.copy() for b in bs1]

    w2f = jnp.ones_like(w1)  # full-path flag: measure the pre-fast-path kernel
    t2f = jnp.full(w1.shape[:2], w1.shape[-1], jnp.int32)

    def run_kernel(e, gx, gy, gz, w1a, cx, cy, cz):
        return pe_fused_packed((gx + e, gy, gz), w1a, w2f, t2f, (cx, cy, cz), Ws1, bs1, Ws2, bs2, 0.1, 0.2)

    timed("pe_kernel_2Bx2048", run_kernel, *g2, w1, *center)

    # 3. full PE module (production path)
    pe = FinePositionalEncoding(out_dim=256, r1=0.1, r2=0.2, nsample1=64, nsample2=256)
    variables = pe.init(jax.random.PRNGKey(0), pts, train=False)
    timed("pe_module_2Bx2048", lambda e, v, p: pe.apply(v, p + e, train=False), variables, pts)

    # 4. coarse solver pieces at B=16
    B, N1, N2 = 16, 196, 196
    atten = jnp.asarray(rng.standard_normal((B, N1 + 1, N2 + 1)).astype(np.float32))
    score = jnp.asarray(rng.uniform(0, 1, (B, N1 + N2)).astype(np.float32))
    p1 = jnp.asarray(rng.uniform(-1, 1, (B, N1, 3)).astype(np.float32))
    p2 = jnp.asarray(rng.uniform(-1, 1, (B, N2, 3)).astype(np.float32))
    key = jax.random.PRNGKey(0)

    timed(
        "coarse_solver_full",
        lambda e, a, s, q1, q2: compute_coarse_Rt_overlap(key, a + e, s, q1, q2)[0],
        atten, score, p1, p2,
    )

    # sampling alone: cdf + searchsorted + triplet gathers
    def sampling(e, a, s, q1, q2):
        from unopose_tpu.ops.gather_pallas import gather_planar
        from unopose_tpu.ops.solver import _dual_softmax_assignment

        pred, w1s, w2s, _, _ = _dual_softmax_assignment(a + e, s, N1, N2)
        ps = (pred[:, 1:, 1:] * w1s[:, :, None] * w2s[:, None, :]).reshape(B, N1 * N2) ** 1.5
        cum = jnp.cumsum(ps, axis=1)
        cum = cum / (cum[:, -1:] + 1e-8)
        r = jax.random.uniform(key, (B, 6000 * 3), dtype=jnp.float32)
        idx = searchsorted_cdf(cum, r)
        idx1 = jnp.minimum(idx // N2, N1 - 1)
        idx2 = idx % N2
        outs = []
        for c, idxc in ((q1, idx1), (q2, idx2)):
            pl_ = gather_planar(c[..., 0], c[..., 1], c[..., 2], idxc[..., None])
            outs.append(pl_[0][..., 0])
        return outs

    timed("coarse_sampling", sampling, atten, score, p1, p2)

    print(RESULTS, flush=True)


if __name__ == "__main__":
    main()
