"""Packed first_k PE component attribution at the model's 2B=32 PE batch.

  keys kernel (bf16x3) -> budget sort -> select (full) -> packed grouping
  -> fused PE kernel -> full packed PE module

cd /root/repo && python benchmarks/profile_r8.py
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

    from unopose_tpu.models.matching import FinePositionalEncoding
    from unopose_tpu.ops.ball_query import (
        _first_k_budget_select,
        _first_k_keys_pallas,
        two_scale_group_first_k_packed,
    )
    from unopose_tpu.ops.pe_fused import pe_fused_packed, fold_bn

    B, N, C = 32, 2048, 4
    R1, K1, R2, K2 = 0.1, 64, 0.2, 256
    rng = np.random.default_rng(0)
    v = rng.normal(size=(B, N, 3))
    v /= np.linalg.norm(v, axis=-1, keepdims=True)
    pts = jnp.asarray((0.5 * v + rng.normal(size=(B, N, 3)) * 2e-3).astype(np.float32))
    print(f"backend: {jax.default_backend()}", flush=True)

    perm_np = np.random.default_rng(20240613).permutation(N).astype(np.int32)
    perm = jnp.asarray(perm_np)
    pts_p = jnp.take(pts, perm, axis=1)

    timed("keys_kernel_bf16x3", lambda e, p, pp: _first_k_keys_pallas(R1, R2, p + e, pp, perm, C), pts, pts_p)

    key, _, _ = jax.jit(lambda p, pp: _first_k_keys_pallas(R1, R2, p, pp, perm, C))(pts, pts_p)
    budget = K2 // C
    timed(
        "budget_sort_512_keep64",
        lambda e, k: jax.lax.sort(-(k + jnp.int16(0)), dimension=-1, is_stable=False)[..., :budget],
        key,
    )

    timed(
        "full_budget_select",
        lambda e, p: _first_k_budget_select(R1, K1, R2, K2, p + e, C, None, False)["g2"],
        pts,
    )
    timed(
        "packed_grouping",
        lambda e, p: two_scale_group_first_k_packed(R1, K1, R2, K2, p + e)[0],
        pts,
    )

    # fused PE kernel alone on a precomputed grouping
    g2, w1, *_ = jax.jit(lambda p: two_scale_group_first_k_packed(R1, K1, R2, K2, p))(pts)
    cx, cy, cz = pts[..., 0], pts[..., 1], pts[..., 2]
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
    w2f = jnp.ones_like(w1)  # full-path flag: measure the pre-fast-path kernel
    t2f = jnp.full(w1.shape[:2], w1.shape[-1], jnp.int32)
    timed(
        "pe_fused_packed_kernel",
        lambda e, a, b, c, w, x, y, z: pe_fused_packed(
            (a + e, b, c), w, w2f, t2f, (x, y, z), Ws1, bs1, Ws2, bs2, R1, R2
        ),
        *g2, w1, cx, cy, cz,
    )

    pe = FinePositionalEncoding(out_dim=256, r1=R1, r2=R2, nsample1=K1, nsample2=K2, neighbor_mode="first_k")
    variables = pe.init(jax.random.PRNGKey(0), pts, train=False)
    timed("pe_packed_full_B32", lambda e, v, p: pe.apply(v, p + e, train=False), variables, pts)

    print(RESULTS, flush=True)


if __name__ == "__main__":
    main()
