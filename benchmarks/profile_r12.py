"""PE deep-dive: keys kernel vs decode/gather vs fused MLP kernel, all with
device-resident inputs at the production shape (2B=32, N=2048).

cd /root/repo && python benchmarks/profile_r12.py
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

    import importlib
    bq = importlib.import_module("unopose_tpu.ops.ball_query")
    from unopose_tpu.ops.pe_fused import pe_fused_packed

    B2, P = 32, 2048
    rng = np.random.default_rng(0)
    pts = rng.uniform(-1, 1, size=(B2, P, 3)).astype(np.float32)
    pts /= np.linalg.norm(pts, axis=-1, keepdims=True).max(axis=1, keepdims=True)
    pts = jax.device_put(jnp.asarray(pts))
    print(f"backend: {jax.default_backend()}", flush=True)

    r1, k1, r2, k2, C = 0.1, 64, 0.2, 256, 4
    perm_np = np.random.default_rng(20240613).permutation(P).astype(np.int32)
    perm = jax.device_put(jnp.asarray(perm_np))
    pts_p = jax.jit(lambda p: jnp.take(p, perm, axis=1))(pts)

    # 1. keys kernel alone (compact mode)
    def keys_only(e, p, pp):
        sel, ccnt, aux = bq._first_k_keys_pallas(r1, r2, p + e, pp, perm, C, compact=k2 // C)
        return sel.astype(jnp.int32).sum(), ccnt, aux

    timed("keys_pallas", keys_only, pts, pts_p)

    # 2. full budget select (keys + decode + pad + gather_planar)
    timed(
        "budget_select_full",
        lambda e, p: bq._first_k_budget_select(r1, k1, r2, k2, p + e, C, None, False)["g2"][0],
        pts,
    )

    # 3. packed wrapper (select + w1 bump)
    timed(
        "group_packed",
        lambda e, p: bq.two_scale_group_first_k_packed(r1, k1, r2, k2, p + e)[0][0],
        pts,
    )

    # 4. fused MLP kernel with DEVICE-resident grouped inputs
    g2, w1, *_ = jax.jit(lambda p: bq.two_scale_group_first_k_packed(r1, k1, r2, k2, p))(pts)
    g2 = tuple(jax.device_put(g) for g in g2)
    w1 = jax.device_put(w1)
    center = tuple(jax.device_put(pts[..., i]) for i in range(3))
    Ws1 = [jax.device_put(jnp.asarray(rng.standard_normal((c, d)).astype(np.float32) * 0.1)) for c, d in ((6, 32), (32, 64), (64, 128))]
    bs1 = [jax.device_put(jnp.asarray(rng.standard_normal((d,)).astype(np.float32) * 0.01)) for d in (32, 64, 128)]

    w2f = jnp.ones_like(w1)  # full-path flag: measure the pre-fast-path kernel
    t2f = jnp.full(w1.shape[:2], w1.shape[-1], jnp.int32)

    def run_kernel(e, gx, gy, gz, w1a, cx, cy, cz):
        return pe_fused_packed((gx + e, gy, gz), w1a, w2f, t2f, (cx, cy, cz), Ws1, bs1, Ws1, bs1, r1, r2)

    timed("pe_kernel_dev", run_kernel, *g2, w1, *center)

    print(RESULTS, flush=True)


if __name__ == "__main__":
    main()
