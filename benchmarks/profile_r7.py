"""Budget-sort restructuring + keys-kernel precision micro-bench (B=32).

  s0: current single 512-wide int16 sort, keep 64
  s1: two-stage — sort 4x128-wide keep 32, re-sort 128-wide keep 64
      (set-identical when no 128-sub-block holds >32 hits; final order
      identical because both end fully key-sorted)
  s2: two-stage at 64-wide/keep-16 first stage (riskier overflow bound)
  k0/k1: _first_k_keys_pallas cross term at HIGHEST (6-pass) vs HIGH (3-pass)

cd /root/repo && python benchmarks/profile_r7.py
"""

from __future__ import annotations

import sys
import time
import os.path as osp

sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))

import numpy as np

RESULTS = {}


def timed(name, fn, *args, iters=10, warmup=2):
    import jax

    jfn = jax.jit(fn)
    out = jfn(np.float32(0.0), *args)
    first = jax.tree_util.tree_leaves(out)[0]
    float(np.asarray(first.reshape(-1)[0], dtype=np.float64))

    def chain(n):
        eps = np.float32(0.0)
        for _ in range(n):
            out = jfn(eps, *args)
            leaf = jax.tree_util.tree_leaves(out)[0]
            eps = (leaf.reshape(-1)[0] * 0).astype(np.float32) if leaf.dtype.kind == "f" else np.float32(0.0)
        return out

    chain(warmup)
    t0 = time.perf_counter()
    out = chain(iters)
    float(np.asarray(jax.tree_util.tree_leaves(out)[0].reshape(-1)[0], dtype=np.float64))
    dt = (time.perf_counter() - t0) / iters
    RESULTS[name] = round(dt * 1e3, 2)
    print(f"{name:52s} {dt * 1e3:9.2f} ms", flush=True)
    return dt


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/unopose_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

    print(f"backend: {jax.default_backend()}", flush=True)
    B, N = 32, 2048
    C, W = 4, 512
    budget = 64
    rng = np.random.default_rng(0)

    # realistic 3-level int16 keys: ~7% hit density
    wiota = np.arange(W, dtype=np.int32)[None, None, None, :]
    m2 = rng.random((B, C, N, W)) < 0.07
    m1 = m2 & (rng.random((B, C, N, W)) < 0.35)
    key_np = (W - wiota + np.where(m2, 2 * W, 0) + np.where(m1, 4 * W, 0)).astype(np.int16)
    key = jax.device_put(key_np)

    def s0(eps, key):
        top = jax.lax.sort(-key, dimension=-1, is_stable=False)[..., :budget]
        return top.astype(jnp.float32).sum() * 0 + eps, top

    def s1(eps, key):
        k4 = key.reshape(B, C, N, 4, 128)
        t1 = jax.lax.sort(-k4, dimension=-1, is_stable=False)[..., :32]
        t1 = t1.reshape(B, C, N, 128)
        top = jax.lax.sort(t1, dimension=-1, is_stable=False)[..., :budget]
        return top.astype(jnp.float32).sum() * 0 + eps, top

    def s2(eps, key):
        k8 = key.reshape(B, C, N, 8, 64)
        t1 = jax.lax.sort(-k8, dimension=-1, is_stable=False)[..., :16]
        t1 = t1.reshape(B, C, N, 128)
        top = jax.lax.sort(t1, dimension=-1, is_stable=False)[..., :budget]
        return top.astype(jnp.float32).sum() * 0 + eps, top

    timed("s0 single 512-wide sort", s0, key)
    timed("s1 two-stage 128/32 -> 128/64", s1, key)
    timed("s2 two-stage 64/16 -> 128/64", s2, key)

    # equality check (no sub-block overflow in this synthetic draw? verify)
    sub_cnt = m2.reshape(B, C, N, 4, 128).sum(-1).max()
    _, a = jax.jit(s0)(np.float32(0), key)
    _, b = jax.jit(s1)(np.float32(0), key)
    same = bool((np.asarray(a) == np.asarray(b)).all())
    print(f"max 128-sub-block hit count: {sub_cnt} (budget 32); s0==s1: {same}", flush=True)
    RESULTS["s1_ok"] = same and int(sub_cnt) <= 32

    # ---- keys kernel precision
    from unopose_tpu.ops.ball_query import _first_k_keys_pallas

    pts = rng.normal(size=(B, N, 3)).astype(np.float32) * 0.3
    perm_np = np.random.default_rng(20240613).permutation(N).astype(np.int32)
    pts_d = jax.device_put(pts)
    pts_p = jax.device_put(pts[:, perm_np])
    perm = jax.device_put(perm_np)

    def k0(eps, pts, pts_p):
        key, ccnt, aux = _first_k_keys_pallas(0.1, 0.2, pts + eps, pts_p, perm, C)
        return ccnt.astype(jnp.float32).sum() * 0 + eps, (key, ccnt)

    timed("k0 keys kernel (HIGHEST cross term)", k0, pts_d, pts_p)

    import json

    print(json.dumps(RESULTS))


if __name__ == "__main__":
    main()
