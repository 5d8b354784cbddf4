"""Grouping-internals scouting: where do the 14 ms of first_k grouping go?

Times (B=32 = the model's 2B-batched PE call, N=2048):
  1. fused keys kernel alone
  2. budget sort (full 512-wide int16 sort) vs lax.top_k(64)
  3. scale-1 selection: 4-operand 256-wide sort vs packed 1-operand sort
  4. full grouping for reference

cd /root/repo && python benchmarks/profile_r5.py
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

    from unopose_tpu.ops.ball_query import _first_k_keys_pallas, two_scale_group_first_k_fast

    print(f"backend: {jax.default_backend()}", flush=True)
    B, N = 32, 2048
    C, W = 4, 512
    R1, K1, R2, K2 = 0.1, 64, 0.2, 256
    budget = K2 // C
    rng = np.random.default_rng(0)
    v = rng.normal(size=(B, N, 3))
    v /= np.linalg.norm(v, axis=-1, keepdims=True)
    pts = jax.device_put((0.5 * v + rng.normal(size=(B, N, 3)) * 0.01).astype(np.float32))

    perm_np = np.random.default_rng(20240613).permutation(N).astype(np.int32)
    perm = jnp.asarray(perm_np)

    def keys_only(eps, pts):
        pp = jnp.take(pts + eps, perm, axis=1)
        return _first_k_keys_pallas(R1, R2, pts + eps, pp, perm, C)

    timed("keys kernel only (B=32)", keys_only, pts)

    key, ccnt, aux = jax.jit(keys_only)(np.float32(0.0), pts)
    key = jax.device_put(key)

    def budget_sort(eps, key):
        k = key + eps.astype(jnp.int16) * 0
        return jax.lax.sort(-k, dimension=-1, is_stable=False)[..., :budget].astype(jnp.float32)

    timed("budget sort 512-wide int16", budget_sort, key)

    def budget_topk(eps, key):
        k = key + eps.astype(jnp.int16) * 0
        vals, _ = jax.lax.top_k(k, budget)
        return vals.astype(jnp.float32)

    timed("budget top_k(64) int16", budget_topk, key)

    def budget_topk32(eps, key):
        k = (key + eps.astype(jnp.int16) * 0).astype(jnp.int32)
        vals, _ = jax.lax.top_k(k, budget)
        return vals.astype(jnp.float32)

    timed("budget top_k(64) int32", budget_topk32, key)

    # ---- scale-1 selection variants on realistic slot data
    g2x = jax.device_put(rng.normal(size=(B, N, K2)).astype(np.float32))
    g2y = jax.device_put(rng.normal(size=(B, N, K2)).astype(np.float32))
    g2z = jax.device_put(rng.normal(size=(B, N, K2)).astype(np.float32))
    m1 = jax.device_put(rng.uniform(size=(B, N, K2)) < 0.15)

    def s1_multisort(eps, g2x, g2y, g2z, m1):
        siota = jnp.arange(K2, dtype=jnp.int32)[None, None, :]
        key1 = jnp.where(m1, 2 * K2 - siota, K2 - siota).astype(jnp.int16)
        negk, ax, ay, az = jax.lax.sort(
            (-key1, g2x + eps, g2y, g2z), dimension=-1, is_stable=False, num_keys=1
        )
        return ax[..., :K1] + ay[..., :K1] + az[..., :K1] + negk[..., :K1].astype(jnp.float32)

    timed("scale1 4-operand sort 256-wide", s1_multisort, g2x, g2y, g2z, m1)

    def s1_packsort(eps, g2x, g2y, g2z, m1):
        # pack (m1, slot) into one int32; sort; take top k1; then one-hot
        # matmul gather of the 3 coord planes from the 256 slots
        siota = jnp.arange(K2, dtype=jnp.int32)[None, None, :]
        key1 = jnp.where(m1, 2 * K2 - siota, K2 - siota)
        packed = key1 * K2 + siota
        top = jax.lax.sort(-packed, dimension=-1, is_stable=False)[..., :K1]
        slot = (-top) % K2  # (B, N, K1)
        onehot = (slot[..., :, None] == siota[..., None, :]).astype(jnp.bfloat16)  # (B,N,K1,K2)
        sel = jnp.einsum(
            "bnks,bnsc->bnkc",
            onehot,
            jnp.stack([g2x + eps, g2y, g2z], axis=-1).astype(jnp.bfloat16),
        )
        return sel.astype(jnp.float32).sum(-1).sum(-1) + top[..., 0].astype(jnp.float32)

    timed("scale1 packed sort + onehot gather", s1_packsort, g2x, g2y, g2z, m1)

    def s1_topk(eps, g2x, g2y, g2z, m1):
        siota = jnp.arange(K2, dtype=jnp.int32)[None, None, :]
        key1 = jnp.where(m1, 2 * K2 - siota, K2 - siota)
        packed = key1 * K2 + siota
        top, _ = jax.lax.top_k(packed, K1)
        slot = top % K2
        onehot = (slot[..., :, None] == siota[..., None, :]).astype(jnp.bfloat16)
        sel = jnp.einsum(
            "bnks,bnsc->bnkc",
            onehot,
            jnp.stack([g2x + eps, g2y, g2z], axis=-1).astype(jnp.bfloat16),
        )
        return sel.astype(jnp.float32).sum(-1).sum(-1) + top[..., 0].astype(jnp.float32)

    timed("scale1 top_k + onehot gather", s1_topk, g2x, g2y, g2z, m1)

    # ---- full grouping for reference
    def grp(eps, pts):
        return two_scale_group_first_k_fast(R1, K1, R2, K2, pts + eps)

    timed("full grouping fused keys (B=32)", grp, pts)

    import json

    print(json.dumps(RESULTS))


if __name__ == "__main__":
    main()
