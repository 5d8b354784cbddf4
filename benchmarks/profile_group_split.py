"""Round-3: split the packed first_k grouping's 13.1 ms into the Pallas
keys kernel vs the decode + pad-fill + gather tail.

cd /root/repo && python benchmarks/profile_group_split.py
"""

from __future__ import annotations

import sys
import time
import os.path as osp

sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))

import numpy as np


def _leaf0(tree):
    import jax

    leaves = [l for l in jax.tree_util.tree_leaves(tree) if hasattr(l, "dtype")]
    for l in leaves:
        if l.dtype.kind == "f":
            return l.reshape(-1)[0]
    return leaves[0].reshape(-1)[0].astype("float32")


def timed(name, jfn, *args, iters=10, warmup=2):
    out = jfn(np.float32(0.0), *args)
    float(_leaf0(out))

    def chain(n):
        eps = np.float32(0.0)
        for _ in range(n):
            out = jfn(eps, *args)
            eps = _leaf0(out) * 0.0
        return float(_leaf0(out))

    chain(warmup)
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        chain(iters)
        ts.append((time.perf_counter() - t0) / iters)
    dt = min(ts)
    print(f"{name:44s} {dt * 1e3:9.2f} ms", flush=True)
    return dt


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/unopose_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

    from unopose_tpu.ops.ball_query import (
        _first_k_keys_pallas,
        two_scale_group_first_k_packed,
    )
    from unopose_tpu.ops.gather_pallas import gather_planar

    B, P = 16, 2048
    rng = np.random.default_rng(0)
    pts_np = rng.uniform(-1, 1, size=(2 * B, P, 3)).astype(np.float32)
    pts_np /= np.linalg.norm(pts_np, axis=-1, keepdims=True).max(axis=1, keepdims=True)
    pts = jnp.asarray(pts_np)
    print(f"backend: {jax.default_backend()}", flush=True)

    timed(
        "group_packed_total",
        jax.jit(lambda e, p: two_scale_group_first_k_packed(0.1, 64, 0.2, 256, p + e)),
        pts,
    )

    N = P
    C = 4
    perm_np = np.random.default_rng(20240613).permutation(N).astype(np.int32)
    perm = jnp.asarray(perm_np)

    def keys_only(e, p):
        p = p + e
        pp = jnp.take(p, perm, axis=1)
        return _first_k_keys_pallas(0.1, 0.2, p, pp, perm, C, interpret=False, compact=64)

    timed("keys_pallas_compact", jax.jit(keys_only), pts)

    # gather tail alone: random int16 slots
    idx = jnp.asarray(
        rng.integers(0, N, size=(2 * B, N, 256)).astype(np.int16)
    )
    xp = jnp.asarray(pts_np[..., 0])
    yp = jnp.asarray(pts_np[..., 1])
    zp = jnp.asarray(pts_np[..., 2])
    timed(
        "gather_planar_g2",
        jax.jit(lambda e, x, y, z, i: gather_planar(x + e, y, z, i)),
        xp,
        yp,
        zp,
        idx,
    )


if __name__ == "__main__":
    main()
