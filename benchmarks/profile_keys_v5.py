"""Round-5: keys-kernel ablation — PE grouping is now 6.4 ms of the 12.2 ms
PE total; where does it live? Times _first_k_keys_pallas in its three modes
(full global compaction / per-chunk compaction only / raw keys) plus the
XLA weight-building tail, in ONE process.

cd /root/repo && python benchmarks/profile_keys_v5.py
"""

from __future__ import annotations

import json
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
    dt = min(ts) * 1e3
    print(f"{name:52s} {dt:9.2f} ms", flush=True)
    return dt


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/unopose_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

    from unopose_tpu.ops.ball_query import (
        _first_k_keys_pallas,
        two_scale_group_first_k_packed_idx,
    )

    B, P = 16, 2048
    rng = np.random.default_rng(0)
    pts_np = rng.uniform(-1, 1, size=(2 * B, P, 3)).astype(np.float32)
    pts_np /= np.linalg.norm(pts_np, axis=-1, keepdims=True).max(axis=1, keepdims=True)
    pts = jnp.asarray(pts_np)
    print(f"backend: {jax.default_backend()}", flush=True)

    perm_np = np.random.default_rng(20240613).permutation(P).astype(np.int32)
    perm = jnp.asarray(perm_np)
    pts_p = jnp.take(pts, perm, axis=1)

    results = {}
    results["grouping_idx_total"] = timed(
        "grouping_idx_total (keys + weights XLA tail)",
        jax.jit(lambda e, p: two_scale_group_first_k_packed_idx(0.1, 64, 0.2, 256, p + e)),
        pts,
    )
    for name, kw in (
        ("keys[global_compact]", dict(compact=64, global_compact=True)),
        ("keys[chunk_compact]", dict(compact=64, global_compact=False)),
        ("keys[raw]", dict(compact=0, global_compact=False)),
    ):
        fn = jax.jit(
            lambda e, p, pp, kw=kw: _first_k_keys_pallas(0.1, 0.2, p + e, pp + e, perm, 4, **kw)
        )
        results[name] = timed(name, fn, pts, pts_p)

    print(json.dumps({k: round(v, 2) for k, v in results.items()}))


if __name__ == "__main__":
    main()
