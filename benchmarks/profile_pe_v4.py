"""Round-5: PE-v4 internal ablation on the real chip — where do the ms live?

Measures, in ONE process (one axon claim): the idx grouping, the full v4
kernel, and the kernel with gather / LRF / MLP ablated out. Deltas give the
per-component share net of the common DMA + dispatch cost.

cd /root/repo && python benchmarks/profile_pe_v4.py
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
    dt = min(ts)
    print(f"{name:44s} {dt * 1e3:9.2f} ms", flush=True)
    return dt * 1e3


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/unopose_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

    from unopose_tpu.ops.ball_query import two_scale_group_first_k_packed_idx
    from unopose_tpu.ops.pe_fused import pe_fused_gather_t

    B, P = 16, 2048
    rng = np.random.default_rng(0)
    pts_np = rng.uniform(-1, 1, size=(2 * B, P, 3)).astype(np.float32)
    pts_np /= np.linalg.norm(pts_np, axis=-1, keepdims=True).max(axis=1, keepdims=True)
    pts = jnp.asarray(pts_np)
    center = (pts[..., 0], pts[..., 1], pts[..., 2])
    print(f"backend: {jax.default_backend()}", flush=True)

    mlp_dims = (32, 64, 128)
    w1_mlp, b1_mlp, w2_mlp, b2_mlp = [], [], [], []
    cin = 6
    r = np.random.default_rng(1)
    for d in mlp_dims:
        w1_mlp.append(jnp.asarray(r.standard_normal((cin, d)).astype(np.float32) * 0.3))
        b1_mlp.append(jnp.asarray(r.standard_normal((d,)).astype(np.float32) * 0.1))
        w2_mlp.append(jnp.asarray(r.standard_normal((cin, d)).astype(np.float32) * 0.3))
        b2_mlp.append(jnp.asarray(r.standard_normal((d,)).astype(np.float32) * 0.1))
        cin = d

    results = {}
    grp = jax.jit(lambda e, p: two_scale_group_first_k_packed_idx(0.1, 64, 0.2, 256, p + e))
    results["grouping_idx"] = timed("grouping_idx (keys + weights, no gather)", grp, pts)

    planes, idx_p, w1, w2, total2, overflow = jax.block_until_ready(grp(np.float32(0.0), pts))
    print("overflow:", bool(overflow), flush=True)
    t2 = np.asarray(total2)
    bmax = t2.reshape(t2.shape[0], -1, 128).max(-1)
    print(
        f"total2: max {t2.max()}, mean {t2.mean():.1f}; tier64 {np.mean(bmax <= 64):.3f} "
        f"tier128 {np.mean((bmax > 64) & (bmax <= 128)):.3f} tier256 {np.mean(bmax > 128):.3f}",
        flush=True,
    )

    variants = [("", None), ("scratch", None), ("scratch", 0), ("gather", None), ("lrf", None), ("mlp", None)]
    for ab, ft in variants:
        fn = jax.jit(
            lambda e, pl_, ii, a, b, t2_, ab=ab, ft=ft: pe_fused_gather_t(
                tuple(q + e for q in pl_), ii, a, b, t2_, center,
                w1_mlp, b1_mlp, w2_mlp, b2_mlp, 0.1, 0.2, ablate=ab, force_tier=ft,
            )
        )
        name = f"v4_kernel[{ab or 'full'}{'' if ft is None else f'_tier{ft}'}]"
        results[name] = timed(name, fn, planes, idx_p, w1, w2, total2)

    print(json.dumps({k: round(v, 2) for k, v in results.items()}))


if __name__ == "__main__":
    main()
