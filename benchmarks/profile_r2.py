"""Round-2 perf scouting: candidate-by-candidate on-chip timings.

Measures, on the real TPU at the production operating point (B=16 pairs,
N=2048 fine points, 197 coarse nodes):

  1. first_k grouping: encoded full sort vs lax.top_k vs subset-Pallas
  2. fine PE: XLA first_k path vs pe_fused(subset) vs pe_fused fed with
     first_k groupings (the candidate production config)
  3. pe_fused p_blk sweep (grid-overhead check)
  4. geo embedding per cloud (current)
  5. ViT encoder pair

cd /root/repo && python benchmarks/profile_r2.py
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

    from unopose_tpu.ops.ball_query import (
        _first_k_in_radius,
        ball_group_subset_pallas,
        two_scale_group_exact_planar,
    )
    from unopose_tpu.ops.geometry import pairwise_sqdist
    from unopose_tpu.ops.gather_pallas import gather_planar

    print(f"backend: {jax.default_backend()}", flush=True)
    B, N = 16, 2048
    R1, K1, R2, K2 = 0.1, 64, 0.2, 256
    rng = np.random.default_rng(0)
    v = rng.normal(size=(B, N, 3))
    v /= np.linalg.norm(v, axis=-1, keepdims=True)
    pts = jax.device_put((0.5 * v + rng.normal(size=(B, N, 3)) * 0.01).astype(np.float32))

    # ---- 1. grouping variants
    def grp_sort(eps, pts):
        return two_scale_group_exact_planar(R1, K1, R2, K2, pts + eps)

    timed("group first_k (encoded sort, 2 scales)", grp_sort, pts)

    def topk_first_k(mask, nsample):
        n = mask.shape[-1]
        iota = jnp.arange(n, dtype=jnp.int32)
        key = jnp.where(mask, 2 * n - iota, n - iota)
        top, _ = jax.lax.top_k(key, nsample)
        idx = jnp.where(top > n, 2 * n - top, n - top)
        cnt = jnp.sum(mask, axis=-1, dtype=jnp.int32)[..., None]
        slot = jnp.arange(nsample, dtype=jnp.int32)
        first = jnp.where(cnt > 0, idx[..., :1], 0)
        return jnp.where(slot < cnt, idx, first).astype(jnp.int32)

    def grp_topk(eps, pts):
        p = pts + eps
        x, y, z = p[..., 0], p[..., 1], p[..., 2]
        d2 = pairwise_sqdist(p, p)
        i1 = topk_first_k(d2 < R1 * R1, K1)
        i2 = topk_first_k(d2 < R2 * R2, K2)
        return gather_planar(x, y, z, i1), gather_planar(x, y, z, i2)

    timed("group first_k (lax.top_k, 2 scales)", grp_topk, pts)

    def grp_subset(eps, pts):
        p = pts + eps
        a = ball_group_subset_pallas(R1, K1, p)
        b = ball_group_subset_pallas(R2, K2, p)
        return a[0], b[0]

    timed("group subset (Pallas, 2 scales)", grp_subset, pts)

    # d2 alone, to subtract
    timed("pairwise d2 (B,N,N) only", lambda eps, p: pairwise_sqdist(p + eps, p), pts)

    # sort alone on the encoded key
    def sort_only(eps, pts):
        d2 = pairwise_sqdist(pts + eps, pts)
        return _first_k_in_radius(d2 < R2 * R2, K2)

    timed("d2 + encoded sort (scale2 only)", sort_only, pts)

    def topk_only(eps, pts):
        d2 = pairwise_sqdist(pts + eps, pts)
        return topk_first_k(d2 < R2 * R2, K2)

    timed("d2 + top_k (scale2 only)", topk_only, pts)

    # ---- 2. PE variants
    from unopose_tpu.models.matching import FinePositionalEncoding

    def pe_run(mode, fused, dtype=None):
        m = FinePositionalEncoding(
            out_dim=256, r1=R1, r2=R2, nsample1=K1, nsample2=K2,
            neighbor_mode=mode, fused=fused, compute_dtype=dtype,
        )
        variables = m.init({"params": jax.random.PRNGKey(0)}, pts, train=False)

        def f(eps, pts):
            return m.apply(variables, pts + eps, train=False)

        return f

    timed("PE subset fused (production today)", pe_run("subset", True), pts)
    timed("PE first_k XLA (parity today)", pe_run("first_k", None), pts)

    # ---- 3. pe_fused p_blk sweep
    from unopose_tpu.ops.pe_fused import pe_fused

    g1, d1s, v1 = ball_group_subset_pallas(R1, K1, pts)
    g2, d2s, v2 = ball_group_subset_pallas(R2, K2, pts)
    center = (pts[..., 0], pts[..., 1], pts[..., 2])
    Ws1 = [jnp.asarray(rng.normal(size=(c, d)).astype(np.float32) * 0.1) for c, d in ((6, 32), (32, 64), (64, 128))]
    bs1 = [jnp.zeros((d,), jnp.float32) for d in (32, 64, 128)]

    for p_blk in (32, 64, 128, 256):
        def f(eps, g1=g1, g2=g2, p_blk=p_blk):
            g1e = tuple(g + eps for g in g1)
            return pe_fused(g1e, v1, g2, v2, center, Ws1, bs1, Ws1, bs1, R1, R2, p_blk=p_blk)

        timed(f"pe_fused kernel p_blk={p_blk}", f, iters=10)

    # ---- 4. geo embedding
    from unopose_tpu.models.embedding import GeometricStructureEmbedding

    nodes = jax.device_put(np.concatenate([np.ones((B, 1, 3), np.float32), np.asarray(pts[:, :196])], axis=1))
    geo = GeometricStructureEmbedding(hidden_dim=256, sigma_d=0.2, sigma_a=15, angle_k=3, reduction_a="max",
                                      d_index_max=float(2.1 * np.sqrt(3.0) / 0.2), dtype=jnp.bfloat16)
    gvars = geo.init(jax.random.PRNGKey(0), nodes)
    timed("geo embedding (1 cloud, bf16)", lambda eps, n: geo.apply(gvars, n + eps), nodes)

    # ---- 5. ViT pair
    from unopose_tpu.models.vit import make_vit

    vit = make_vit("vit_base_patch14_reg4_dinov2", img_size=224, dtype=jnp.bfloat16)
    imgs = jax.device_put(rng.normal(size=(2 * B, 224, 224, 3)).astype(np.float32))
    vvars = vit.init(jax.random.PRNGKey(0), imgs[:1])

    def vf(eps, imgs):
        outs, cls = vit.apply(vvars, imgs + eps)
        return cls

    timed("ViT pair (32 imgs, bf16)", vf, imgs, iters=6)

    import json

    print(json.dumps(RESULTS))


if __name__ == "__main__":
    main()
