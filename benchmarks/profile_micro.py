"""Micro-profile of the point-op / solver internals flagged by
profile_stages.py (fps_lrf, geo_embed, fine PE, coarse solver pieces).

cd /root/repo && python benchmarks/profile_micro.py
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
    print(f"{name:36s} {dt * 1e3:9.2f} ms   (compile {compile_s:.1f}s)", flush=True)
    return dt


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/unopose_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

    from unopose_tpu.ops.ball_query import ball_group_planar
    from unopose_tpu.ops.fps import fps_pallas, fps_xla, gather_points
    from unopose_tpu.ops.geometry import pairwise_sqdist
    from unopose_tpu.ops.lrf import global_lrf
    from unopose_tpu.ops.procrustes import weighted_procrustes

    B = 16
    rng = np.random.default_rng(0)
    p2048 = jnp.asarray(rng.uniform(-1, 1, size=(B, 2048, 3)).astype(np.float32))
    f2048 = jnp.asarray(rng.standard_normal((B, 2048, 256)).astype(np.float32))

    print(f"backend: {jax.default_backend()}", flush=True)

    timed("fps_pallas_2048->196", lambda e, p: fps_pallas(p + e, 196), p2048)
    timed("fps_xla_2048->196", lambda e, p: fps_xla(p + e, 196), p2048)
    timed("global_lrf_2048", lambda e, p: global_lrf(p + e), p2048)

    idx196 = jnp.asarray(rng.integers(0, 2048, size=(B, 196)).astype(np.int32))
    timed("gather_3x(196)", lambda e, f, i: gather_points(f + e, i), f2048, idx196)

    # geo embedding pieces
    pts197 = jnp.asarray(rng.uniform(-1, 1, size=(B, 197, 3)).astype(np.float32))

    def geo_dist_part(e, p):
        p = p + e
        dist = jnp.sqrt(pairwise_sqdist(p, p))
        return dist

    timed("geo_pairwise_dist", geo_dist_part, pts197)

    def geo_knn_part(e, p):
        p = p + e
        dist = jnp.sqrt(pairwise_sqdist(p, p))
        _, knn_idx = jax.lax.top_k(-dist, 4)
        return knn_idx.astype(jnp.float32)

    timed("geo_dist+knn", geo_knn_part, pts197)

    def geo_angles(e, p):
        p = p + e
        dist = jnp.sqrt(pairwise_sqdist(p, p))
        _, knn_idx = jax.lax.top_k(-dist, 4)
        knn_idx = knn_idx[..., 1:]
        knn_pts = jnp.take_along_axis(p[:, None, :, :], knn_idx[..., None], axis=2)
        ref_vec = knn_pts - p[:, :, None, :]
        anc_vec = p[:, None, :, :] - p[:, :, None, :]
        rv = ref_vec[:, :, None, :, :]
        av = anc_vec[:, :, :, None, :]
        sin_v = jnp.linalg.norm(jnp.cross(rv, av), axis=-1)
        cos_v = jnp.sum(rv * av, axis=-1)
        return jnp.arctan2(sin_v, cos_v)

    timed("geo_angles_full", geo_angles, pts197)

    def sinus(e, idx):
        idx = idx + e
        div = jnp.exp(jnp.arange(0, 256, 2, dtype=jnp.float32) * (-np.log(10000.0) / 256))
        om = idx[..., None] * div
        return jnp.concatenate([jnp.sin(om), jnp.cos(om)], axis=-1)

    d197 = jnp.asarray(rng.uniform(0, 5, size=(B, 197, 197)).astype(np.float32))
    timed("sinusoid_197x197_d256", sinus, d197)

    # ball grouping for fine PE
    timed("ball_group_subset_2048x256", lambda e, p: ball_group_planar(0.2, 256, p + e)[0][0], p2048)

    # coarse solver pieces
    ps = jnp.asarray(rng.uniform(0, 1, size=(B, 196 * 196)).astype(np.float32))
    key = jax.random.PRNGKey(0)

    def sample_part(e, ps):
        ps = ps + e
        cum = jnp.cumsum(ps, axis=1)
        cum = cum / (cum[:, -1:] + 1e-8)
        r = jax.random.uniform(key, (B, 6000 * 3), dtype=jnp.float32)
        idx = jax.vmap(lambda a, v: jnp.searchsorted(a, v, method="sort"))(cum, r)
        return idx.astype(jnp.float32)

    timed("csolve_cumsum+searchsorted", sample_part, ps)

    p196 = jnp.asarray(rng.uniform(-1, 1, size=(B, 196, 3)).astype(np.float32))
    tri1 = jnp.asarray(rng.uniform(-1, 1, size=(B * 6000, 3, 3)).astype(np.float32))
    tri2 = jnp.asarray(rng.uniform(-1, 1, size=(B * 6000, 3, 3)).astype(np.float32))

    def procrustes_part(e, a, b):
        return weighted_procrustes(a + e, b)

    timed("procrustes_96000_triplets", procrustes_part, tri1, tri2)

    rs = jnp.asarray(rng.standard_normal((B, 300, 3, 3)).astype(np.float32))
    ts = jnp.asarray(rng.standard_normal((B, 300, 1, 3)).astype(np.float32))
    w1 = jnp.asarray((rng.uniform(0, 1, size=(B, 196)) > 0.5).astype(np.float32))

    def select_part(e, rs, ts, p1, mp):
        rs = rs + e
        chunk = 30
        rs_c = rs.reshape(B, 10, chunk, 3, 3).swapaxes(0, 1)
        ts_c = ts.reshape(B, 10, chunk, 1, 3).swapaxes(0, 1)

        def chunk_scores(args):
            rc, tc = args
            tp = jnp.matmul(p1[:, None] - tc, rc)
            d = jnp.sqrt(jnp.maximum(pairwise_sqdist(tp, mp[:, None]), 0))
            d = jnp.min(d, axis=-1)
            return jnp.sum(w1, axis=1)[:, None] / (jnp.sum(d * w1[:, None], axis=2) + 1e-8)

        scores = jax.lax.map(chunk_scores, (rs_c, ts_c))
        return scores

    timed("csolve_selection_laxmap10", select_part, rs, ts, p196, p196)

    def select_part_onego(e, rs, ts, p1, mp):
        rs = rs + e
        tp = jnp.matmul(p1[:, None] - ts, rs)  # (B,300,196,3)
        d2 = pairwise_sqdist(tp, mp[:, None])
        d = jnp.min(d2, axis=-1)
        d = jnp.sqrt(jnp.maximum(d, 0))
        return jnp.sum(w1, axis=1)[:, None] / (jnp.sum(d * w1[:, None], axis=2) + 1e-8)

    timed("csolve_selection_onego_sqrtmin", select_part_onego, rs, ts, p196, p196)

    print({k: v for k, v in RESULTS.items()}, flush=True)


if __name__ == "__main__":
    main()
