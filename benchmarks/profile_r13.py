"""Round-3 deep dive: fine-matcher internals + coarse-solver internals at the
production operating point (B=16 pairs, first_k packed PE, int8 geo).

cd /root/repo && python benchmarks/profile_r13.py
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
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        chain(iters)
        ts.append((time.perf_counter() - t0) / iters)
    dt = min(ts)
    RESULTS[name] = round(dt * 1e3, 2)
    print(f"{name:44s} {dt * 1e3:9.2f} ms   (compile {compile_s:.1f}s)", flush=True)
    return dt


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/unopose_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

    from unopose_tpu.models.attention import LinearTransformerLayer
    from unopose_tpu.models.matching import FinePositionalEncoding
    from unopose_tpu.models.transformer import GeometricTransformer
    from unopose_tpu.ops.solver import _dual_softmax_assignment, searchsorted_cdf

    B, P = 16, 2048
    rng = np.random.default_rng(0)
    pts_np = rng.uniform(-1, 1, size=(2 * B, P, 3)).astype(np.float32)
    pts_np /= np.linalg.norm(pts_np, axis=-1, keepdims=True).max(axis=1, keepdims=True)
    pts = jnp.asarray(pts_np)
    print(f"backend: {jax.default_backend()}", flush=True)

    # ---- 1. production PE (packed first_k) on 2B clouds ----
    pe = FinePositionalEncoding(out_dim=256, r1=0.1, r2=0.2, nsample1=64, nsample2=256)
    pe_vars = pe.init(jax.random.PRNGKey(0), pts, train=False)
    timed("pe_total_packed_2B", lambda e, v, p: pe.apply(v, p + e, train=False), pe_vars, pts)

    # ---- 2. sparse stage: GeometricTransformer(self+cross) on 197 tokens,
    # int8 geo tuple, x3 blocks (as the scan does) ----
    f197 = jnp.asarray(rng.standard_normal((B, 197, 256)).astype(np.float32)).astype(jnp.bfloat16)
    e8 = jnp.asarray(rng.integers(-127, 127, size=(B, 197, 197, 256)).astype(np.int8))
    esc = jnp.asarray(rng.uniform(0.001, 0.01, size=(256,)).astype(np.float32))
    gt = GeometricTransformer(("self", "cross"), 256, 4, dtype=jnp.bfloat16)
    gt_vars = gt.init(jax.random.PRNGKey(1), f197, (e8, esc), f197, (e8, esc))

    def run_sparse(eps, v, f, e8_, esc_):
        a = f + eps
        b = f
        for _ in range(3):
            a, b = gt.apply(v, a, (e8_, esc_), b, (e8_, esc_))
        return a

    timed("sparse_geo_x3", run_sparse, gt_vars, f197, e8, esc)

    # sparse stage split: self(2B stacked) vs the two sequential cross calls
    def run_sparse_self(eps, v, f, e8_, esc_):
        a = f + eps
        for _ in range(3):
            a, _ = GeometricTransformer(("self",), 256, 4, dtype=jnp.bfloat16).apply(
                {"params": {"layer0": v["params"]["layer0"]}}, a, (e8_, esc_), a, (e8_, esc_)
            )
        return a

    timed("sparse_self_only_x3", run_sparse_self, gt_vars, f197, e8, esc)

    # ---- 3. dense linear attention x3 (2B stacked, as the block does) ----
    lt = LinearTransformerLayer(256, 4, 3.0, dtype=jnp.bfloat16)
    xd = jnp.asarray(rng.standard_normal((2 * B, P, 256)).astype(np.float32)).astype(jnp.bfloat16)
    xs = jnp.asarray(rng.standard_normal((2 * B, 197, 256)).astype(np.float32)).astype(jnp.bfloat16)
    lt_vars = lt.init(jax.random.PRNGKey(2), xd, xs)

    def run_lt(eps, v, d, s):
        out = d + eps
        for _ in range(3):
            out = lt.apply(v, out, s)
        return out

    timed("dense_linattn_2Bx3", run_lt, lt_vars, xd, xs)

    # ---- 4. coarse solver internals ----
    atten = jnp.asarray(rng.standard_normal((B, 197, 197)).astype(np.float32))
    score = jnp.asarray(rng.uniform(0, 1, size=(B, 392)).astype(np.float32))
    p196 = jnp.asarray(pts_np[:B, :196])
    key = jax.random.PRNGKey(3)
    n1 = n2 = 196

    def run_sampling(eps, a, s):
        pred, w1, w2, _, _ = _dual_softmax_assignment(a + eps, s, n1, n2)
        ps = pred[:, 1:, 1:] * w1[:, :, None] * w2[:, None, :]
        ps = jnp.reshape(ps, (B, n1 * n2)) ** 1.5
        cum = jnp.cumsum(ps, axis=1)
        cum = cum / (cum[:, -1:] + 1e-8)
        r = jax.random.uniform(key, (B, 6000 * 3), dtype=jnp.float32)
        return searchsorted_cdf(cum, r)

    timed("csolver_sampling", run_sampling, atten, score)

    idx = jax.jit(run_sampling)(np.float32(0.0), atten, score)
    idx = jax.device_put(idx)

    def run_triplets(eps, idx_, p):
        from unopose_tpu.ops.gather_pallas import gather_planar
        from unopose_tpu.ops.procrustes import kabsch_rotation_planar

        p = p + eps
        x1, y1, z1 = p[..., 0], p[..., 1], p[..., 2]
        idx1 = jnp.minimum(idx_ // n2, n1 - 1)
        idx2 = idx_ % n2

        def gp(x, y, z, i):
            planes = gather_planar(x, y, z, i[..., None])
            return tuple(q[..., 0] for q in planes)

        r_m = [gp(x1, y1, z1, idx1[:, m::3]) for m in range(3)]
        s_m = [gp(x1, y1, z1, idx2[:, m::3]) for m in range(3)]
        third = jnp.float32(1.0 / 3.0)
        cr = [sum(q[k] for q in r_m) * third for k in range(3)]
        cs = [sum(q[k] for q in s_m) * third for k in range(3)]
        dr = [[q[k] - cr[k] for k in range(3)] for q in r_m]
        ds = [[q[k] - cs[k] for k in range(3)] for q in s_m]
        H = [[sum(ds[m][i] * dr[m][j] for m in range(3)) * third for j in range(3)] for i in range(3)]
        R9 = kabsch_rotation_planar((H[0][0], H[0][1], H[0][2], H[1][0], H[1][1], H[1][2], H[2][0], H[2][1], H[2][2]))
        return R9[0]

    timed("csolver_triplet_solve", run_triplets, idx, p196)

    # selection: top-k + inlier-weighted distance scoring
    rs = jnp.asarray(rng.standard_normal((B, 300, 3, 3)).astype(np.float32))
    ts = jnp.asarray(rng.standard_normal((B, 300, 1, 3)).astype(np.float32) * 0.1)
    w1d = jnp.asarray((rng.uniform(0, 1, size=(B, 196)) > 0.5).astype(np.float32))

    def run_select(eps, rs_, ts_, p, w):
        from unopose_tpu.ops.geometry import pairwise_sqdist

        tp = jnp.matmul(p[:, None] - (ts_ + eps), rs_)
        d2 = pairwise_sqdist(tp, p[:, None])
        d = jnp.sqrt(jnp.maximum(jnp.min(d2, axis=-1), 0.0))
        return jnp.sum(w, axis=1)[:, None] / (jnp.sum(d * w[:, None], axis=2) + 1e-8)

    timed("csolver_selection_300", run_select, rs, ts, p196, w1d)

    resid = jnp.asarray(rng.uniform(0, 1, size=(B, 6000)).astype(np.float32))
    timed("csolver_topk300", lambda e, r: jax.lax.top_k(-(r + e), 300)[1].astype(jnp.float32), resid)

    print(RESULTS, flush=True)


if __name__ == "__main__":
    main()
