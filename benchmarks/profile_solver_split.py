"""Round-3: sub-profile the coarse solver below the ~4 ms axon dispatch
floor (in-jit fori_loop repetition, see benchmarks/_timing.py), and compare
alternates (one-hot matmul gathers, encoded-sort top-k).

cd /root/repo && python benchmarks/profile_solver_split.py
"""

from __future__ import annotations

import sys
import os.path as osp

sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))

import numpy as np

RESULTS = {}


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/unopose_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

    from benchmarks._timing import timed_loop
    from unopose_tpu.ops.geometry import pairwise_sqdist
    from unopose_tpu.ops.solver import (
        _dual_softmax_assignment,
        compute_coarse_Rt_overlap,
        searchsorted_cdf,
    )

    B = 16
    n1 = n2 = 196
    NP1, NP2 = 6000, 300
    Q = NP1 * 3
    rng = np.random.default_rng(0)
    atten = jnp.asarray(rng.standard_normal((B, n1 + 1, n2 + 1)).astype(np.float32))
    score = jnp.asarray(rng.uniform(0, 1, size=(B, n1 + n2)).astype(np.float32))
    pts_np = rng.uniform(-1, 1, size=(B, n1, 3)).astype(np.float32)
    p196 = jnp.asarray(pts_np)
    key = jax.random.PRNGKey(3)
    print(f"backend: {jax.default_backend()}", flush=True)

    T = lambda name, fn, *args: timed_loop(name, fn, *args, k=20, results=RESULTS)

    # --- whole solver ---
    T(
        "solver_total",
        lambda e, a, s, p: compute_coarse_Rt_overlap(key, a + e, s, p, p)[0],
        atten,
        score,
        p196,
    )

    # --- stage 1: softmaxes + ps + pow1.5 ---
    def run_ps(e, a, s):
        pred, w1, w2, _, _ = _dual_softmax_assignment(a + e, s, n1, n2)
        ps = pred[:, 1:, 1:] * w1[:, :, None] * w2[:, None, :]
        return jnp.reshape(ps, (B, n1 * n2)) ** 1.5

    T("s1_softmax_ps_pow", run_ps, atten, score)
    ps = jax.jit(run_ps)(np.float32(0.0), atten, score)

    def run_cum(e, p):
        cum = jnp.cumsum(p + e, axis=1)
        return cum / (cum[:, -1:] + 1e-8)

    T("s2_cumsum_norm", run_cum, ps)
    cum = jax.jit(run_cum)(np.float32(0.0), ps)

    T("s3_uniform", lambda e, k_: jax.random.uniform(k_, (B, Q), jnp.float32) + e, key)
    r = jax.jit(lambda k_: jax.random.uniform(k_, (B, Q), jnp.float32))(key)

    T("s4_searchsorted_cdf", lambda e, c, rr: searchsorted_cdf(c, rr + e).astype(jnp.float32), cum, r)

    idx = jax.jit(lambda c, rr: searchsorted_cdf(c, rr))(cum, r)

    # --- stage 5: triplet coordinate gathers ---
    from unopose_tpu.ops.gather_pallas import gather_planar

    x1, y1, z1 = p196[..., 0], p196[..., 1], p196[..., 2]

    def gathers_cur(e, i, x, y, z):
        x = x + e
        i1 = jnp.minimum(i // n2, n1 - 1)
        i2 = i % n2
        outs = []
        for m in range(3):
            outs += list(gather_planar(x, y, z, i1[:, m::3][..., None]))
            outs += list(gather_planar(x, y, z, i2[:, m::3][..., None]))
        return sum(o[..., 0] for o in outs)

    T("s5_triplet_gathers_cur", gathers_cur, idx, x1, y1, z1)

    def gathers_onehot_f32(e, i, p):
        p = p + e
        i1 = jnp.minimum(i // n2, n1 - 1)
        i2 = i % n2
        oh1 = jax.nn.one_hot(i1, n1, dtype=jnp.float32)
        oh2 = jax.nn.one_hot(i2, n2, dtype=jnp.float32)
        g1 = jnp.einsum("bqn,bnc->bqc", oh1, p)
        g2 = jnp.einsum("bqn,bnc->bqc", oh2, p)
        return g1.sum(-1) + g2.sum(-1)

    T("s5_triplet_gathers_onehot_f32", gathers_onehot_f32, idx, p196)

    # --- stage 5b: full planar triplet solve (gathers + kabsch) ---
    def run_triplets(e, idx_, p):
        from unopose_tpu.ops.procrustes import kabsch_rotation_planar

        p = p + e
        x, y, z = p[..., 0], p[..., 1], p[..., 2]
        idx1 = jnp.minimum(idx_ // n2, n1 - 1)
        idx2 = idx_ % n2

        def gp(xx, yy, zz, i):
            planes = gather_planar(xx, yy, zz, i[..., None])
            return tuple(q[..., 0] for q in planes)

        r_m = [gp(x, y, z, idx1[:, m::3]) for m in range(3)]
        s_m = [gp(x, y, z, idx2[:, m::3]) for m in range(3)]
        third = jnp.float32(1.0 / 3.0)
        cr = [sum(q[k] for q in r_m) * third for k in range(3)]
        cs = [sum(q[k] for q in s_m) * third for k in range(3)]
        dr = [[q[k] - cr[k] for k in range(3)] for q in r_m]
        ds = [[q[k] - cs[k] for k in range(3)] for q in s_m]
        H = [[sum(ds[m][i] * dr[m][j] for m in range(3)) * third for j in range(3)] for i in range(3)]
        R9 = kabsch_rotation_planar((H[0][0], H[0][1], H[0][2], H[1][0], H[1][1], H[1][2], H[2][0], H[2][1], H[2][2]))
        return R9[0]

    T("s5b_triplet_full", run_triplets, idx, p196)

    # --- stage 6: top-k ---
    resid = jnp.asarray(rng.uniform(0, 1, size=(B, NP1)).astype(np.float32))
    T("s6_topk300_cur", lambda e, rr: jax.lax.top_k(-(rr + e), NP2)[1].astype(jnp.float32), resid)

    def topk_encoded(e, rr):
        rr = rr + e
        bits = jax.lax.bitcast_convert_type(rr, jnp.int32)
        enc = (bits & ~0x1FFF) | jax.lax.broadcasted_iota(jnp.int32, rr.shape, 1)
        srt = jax.lax.sort(enc, dimension=-1, is_stable=False)[:, :NP2]
        return (srt & 0x1FFF).astype(jnp.float32)

    T("s6_topk300_encoded_sort", topk_encoded, resid)

    # --- stage 7: selection ---
    rs = jnp.asarray(rng.standard_normal((B, NP2, 3, 3)).astype(np.float32))
    ts = jnp.asarray(rng.standard_normal((B, NP2, 1, 3)).astype(np.float32) * 0.1)
    w1d = jnp.asarray((rng.uniform(0, 1, size=(B, n1)) > 0.5).astype(np.float32))

    def run_select(e, rs_, ts_, p, w):
        tp = jnp.matmul(p[:, None] - (ts_ + e), rs_)
        d2 = pairwise_sqdist(tp, p[:, None])
        d = jnp.sqrt(jnp.maximum(jnp.min(d2, axis=-1), 0.0))
        return jnp.sum(w, axis=1)[:, None] / (jnp.sum(d * w[:, None], axis=2) + 1e-8)

    T("s7_selection_cur", run_select, rs, ts, p196, w1d)

    print(RESULTS, flush=True)


if __name__ == "__main__":
    main()
