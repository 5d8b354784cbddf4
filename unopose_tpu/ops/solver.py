"""Soft-correspondence pose solvers (coarse hypothesis search + fine WSVD).

TPU-native counterparts of the reference inference solvers
(core/unopose/utils/model_utils.py:411-566). Differences by design:

  * RNG is explicit (jax PRNG key) instead of global torch RNG
    (reference samples hypotheses with torch.rand, model_utils.py:462).
  * The 6000-triplet SVD batch is solved with the quaternion Kabsch method
    (ops/procrustes.py) — one fused batch of 4x4 eigenproblems instead of
    6000 CUDA SVDs.
  * The O(n_proposal2 * N1 * N2) pose-selection distance is evaluated in
    chunks via lax.map so the intermediate never exceeds ~100MB.

All shapes are static; everything jits on TPU and CPU.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from unopose_tpu.ops.fps import gather_points
from unopose_tpu.ops.geometry import pairwise_sqdist
from unopose_tpu.ops.procrustes import weighted_procrustes


def searchsorted_cdf(cum: jnp.ndarray, r: jnp.ndarray, seg: int = 49, super_seg: int = 28) -> jnp.ndarray:
    """Vectorized searchsorted('left') into a sorted CDF, per batch row.

    Equivalent to ``jnp.searchsorted(cum[b], r[b])`` but THREE-level: count
    full SUPER-segments below r over the (G1,) super-edges, gather one
    super-window of segment edges and count inside it (recovering the full
    segment index), then gather ONE seg-wide value window per query and
    count inside it. Avoids both the (N+Q)-wide sort that ``method='sort'``
    pays (~10 ms/batch at the coarse solver's operating point) and the flat
    two-level form's (Q, G) compare sweep (G ~ 784 edges -> ~105 compares
    per query here; measured 1.11 -> ~0.6 ms at the operating point).

    cum: (B, N) nondecreasing, r: (B, Q). Returns int32 (B, Q) in [0, N].
    """
    from unopose_tpu.ops.fps import gather_points

    B, N = cum.shape
    G = -(-N // seg)
    pad = G * seg - N
    if pad:
        # pad with the final value: never smaller than any query, so padded
        # slots are never counted
        cum = jnp.concatenate([cum, jnp.broadcast_to(cum[:, -1:], (B, pad))], axis=1)
    win = cum.reshape(B, G, seg)
    edges = win[:, :, -1]  # (B, G) right edge of each segment
    G1 = -(-G // super_seg)
    epad = G1 * super_seg - G
    if epad:
        edges_p = jnp.concatenate([edges, jnp.broadcast_to(edges[:, -1:], (B, epad))], axis=1)
    else:
        edges_p = edges
    ewin = edges_p.reshape(B, G1, super_seg)
    super_edges = ewin[:, :, -1]  # (B, G1)
    n1 = jnp.sum(super_edges[:, None, :] < r[:, :, None], axis=-1).astype(jnp.int32)  # (B, Q)
    esel = gather_points(ewin, jnp.minimum(n1, G1 - 1))  # (B, Q, super_seg)
    n2 = jnp.sum(esel < r[..., None], axis=-1).astype(jnp.int32)
    nfull = jnp.minimum(n1 * super_seg + n2, G)  # full segments below r
    wsel = gather_points(win, jnp.minimum(nfull, G - 1))  # (B, Q, seg)
    cnt = jnp.sum(wsel < r[..., None], axis=-1).astype(jnp.int32)
    return jnp.minimum(nfull * seg + cnt, N)


def _dual_softmax_assignment(atten: jnp.ndarray, score: jnp.ndarray, n1: int, n2: int):
    """Dual-softmax assignment gated by overlap-score outer product.

    atten: (B, n1+1, n2+1) similarity logits incl. bg row/col.
    score: (B, n1+n2) per-point overlap scores in [0, 1].
    Returns assignment (B, n1+1, n2+1) and fg weights w1 (B, n1), w2 (B, n2).
    """
    B = atten.shape[0]
    atten = atten.astype(jnp.float32)
    s1 = jnp.concatenate([jnp.ones((B, 1), jnp.float32), score[:, :n1].astype(jnp.float32)], axis=1)
    s2 = jnp.concatenate([jnp.ones((B, 1), jnp.float32), score[:, n1:].astype(jnp.float32)], axis=1)
    pred = jax.nn.softmax(atten, axis=2) * jax.nn.softmax(atten, axis=1)
    pred = pred * s1[:, :, None] * s2[:, None, :]
    label1 = jnp.argmax(pred[:, 1:, :], axis=2)  # (B, n1) over n2+1 cols (0 = bg)
    label2 = jnp.argmax(pred[:, :, 1:], axis=1)  # (B, n2) over n1+1 rows
    w1 = (label1 > 0).astype(jnp.float32)
    w2 = (label2 > 0).astype(jnp.float32)
    return pred, w1, w2, label1, label2


def compute_coarse_Rt_overlap(
    key: jax.Array,
    atten: jnp.ndarray,
    score: jnp.ndarray,
    pts1: jnp.ndarray,
    pts2: jnp.ndarray,
    model_pts: jnp.ndarray | None = None,
    n_proposal1: int = 6000,
    n_proposal2: int = 300,
    selection_chunks: int = 10,
):
    """RANSAC-like coarse pose hypothesis search (reference model_utils.py:411-490).

    Samples ``n_proposal1`` 3-point correspondence triplets from the
    score-weighted assignment (cumsum + searchsorted inverse-CDF, exponent
    1.5), solves a rigid transform per triplet, keeps the ``n_proposal2``
    with the lowest alignment residual, and picks the hypothesis with the
    best inlier-weighted score against ``model_pts`` (defaults to pts2).

    Args:
        atten: (B, N1+1, N2+1) similarity logits.
        score: (B, N1+N2) overlap scores.
        pts1: (B, N1, 3) observed/target cloud (normalized units).
        pts2: (B, N2, 3) reference/source cloud.
    Returns:
        R (B, 3, 3), t (B, 3), pose_score (B,) — pose maps pts2 into pts1
        frame (p1 ~= R p2 + t).
    """
    pts1 = pts1.astype(jnp.float32)
    pts2 = pts2.astype(jnp.float32)
    B, N1, _ = pts1.shape
    N2 = pts2.shape[1]
    if model_pts is None:
        model_pts = pts2

    pred, w1, w2, _, _ = _dual_softmax_assignment(atten, score, N1, N2)
    ps = pred[:, 1:, 1:] * w1[:, :, None] * w2[:, None, :]
    ps = jnp.reshape(ps, (B, N1 * N2)) ** 1.5

    # inverse-CDF sampling of 3 * n_proposal1 correspondences via the
    # two-level binned search (see searchsorted_cdf; a sort-based
    # searchsorted costs ~10ms/batch here, the sequential 'scan' ~90ms)
    cum = jnp.cumsum(ps, axis=1)
    cum = cum / (cum[:, -1:] + 1e-8)
    r = jax.random.uniform(key, (B, n_proposal1 * 3), dtype=jnp.float32)
    idx = searchsorted_cdf(cum, r)  # (B, 3*n_proposal1)
    idx1 = jnp.minimum(idx // N2, N1 - 1)
    idx2 = idx % N2

    # triplet Procrustes in planar form: every per-hypothesis quantity is a
    # (B, P1) array — the former (B*P1, 3, 3) tensors put the 3x3 in the
    # tiled minor dims and spent ~2x the time on layout
    from unopose_tpu.ops.procrustes import kabsch_rotation_planar

    # one-hot matmul gather: 18k random-index gathers from a 196-point cloud
    # run ~12x faster as an MXU contraction than as a vector gather
    # (benchmarks/profile_solver_split.py s5). Exactness with 3 DEFAULT
    # passes instead of HIGHEST's operand-pair decomposition: the one-hot
    # side is 0/1 (bf16-exact), and the point side splits into three
    # non-overlapping bf16 components p0+p1+p2 == pts bitwise (f32's 24
    # mantissa bits = 3 x 8); a one-hot row selects a single value, so the
    # fp32-accumulated sum of the three partial gathers rebuilds the exact
    # f32 coordinate. On TPU each DEFAULT bf16 pass is 1 MXU pass: 3 total.
    oh1 = jax.nn.one_hot(idx1, N1, dtype=jnp.bfloat16)  # (B, 3*P1, N1)
    oh2 = jax.nn.one_hot(idx2, N2, dtype=jnp.bfloat16)

    def _x3_gather(oh, p):
        p0 = p.astype(jnp.bfloat16)
        r1_ = p - p0.astype(jnp.float32)
        p1 = r1_.astype(jnp.bfloat16)
        p2 = (r1_ - p1.astype(jnp.float32)).astype(jnp.bfloat16)
        dot = lambda pk: jax.lax.dot_general(
            oh, pk, (((2,), (1,)), ((0,), (0,))), preferred_element_type=jnp.float32
        )
        return dot(p0) + dot(p1) + dot(p2)  # (B, Q, 3) exact f32

    g1 = _x3_gather(oh1, pts1)
    g2 = _x3_gather(oh2, pts2)
    r_m = [tuple(g1[:, m::3, k] for k in range(3)) for m in range(3)]  # ref = pts1 triplets
    s_m = [tuple(g2[:, m::3, k] for k in range(3)) for m in range(3)]  # src = pts2 triplets

    third = jnp.float32(1.0 / 3.0)
    cr = [sum(p[k] for p in r_m) * third for k in range(3)]  # centroids (B, P1)
    cs = [sum(p[k] for p in s_m) * third for k in range(3)]
    dr = [[p[k] - cr[k] for k in range(3)] for p in r_m]  # [m][coord]
    ds = [[p[k] - cs[k] for k in range(3)] for p in s_m]
    # H[i][j] = sum_m w * src_i * ref_j, w = 1/3 (normalized uniform)
    H = [[sum(ds[m][i] * dr[m][j] for m in range(3)) * third for j in range(3)] for i in range(3)]
    R9 = kabsch_rotation_planar((H[0][0], H[0][1], H[0][2], H[1][0], H[1][1], H[1][2], H[2][0], H[2][1], H[2][2]))
    r00, r01, r02, r10, r11, r12, r20, r21, r22 = R9
    # t = cr - R cs (R maps src->ref)
    tx = cr[0] - (r00 * cs[0] + r01 * cs[1] + r02 * cs[2])
    ty = cr[1] - (r10 * cs[0] + r11 * cs[1] + r12 * cs[2])
    tz = cr[2] - (r20 * cs[0] + r21 * cs[1] + r22 * cs[2])

    # residual: mean_m | R^T (ref_m - t) - src_m |
    resid = 0.0
    for m in range(3):
        ux = r_m[m][0] - tx
        uy = r_m[m][1] - ty
        uz = r_m[m][2] - tz
        vx = ux * r00 + uy * r10 + uz * r20
        vy = ux * r01 + uy * r11 + uz * r21
        vz = ux * r02 + uy * r12 + uz * r22
        ex = vx - s_m[m][0]
        ey = vy - s_m[m][1]
        ez = vz - s_m[m][2]
        resid = resid + jnp.sqrt(ex * ex + ey * ey + ez * ez)
    resid = resid * third  # (B, P1)

    _, keep = jax.lax.top_k(-resid, n_proposal2)  # lowest residual
    take = lambda p: jnp.take_along_axis(p, keep, axis=1)  # (B, P2)
    rs = jnp.stack(
        [
            jnp.stack([take(r00), take(r01), take(r02)], axis=-1),
            jnp.stack([take(r10), take(r11), take(r12)], axis=-1),
            jnp.stack([take(r20), take(r21), take(r22)], axis=-1),
        ],
        axis=-2,
    )  # (B, P2, 3, 3)
    ts = jnp.stack([take(tx), take(ty), take(tz)], axis=-1)[:, :, None, :]  # (B, P2, 1, 3)

    # hypothesis selection: inlier-weighted mean distance to model points.
    # One fused XLA pass: the min folds into the distance computation, and
    # sqrt(min(d2)) == min(sqrt(d2)) needs only one sqrt over (B, P2, N1) —
    # profiled faster than the former lax.map chunking AND faster than a
    # per-hypothesis fused Pallas kernel (ops/hyp_select.py: all-in-VMEM
    # transform -> min -> weighted sum measured 57.8 vs 55.4 ms full-model —
    # 4800 serialized tiny-matmul pipelines lose to XLA's batched GEMMs
    # despite the ~740MB d2 materialization; kernel kept + oracle-tested as
    # the documented negative). Above a ~1.2GB budget the requested
    # ``selection_chunks`` splits the hypotheses so large batch /
    # n_proposal2 cannot OOM.
    def _sel_scores(rs_c, ts_c):
        tp = jnp.matmul(pts1[:, None] - ts_c, rs_c)  # (B, p, N1, 3)
        d2 = pairwise_sqdist(tp, model_pts[:, None])  # (B, p, N1, N2)
        d = jnp.sqrt(jnp.maximum(jnp.min(d2, axis=-1), 0.0))  # (B, p, N1)
        return jnp.sum(w1, axis=1)[:, None] / (jnp.sum(d * w1[:, None], axis=2) + 1e-8)

    import os as _os

    if (
        jax.default_backend() == "tpu"
        and _os.environ.get("UNOPOSE_HYPSEL_V2", "0") == "1"
    ):
        # batched fused selection tile kernel (ops/hyp_select2.py)
        from unopose_tpu.ops.hyp_select2 import hypothesis_select_scores_v2

        scores = hypothesis_select_scores_v2(pts1, model_pts, rs, ts[:, :, 0, :], w1)
    elif selection_chunks > 1 and B * n_proposal2 * N1 * N2 > 300_000_000:
        chunk = -(-n_proposal2 // selection_chunks)
        scores = jnp.concatenate(
            [_sel_scores(rs[:, i : i + chunk], ts[:, i : i + chunk]) for i in range(0, n_proposal2, chunk)],
            axis=1,
        )
    else:
        scores = _sel_scores(rs, ts)
    best = jnp.argmax(scores, axis=1)
    pose_score = jnp.take_along_axis(scores, best[:, None], axis=1)[:, 0]
    R = jnp.take_along_axis(rs, best[:, None, None, None], axis=1)[:, 0]
    t = jnp.take_along_axis(ts, best[:, None, None, None], axis=1)[:, 0, 0]
    return R, t, pose_score


def compute_fine_Rt_overlap(
    atten: jnp.ndarray,
    score: jnp.ndarray,
    pts1: jnp.ndarray,
    pts2: jnp.ndarray,
    model_pts: jnp.ndarray | None = None,
    dis_thres: float = 0.15,
    return_aux: bool = False,
):
    """Soft-correspondence weighted-SVD fine pose (reference model_utils.py:527-566).

    Builds row-normalized soft target points from the mutually-consistent
    assignment, solves one weighted Procrustes (weight threshold 0.001), and
    scores the pose by the fraction of foreground points within ``dis_thres``
    of the model cloud, damped by the foreground ratio.

    Returns R (B, 3, 3), t (B, 3), pose_score (B,). Like the coarse solver,
    the pose maps the pts2 frame into the pts1 frame (p1 ~= R p2 + t), so
    (pts1 - t) @ R aligns with pts2.
    """
    pts1 = pts1.astype(jnp.float32)
    pts2 = pts2.astype(jnp.float32)
    B, N1, _ = pts1.shape
    N2 = pts2.shape[1]
    if model_pts is None:
        model_pts = pts2

    A, w1, w2, label1, _ = _dual_softmax_assignment(atten, score, N1, N2)
    A = A[:, 1:, 1:] * w1[:, :, None] * w2[:, None, :]
    An = A / (jnp.sum(A, axis=2, keepdims=True) + 1e-6)
    pred_pts = jnp.matmul(An, pts2)  # (B, N1, 3) soft targets in pts2 frame
    weights = jnp.sum(A, axis=2)

    R, t = weighted_procrustes(pred_pts, pts1, weights, weight_thresh=0.001)

    proj = jnp.matmul(pts1 - t[:, None, :], R)  # back into pts2 frame
    # min-then-sqrt: one sqrt over (B, N1), not the full (B, N1, N2) matrix
    d = jnp.sqrt(jnp.maximum(pairwise_sqdist(proj, model_pts).min(axis=2), 0.0))  # (B, N1)
    mask = (label1 > 0).astype(jnp.float32)
    inlier = (d < dis_thres).astype(jnp.float32)
    pose_score = jnp.sum(inlier * mask, axis=1) / (jnp.sum(mask, axis=1) + 1e-8)
    pose_score = pose_score * jnp.mean(mask, axis=1)
    if return_aux:
        # max pre-threshold WSVD row weight: > 0.001 certifies the weighted
        # Procrustes ran nominally (not the identity fallback) — the
        # vacuousness gate for accuracy studies
        return R, t, pose_score, jnp.max(weights, axis=1)
    return R, t, pose_score
