"""End-to-end tests of the coarse/fine pose solvers on synthetic
correspondences with known ground-truth poses."""

import numpy as np
import jax
import jax.numpy as jnp

from unopose_tpu.ops.procrustes import quat_to_rotmat
from unopose_tpu.ops.solver import compute_coarse_Rt_overlap, compute_fine_Rt_overlap


def make_pair(rng, B=2, N=60, noise=0.0):
    """pts2 (source) and pts1 = R pts2 + t (target), plus oracle attention."""
    q = rng.normal(size=(B, 4))
    q /= np.linalg.norm(q, axis=-1, keepdims=True)
    R = np.asarray(quat_to_rotmat(jnp.asarray(q)))
    t = rng.normal(size=(B, 3)).astype(np.float32) * 0.5
    pts2 = rng.uniform(-1, 1, size=(B, N, 3)).astype(np.float32)
    pts1 = np.einsum("bij,bnj->bni", R, pts2) + t[:, None] + noise * rng.normal(size=(B, N, 3))
    # oracle logits: bg row/col low, diagonal high
    atten = np.full((B, N + 1, N + 1), -5.0, np.float32)
    atten[:, 1:, 1:] += 10.0 * np.eye(N)
    score = np.ones((B, 2 * N), np.float32)
    return R, t, pts1.astype(np.float32), pts2, atten, score


def pose_errors(R, t, R_gt, t_gt):
    cos = (np.einsum("bij,bij->b", R, R_gt) - 1.0) / 2.0
    ang = np.degrees(np.arccos(np.clip(cos, -1, 1)))
    return ang, np.linalg.norm(t - t_gt, axis=-1)


def test_fine_solver_recovers_pose(rng):
    R_gt, t_gt, pts1, pts2, atten, score = make_pair(rng)
    R, t, s = compute_fine_Rt_overlap(jnp.asarray(atten), jnp.asarray(score), jnp.asarray(pts1), jnp.asarray(pts2))
    ang, terr = pose_errors(np.asarray(R), np.asarray(t), R_gt, t_gt)
    assert ang.max() < 0.5 and terr.max() < 0.01
    assert (np.asarray(s) > 0.9).all()  # all fg, all inliers


def test_fine_solver_score_penalizes_outliers(rng):
    R_gt, t_gt, pts1, pts2, atten, score = make_pair(rng, B=1, N=60)
    # corrupt half the target points so they're far from the model
    pts1_bad = pts1.copy()
    pts1_bad[:, ::2] += 5.0
    _, _, s_good = compute_fine_Rt_overlap(jnp.asarray(atten), jnp.asarray(score), jnp.asarray(pts1), jnp.asarray(pts2))
    _, _, s_bad = compute_fine_Rt_overlap(
        jnp.asarray(atten), jnp.asarray(score), jnp.asarray(pts1_bad), jnp.asarray(pts2)
    )
    assert float(s_bad[0]) < float(s_good[0])


def test_coarse_solver_recovers_pose(rng):
    R_gt, t_gt, pts1, pts2, atten, score = make_pair(rng, B=2, N=50)
    R, t, s = compute_coarse_Rt_overlap(
        jax.random.PRNGKey(0),
        jnp.asarray(atten),
        jnp.asarray(score),
        jnp.asarray(pts1),
        jnp.asarray(pts2),
        n_proposal1=500,
        n_proposal2=50,
        selection_chunks=5,
    )
    ang, terr = pose_errors(np.asarray(R), np.asarray(t), R_gt, t_gt)
    assert ang.max() < 1.0 and terr.max() < 0.02
    assert np.isfinite(np.asarray(s)).all()


def test_coarse_solver_robust_to_outlier_rows(rng):
    """Rows marked background (bg argmax) must be excluded from hypotheses."""
    R_gt, t_gt, pts1, pts2, atten, score = make_pair(rng, B=1, N=50)
    # make 10 target points outliers and point their attention at bg
    pts1 = pts1.copy()
    pts1[:, :10] += 3.0
    atten[:, 1:11, :] = -5.0
    atten[:, 1:11, 0] = 10.0  # bg column wins for those rows
    R, t, _ = compute_coarse_Rt_overlap(
        jax.random.PRNGKey(1),
        jnp.asarray(atten),
        jnp.asarray(score),
        jnp.asarray(pts1),
        jnp.asarray(pts2),
        n_proposal1=500,
        n_proposal2=50,
        selection_chunks=5,
    )
    ang, terr = pose_errors(np.asarray(R), np.asarray(t), R_gt, t_gt)
    assert ang.max() < 2.0 and terr.max() < 0.05


def test_solvers_jit_compile(rng):
    R_gt, t_gt, pts1, pts2, atten, score = make_pair(rng, B=1, N=40)
    f = jax.jit(
        lambda k, a, s, p1, p2: compute_coarse_Rt_overlap(
            k, a, s, p1, p2, n_proposal1=100, n_proposal2=20, selection_chunks=4
        )
    )
    R, t, s = f(jax.random.PRNGKey(0), jnp.asarray(atten), jnp.asarray(score), jnp.asarray(pts1), jnp.asarray(pts2))
    assert R.shape == (1, 3, 3)
    g = jax.jit(compute_fine_Rt_overlap)
    R2, t2, s2 = g(jnp.asarray(atten), jnp.asarray(score), jnp.asarray(pts1), jnp.asarray(pts2))
    assert R2.shape == (1, 3, 3)


def test_searchsorted_cdf_matches_numpy():
    """Two-level binned CDF search == np.searchsorted('left') on sorted rows,
    including duplicate values, queries beyond the last edge, and a row
    length that does not divide the segment size."""
    import numpy as np
    import jax.numpy as jnp

    from unopose_tpu.ops.solver import searchsorted_cdf

    rng = np.random.default_rng(0)
    for N in (38416, 1000, 97):
        w = rng.random((3, N)).astype(np.float32)
        w[:, rng.integers(0, N, 50)] = 0.0  # duplicates in the cumsum
        cum = np.cumsum(w, axis=1)
        cum = cum / cum[:, -1:]
        r = rng.random((3, 777)).astype(np.float32)
        r[0, :5] = [0.0, 1.0 - 1e-7, 0.5, cum[0, 0], cum[0, 1]]
        got = np.asarray(searchsorted_cdf(jnp.asarray(cum), jnp.asarray(r)))
        want = np.stack([np.searchsorted(cum[b], r[b], side="left") for b in range(3)])
        np.testing.assert_array_equal(got, want)


def test_hypothesis_select_kernel_matches_xla(rng):
    """The fused hypothesis-selection kernel (ops/hyp_select.py, interpret
    mode) matches the XLA selection pass of compute_coarse_Rt_overlap on
    scores (bf16-grade tolerance; TP is bf16 in BOTH paths) and picks the
    same argmax hypothesis."""
    from unopose_tpu.ops.geometry import pairwise_sqdist
    from unopose_tpu.ops.hyp_select import hypothesis_select_scores
    from unopose_tpu.ops.pose_utils import quat2mat

    B, N1, N2, P2 = 2, 196, 196, 300
    pts1 = jnp.asarray(rng.uniform(-0.5, 0.5, (B, N1, 3)).astype(np.float32))
    model = jnp.asarray(rng.uniform(-0.5, 0.5, (B, N2, 3)).astype(np.float32))
    q = rng.standard_normal((B, P2, 4))
    q = q / np.linalg.norm(q, axis=-1, keepdims=True)
    rs = quat2mat(jnp.asarray(q.astype(np.float32)))
    ts = jnp.asarray(rng.uniform(-0.2, 0.2, (B, P2, 3)).astype(np.float32))
    w1 = jnp.asarray((rng.random((B, N1)) < 0.7).astype(np.float32))

    tp = jnp.matmul(pts1[:, None] - ts[:, :, None, :], rs)
    d2 = pairwise_sqdist(tp, model[:, None])
    d = jnp.sqrt(jnp.maximum(jnp.min(d2, -1), 0.0))
    want = np.asarray(jnp.sum(w1, 1)[:, None] / (jnp.sum(d * w1[:, None], 2) + 1e-8))
    got = np.asarray(hypothesis_select_scores(pts1, model, rs, ts, w1, interpret=True))
    rel = np.abs(want - got) / (np.abs(want) + 1e-9)
    assert np.median(rel) < 3e-3, np.median(rel)
    assert rel.max() < 2e-2, rel.max()
    assert (want.argmax(1) == got.argmax(1)).all()


def test_hypothesis_select_v2_matches_xla(rng):
    """The batched tile variant (ops/hyp_select2.py, interpret mode) matches
    the XLA selection pass to x3-cross-term tolerance (max rel ~3e-5)."""
    from unopose_tpu.ops.geometry import pairwise_sqdist
    from unopose_tpu.ops.hyp_select2 import hypothesis_select_scores_v2
    from unopose_tpu.ops.pose_utils import quat2mat

    B, N1, N2, P2 = 2, 196, 196, 300
    pts1 = jnp.asarray(rng.uniform(-0.5, 0.5, (B, N1, 3)).astype(np.float32))
    model = jnp.asarray(rng.uniform(-0.5, 0.5, (B, N2, 3)).astype(np.float32))
    q = rng.standard_normal((B, P2, 4))
    q = q / np.linalg.norm(q, axis=-1, keepdims=True)
    rs = quat2mat(jnp.asarray(q.astype(np.float32)))
    ts = jnp.asarray(rng.uniform(-0.2, 0.2, (B, P2, 3)).astype(np.float32))
    w1 = jnp.asarray((rng.random((B, N1)) < 0.7).astype(np.float32))

    tp = jnp.matmul(pts1[:, None] - ts[:, :, None, :], rs)
    d2 = pairwise_sqdist(tp, model[:, None])
    d = jnp.sqrt(jnp.maximum(jnp.min(d2, -1), 0.0))
    want = np.asarray(jnp.sum(w1, 1)[:, None] / (jnp.sum(d * w1[:, None], 2) + 1e-8))
    got = np.asarray(hypothesis_select_scores_v2(pts1, model, rs, ts, w1, interpret=True))
    rel = np.abs(want - got) / (np.abs(want) + 1e-9)
    assert rel.max() < 1e-3, rel.max()
    assert (want.argmax(1) == got.argmax(1)).all()
