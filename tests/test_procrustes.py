"""Property tests for the quaternion Kabsch / weighted Procrustes solver
against numpy-SVD oracles (the formulas used by the reference,
core/unopose/utils/model_utils.py:667-743, re-derived here in numpy)."""

import numpy as np
import jax.numpy as jnp

from unopose_tpu.ops.procrustes import kabsch_rotation, quat_to_rotmat, weighted_procrustes


def svd_kabsch_oracle(H):
    """R = V diag(1,1,det(V U^T)) U^T maximizing tr(R H)."""
    U, _, Vt = np.linalg.svd(H)
    V = Vt.T
    d = np.sign(np.linalg.det(V @ U.T))
    return V @ np.diag([1.0, 1.0, d]) @ U.T


def wp_oracle(src, ref, weights=None, weight_thresh=0.0, eps=1e-5):
    if weights is None:
        weights = np.ones(src.shape[:-1])
    weights = np.where(weights < weight_thresh, 0.0, weights)
    weights = weights / (weights.sum(-1, keepdims=True) + eps)
    w = weights[..., None]
    sc = (src * w).sum(-2, keepdims=True)
    rc = (ref * w).sum(-2, keepdims=True)
    H = np.einsum("...ni,...nj->...ij", src - sc, w * (ref - rc))
    Rs = np.stack([svd_kabsch_oracle(h) for h in H.reshape(-1, 3, 3)]).reshape(H.shape)
    t = rc[..., 0, :] - np.einsum("...ij,...j->...i", Rs, sc[..., 0, :])
    return Rs, t


def random_rotations(rng, n):
    q = rng.normal(size=(n, 4))
    q /= np.linalg.norm(q, axis=-1, keepdims=True)
    return np.asarray(quat_to_rotmat(jnp.asarray(q)))


def test_quat_to_rotmat_orthonormal(rng):
    R = random_rotations(rng, 64)
    assert np.allclose(R @ R.transpose(0, 2, 1), np.eye(3), atol=1e-5)
    assert np.allclose(np.linalg.det(R), 1.0, atol=1e-5)


def test_kabsch_matches_svd_oracle(rng):
    H = rng.normal(size=(256, 3, 3)).astype(np.float32)
    R = np.asarray(kabsch_rotation(jnp.asarray(H)))
    R_ref = np.stack([svd_kabsch_oracle(h) for h in H])
    assert np.abs(R - R_ref).max() < 2e-3


def test_kabsch_180_degree_rotations(rng):
    """H built from point sets related by 180-degree rotations (w=0 quaternions) —
    the case where naive power iteration from (1,0,0,0) can fail."""
    for axis in np.eye(3):
        c = -np.eye(3) + 2 * np.outer(axis, axis)  # 180 deg about axis
        src = rng.normal(size=(50, 3))
        ref = src @ c.T
        H = src.T @ ref
        R = np.asarray(kabsch_rotation(jnp.asarray(H[None])))[0]
        assert np.abs(R - c).max() < 1e-3, (axis, R, c)


def test_kabsch_exact_recovery(rng):
    """Noise-free correspondences recover the exact rotation."""
    R_true = random_rotations(rng, 32)
    src = rng.normal(size=(32, 100, 3)).astype(np.float32)
    ref = np.einsum("bij,bnj->bni", R_true, src)
    H = np.einsum("bni,bnj->bij", src, ref)
    R = np.asarray(kabsch_rotation(jnp.asarray(H)))
    assert np.abs(R - R_true).max() < 2e-3


def test_kabsch_rank_deficient_triplets(rng):
    """3-point correspondences (rank<=2 centered H) — the coarse-solver regime."""
    R_true = random_rotations(rng, 128)
    t_true = rng.normal(size=(128, 3)).astype(np.float32)
    src = rng.normal(size=(128, 3, 3)).astype(np.float32)
    ref = np.einsum("bij,bnj->bni", R_true, src) + t_true[:, None]
    R, t = weighted_procrustes(jnp.asarray(src), jnp.asarray(ref))
    err = np.einsum("bij,bnj->bni", np.asarray(R), src) + np.asarray(t)[:, None] - ref
    assert np.abs(err).max() < 1e-2


def test_weighted_procrustes_matches_oracle(rng):
    src = rng.normal(size=(16, 50, 3)).astype(np.float32)
    R_true = random_rotations(rng, 16)
    t_true = rng.normal(size=(16, 3)).astype(np.float32)
    ref = np.einsum("bij,bnj->bni", R_true, src) + t_true[:, None] + 0.01 * rng.normal(size=(16, 50, 3))
    w = rng.uniform(size=(16, 50)).astype(np.float32)
    R, t = weighted_procrustes(jnp.asarray(src), jnp.asarray(ref), jnp.asarray(w), weight_thresh=0.3)
    R_o, t_o = wp_oracle(src, ref, w, weight_thresh=0.3)
    assert np.abs(np.asarray(R) - R_o).max() < 5e-3
    assert np.abs(np.asarray(t) - t_o).max() < 5e-3


def test_weighted_procrustes_zero_weights_is_identityish():
    """All-zero weights (degenerate) must not produce NaNs."""
    src = jnp.ones((2, 10, 3))
    ref = jnp.ones((2, 10, 3))
    R, t = weighted_procrustes(src, ref, jnp.zeros((2, 10)))
    assert np.isfinite(np.asarray(R)).all() and np.isfinite(np.asarray(t)).all()
