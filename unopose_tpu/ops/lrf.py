"""Local/global reference frame (LRF) canonicalization.

TPU-native reimplementation of the reference's FLARE-style LRF:
  * global per-cloud frame (reference: core/unopose/utils/model_utils.py:766-823,
    used by UNOPose.get_batch_lrf, oneref_grf_predator_pose_estimation_model.py:78-93)
  * per-neighborhood batched frame (reference:
    core/unopose/model/pointnet2/pointnet2_utils.py:429-481, used by the fine
    stage's QueryAndLRFGroup positional encoding).

The z axis is the smallest eigenvector of the neighborhood covariance with a
robust sign vote; the x axis is a border-weighted projection of the
point-to-center vectors onto the plane orthogonal to z; y = z cross x. Points
are output in LRF coordinates scaled by 1/r_lrf. Instead of torch.svd we use
the closed-form symmetric 3x3 eigensolver (ops/eig3.py) — pure VPU math.
"""

from __future__ import annotations

import jax.numpy as jnp

from unopose_tpu.ops.eig3 import smallest_eigvec_sym3
from unopose_tpu.ops.geometry import normalize_vec


def _lrf_axes(rel: jnp.ndarray, r_lrf: jnp.ndarray, eps: float = 1e-10):
    """Shared LRF math.

    Args:
        rel: (..., M, 3) neighbor points relative to the frame center
             (p_i - center).
        r_lrf: (...,) frame radius.
    Returns:
        lrf: (..., 3, 3) with rows = (x, y, z) axes; coordinates of a point d
             in the frame are lrf @ d.
    """
    rel = rel.astype(jnp.float32)
    M = rel.shape[-2]
    # covariance of (center - p) == covariance of (p - center)
    cov = jnp.einsum("...mi,...mj->...ij", rel, rel) / M
    z = smallest_eigvec_sym3(cov)  # (..., 3)

    # sign vote: count points whose projection on z is significantly positive
    # vs negative, measured on (center - p) = -rel (reference convention).
    center_proj = -jnp.einsum("...i,...mi->...m", z, rel)  # (..., M)
    vote = jnp.sum((center_proj > 1e-3).astype(jnp.int32), axis=-1) - jnp.sum(
        (center_proj < -1e-3).astype(jnp.int32), axis=-1
    )
    sign = jnp.where(vote < 0, -1.0, 1.0)
    z = z * sign[..., None]

    # x axis: border-weighted sum of in-plane components of rel
    norm = jnp.einsum("...i,...mi->...m", z, rel)  # (..., M) projection lengths
    vi = rel - norm[..., None] * z[..., None, :]  # in-plane component
    x_l2 = jnp.linalg.norm(rel, axis=-1)  # (..., M)
    alpha = (r_lrf[..., None] - x_l2) ** 2
    beta = norm * norm
    vi_c = jnp.sum((alpha * beta)[..., None] * vi, axis=-2)  # (..., 3)
    x = vi_c / (jnp.linalg.norm(vi_c, axis=-1, keepdims=True) + eps)

    y = jnp.cross(x, z)
    return jnp.stack([x, y, z], axis=-2)  # rows are axes -> lrf @ d projects


def global_lrf(pts: jnp.ndarray, r_lrf: jnp.ndarray | None = None) -> jnp.ndarray:
    """Canonicalize each cloud into its global LRF.

    Mirrors UNOPose.get_batch_lrf (reference
    oneref_grf_predator_pose_estimation_model.py:78-93): centroid center,
    radius = max distance to centroid (or 1.0 when r_lrf is given).

    Args:
        pts: (B, N, 3)
        r_lrf: optional (B,) radius override.
    Returns:
        (B, N, 3) LRF coordinates, scaled by 1/r_lrf.
    """
    pts = pts.astype(jnp.float32)
    centroid = jnp.mean(pts, axis=-2, keepdims=True)  # (B, 1, 3)
    rel = pts - centroid
    if r_lrf is None:
        r_lrf = jnp.max(jnp.linalg.norm(rel, axis=-1), axis=-1)  # (B,)
    lrf = _lrf_axes(rel, r_lrf)  # (B, 3, 3)
    return jnp.einsum("...ij,...mj->...mi", lrf, rel) / r_lrf[..., None, None]


def batch_lrf_planar(center, grouped, r_lrf: float, mask=None):
    """Channel-planar per-neighborhood LRF: same math as ``batch_lrf`` but
    with xyz given as separate arrays so every tensor keeps (points, samples)
    in the TPU-tiled minor dims (a trailing xyz axis of width 3 wastes ~98%
    of each (8, 128) register tile).

    Args:
        center: (cx, cy, cz), each (B, P).
        grouped: (gx, gy, gz), each (B, P, M) absolute neighbor coords.
        r_lrf: scalar radius.
        mask: optional (B, P, M) bool — restrict the neighborhood to the
            masked subset (all moments/votes/sums masked; must have >= 1
            True per row). Lets a smaller-radius scale reuse a larger
            scale's gathered group without a second gather.
    Returns:
        (o0, o1, o2): LRF coordinates of each neighbor, each (B, P, M),
        scaled by 1/r_lrf.
    """
    from unopose_tpu.ops.eig3 import smallest_eigvec_sym3_planar

    cx, cy, cz = (c.astype(jnp.float32)[..., None] for c in center)
    gx, gy, gz = (g.astype(jnp.float32) for g in grouped)
    rx, ry, rz = gx - cx, gy - cy, gz - cz  # rel = p_i - center, (B, P, M)

    if mask is None:
        mean = lambda t: jnp.mean(t, axis=-1)
        msum = lambda t: jnp.sum(t, axis=-1)
        m = None
    else:
        m = mask.astype(jnp.float32)
        cnt = jnp.maximum(jnp.sum(m, axis=-1), 1.0)
        mean = lambda t: jnp.sum(t * m, axis=-1) / cnt
        msum = lambda t: jnp.sum(t * m, axis=-1)

    # covariance (6 unique entries), mean over (masked) neighbors
    a = mean(rx * rx)
    b = mean(rx * ry)
    c = mean(rx * rz)
    d = mean(ry * ry)
    e = mean(ry * rz)
    f = mean(rz * rz)
    z0, z1, z2 = smallest_eigvec_sym3_planar(a, b, c, d, e, f)  # (B, P)

    # sign vote on (center - p) = -rel
    cp = -(z0[..., None] * rx + z1[..., None] * ry + z2[..., None] * rz)
    pos = (cp > 1e-3).astype(jnp.float32)
    neg = (cp < -1e-3).astype(jnp.float32)
    vote = msum(pos) - msum(neg)
    sgn = jnp.where(vote < 0, -1.0, 1.0)
    z0, z1, z2 = z0 * sgn, z1 * sgn, z2 * sgn

    norm = z0[..., None] * rx + z1[..., None] * ry + z2[..., None] * rz  # z . rel
    vix = rx - norm * z0[..., None]
    viy = ry - norm * z1[..., None]
    viz = rz - norm * z2[..., None]
    x_l2 = jnp.sqrt(rx * rx + ry * ry + rz * rz)
    w = (r_lrf - x_l2) ** 2 * (norm * norm)
    vx = msum(w * vix)
    vy = msum(w * viy)
    vz = msum(w * viz)
    vn = jnp.sqrt(vx * vx + vy * vy + vz * vz) + 1e-10
    x0, x1, x2 = vx / vn, vy / vn, vz / vn

    # y = x cross z
    y0 = x1 * z2 - x2 * z1
    y1 = x2 * z0 - x0 * z2
    y2 = x0 * z1 - x1 * z0

    inv_r = 1.0 / r_lrf
    o0 = (x0[..., None] * rx + x1[..., None] * ry + x2[..., None] * rz) * inv_r
    o1 = (y0[..., None] * rx + y1[..., None] * ry + y2[..., None] * rz) * inv_r
    o2 = (z0[..., None] * rx + z1[..., None] * ry + z2[..., None] * rz) * inv_r
    return o0, o1, o2


def batch_lrf(centers: jnp.ndarray, grouped_pts: jnp.ndarray, r_lrf: float) -> jnp.ndarray:
    """Per-neighborhood LRF coordinates.

    Mirrors LRF_batch (reference pointnet2_utils.py:429-481).

    Args:
        centers: (B, P, 3) group centers.
        grouped_pts: (B, P, M, 3) absolute neighbor coordinates.
        r_lrf: scalar group radius.
    Returns:
        (B, P, M, 3) neighbor coordinates in each group's LRF, scaled by 1/r_lrf.
    """
    rel = grouped_pts.astype(jnp.float32) - centers.astype(jnp.float32)[..., None, :]
    r = jnp.full(rel.shape[:-2], r_lrf, dtype=jnp.float32)
    lrf = _lrf_axes(rel, r)  # (B, P, 3, 3)
    return jnp.einsum("...ij,...mj->...mi", lrf, rel) / r_lrf
