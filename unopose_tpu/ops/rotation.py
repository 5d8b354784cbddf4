"""Rotation parameterizations and conversions (jittable, batched).

Covers the subset of the reference's pose_utils.py conversion zoo that the
framework actually needs (euler/axis-angle/quaternion <-> matrix, random
rotations), plus the exact euler-composition used by the train-time pose
noise (reference: core/unopose/utils/model_utils.py:285-333) and the random
SO(3) augmentation of the training dataset
(reference: core/unopose/utils/data_utils.py:288-296).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def rot_z(a: jnp.ndarray) -> jnp.ndarray:
    """(...,) radians -> (..., 3, 3) rotation about z."""
    c, s = jnp.cos(a), jnp.sin(a)
    o, i = jnp.zeros_like(a), jnp.ones_like(a)
    return jnp.stack(
        [
            jnp.stack([c, -s, o], axis=-1),
            jnp.stack([s, c, o], axis=-1),
            jnp.stack([o, o, i], axis=-1),
        ],
        axis=-2,
    )


def rot_x(a: jnp.ndarray) -> jnp.ndarray:
    c, s = jnp.cos(a), jnp.sin(a)
    o, i = jnp.zeros_like(a), jnp.ones_like(a)
    return jnp.stack(
        [
            jnp.stack([i, o, o], axis=-1),
            jnp.stack([o, c, -s], axis=-1),
            jnp.stack([o, s, c], axis=-1),
        ],
        axis=-2,
    )


def rot_y(a: jnp.ndarray) -> jnp.ndarray:
    c, s = jnp.cos(a), jnp.sin(a)
    o, i = jnp.zeros_like(a), jnp.ones_like(a)
    return jnp.stack(
        [
            jnp.stack([c, o, s], axis=-1),
            jnp.stack([o, i, o], axis=-1),
            jnp.stack([-s, o, c], axis=-1),
        ],
        axis=-2,
    )


def mat_to_quat(R: jnp.ndarray) -> jnp.ndarray:
    """Rotation matrix (..., 3, 3) -> unit quaternion (w, x, y, z) with w >= 0.

    Branchless Shepperd-style formulation (numerically safe for all traces).
    """
    R = R.astype(jnp.float32)
    m00, m01, m02 = R[..., 0, 0], R[..., 0, 1], R[..., 0, 2]
    m10, m11, m12 = R[..., 1, 0], R[..., 1, 1], R[..., 1, 2]
    m20, m21, m22 = R[..., 2, 0], R[..., 2, 1], R[..., 2, 2]
    # four squared-magnitude candidates
    qw2 = jnp.maximum(0.0, 1 + m00 + m11 + m22) / 4
    qx2 = jnp.maximum(0.0, 1 + m00 - m11 - m22) / 4
    qy2 = jnp.maximum(0.0, 1 - m00 + m11 - m22) / 4
    qz2 = jnp.maximum(0.0, 1 - m00 - m11 + m22) / 4
    qw = jnp.sqrt(qw2)
    safe = jnp.maximum(4 * qw, 1e-8)
    qx = jnp.where(qw > 1e-4, (m21 - m12) / safe, jnp.sqrt(qx2))
    qy = jnp.where(qw > 1e-4, (m02 - m20) / safe, jnp.sqrt(qy2) * jnp.sign(m01 + 1e-30))
    qz = jnp.where(qw > 1e-4, (m10 - m01) / safe, jnp.sqrt(qz2) * jnp.sign(m02 + 1e-30))
    q = jnp.stack([qw, qx, qy, qz], axis=-1)
    return q / (jnp.linalg.norm(q, axis=-1, keepdims=True) + 1e-12)


def axangle_to_mat(axis: jnp.ndarray, angle: jnp.ndarray) -> jnp.ndarray:
    """Rodrigues: axis (..., 3) (normalized internally), angle (...,) rad."""
    ax = axis / (jnp.linalg.norm(axis, axis=-1, keepdims=True) + 1e-12)
    x, y, z = ax[..., 0], ax[..., 1], ax[..., 2]
    zero = jnp.zeros_like(x)
    K = jnp.stack(
        [
            jnp.stack([zero, -z, y], -1),
            jnp.stack([z, zero, -x], -1),
            jnp.stack([-y, x, zero], -1),
        ],
        -2,
    )
    c, s = jnp.cos(angle)[..., None, None], jnp.sin(angle)[..., None, None]
    return jnp.eye(3) + s * K + (1 - c) * jnp.matmul(K, K)


def mat_to_axangle(R: jnp.ndarray):
    """Rotation matrix -> (axis (..., 3), angle (...,))."""
    q = mat_to_quat(R)
    w = jnp.clip(q[..., 0], -1.0, 1.0)
    angle = 2.0 * jnp.arccos(w)
    s = jnp.sqrt(jnp.maximum(1.0 - w * w, 1e-12))
    axis = q[..., 1:] / s[..., None]
    axis = jnp.where(angle[..., None] < 1e-6, jnp.array([1.0, 0.0, 0.0]), axis)
    return axis, angle


def rotation_angle_deg(R1: jnp.ndarray, R2: jnp.ndarray) -> jnp.ndarray:
    """Geodesic angle between two rotations in degrees (pose metrics)."""
    cos = (jnp.einsum("...ij,...ij->...", R1, R2) - 1.0) / 2.0
    return jnp.degrees(jnp.arccos(jnp.clip(cos, -1.0, 1.0)))


def random_so3(key: jax.Array, shape=()) -> jnp.ndarray:
    """Uniform-ish random rotations via Rx(a0) @ Ry(a1) @ Rz(a2), a ~ U[0, 2pi).

    Matches the distribution family of the reference's get_random_rotation
    (data_utils.py:288-296); used for the template-cloud SO(3) train aug.
    """
    a = jax.random.uniform(key, shape + (3,), minval=0.0, maxval=2 * jnp.pi)
    return rot_x(a[..., 0]) @ rot_y(a[..., 1]) @ rot_z(a[..., 2])


def aug_pose_noise(
    key: jax.Array,
    gt_r: jnp.ndarray,
    gt_t: jnp.ndarray,
    std_rots=(15.0, 10.0, 5.0, 1.25, 1.0),
    max_rot: float = 45.0,
    std_trans=(0.2, 0.2, 0.2),
    max_trans: float = 0.8,
):
    """Train-time initial-pose perturbation (reference model_utils.py:285-333).

    One rotation-noise std is drawn per batch from ``std_rots``; per-sample
    euler noise is clamped to +-max_rot degrees and composed as
    Rz(a0) @ Rx(a1) @ Ry(a2) on the right of gt_r. Translation noise is
    gaussian, clamped to +-max_trans, with z clamped positive.
    """
    B = gt_r.shape[0]
    k_std, k_ang, k_tr = jax.random.split(key, 3)
    std = jnp.asarray(std_rots, jnp.float32)[jax.random.randint(k_std, (), 0, len(std_rots))]
    angles = jnp.clip(jax.random.normal(k_ang, (B, 3)) * std, -max_rot, max_rot) * (jnp.pi / 180.0)
    rand_rot = rot_z(angles[:, 0]) @ rot_x(angles[:, 1]) @ rot_y(angles[:, 2])
    trans = jax.random.normal(k_tr, (B, 3)) * jnp.asarray(std_trans, jnp.float32)
    trans = jnp.clip(trans, -max_trans, max_trans)
    out_r = gt_r @ rand_rot
    out_t = gt_t + trans
    out_t = out_t.at[:, 2].set(jnp.maximum(out_t[:, 2], 1e-6))
    return jax.lax.stop_gradient(out_r), jax.lax.stop_gradient(out_t)
