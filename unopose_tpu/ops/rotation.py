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
