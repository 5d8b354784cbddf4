"""Pose/rotation conversion zoo (reference core/unopose/utils/pose_utils.py).

TPU-native counterparts of the reference's legacy GDR-Net conversion
library — the families its codebase actually exercises: quaternion algebra
(qmul/qrot, :38-91), euler<->quat<->mat in the reference's conventions
(:93-197, :266-296), axis-angle (:299-346), quat2mat (:349-412),
pose_vec2mat (:415-434), SE(3) inverse/mul/relative (:748-804), and the
closest-rotation-under-symmetry selectors (:472-560). Everything is
batched jnp with static shapes; the reference's per-sample python loop
over symmetry rotations becomes one masked argmin over a padded (B, K, 3,
3) symmetry tensor (TPU-friendly; ragged per-object symmetry lists pad
with identity + mask). The depth-warping helpers (:199-264, :437-470) are
PoseNet-lineage image ops unused by UNOPose and are intentionally out of
scope.
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp


def qmul(q: jnp.ndarray, r: jnp.ndarray) -> jnp.ndarray:
    """Hamilton product of quaternions (w, x, y, z), shapes (*, 4)."""
    w1, x1, y1, z1 = (q[..., i] for i in range(4))
    w2, x2, y2, z2 = (r[..., i] for i in range(4))
    return jnp.stack(
        [
            w1 * w2 - x1 * x2 - y1 * y2 - z1 * z2,
            w1 * x2 + x1 * w2 + y1 * z2 - z1 * y2,
            w1 * y2 - x1 * z2 + y1 * w2 + z1 * x2,
            w1 * z2 + x1 * y2 - y1 * x2 + z1 * w2,
        ],
        axis=-1,
    )


def qrot(q: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    """Rotate vectors v (*, 3) by unit quaternions q (*, 4) (reference
    qrot_torch :59-79: v + 2 * qw * (qv x v) + 2 * qv x (qv x v))."""
    qw = q[..., :1]
    qv = q[..., 1:]
    uv = jnp.cross(qv, v)
    uuv = jnp.cross(qv, uv)
    return v + 2.0 * (qw * uv + uuv)


def quat2mat(quat: jnp.ndarray, eps: float = 0.0) -> jnp.ndarray:
    """(*, 4) wxyz (not necessarily normalized) -> (*, 3, 3) (reference
    quat2mat_torch :349-412: normalize then standard formula)."""
    q = quat / jnp.clip(jnp.linalg.norm(quat, axis=-1, keepdims=True), eps + 1e-12, None)
    w, x, y, z = (q[..., i] for i in range(4))
    x2, y2, z2 = x * x, y * y, z * z
    wx, wy, wz = w * x, w * y, w * z
    xy, xz, yz = x * y, x * z, y * z
    m = jnp.stack(
        [
            1 - 2 * (y2 + z2), 2 * (xy - wz), 2 * (xz + wy),
            2 * (xy + wz), 1 - 2 * (x2 + z2), 2 * (yz - wx),
            2 * (xz - wy), 2 * (yz + wx), 1 - 2 * (x2 + y2),
        ],
        axis=-1,
    )
    return m.reshape(q.shape[:-1] + (3, 3))


def euler2mat(angle: jnp.ndarray) -> jnp.ndarray:
    """(B, 3) radians (x, y, z) -> (B, 3, 3) = Rx @ Ry @ Rz (reference
    euler2mat_torch :266-296)."""
    x, y, z = angle[..., 0], angle[..., 1], angle[..., 2]
    cz, sz = jnp.cos(z), jnp.sin(z)
    cy, sy = jnp.cos(y), jnp.sin(y)
    cx, sx = jnp.cos(x), jnp.sin(x)
    o = jnp.zeros_like(x)
    i = jnp.ones_like(x)
    zmat = jnp.stack([cz, -sz, o, sz, cz, o, o, o, i], -1).reshape(x.shape + (3, 3))
    ymat = jnp.stack([cy, o, sy, o, i, o, -sy, o, cy], -1).reshape(x.shape + (3, 3))
    xmat = jnp.stack([i, o, o, o, cx, -sx, o, sx, cx], -1).reshape(x.shape + (3, 3))
    return xmat @ ymat @ zmat


def euler2quat(ai: jnp.ndarray, aj: jnp.ndarray, ak: jnp.ndarray) -> jnp.ndarray:
    """sxyz euler angles -> (*, 4) wxyz quaternion (reference
    euler2quat_torch :93-144, axes='sxyz' path)."""
    ai, aj, ak = ai / 2.0, aj / 2.0, ak / 2.0
    ci, si = jnp.cos(ai), jnp.sin(ai)
    cj, sj = jnp.cos(aj), jnp.sin(aj)
    ck, sk = jnp.cos(ak), jnp.sin(ak)
    cc, cs = ci * ck, ci * sk
    sc, ss = si * ck, si * sk
    return jnp.stack(
        [cj * cc + sj * ss, cj * sc - sj * cs, cj * ss + sj * cc, cj * cs - sj * sc],
        axis=-1,
    )


def quat2euler(q: jnp.ndarray, epsilon: float = 0.0) -> jnp.ndarray:
    """(*, 4) wxyz -> (*, 3) zyx-order euler (reference quat2euler_torch
    :146-197, order='zyx': returns (x, y, z) stacked)."""
    q0, q1, q2, q3 = (q[..., i] for i in range(4))
    x = jnp.arctan2(2 * (q0 * q1 + q2 * q3), 1 - 2 * (q1 * q1 + q2 * q2))
    y = jnp.arcsin(jnp.clip(2 * (q0 * q2 - q1 * q3), -1 + epsilon, 1 - epsilon))
    z = jnp.arctan2(2 * (q0 * q3 + q1 * q2), 1 - 2 * (q2 * q2 + q3 * q3))
    return jnp.stack([x, y, z], axis=-1)


def pose_vec2mat(vec: jnp.ndarray, rotation_mode: str = "quat") -> jnp.ndarray:
    """(B, 6|7) [r, t] -> (B, 3, 4) transform (reference :415-434; the
    reference's layout is rotation FIRST: 'quat' = (qw,qx,qy,qz,tx,ty,tz),
    'euler' = (rx,ry,rz,tx,ty,tz))."""
    if rotation_mode == "quat":
        r = vec[..., :4]
        t = vec[..., 4:7, None]
        R = quat2mat(r)
    else:
        r = vec[..., :3]
        t = vec[..., 3:6, None]
        R = euler2mat(r)
    return jnp.concatenate([R, t], axis=-1)


def se3_inverse(RT: jnp.ndarray) -> jnp.ndarray:
    """(*, 3, 4) [R|t] -> inverse [R^T | -R^T t] (reference :748-756)."""
    R = RT[..., :3, :3]
    t = RT[..., :3, 3:]
    Rt = jnp.swapaxes(R, -1, -2)
    return jnp.concatenate([Rt, -Rt @ t], axis=-1)


def se3_mul(RT1: jnp.ndarray, RT2: jnp.ndarray) -> jnp.ndarray:
    """Compose (*, 3, 4) transforms: RT1 @ RT2 (reference :758-769)."""
    R1, t1 = RT1[..., :3, :3], RT1[..., :3, 3:]
    R2, t2 = RT2[..., :3, :3], RT2[..., :3, 3:]
    return jnp.concatenate([R1 @ R2, R1 @ t2 + t1], axis=-1)


def calc_se3(pose_src: jnp.ndarray, pose_tgt: jnp.ndarray) -> jnp.ndarray:
    """Relative transform tgt <- src: pose_tgt @ inv(pose_src) (reference
    calc_se3_torch :790-804)."""
    return se3_mul(pose_tgt, se3_inverse(pose_src))


def rotation_geodesic_deg(R1: jnp.ndarray, R2: jnp.ndarray) -> jnp.ndarray:
    """Geodesic angle between rotations in degrees (the reference's ``re``)."""
    tr = jnp.trace(jnp.swapaxes(R1, -1, -2) @ R2, axis1=-2, axis2=-1)
    c = jnp.clip((tr - 1.0) * 0.5, -1.0, 1.0)
    return jnp.degrees(jnp.arccos(c))


def get_closest_rot_batch(
    pred_rots: jnp.ndarray,  # (B, 3, 3) or (B, 4) wxyz
    gt_rots: jnp.ndarray,  # (B, 3, 3) or (B, 4)
    sym_rots: jnp.ndarray,  # (B, K, 3, 3) padded symmetry rotations (m2m)
    sym_mask: Optional[jnp.ndarray] = None,  # (B, K) bool validity
) -> jnp.ndarray:
    """Closest symmetric equivalent of gt under each object's symmetry set
    (reference get_closest_rot(_batch) :472-529). The reference loops
    python-side over a ragged list of per-object Kx3x3 arrays; here the
    set is padded to a static (B, K, 3, 3) with a mask (pad with identity
    — always a valid candidate since gt itself competes). Returns
    (B, 3, 3) closest gt rotations.
    """
    if pred_rots.shape[-1] == 4:
        pred_rots = quat2mat(pred_rots)
    if gt_rots.shape[-1] == 4:
        gt_rots = quat2mat(gt_rots)
    cands = gt_rots[:, None] @ sym_rots  # (B, K, 3, 3): R_gt @ R_sym
    errs = rotation_geodesic_deg(pred_rots[:, None], cands)  # (B, K)
    base = rotation_geodesic_deg(pred_rots, gt_rots)[:, None]
    if sym_mask is not None:
        errs = jnp.where(sym_mask, errs, jnp.inf)
    # strict improvement over the unsymmetrized gt, like the reference loop
    best = jnp.argmin(jnp.where(errs < base, errs, base + 1.0), axis=1)
    improved = jnp.take_along_axis(errs, best[:, None], axis=1)[:, 0] < base[:, 0]
    chosen = jnp.take_along_axis(cands, best[:, None, None, None], axis=1)[:, 0]
    return jnp.where(improved[:, None, None], chosen, gt_rots)


def rt_transform_batch(quat_delta: jnp.ndarray, t_delta: jnp.ndarray, poses_src: jnp.ndarray) -> jnp.ndarray:
    """Apply a (quat, translation) update to (B, 3, 4) source poses in
    camera coords: R = R_delta @ R_src, t = t_delta (the reference
    RT_transform_batch_cpu :670-685 ASSIGNS the predicted translation —
    ``poses_tgt[i, 6:] = translation[i]`` — rather than adding it to the
    source; rotation composes per R_transform_th CAMERA :586-602)."""
    R = quat2mat(quat_delta) @ poses_src[..., :3, :3]
    t = jnp.broadcast_to(t_delta, poses_src[..., :3, 3].shape)
    return jnp.concatenate([R, t[..., None]], axis=-1)
