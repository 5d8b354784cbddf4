"""Tests for the pose/rotation conversion zoo (unopose_tpu/ops/pose_utils.py)
— round-trips, algebraic identities, and brute-force oracles following the
reference conventions (core/unopose/utils/pose_utils.py)."""

import numpy as np
import jax.numpy as jnp

from unopose_tpu.ops.pose_utils import (
    calc_se3,
    euler2mat,
    euler2quat,
    get_closest_rot_batch,
    pose_vec2mat,
    qmul,
    qrot,
    quat2euler,
    quat2mat,
    rotation_geodesic_deg,
    rt_transform_batch,
    se3_inverse,
    se3_mul,
)


def _rand_quat(rng, n):
    q = rng.standard_normal((n, 4)).astype(np.float32)
    return q / np.linalg.norm(q, axis=-1, keepdims=True)


def test_quat_mat_roundtrip(rng):
    from unopose_tpu.ops.rotation import mat_to_quat

    q = _rand_quat(rng, 32)
    R = np.asarray(quat2mat(jnp.asarray(q)))
    # valid rotations: R R^T = I, det 1
    np.testing.assert_allclose(R @ np.swapaxes(R, -1, -2), np.broadcast_to(np.eye(3), R.shape), atol=1e-5)
    np.testing.assert_allclose(np.linalg.det(R), 1.0, atol=1e-5)
    q2 = np.asarray(mat_to_quat(jnp.asarray(R)))
    sign = np.sign(np.sum(q2 * q, axis=-1, keepdims=True))
    np.testing.assert_allclose(q2 * sign, q, atol=5e-5)


def test_qmul_qrot_match_matrices(rng):
    q1 = _rand_quat(rng, 16)
    q2 = _rand_quat(rng, 16)
    v = rng.standard_normal((16, 3)).astype(np.float32)
    Rm = np.asarray(quat2mat(jnp.asarray(q1))) @ np.asarray(quat2mat(jnp.asarray(q2)))
    Rq = np.asarray(quat2mat(qmul(jnp.asarray(q1), jnp.asarray(q2))))
    np.testing.assert_allclose(Rq, Rm, atol=1e-5)
    rv = np.asarray(qrot(jnp.asarray(q1), jnp.asarray(v)))
    np.testing.assert_allclose(rv, (np.asarray(quat2mat(jnp.asarray(q1))) @ v[..., None])[..., 0], atol=1e-5)


def test_euler_quat_roundtrip(rng):
    # stay within the zyx extraction's principal ranges
    ai = rng.uniform(-1.2, 1.2, 16).astype(np.float32)
    aj = rng.uniform(-0.8, 0.8, 16).astype(np.float32)
    ak = rng.uniform(-1.2, 1.2, 16).astype(np.float32)
    q = euler2quat(jnp.asarray(ai), jnp.asarray(aj), jnp.asarray(ak))
    e = np.asarray(quat2euler(q))  # zyx order == sxyz (reference docstring)
    np.testing.assert_allclose(e[:, 0], ai, atol=1e-4)
    np.testing.assert_allclose(e[:, 1], aj, atol=1e-4)
    np.testing.assert_allclose(e[:, 2], ak, atol=1e-4)


def test_euler2mat_axis_decomposition(rng):
    # euler2mat is Rx @ Ry @ Rz (reference euler2mat_torch :266-296)
    ang = rng.uniform(-1, 1, (8, 3)).astype(np.float32)
    R = np.asarray(euler2mat(jnp.asarray(ang)))

    def rx(a):
        c, s = np.cos(a), np.sin(a)
        return np.array([[1, 0, 0], [0, c, -s], [0, s, c]], np.float32)

    def ry(a):
        c, s = np.cos(a), np.sin(a)
        return np.array([[c, 0, s], [0, 1, 0], [-s, 0, c]], np.float32)

    def rz(a):
        c, s = np.cos(a), np.sin(a)
        return np.array([[c, -s, 0], [s, c, 0], [0, 0, 1]], np.float32)

    want = np.stack([rx(a[0]) @ ry(a[1]) @ rz(a[2]) for a in ang])
    np.testing.assert_allclose(R, want, atol=1e-5)


def test_se3_algebra(rng):
    q = _rand_quat(rng, 8)
    R = np.asarray(quat2mat(jnp.asarray(q)))
    t = rng.standard_normal((8, 3, 1)).astype(np.float32)
    RT = jnp.asarray(np.concatenate([R, t], axis=-1))
    ident = np.asarray(se3_mul(RT, se3_inverse(RT)))
    np.testing.assert_allclose(ident[..., :3], np.broadcast_to(np.eye(3), ident[..., :3].shape), atol=1e-5)
    np.testing.assert_allclose(ident[..., 3], 0.0, atol=1e-5)
    # calc_se3: rel @ src == tgt
    q2 = _rand_quat(rng, 8)
    RT2 = jnp.asarray(
        np.concatenate([np.asarray(quat2mat(jnp.asarray(q2))), rng.standard_normal((8, 3, 1)).astype(np.float32)], -1)
    )
    rel = calc_se3(RT, RT2)
    np.testing.assert_allclose(np.asarray(se3_mul(rel, RT)), np.asarray(RT2), atol=1e-5)


def test_pose_vec2mat(rng):
    # reference layout is rotation FIRST (pose_utils.py:415-434):
    # 'quat' = (qw,qx,qy,qz,tx,ty,tz), 'euler' = (rx,ry,rz,tx,ty,tz)
    vec = rng.standard_normal((6, 7)).astype(np.float32)
    M = np.asarray(pose_vec2mat(jnp.asarray(vec), rotation_mode="quat"))
    np.testing.assert_allclose(M[:, :, 3], vec[:, 4:7], atol=1e-6)
    np.testing.assert_allclose(M[:, :, :3], np.asarray(quat2mat(jnp.asarray(vec[:, :4]))), atol=1e-6)
    vec6 = rng.standard_normal((6, 6)).astype(np.float32)
    Me = np.asarray(pose_vec2mat(jnp.asarray(vec6), rotation_mode="euler"))
    np.testing.assert_allclose(Me[:, :, 3], vec6[:, 3:6], atol=1e-6)
    np.testing.assert_allclose(Me[:, :, :3], np.asarray(euler2mat(jnp.asarray(vec6[:, :3]))), atol=1e-6)


def test_get_closest_rot_batch_bruteforce(rng):
    B, K = 12, 6
    pred = np.asarray(quat2mat(jnp.asarray(_rand_quat(rng, B))))
    gt = np.asarray(quat2mat(jnp.asarray(_rand_quat(rng, B))))
    syms = np.asarray(quat2mat(jnp.asarray(_rand_quat(rng, B * K)))).reshape(B, K, 3, 3)
    mask = rng.random((B, K)) < 0.7
    got = np.asarray(
        get_closest_rot_batch(jnp.asarray(pred), jnp.asarray(gt), jnp.asarray(syms), jnp.asarray(mask))
    )
    # brute-force reference loop (pose_utils.py:472-497 semantics)
    def re(a, b):
        c = np.clip((np.trace(a.T @ b) - 1) / 2, -1, 1)
        return np.degrees(np.arccos(c))

    for b in range(B):
        best, err = gt[b], re(pred[b], gt[b])
        for k in range(K):
            if not mask[b, k]:
                continue
            cand = gt[b] @ syms[b, k]
            e = re(pred[b], cand)
            if e < err:
                best, err = cand, e
        np.testing.assert_allclose(got[b], best, atol=1e-5)


def test_rt_transform_batch(rng):
    q = _rand_quat(rng, 5)
    t = rng.standard_normal((5, 3)).astype(np.float32)
    src = np.concatenate(
        [np.asarray(quat2mat(jnp.asarray(_rand_quat(rng, 5)))), rng.standard_normal((5, 3, 1)).astype(np.float32)],
        axis=-1,
    )
    out = np.asarray(rt_transform_batch(jnp.asarray(q), jnp.asarray(t), jnp.asarray(src)))
    np.testing.assert_allclose(out[..., :3], np.asarray(quat2mat(jnp.asarray(q))) @ src[..., :3], atol=1e-5)
    # reference RT_transform_batch_cpu ASSIGNS the predicted translation
    np.testing.assert_allclose(out[..., 3], t, atol=1e-6)
    # geodesic sanity: identity delta + source translation leaves the pose unchanged
    ident = np.tile(np.array([1, 0, 0, 0], np.float32), (5, 1))
    out2 = np.asarray(rt_transform_batch(jnp.asarray(ident), jnp.asarray(src[..., 3]), jnp.asarray(src)))
    np.testing.assert_allclose(out2, src, atol=1e-5)
    assert float(np.max(np.asarray(rotation_geodesic_deg(jnp.asarray(src[..., :3]), jnp.asarray(src[..., :3]))))) < 0.1  # fp32 acos near tr=3 resolves ~0.03 deg
