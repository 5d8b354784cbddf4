"""Oracle tests for FPS, ball query, grouping, eig3, LRF, and geometry ops."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from unopose_tpu.ops.ball_query import ball_query, group_points, query_and_group
from unopose_tpu.ops.eig3 import eigvals_sym3, smallest_eigvec_sym3
from unopose_tpu.ops.fps import fps_pallas, fps_xla, gather_points, sample_pts_feats
from unopose_tpu.ops.geometry import backproject, pairwise_sqdist
from unopose_tpu.ops.lrf import batch_lrf, global_lrf
from unopose_tpu.ops.rotation import aug_pose_noise, random_so3


# ---------------------------------------------------------------- oracles
def fps_oracle(pts, npoint):
    """Sequential FPS, start at 0, first-occurrence argmax (sampling_gpu.cu:74-150)."""
    B, N, _ = pts.shape
    idx = np.zeros((B, npoint), np.int32)
    for b in range(B):
        mind = np.full(N, 1e10, np.float32)
        last = 0
        for j in range(1, npoint):
            d = ((pts[b] - pts[b, last]) ** 2).sum(-1)
            mind = np.minimum(mind, d)
            last = int(np.argmax(mind))
            idx[b, j] = last
    return idx


def ball_query_oracle(radius, nsample, xyz, new_xyz):
    """Index-order scan with pad-with-first (ball_query_gpu.cu:14-49)."""
    B, N, _ = xyz.shape
    P = new_xyz.shape[1]
    out = np.zeros((B, P, nsample), np.int32)
    r2 = radius * radius
    for b in range(B):
        for j in range(P):
            cnt = 0
            for k in range(N):
                if ((new_xyz[b, j] - xyz[b, k]) ** 2).sum() < r2:
                    if cnt == 0:
                        out[b, j, :] = k
                    out[b, j, cnt] = k
                    cnt += 1
                    if cnt == nsample:
                        break
    return out


# ---------------------------------------------------------------- tests
def test_fps_xla_matches_oracle(rng):
    pts = rng.normal(size=(3, 64, 3)).astype(np.float32)
    got = np.asarray(fps_xla(jnp.asarray(pts), 16))
    want = fps_oracle(pts, 16)
    np.testing.assert_array_equal(got, want)


def test_fps_pallas_interpret_matches_oracle(rng):
    pts = rng.normal(size=(2, 200, 3)).astype(np.float32)  # exercises padding
    got = np.asarray(fps_pallas(jnp.asarray(pts), 32, interpret=True))
    want = fps_oracle(pts, 32)
    np.testing.assert_array_equal(got, want)


def test_fps_covers_spread_points():
    """FPS on a line of points picks the extremes early."""
    pts = np.zeros((1, 10, 3), np.float32)
    pts[0, :, 0] = np.arange(10)
    idx = np.asarray(fps_xla(jnp.asarray(pts), 3))[0]
    assert idx[0] == 0 and idx[1] == 9 and idx[2] in (4, 5)


def test_gather_points(rng):
    data = rng.normal(size=(2, 10, 4)).astype(np.float32)
    idx = rng.integers(0, 10, size=(2, 5)).astype(np.int32)
    got = np.asarray(gather_points(jnp.asarray(data), jnp.asarray(idx)))
    for b in range(2):
        np.testing.assert_allclose(got[b], data[b, idx[b]])


def test_sample_pts_feats_shapes(rng):
    pts = jnp.asarray(rng.normal(size=(2, 100, 3)).astype(np.float32))
    feats = jnp.asarray(rng.normal(size=(2, 100, 8)).astype(np.float32))
    p, f, i = sample_pts_feats(pts, feats, 16, return_index=True)
    assert p.shape == (2, 16, 3) and f.shape == (2, 16, 8) and i.shape == (2, 16)


def test_ball_query_matches_oracle(rng):
    xyz = rng.uniform(-1, 1, size=(2, 80, 3)).astype(np.float32)
    new_xyz = xyz[:, :20]
    got = np.asarray(ball_query(0.5, 8, jnp.asarray(xyz), jnp.asarray(new_xyz)))
    want = ball_query_oracle(0.5, 8, xyz, new_xyz)
    np.testing.assert_array_equal(got, want)


def test_two_scale_group_matches_single_scale(rng):
    """two_scale_group's groupings must match independent ball queries when
    scale 2 captures every scale-1 candidate (the typical case)."""
    from unopose_tpu.ops.ball_query import two_scale_group

    xyz = rng.uniform(-1, 1, size=(2, 100, 3)).astype(np.float32)
    r1, k1, r2, k2 = 0.3, 8, 0.6, 64
    g1, g2 = two_scale_group(r1, k1, r2, k2, jnp.asarray(xyz))
    idx1 = ball_query_oracle(r1, k1, xyz, xyz)
    idx2 = ball_query_oracle(r2, k2, xyz, xyz)
    for b in range(2):
        np.testing.assert_allclose(np.asarray(g2)[b], xyz[b][idx2[b]], atol=1e-6)
        np.testing.assert_allclose(np.asarray(g1)[b], xyz[b][idx1[b]], atol=1e-6)


def test_ball_query_empty_ball(rng):
    xyz = np.ones((1, 10, 3), np.float32) * 5
    new_xyz = np.zeros((1, 2, 3), np.float32)
    got = np.asarray(ball_query(0.1, 4, jnp.asarray(xyz), jnp.asarray(new_xyz)))
    np.testing.assert_array_equal(got, 0)


def test_group_points(rng):
    feats = rng.normal(size=(2, 30, 5)).astype(np.float32)
    idx = rng.integers(0, 30, size=(2, 7, 4)).astype(np.int32)
    got = np.asarray(group_points(jnp.asarray(feats), jnp.asarray(idx)))
    for b in range(2):
        for p in range(7):
            np.testing.assert_allclose(got[b, p], feats[b, idx[b, p]])


def test_query_and_group_relative_coords(rng):
    xyz = rng.uniform(-1, 1, size=(1, 50, 3)).astype(np.float32)
    grouped, idx = query_and_group(0.6, 8, jnp.asarray(xyz), jnp.asarray(xyz))
    grouped, idx = np.asarray(grouped), np.asarray(idx)
    for p in range(0, 50, 10):
        np.testing.assert_allclose(grouped[0, p], xyz[0, idx[0, p]] - xyz[0, p], atol=1e-6)


def test_eigvals_sym3_matches_numpy(rng):
    A = rng.normal(size=(128, 3, 3)).astype(np.float32)
    A = A + A.transpose(0, 2, 1)
    got = np.asarray(eigvals_sym3(jnp.asarray(A)))
    want = np.linalg.eigvalsh(A)[:, ::-1]
    np.testing.assert_allclose(got, want, atol=1e-4)


def test_smallest_eigvec_sym3(rng):
    A = rng.normal(size=(64, 3, 3)).astype(np.float32)
    A = A @ A.transpose(0, 2, 1)  # PSD, generic spectrum
    v = np.asarray(smallest_eigvec_sym3(jnp.asarray(A)))
    w = np.linalg.eigvalsh(A)
    res = np.einsum("bij,bj->bi", A, v) - w[:, :1] * v
    assert np.abs(res).max() < 1e-3
    np.testing.assert_allclose(np.linalg.norm(v, axis=-1), 1.0, atol=1e-5)


def torch_lrf_oracle(pts, r_lrf):
    """Global LRF re-derived in torch following model_utils.py:766-823 semantics."""
    import torch

    pts_t = torch.from_numpy(pts)  # (B, N, 3)
    centroid = pts_t.mean(1, keepdim=True)
    xyz = centroid.transpose(1, 2)  # (B,3,1)
    xyz_group = pts_t.transpose(1, 2)  # (B,3,N)
    B, _, N = xyz_group.shape
    x = xyz - xyz_group
    xxt = torch.bmm(x, x.transpose(1, 2)) / N
    _, _, v = torch.svd(xxt)
    center_proj = v[..., -1].unsqueeze(1) @ x
    sum_ = (center_proj > 1e-3).sum(-1) - (center_proj < -1e-3).sum(-1)
    sign = torch.ones((B, 1)) - 2 * (sum_ < 0)
    zp = (sign * v[..., -1]).unsqueeze(1)
    x = -x
    norm = (zp @ x).transpose(1, 2)
    proj = norm * zp
    vi = x - proj.transpose(1, 2)
    x_l2 = torch.sqrt((x**2).sum(1, keepdim=True))
    alpha = (torch.from_numpy(r_lrf)[:, None, None] - x_l2) ** 2
    beta = (norm * norm).transpose(1, 2)
    vi_c = (alpha * beta * vi).sum(2)
    xp = vi_c / (torch.sqrt((vi_c**2).sum(1, keepdim=True)) + 1e-10)
    yp = torch.cross(xp, zp.squeeze(1), dim=1)
    lrf = torch.cat((xp.unsqueeze(2), yp.unsqueeze(2), zp.transpose(1, 2)), dim=2)
    out = lrf.transpose(1, 2) @ ((xyz_group - xyz) / torch.from_numpy(r_lrf)[:, None, None])
    return out.transpose(1, 2).numpy()


def test_global_lrf_matches_torch_oracle(rng):
    pts = rng.normal(size=(4, 60, 3)).astype(np.float32)
    pts[..., 0] *= 3.0  # anisotropic so eigenvectors are well separated
    pts[..., 2] *= 0.3
    r = np.linalg.norm(pts - pts.mean(1, keepdims=True), axis=-1).max(-1).astype(np.float32)
    got = np.asarray(global_lrf(jnp.asarray(pts)))
    want = torch_lrf_oracle(pts, r)
    # eigenvector sign of x-axis may flip only through the weighted projection;
    # compare up to global handedness by checking the invariant distances too
    np.testing.assert_allclose(got, want, atol=5e-3)


def test_global_lrf_rotation_invariant(rng):
    """LRF coords must be (nearly) invariant to a rigid rotation of the cloud."""
    pts = rng.normal(size=(1, 100, 3)).astype(np.float32)
    pts[..., 0] *= 3.0
    pts[..., 2] *= 0.3
    R = np.asarray(random_so3(jax.random.PRNGKey(1)))
    a = np.asarray(global_lrf(jnp.asarray(pts)))
    b = np.asarray(global_lrf(jnp.asarray(pts @ R.T)))
    np.testing.assert_allclose(a, b, atol=1e-2)


def test_batch_lrf_shapes(rng):
    centers = jnp.asarray(rng.normal(size=(2, 16, 3)).astype(np.float32))
    grouped = centers[:, :, None, :] + 0.05 * jnp.asarray(rng.normal(size=(2, 16, 8, 3)).astype(np.float32))
    out = batch_lrf(centers, grouped, 0.1)
    assert out.shape == (2, 16, 8, 3)
    assert np.isfinite(np.asarray(out)).all()


def test_pairwise_sqdist(rng):
    x = rng.normal(size=(2, 10, 3)).astype(np.float32)
    y = rng.normal(size=(2, 15, 3)).astype(np.float32)
    got = np.asarray(pairwise_sqdist(jnp.asarray(x), jnp.asarray(y)))
    want = ((x[:, :, None] - y[:, None]) ** 2).sum(-1)
    np.testing.assert_allclose(got, want, atol=1e-4)


def test_backproject():
    depth = jnp.ones((4, 6), jnp.float32) * 2.0
    K = jnp.asarray([[100.0, 0, 3.0], [0, 100.0, 2.0], [0, 0, 1]])
    cloud = np.asarray(backproject(depth, K))
    assert cloud.shape == (4, 6, 3)
    np.testing.assert_allclose(cloud[2, 3], [0, 0, 2.0], atol=1e-6)
    np.testing.assert_allclose(cloud[2, 4], [2.0 / 100, 0, 2.0], atol=1e-6)


def test_aug_pose_noise_properties(rng):
    gt_r = np.stack([np.eye(3, dtype=np.float32)] * 8)
    gt_t = rng.normal(size=(8, 3)).astype(np.float32)
    gt_t[:, 2] = np.abs(gt_t[:, 2]) + 1.0  # keep z clamp inactive
    R, t = aug_pose_noise(jax.random.PRNGKey(0), jnp.asarray(gt_r), jnp.asarray(gt_t))
    R, t = np.asarray(R), np.asarray(t)
    assert np.allclose(R @ R.transpose(0, 2, 1), np.eye(3), atol=1e-5)
    assert (t[:, 2] >= 1e-6).all()
    assert np.abs(t - gt_t).max() <= 0.8 + 1e-6


def test_batch_lrf_planar_matches_tensor(rng):
    from unopose_tpu.ops.lrf import batch_lrf_planar

    centers = rng.normal(size=(2, 16, 3)).astype(np.float32)
    grouped = centers[:, :, None, :] + 0.05 * rng.normal(size=(2, 16, 12, 3)).astype(np.float32)
    want = np.asarray(batch_lrf(jnp.asarray(centers), jnp.asarray(grouped), 0.1))
    o0, o1, o2 = batch_lrf_planar(
        tuple(jnp.asarray(centers[..., i]) for i in range(3)),
        tuple(jnp.asarray(grouped[..., i]) for i in range(3)),
        0.1,
    )
    got = np.stack([np.asarray(o0), np.asarray(o1), np.asarray(o2)], axis=-1)
    np.testing.assert_allclose(got, want, atol=2e-3)


def test_smallest_eigvec_planar_matches_tensor(rng):
    from unopose_tpu.ops.eig3 import smallest_eigvec_sym3_planar

    A = rng.normal(size=(64, 3, 3)).astype(np.float32)
    A = A @ A.transpose(0, 2, 1)
    want = np.asarray(smallest_eigvec_sym3(jnp.asarray(A)))
    v0, v1, v2 = smallest_eigvec_sym3_planar(
        jnp.asarray(A[:, 0, 0]), jnp.asarray(A[:, 0, 1]), jnp.asarray(A[:, 0, 2]),
        jnp.asarray(A[:, 1, 1]), jnp.asarray(A[:, 1, 2]), jnp.asarray(A[:, 2, 2]),
    )
    got = np.stack([np.asarray(v0), np.asarray(v1), np.asarray(v2)], axis=-1)
    # eigenvectors defined up to sign: align then compare
    sign = np.sign(np.sum(got * want, axis=-1, keepdims=True))
    np.testing.assert_allclose(got * sign, want, atol=1e-3)


def test_two_scale_group_planar_matches_tensor(rng):
    from unopose_tpu.ops.ball_query import two_scale_group, two_scale_group_planar

    xyz = rng.uniform(-1, 1, size=(2, 100, 3)).astype(np.float32)
    g1t, g2t = two_scale_group(0.3, 8, 0.6, 64, jnp.asarray(xyz))
    g1p, g2p = two_scale_group_planar(0.3, 8, 0.6, 64, jnp.asarray(xyz))
    np.testing.assert_allclose(np.stack([np.asarray(c) for c in g1p], -1), np.asarray(g1t), atol=1e-6)
    np.testing.assert_allclose(np.stack([np.asarray(c) for c in g2p], -1), np.asarray(g2t), atol=1e-6)


def test_rotation_conversions_roundtrip(rng):
    from unopose_tpu.ops.rotation import axangle_to_mat, mat_to_axangle, mat_to_quat
    from unopose_tpu.ops.procrustes import quat_to_rotmat

    q = rng.normal(size=(32, 4)).astype(np.float32)
    q /= np.linalg.norm(q, axis=-1, keepdims=True)
    q *= np.sign(q[:, :1] + 1e-12)  # canonical w >= 0
    R = quat_to_rotmat(jnp.asarray(q))
    q2 = np.asarray(mat_to_quat(R))
    np.testing.assert_allclose(np.abs(np.sum(q2 * q, axis=-1)), 1.0, atol=1e-4)

    axis, angle = mat_to_axangle(R)
    R2 = axangle_to_mat(axis, angle)
    np.testing.assert_allclose(np.asarray(R2), np.asarray(R), atol=1e-3)


def test_three_nn_interpolate(rng):
    from unopose_tpu.ops.interpolate import interpolate_features, three_interpolate, three_nn

    unknown = rng.normal(size=(2, 20, 3)).astype(np.float32)
    known = rng.normal(size=(2, 8, 3)).astype(np.float32)
    dist, idx = three_nn(jnp.asarray(unknown), jnp.asarray(known))
    d_full = np.linalg.norm(unknown[:, :, None] - known[:, None], axis=-1)
    want = np.sort(d_full, axis=-1)[..., :3]
    np.testing.assert_allclose(np.asarray(dist), want, atol=1e-5)

    feats = rng.normal(size=(2, 8, 6)).astype(np.float32)
    w = rng.uniform(size=(2, 20, 3)).astype(np.float32)
    out = np.asarray(three_interpolate(jnp.asarray(feats), idx, jnp.asarray(w)))
    for b in range(2):
        for n in range(20):
            expect = sum(w[b, n, j] * feats[b, np.asarray(idx)[b, n, j]] for j in range(3))
            np.testing.assert_allclose(out[b, n], expect, atol=1e-4)

    # constant features interpolate to the same constant
    const = np.ones((2, 8, 4), np.float32) * 3.0
    out2 = interpolate_features(jnp.asarray(unknown), jnp.asarray(known), jnp.asarray(const))
    np.testing.assert_allclose(np.asarray(out2), 3.0, atol=1e-4)


def test_gather_planar_matches_xla(rng):
    from unopose_tpu.ops.gather_pallas import gather_planar

    B, N, P, S = 2, 50, 30, 7
    pts = rng.normal(size=(B, N, 3)).astype(np.float32)
    idx = rng.integers(0, N, size=(B, P, S)).astype(np.int32)
    gx, gy, gz = gather_planar(
        jnp.asarray(pts[..., 0]), jnp.asarray(pts[..., 1]), jnp.asarray(pts[..., 2]), jnp.asarray(idx)
    )
    want = pts[np.arange(B)[:, None, None], idx]
    np.testing.assert_allclose(np.stack([np.asarray(gx), np.asarray(gy), np.asarray(gz)], -1), want, atol=1e-6)


def test_gather_planar_grad_is_scatter_add(rng):
    from unopose_tpu.ops.gather_pallas import gather_planar

    B, N, P, S = 1, 10, 4, 3
    pts = rng.normal(size=(B, N, 3)).astype(np.float32)
    idx = rng.integers(0, N, size=(B, P, S)).astype(np.int32)

    def f(x):
        gx, gy, gz = gather_planar(x, jnp.asarray(pts[..., 1]), jnp.asarray(pts[..., 2]), jnp.asarray(idx))
        return jnp.sum(gx * jnp.arange(P * S).reshape(1, P, S))

    gr = np.asarray(jax.grad(f)(jnp.asarray(pts[..., 0])))
    want = np.zeros((B, N))
    w = np.arange(P * S).reshape(P, S)
    for p in range(P):
        for s in range(S):
            want[0, idx[0, p, s]] += w[p, s]
    np.testing.assert_allclose(gr, want, atol=1e-4)


def test_ball_group_planar_subset_mode(rng):
    from unopose_tpu.ops.ball_query import ball_group_planar

    B, N, S = 2, 64, 16
    xyz = rng.uniform(-1, 1, size=(B, N, 3)).astype(np.float32)
    r = 0.7
    planes, d2_sel, valid = ball_group_planar(r, S, jnp.asarray(xyz), mode="subset")
    planes = np.stack([np.asarray(c) for c in planes], -1)
    valid = np.asarray(valid)
    d2 = ((xyz[:, :, None] - xyz[:, None]) ** 2).sum(-1)
    for b in range(B):
        for p in range(N):
            sel = planes[b, p][valid[b, p]]
            # every valid pick is a real cloud point within the radius
            dmin = np.linalg.norm(sel[:, None] - xyz[b][None], axis=-1).min(1)
            assert dmin.max() < 1e-5
            dctr = np.linalg.norm(sel - xyz[b, p], axis=-1)
            assert (dctr < r).all()
            # at least one valid slot (the ball always contains the point itself)
            assert valid[b, p].any()
    # validity counts bounded by in-radius counts
    cnt = (d2 < r * r).sum(-1)
    assert (valid.sum(-1) <= np.minimum(cnt, S)).all()


def test_ball_group_planar_first_k_matches_oracle(rng):
    from unopose_tpu.ops.ball_query import ball_group_planar

    B, N, S = 2, 60, 8
    xyz = rng.uniform(-1, 1, size=(B, N, 3)).astype(np.float32)
    planes, _, valid = ball_group_planar(0.5, S, jnp.asarray(xyz), mode="first_k")
    idx = ball_query_oracle(0.5, S, xyz, xyz)
    got = np.stack([np.asarray(c) for c in planes], -1)
    for b in range(B):
        np.testing.assert_allclose(got[b][np.asarray(valid)[b]], xyz[b][idx[b]][np.asarray(valid)[b]], atol=1e-6)


def test_two_scale_first_k_fast_matches_exact(rng):
    """The sort-free first_k grouping (chunked budgets + overflow fallback)
    returns the SAME padded multiset per point as the reference sort path —
    slot order differs, the set (and the pad-duplicate count/identity,
    which feed the unmasked LRF) does not."""
    from unopose_tpu.ops.ball_query import (
        two_scale_group_exact_planar,
        two_scale_group_first_k_fast,
    )

    B, N = 2, 512
    R1, K1, R2, K2 = 0.1, 64, 0.2, 256
    v = rng.normal(size=(B, N, 3))
    v /= np.linalg.norm(v, axis=-1, keepdims=True)
    r = 0.5 * (1.0 + 0.2 * np.sin(3 * v[..., 0:1]) * np.cos(4 * v[..., 1:2]))
    pts = jnp.asarray((r * v + rng.normal(size=(B, N, 3)) * 2e-3).astype(np.float32))

    def canon(planes):
        a = np.stack([np.asarray(p) for p in planes], axis=-1)
        flat = a.reshape(-1, a.shape[2], 3)
        out = np.empty_like(flat)
        for i in range(flat.shape[0]):
            out[i] = flat[i][np.lexsort((flat[i, :, 2], flat[i, :, 1], flat[i, :, 0]))]
        return out

    g1e, g2e = jax.jit(lambda p: two_scale_group_exact_planar(R1, K1, R2, K2, p))(pts)
    g1f, g2f = jax.jit(lambda p: two_scale_group_first_k_fast(R1, K1, R2, K2, p))(pts)
    np.testing.assert_array_equal(canon(g2e), canon(g2f))
    np.testing.assert_array_equal(canon(g1e), canon(g1f))

    # dense cluster: every budget overflows -> lax.cond falls back to the
    # exact sort path, bitwise identical
    pts2 = jnp.asarray((rng.normal(size=(B, N, 3)) * 0.01).astype(np.float32))
    e = jax.jit(lambda p: two_scale_group_exact_planar(R1, K1, R2, K2, p))(pts2)
    f = jax.jit(lambda p: two_scale_group_first_k_fast(R1, K1, R2, K2, p))(pts2)
    for ep, fp in zip((*e[0], *e[1]), (*f[0], *f[1])):
        np.testing.assert_array_equal(np.asarray(ep), np.asarray(fp))


def test_first_k_fast_fused_keys_matches_xla(rng):
    """The Pallas select kernel (interpret mode on CPU) yields the SAME
    padded multiset per point as the pure-XLA fast path: same d2 expansion
    form, same hit sets; only the slot ORDER differs (the kernel's in-VMEM
    stream compaction keeps lane order, the XLA path's encoded sort keeps
    level-then-index order), which the canonical per-point sort removes."""
    from unopose_tpu.ops.ball_query import two_scale_group_first_k_fast

    B, N = 2, 512
    R1, K1, R2, K2 = 0.1, 64, 0.2, 256
    v = rng.normal(size=(B, N, 3))
    v /= np.linalg.norm(v, axis=-1, keepdims=True)
    pts = jnp.asarray((0.5 * v + rng.normal(size=(B, N, 3)) * 2e-3).astype(np.float32))

    def canon(planes):
        a = np.stack([np.asarray(p) for p in planes], axis=-1)
        flat = a.reshape(-1, a.shape[2], 3)
        out = np.empty_like(flat)
        for i in range(flat.shape[0]):
            out[i] = flat[i][np.lexsort((flat[i, :, 2], flat[i, :, 1], flat[i, :, 0]))]
        return out

    ref = jax.jit(lambda p: two_scale_group_first_k_fast(R1, K1, R2, K2, p, fused_keys=False))(pts)
    got = jax.jit(
        lambda p: two_scale_group_first_k_fast(R1, K1, R2, K2, p, fused_keys=True, interpret=True)
    )(pts)
    np.testing.assert_array_equal(canon(ref[1]), canon(got[1]))
    np.testing.assert_array_equal(canon(ref[0]), canon(got[0]))


def test_ball_group_subset_pallas_matches_xla(rng):
    """The Pallas subset-grouping kernel (interpret mode on CPU) selects
    exactly the same neighbors, distances and validity as the XLA subset
    path, across sample sizes including sub-128 ones."""
    from unopose_tpu.ops.ball_query import ball_group_planar, ball_group_subset_pallas

    pts = jnp.asarray(rng.uniform(-1, 1, size=(2, 128, 3)).astype(np.float32))
    for S in (16, 32):
        a_planes, a_d2, a_valid = ball_group_planar(0.7, S, pts, mode="subset")
        b_planes, b_d2, b_valid = ball_group_subset_pallas(0.7, S, pts, p_blk=32, interpret=True)
        np.testing.assert_array_equal(np.asarray(a_valid), np.asarray(b_valid))
        av = np.asarray(a_valid)
        for i in range(3):
            np.testing.assert_allclose(
                np.asarray(a_planes[i]) * av, np.asarray(b_planes[i]) * av, atol=1e-6
            )
        np.testing.assert_allclose(np.asarray(a_d2) * av, np.asarray(b_d2) * av, atol=1e-5)
        # every valid slot holds a real in-radius cloud point
        sel = np.stack([np.asarray(p) for p in b_planes], -1)
        ctr = np.asarray(pts)
        for b in range(2):
            for p in range(128):
                picks = sel[b, p][av[b, p]]
                if len(picks):
                    d = np.linalg.norm(picks - ctr[b, p], axis=-1)
                    assert (d < 0.7).all()


def test_first_k_packed_weights_match_oracle(rng):
    """two_scale_group_first_k_packed's per-slot weights reproduce the exact
    reference scale-1 MULTISET: {first <=k1 r1 hits by original index} +
    (k1-cnt1) duplicates of the scan-first r1 hit. Verified against a numpy
    oracle on the slot coordinates (order-free multiset comparison of
    weighted moment sums)."""
    from unopose_tpu.ops.ball_query import two_scale_group_first_k_packed

    B, N = 2, 512
    R1, K1, R2, K2 = 0.12, 64, 0.24, 256
    v = rng.normal(size=(B, N, 3))
    v /= np.linalg.norm(v, axis=-1, keepdims=True)
    pts_np = (0.5 * v + rng.normal(size=(B, N, 3)) * 2e-3).astype(np.float32)
    pts = jnp.asarray(pts_np)

    g2, w1, w2, total2, overflow = jax.jit(
        lambda p: two_scale_group_first_k_packed(R1, K1, R2, K2, p)
    )(pts)
    assert not bool(overflow)
    w1 = np.asarray(w1)
    w2 = np.asarray(w2)
    total2 = np.asarray(total2)
    gx, gy, gz = (np.asarray(g) for g in g2)

    # numpy oracle: reference CUDA semantics per row
    d2 = ((pts_np[:, :, None, :] - pts_np[:, None, :, :]) ** 2).sum(-1)
    m1 = d2 < R1 * R1
    m2full = d2 < R2 * R2
    for b in range(B):
        for n in range(0, N, 37):
            hits = np.nonzero(m1[b, n])[0]
            assert 1 <= len(hits) <= K1
            # reference multiset: hits + (K1 - cnt) x first hit
            ref_pts = pts_np[b, hits]
            ref_multiset = np.concatenate(
                [ref_pts, np.repeat(ref_pts[:1], K1 - len(hits), axis=0)], axis=0
            )
            got_w = w1[b, n]
            assert got_w.sum() == K1
            got = np.stack([gx[b, n], gy[b, n], gz[b, n]], -1)
            # global compaction: every hit-carrying slot (either scale) is in
            # the first total2 slots — the PE kernel's half-budget fast path
            # relies on this
            t2 = total2[b, n]
            assert (got_w[t2:] == 0).all() and (w2[b, n, t2:] == 0).all()
            hits2 = np.nonzero(m2full[b, n])[0]
            assert t2 == len(hits2)
            # scale-2 multiset: hits + (K2 - cnt2) x first hit
            ref2 = pts_np[b, hits2]
            ref2_multiset = np.concatenate(
                [ref2, np.repeat(pts_np[b, hits2[:1]], K2 - len(hits2), axis=0)], axis=0
            )
            got_w2 = w2[b, n]
            assert got_w2.sum() == K2
            # weighted moment comparison (order-free multiset equality)
            for mom in (lambda p: p, lambda p: p**2, lambda p: p**3):
                np.testing.assert_allclose(
                    (mom(got) * got_w[:, None]).sum(0), mom(ref_multiset).sum(0), rtol=1e-4, atol=1e-6
                )
                np.testing.assert_allclose(
                    (mom(got) * got_w2[:, None]).sum(0), mom(ref2_multiset).sum(0), rtol=1e-4, atol=1e-6
                )


def test_first_k_packed_overflow_flag(rng):
    """A degenerate cloud (all points inside every ball) must raise the
    packed path's overflow flag so the consumer branches to the exact path."""
    from unopose_tpu.ops.ball_query import two_scale_group_first_k_packed

    pts = jnp.asarray(rng.uniform(-0.01, 0.01, size=(1, 512, 3)).astype(np.float32))
    *_, overflow = jax.jit(
        lambda p: two_scale_group_first_k_packed(0.5, 64, 1.0, 256, p)
    )(pts)
    assert bool(overflow)
