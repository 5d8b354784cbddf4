"""Oracle tests for the GeoTransformer node-correspondence machinery
(unopose_tpu/ops/node_corr.py) against a torch-cpu implementation of the
reference formulas (core/unopose/utils/data_utils.py:509-616, 781-914)."""

import numpy as np
import pytest
import torch

import jax.numpy as jnp

from unopose_tpu.ops.node_corr import (
    get_node_correspondences,
    point2node,
    point2node_correspondences,
    point_to_node_partition,
)


def _torch_pairwise_d2(a, b):
    return ((a[:, None, :] - b[None, :, :]) ** 2).sum(-1)


def _torch_point_to_node_partition(points, nodes, point_limit):
    d2 = _torch_pairwise_d2(nodes, points)  # (M, N)
    point_to_node = d2.min(dim=0)[1]
    node_masks = torch.zeros(nodes.shape[0], dtype=torch.bool)
    node_masks.index_fill_(0, point_to_node, True)
    matching = torch.zeros_like(d2, dtype=torch.bool)
    matching[point_to_node, torch.arange(points.shape[0])] = True
    d2 = d2.masked_fill(~matching, 1e12)
    knn_idx = d2.topk(k=point_limit, dim=1, largest=False)[1]
    knn_node = point_to_node[knn_idx]
    knn_masks = knn_node == torch.arange(nodes.shape[0])[:, None]
    knn_idx = knn_idx.masked_fill(~knn_masks, points.shape[0])
    sizes = torch.zeros(nodes.shape[0], dtype=torch.long)
    idx, cts = torch.unique(point_to_node, return_counts=True)
    sizes[idx] = cts
    return point_to_node, sizes, node_masks, knn_idx, knn_masks


@pytest.fixture
def clouds(rng):
    pts = rng.uniform(-1, 1, size=(200, 3)).astype(np.float32)
    nodes = rng.uniform(-1, 1, size=(16, 3)).astype(np.float32)
    return pts, nodes


def test_point_to_node_partition_oracle(clouds):
    pts, nodes = clouds
    p2n, sizes, masks, knn_idx, knn_masks = point_to_node_partition(
        jnp.asarray(pts), jnp.asarray(nodes), point_limit=24, return_count=True
    )
    tp2n, tsizes, tmasks, tknn_idx, tknn_masks = _torch_point_to_node_partition(
        torch.from_numpy(pts), torch.from_numpy(nodes), 24
    )
    np.testing.assert_array_equal(np.asarray(p2n), tp2n.numpy())
    np.testing.assert_array_equal(np.asarray(sizes), tsizes.numpy())
    np.testing.assert_array_equal(np.asarray(masks), tmasks.numpy())
    np.testing.assert_array_equal(np.asarray(knn_masks), tknn_masks.numpy())
    # indices agree on valid slots (tie order within equal distances can
    # differ between top_k implementations; distances pin the semantics)
    d_ref = np.take(pts, np.where(tknn_masks, tknn_idx, 0), axis=0)
    d_jax = np.take(pts, np.where(np.asarray(knn_masks), np.asarray(knn_idx), 0), axis=0)
    np.testing.assert_allclose(
        np.sort(np.linalg.norm(d_ref - nodes[:, None], axis=-1), axis=1),
        np.sort(np.linalg.norm(d_jax - nodes[:, None], axis=-1), axis=1),
        atol=1e-6,
    )


def test_point2node_oracle(clouds):
    pts, nodes = clouds
    got = np.asarray(point2node(jnp.asarray(nodes), jnp.asarray(pts)))
    want = _torch_pairwise_d2(torch.from_numpy(pts), torch.from_numpy(nodes)).min(dim=1)[1].numpy()
    np.testing.assert_array_equal(got, want)


def test_get_node_correspondences_oracle(rng):
    M = N = 32
    K = 8
    ref_nodes = rng.uniform(-1, 1, size=(M, 3)).astype(np.float32)
    src_nodes = rng.uniform(-1, 1, size=(N, 3)).astype(np.float32)
    ref_knn = ref_nodes[:, None] + rng.uniform(-0.2, 0.2, size=(M, K, 3)).astype(np.float32)
    src_knn = src_nodes[:, None] + rng.uniform(-0.2, 0.2, size=(N, K, 3)).astype(np.float32)
    ref_knn_masks = rng.random((M, K)) < 0.9
    src_knn_masks = rng.random((N, K)) < 0.9
    ref_knn_masks[:, 0] = True
    src_knn_masks[:, 0] = True
    T = np.eye(4, dtype=np.float32)
    # small rigid transform
    th = 0.3
    T[:3, :3] = np.array(
        [[np.cos(th), -np.sin(th), 0], [np.sin(th), np.cos(th), 0], [0, 0, 1]], np.float32
    )
    T[:3, 3] = [0.05, -0.02, 0.01]
    pos_radius = 0.15

    dense = np.asarray(
        get_node_correspondences(
            jnp.asarray(ref_nodes), jnp.asarray(src_nodes), jnp.asarray(ref_knn), jnp.asarray(src_knn),
            jnp.asarray(T), pos_radius,
            ref_knn_masks=jnp.asarray(ref_knn_masks), src_knn_masks=jnp.asarray(src_knn_masks),
            row_chunk=8,
        )
    )

    # torch oracle (reference data_utils.py:830-914 formulas)
    t_src_nodes = (torch.from_numpy(src_nodes) - torch.from_numpy(T[:3, 3])) @ torch.from_numpy(T[:3, :3])
    t_src_knn = (torch.from_numpy(src_knn) - torch.from_numpy(T[:3, 3])) @ torch.from_numpy(T[:3, :3])
    t_ref_knn = torch.from_numpy(ref_knn)
    rkm = torch.from_numpy(ref_knn_masks)
    skm = torch.from_numpy(src_knn_masks)
    ref_d = torch.linalg.norm(t_ref_knn - torch.from_numpy(ref_nodes)[:, None], dim=-1).masked_fill(~rkm, 0.0)
    src_d = torch.linalg.norm(t_src_knn - t_src_nodes[:, None], dim=-1).masked_fill(~skm, 0.0)
    dist = torch.sqrt(_torch_pairwise_d2(torch.from_numpy(ref_nodes), t_src_nodes).clamp_min(0))
    intersect = ref_d.max(1)[0][:, None] + src_d.max(1)[0][None, :] + pos_radius - dist > 0
    want = np.zeros((M, N), np.float32)
    for i in range(M):
        for j in range(N):
            if not intersect[i, j]:
                continue
            d2 = _torch_pairwise_d2(t_ref_knn[i], t_src_knn[j])
            pm = rkm[i][:, None] & skm[j][None, :]
            ov = (d2 < pos_radius**2) & pm
            r_oc = ov.any(1).sum().float()
            s_oc = ov.any(0).sum().float()
            want[i, j] = 0.5 * (r_oc / rkm[i].sum() + s_oc / skm[j].sum())
    np.testing.assert_allclose(dense, want, atol=1e-6)


def test_get_node_correspondences_ref_node_count(rng):
    # M=196 (the reference pipeline's coarse node count) with the DEFAULT
    # row_chunk: the chunk is picked internally (196 % 16 != 0), and the
    # result matches a divisor-chunk run exactly.
    M, N, K = 196, 24, 4
    ref_nodes = rng.uniform(-1, 1, size=(M, 3)).astype(np.float32)
    src_nodes = rng.uniform(-1, 1, size=(N, 3)).astype(np.float32)
    ref_knn = ref_nodes[:, None] + rng.uniform(-0.2, 0.2, size=(M, K, 3)).astype(np.float32)
    src_knn = src_nodes[:, None] + rng.uniform(-0.2, 0.2, size=(N, K, 3)).astype(np.float32)
    T = jnp.eye(4)
    a = np.asarray(
        get_node_correspondences(
            jnp.asarray(ref_nodes), jnp.asarray(src_nodes), jnp.asarray(ref_knn), jnp.asarray(src_knn), T, 0.15
        )
    )
    b = np.asarray(
        get_node_correspondences(
            jnp.asarray(ref_nodes), jnp.asarray(src_nodes), jnp.asarray(ref_knn), jnp.asarray(src_knn), T, 0.15,
            row_chunk=14,
        )
    )
    assert a.shape == (M, N)
    np.testing.assert_allclose(a, b, atol=0)


def test_point2node_correspondences_oracle(rng):
    M1, M2, N1, N2 = 12, 10, 120, 100
    src_nodes = rng.uniform(-1, 1, size=(M1, 3)).astype(np.float32)
    tgt_nodes = rng.uniform(-1, 1, size=(M2, 3)).astype(np.float32)
    src_pts = rng.uniform(-1, 1, size=(N1, 3)).astype(np.float32)
    tgt_pts = rng.uniform(-1, 1, size=(N2, 3)).astype(np.float32)
    Kc = 64
    corr = np.stack(
        [rng.integers(0, N1, size=Kc), rng.integers(0, N2, size=Kc)], axis=1
    ).astype(np.int32)
    mask = rng.random(Kc) < 0.8

    row, col = point2node_correspondences(
        jnp.asarray(src_nodes), jnp.asarray(src_pts), jnp.asarray(tgt_nodes), jnp.asarray(tgt_pts),
        jnp.asarray(corr), jnp.asarray(mask),
    )

    # torch oracle (reference data_utils.py:526-616 formulas) on the
    # masked-in rows only
    pc = torch.from_numpy(corr[mask].astype(np.int64))
    s_nodes, t_nodes = torch.from_numpy(src_nodes), torch.from_numpy(tgt_nodes)
    s_pts, t_pts = torch.from_numpy(src_pts), torch.from_numpy(tgt_pts)
    src_idx = _torch_pairwise_d2(s_pts, s_nodes).min(1)[1]
    tgt_idx = _torch_pairwise_d2(t_pts, t_nodes).min(1)[1]

    def node_vis(idx, vis_points, M, Npts):
        vis = torch.zeros(Npts)
        vis[vis_points] = 1.0
        vis_idx = vis.nonzero().squeeze(1)
        tot = torch.ones(M)
        i, c = torch.unique(idx, return_counts=True)
        tot[i] = c.float()
        vn = torch.zeros(M)
        i2, c2 = torch.unique(idx[vis_idx], return_counts=True)
        vn[i2] = c2.float()
        return vn / tot

    src_node_vis = node_vis(src_idx, pc[:, 0], M1, N1)
    tgt_node_vis = node_vis(tgt_idx, pc[:, 1], M2, N2)
    s_corr = src_idx[pc[:, 0]]
    t_corr = tgt_idx[pc[:, 1]]
    index = s_corr * M2 + t_corr
    index, counts = torch.unique(index, return_counts=True)
    ncm = torch.zeros(M1, M2)
    ncm[index // M2, index % M2] = counts.float()
    row_norm = ncm / (ncm.sum(1, keepdim=True) + 1e-10) * src_node_vis[:, None]
    col_norm = ncm / (ncm.sum(0, keepdim=True) + 1e-10) * tgt_node_vis[None, :]
    want_row = torch.cat([(1 - src_node_vis)[:, None], row_norm], dim=1).T
    want_col = torch.cat([(1 - tgt_node_vis)[None, :], col_norm], dim=0)

    np.testing.assert_allclose(np.asarray(row), want_row.numpy(), atol=1e-5)
    np.testing.assert_allclose(np.asarray(col), want_col.numpy(), atol=1e-5)
