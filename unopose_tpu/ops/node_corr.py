"""GeoTransformer superpoint/patch ("node") correspondence machinery.

Full-fidelity TPU-native counterparts of the reference's soft/circle-loss
ground-truth generators (core/unopose/utils/data_utils.py):

  * ``point_to_node_partition``  (data_utils.py:781-827)
  * ``get_node_correspondences`` (data_utils.py:830-914)
  * ``point2node``               (data_utils.py:509-523)
  * ``point2node_correspondences`` (data_utils.py:526-616)

Design deltas, TPU-first: everything is STATIC-SHAPED — the reference's
``nonzero``/``unique``/boolean-indexing steps (data-dependent shapes that
cannot live under jit) become dense masked matrices and one-hot MXU
contractions. ``get_node_correspondences`` returns the dense (M, N)
overlap matrix (reference's sparse ``corr_indices/corr_overlaps`` list is
exactly its nonzero set); ``point2node_correspondences`` takes a padded
correspondence list + validity mask instead of a ragged index tensor.
These feed the optional soft/circle losses (losses.compute_soft_loss /
weighted_circle_loss), which the main config disables — the light-weight
``losses.node_correspondence_targets`` stand-in remains the default
target generator for that path.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from unopose_tpu.ops.geometry import pairwise_sqdist


def point2node(nodes: jnp.ndarray, points: jnp.ndarray) -> jnp.ndarray:
    """Index of the nearest node for each point (reference
    data_utils.py:509-523). nodes (M, 3), points (N, 3) -> (N,) int32."""
    d2 = pairwise_sqdist(points[None], nodes[None])[0]  # (N, M)
    return jnp.argmin(d2, axis=1).astype(jnp.int32)


def point_to_node_partition(
    points: jnp.ndarray,  # (N, 3)
    nodes: jnp.ndarray,  # (M, 3)
    point_limit: int,
    return_count: bool = False,
):
    """Partition points to their nearest node; per node keep its
    ``point_limit`` nearest OWNED points (reference data_utils.py:781-827,
    the "fixed knn bug" variant: knn is over owned points only, via the
    1e12 masked distance).

    Returns (point_to_node (N,), [node_sizes (M,)], node_masks (M,),
    node_knn_indices (M, K) — invalid slots filled with N,
    node_knn_masks (M, K)).
    """
    N = points.shape[0]
    M = nodes.shape[0]
    d2 = pairwise_sqdist(nodes[None], points[None])[0]  # (M, N)
    point_to_node = jnp.argmin(d2, axis=0).astype(jnp.int32)  # (N,)

    owned = point_to_node[None, :] == jnp.arange(M, dtype=jnp.int32)[:, None]  # (M, N)
    node_masks = jnp.any(owned, axis=1)
    d2_masked = jnp.where(owned, d2, 1e12)
    # k smallest owned distances per node (ties: lowest index, like topk)
    neg_top, node_knn_indices = jax.lax.top_k(-d2_masked, point_limit)  # (M, K)
    node_knn_node_indices = point_to_node[node_knn_indices]  # (M, K)
    node_knn_masks = node_knn_node_indices == jnp.arange(M, dtype=jnp.int32)[:, None]
    node_knn_masks &= -neg_top < 1e12  # all-owned guard (pad rows)
    node_knn_indices = jnp.where(node_knn_masks, node_knn_indices, N).astype(jnp.int32)

    if return_count:
        node_sizes = jnp.sum(owned, axis=1).astype(jnp.int32)
        return point_to_node, node_sizes, node_masks, node_knn_indices, node_knn_masks
    return point_to_node, node_masks, node_knn_indices, node_knn_masks


def get_node_correspondences(
    ref_nodes: jnp.ndarray,  # (M, 3)
    src_nodes: jnp.ndarray,  # (N, 3)
    ref_knn_points: jnp.ndarray,  # (M, K, 3)
    src_knn_points: jnp.ndarray,  # (N, K, 3)
    transform: jnp.ndarray,  # (4, 4) src -> ref
    pos_radius: float,
    ref_masks: Optional[jnp.ndarray] = None,  # (M,) bool
    src_masks: Optional[jnp.ndarray] = None,  # (N,) bool
    ref_knn_masks: Optional[jnp.ndarray] = None,  # (M, K) bool
    src_knn_masks: Optional[jnp.ndarray] = None,  # (N, K) bool
    row_chunk: int = 16,
) -> jnp.ndarray:
    """Ground-truth patch overlap ratios (reference data_utils.py:830-914).

    Returns the DENSE (M, N) float32 overlap matrix: entry (i, j) is the
    reference's ``corr_overlaps`` for pair (i, j) and 0 elsewhere — the
    reference's (C, 2)+(C,) sparse form is exactly this matrix's nonzero
    set. The enclosing-sphere pre-filter is applied as a mask (it zeroes
    pairs the reference never scores; for such pairs the true overlap is 0
    anyway). Patch pairs are scored in ``row_chunk`` ref-node chunks so the
    (chunk, N, K, K) distance block stays small and static.
    """
    M, K = ref_knn_points.shape[:2]
    N = src_knn_points.shape[0]
    R, t = transform[:3, :3], transform[:3, 3]
    src_nodes = (src_nodes - t[None, :]) @ R
    src_knn_points = (src_knn_points - t[None, None, :]) @ R

    ref_masks = jnp.ones(M, bool) if ref_masks is None else ref_masks
    src_masks = jnp.ones(N, bool) if src_masks is None else src_masks
    ref_knn_masks = jnp.ones((M, K), bool) if ref_knn_masks is None else ref_knn_masks
    src_knn_masks = jnp.ones((N, K), bool) if src_knn_masks is None else src_knn_masks

    node_mask_mat = ref_masks[:, None] & src_masks[None, :]
    ref_max = jnp.max(
        jnp.where(ref_knn_masks, jnp.linalg.norm(ref_knn_points - ref_nodes[:, None], axis=-1), 0.0), axis=1
    )
    src_max = jnp.max(
        jnp.where(src_knn_masks, jnp.linalg.norm(src_knn_points - src_nodes[:, None], axis=-1), 0.0), axis=1
    )
    dist = jnp.sqrt(jnp.maximum(pairwise_sqdist(ref_nodes[None], src_nodes[None])[0], 0.0))
    intersect = (ref_max[:, None] + src_max[None, :] + pos_radius - dist > 0) & node_mask_mat

    r2 = pos_radius * pos_radius
    ref_cnt = jnp.sum(ref_knn_masks, axis=1).astype(jnp.float32)  # (M,)
    src_cnt = jnp.sum(src_knn_masks, axis=1).astype(jnp.float32)  # (N,)

    # pick the largest divisor of M <= row_chunk so the default works at any
    # node count (the reference pipeline uses M=196, which 16 doesn't divide)
    while M % row_chunk != 0:
        row_chunk -= 1

    def chunk(i0):
        rp = jax.lax.dynamic_slice_in_dim(ref_knn_points, i0, row_chunk)  # (C, K, 3)
        rm = jax.lax.dynamic_slice_in_dim(ref_knn_masks, i0, row_chunk)  # (C, K)
        # (C, N, K, K) pairwise point distances between patches
        d2 = jnp.sum(
            (rp[:, None, :, None, :] - src_knn_points[None, :, None, :, :]) ** 2, axis=-1
        )
        pm = rm[:, None, :, None] & src_knn_masks[None, :, None, :]
        ov = (d2 < r2) & pm
        ref_oc = jnp.sum(jnp.any(ov, axis=3), axis=2).astype(jnp.float32)  # (C, N)
        src_oc = jnp.sum(jnp.any(ov, axis=2), axis=2).astype(jnp.float32)  # (C, N)
        rc = jax.lax.dynamic_slice_in_dim(ref_cnt, i0, row_chunk)
        return 0.5 * (ref_oc / jnp.maximum(rc[:, None], 1.0) + src_oc / jnp.maximum(src_cnt[None, :], 1.0))

    overlaps = jax.lax.map(chunk, jnp.arange(0, M, row_chunk)).reshape(M, N)
    return jnp.where(intersect, overlaps, 0.0)


def point2node_correspondences(
    src_nodes: jnp.ndarray,  # (M1, 3)
    src_points: jnp.ndarray,  # (N1, 3)
    tgt_nodes: jnp.ndarray,  # (M2, 3)
    tgt_points: jnp.ndarray,  # (N2, 3)
    point_correspondences: jnp.ndarray,  # (Kc, 2) int [src_idx, tgt_idx], padded
    corr_mask: Optional[jnp.ndarray] = None,  # (Kc,) bool validity of each row
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Node-correspondence distributions from GT point correspondences
    (reference data_utils.py:526-616).

    The reference's unique/scatter steps become one-hot MXU contractions:
    visible-point sets are dense masks, and the per-node-pair
    correspondence counts are ``one_hot(src_node)^T @ one_hot(tgt_node)``
    — one-hot accumulation yields exactly the multiplicities the
    reference's ``unique(index, return_counts)`` scatter assigns.

    Returns the reference's pair:
      node_corr_norm_row: (M2 + 1, M1) — cat((1-src_node_vis), row_norm).T
      node_corr_norm_col: (M1 + 1, M2) — cat((1-tgt_node_vis), col_norm)
    """
    M1 = src_nodes.shape[0]
    M2 = tgt_nodes.shape[0]
    N1 = src_points.shape[0]
    N2 = tgt_points.shape[0]
    Kc = point_correspondences.shape[0]
    if corr_mask is None:
        corr_mask = jnp.ones((Kc,), bool)

    src_idx = point2node(src_nodes, src_points)  # (N1,)
    tgt_idx = point2node(tgt_nodes, tgt_points)  # (N2,)

    # per-node totals (ones() default then overwritten where a count exists)
    src_tot = jnp.sum(src_idx[:, None] == jnp.arange(M1)[None, :], axis=0).astype(jnp.float32)
    src_tot = jnp.maximum(src_tot, 1.0)
    tgt_tot = jnp.sum(tgt_idx[:, None] == jnp.arange(M2)[None, :], axis=0).astype(jnp.float32)
    tgt_tot = jnp.maximum(tgt_tot, 1.0)

    # visible point masks: a point is visible if it appears in any valid
    # correspondence row (reference: scatter 1.0 then nonzero — a SET, so
    # duplicate appearances count once)
    src_vis_pt = jnp.zeros((N1,), jnp.float32).at[
        jnp.where(corr_mask, point_correspondences[:, 0], N1)
    ].set(1.0, mode="drop")
    tgt_vis_pt = jnp.zeros((N2,), jnp.float32).at[
        jnp.where(corr_mask, point_correspondences[:, 1], N2)
    ].set(1.0, mode="drop")

    src_vis_num = jnp.zeros((M1,), jnp.float32).at[src_idx].add(src_vis_pt)
    tgt_vis_num = jnp.zeros((M2,), jnp.float32).at[tgt_idx].add(tgt_vis_pt)
    src_node_vis = src_vis_num / src_tot  # (M1,)
    tgt_node_vis = tgt_vis_num / tgt_tot  # (M2,)

    # per-node-pair correspondence counts via one-hot contraction
    sc = jnp.where(corr_mask, src_idx[point_correspondences[:, 0]], M1)
    tc = jnp.where(corr_mask, tgt_idx[point_correspondences[:, 1]], M2)
    oh_s = jax.nn.one_hot(sc, M1, dtype=jnp.float32)  # (Kc, M1); invalid -> all-zero row
    oh_t = jax.nn.one_hot(tc, M2, dtype=jnp.float32)
    counts = oh_s.T @ oh_t  # (M1, M2)

    row_norm = counts / (jnp.sum(counts, axis=1, keepdims=True) + 1e-10) * src_node_vis[:, None]
    col_norm = counts / (jnp.sum(counts, axis=0, keepdims=True) + 1e-10) * tgt_node_vis[None, :]

    node_corr_norm_row = jnp.concatenate([(1.0 - src_node_vis)[:, None], row_norm], axis=1).T  # (M2+1, M1)
    node_corr_norm_col = jnp.concatenate([(1.0 - tgt_node_vis)[None, :], col_norm], axis=0)  # (M1+1, M2)
    return node_corr_norm_row, node_corr_norm_col
