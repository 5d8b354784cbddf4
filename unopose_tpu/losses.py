"""Training losses: overlap (predator) BCE + bidirectional correspondence CE.

JAX counterparts of reference core/unopose/utils/loss_utils.py:108-274.
All functions are pure, batched, and return per-sample values; the engine
averages and sums them (process_loss)."""

from __future__ import annotations

from typing import Dict, List, Sequence

import jax
import jax.numpy as jnp

from unopose_tpu.ops.fps import gather_points
from unopose_tpu.ops.geometry import pairwise_sqdist


def weighted_bce(prediction: jnp.ndarray, gt: jnp.ndarray, eps: float = 1e-7) -> jnp.ndarray:
    """Class-balanced binary cross entropy (reference loss_utils.py:108-129).

    prediction, gt: (B, N) in [0, 1]. Positive elements are weighted by the
    negative fraction and vice versa. Returns (B,) per-sample means.
    """
    p = jnp.clip(prediction.astype(jnp.float32), eps, 1.0 - eps)
    ce = -(gt * jnp.log(p) + (1.0 - gt) * jnp.log(1.0 - p))
    w_neg = jnp.mean(gt, axis=1, keepdims=True)
    w_pos = 1.0 - w_neg
    weights = jnp.where(gt >= 0.5, w_pos, w_neg)
    return jnp.mean(weights * ce, axis=1)


def _softmax_ce_with_labels(logits: jnp.ndarray, labels: jnp.ndarray) -> jnp.ndarray:
    """Cross entropy over the last axis at integer labels; (B, N) means."""
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    picked = jnp.take_along_axis(logp, labels[..., None], axis=-1)[..., 0]
    return -jnp.mean(picked, axis=-1)


def compute_overlap_loss(
    atten_list: Sequence[jnp.ndarray],
    score_list: Sequence[jnp.ndarray],
    saliency_list: Sequence[jnp.ndarray],
    pts1: jnp.ndarray,
    pts2: jnp.ndarray,
    gt_r: jnp.ndarray,
    gt_t: jnp.ndarray,
    predator_thres: float = 0.15,
    dis_thres: float = 0.15,
    loss_str: str = "coarse",
) -> Dict[str, jnp.ndarray]:
    """Core training loss (reference loss_utils.py:132-203).

    GT overlap: points of either cloud with any counterpart within
    ``predator_thres`` after applying the GT pose. Per evaluated block:
    weighted BCE on the overlap score and saliency, plus bidirectional CE on
    the similarity logits with bg class 0 (labels = nearest-index + 1 when
    within ``dis_thres``). Also emits acc / fg_num / mean-fg-distance metrics.
    """
    out: Dict[str, jnp.ndarray] = {}
    B, n1 = pts1.shape[:2]
    pts1 = pts1.astype(jnp.float32)
    pts2 = pts2.astype(jnp.float32)
    gt_pts = jnp.matmul(pts1 - gt_t[:, None, :].astype(jnp.float32), gt_r.astype(jnp.float32))
    dis_mat = jnp.sqrt(pairwise_sqdist(gt_pts, pts2))  # (B, n1, n2)

    ov1 = jnp.any(dis_mat <= predator_thres, axis=2)
    ov2 = jnp.any(dis_mat <= predator_thres, axis=1)
    gt_overlap = jnp.concatenate([ov1, ov2], axis=1).astype(jnp.float32)  # (B, n1+n2)

    for idx, score in enumerate(score_list):
        out[f"{loss_str}_score_loss{idx}"] = weighted_bce(score, gt_overlap)
    for idx, sal in enumerate(saliency_list):
        out[f"{loss_str}_saliency_loss{idx}"] = weighted_bce(sal, gt_overlap)

    dis1 = jnp.min(dis_mat, axis=2)
    lab1 = jnp.argmin(dis_mat, axis=2)
    label1 = jnp.where(dis1 <= dis_thres, lab1 + 1, 0)  # (B, n1) in [0, n2]
    dis2 = jnp.min(dis_mat, axis=1)
    lab2 = jnp.argmin(dis_mat, axis=1)
    label2 = jnp.where(dis2 <= dis_thres, lab2 + 1, 0)  # (B, n2) in [0, n1]

    for idx, atten in enumerate(atten_list):
        # rows: each of the n1 points classifies over [bg + n2] columns
        l1 = _softmax_ce_with_labels(atten[:, 1:, :], label1)
        # cols: each of the n2 points classifies over [bg + n1] rows
        l2 = _softmax_ce_with_labels(jnp.swapaxes(atten[:, :, 1:], 1, 2), label2)
        out[f"{loss_str}_atten_loss{idx}"] = 0.5 * (l1 + l2)

    pred_label = jnp.argmax(atten_list[-1][:, 1:, :], axis=2)  # (B, n1)
    out[f"{loss_str}_acc"] = jnp.mean((pred_label == label1).astype(jnp.float32), axis=1)
    fg_mask = (pred_label > 0).astype(jnp.float32)
    out[f"{loss_str}_fg_num"] = jnp.sum(fg_mask, axis=1)
    fg_label = (fg_mask * (pred_label - 1)).astype(jnp.int32)
    pred_pts = gather_points(pts2, fg_label)
    pred_dis = jnp.linalg.norm(pred_pts - gt_pts, axis=2)
    out[f"{loss_str}_dis"] = jnp.sum(pred_dis * fg_mask, axis=1) / (jnp.sum(fg_mask, axis=1) + 1e-8)
    return out


def compute_soft_loss(
    atten_list: Sequence[jnp.ndarray],
    node_corr_norm_row: jnp.ndarray,
    node_corr_norm_col: jnp.ndarray,
    loss_str: str = "coarse_soft",
) -> Dict[str, jnp.ndarray]:
    """Optional node-overlap supervision (reference loss_utils.py:86-105):
    soft cross entropy of the similarity logits against normalized node-
    correspondence rows/cols. Off in the main config (softloss_weight=0).

    node_corr_norm_row: (B, n1, n2+1) soft targets over [bg + n2] per row.
    node_corr_norm_col: (B, n2, n1+1) soft targets over [bg + n1] per col.
    """
    out = {}
    for idx, atten in enumerate(atten_list):
        a = atten.astype(jnp.float32)
        lp_row = jax.nn.log_softmax(a[:, 1:, :], axis=-1)  # (B, n1, n2+1)
        l1 = -jnp.mean(jnp.sum(node_corr_norm_row * lp_row, axis=-1), axis=-1)
        lp_col = jax.nn.log_softmax(jnp.swapaxes(a[:, :, 1:], 1, 2), axis=-1)  # (B, n2, n1+1)
        l2 = -jnp.mean(jnp.sum(node_corr_norm_col * lp_col, axis=-1), axis=-1)
        out[f"{loss_str}_loss{idx}"] = 0.5 * (l1 + l2)
    return out


def node_correspondence_targets(
    nodes1: jnp.ndarray,
    nodes2: jnp.ndarray,
    gt_r: jnp.ndarray,
    gt_t: jnp.ndarray,
    sigma: float = 0.15,
) -> tuple:
    """Soft node-correspondence targets from GT-aligned node distances:
    rows/cols of exp(-d^2 / sigma^2) with an extra bg column whose mass is
    the non-overlap residual, normalized to distributions. A light-weight
    stand-in for the GeoTransformer superpoint-overlap machinery the
    reference's (disabled) soft loss consumes (data_utils.py:830-914)."""
    gt_pts = jnp.matmul(nodes1 - gt_t[:, None, :], gt_r)
    d2 = pairwise_sqdist(gt_pts, nodes2)
    aff = jnp.exp(-d2 / (sigma * sigma))  # (B, n1, n2)
    row_fg = aff / (jnp.sum(aff, axis=2, keepdims=True) + 1.0)
    row_bg = 1.0 - jnp.sum(row_fg, axis=2, keepdims=True)
    row = jnp.concatenate([row_bg, row_fg], axis=2)  # (B, n1, n2+1)
    col_fg = jnp.swapaxes(aff, 1, 2) / (jnp.sum(aff, axis=1, keepdims=True).swapaxes(1, 2) + 1.0)
    col_bg = 1.0 - jnp.sum(col_fg, axis=2, keepdims=True)
    col = jnp.concatenate([col_bg, col_fg], axis=2)  # (B, n2, n1+1)
    return row, col


def weighted_circle_loss(
    pos_masks: jnp.ndarray,
    neg_masks: jnp.ndarray,
    feat_dists: jnp.ndarray,
    pos_scales: jnp.ndarray,
    pos_margin: float = 0.1,
    neg_margin: float = 1.4,
    pos_optimal: float = 0.1,
    neg_optimal: float = 1.4,
    log_scale: float = 24.0,
) -> jnp.ndarray:
    """Weighted circle loss (GeoTransformer; reference loss_utils.py:9-38
    path). feat_dists (B, n, m); masks/scales same shape. Returns (B,)."""
    d = feat_dists.astype(jnp.float32)
    pos_w = jnp.maximum(d - pos_optimal, 0.0) * pos_scales
    neg_w = jnp.maximum(neg_optimal - d, 0.0)
    lse_pos = jax.nn.logsumexp(
        jnp.where(pos_masks, log_scale * (d - pos_margin) * pos_w, -jnp.inf), axis=(-2, -1)
    )
    lse_neg = jax.nn.logsumexp(
        jnp.where(neg_masks, log_scale * (neg_margin - d) * neg_w, -jnp.inf), axis=(-2, -1)
    )
    return jax.nn.softplus(lse_pos + lse_neg) / log_scale


def process_loss(end_points: Dict[str, jnp.ndarray]) -> Dict[str, jnp.ndarray]:
    """Sum every coarse_*/fine_* key containing 'loss', clamp at 100, mean
    over batch (reference loss_utils.py:265-274)."""
    out = {}
    total = 0.0
    for key in sorted(end_points.keys()):
        if "coarse_" in key or "fine_" in key:
            out[key] = jnp.mean(end_points[key])
            if "loss" in key:
                total = total + end_points[key]
    out["loss"] = jnp.mean(jnp.clip(total, max=100.0))
    return out
