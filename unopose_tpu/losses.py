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
