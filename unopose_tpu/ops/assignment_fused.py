"""Fused dual-softmax soft-assignment over the fine similarity matrix.

The inference fine stage consumes the (B, 2049, 2049) similarity matrix
through: row softmax x col softmax x score outer product -> mutual-argmax
foreground masks -> row-normalized soft correspondences (reference
model_utils.py:527-566 + oneref_predator_fine_point_matching.py:86-90; the
"long-context analog" SURVEY section 5.7 flags for fusion). As XLA ops the
matrix and several same-sized products round-trip HBM repeatedly.

This module computes the whole chain in three flash-style Pallas sweeps
that rebuild A = f1n @ f2n^T tile-by-tile on the MXU (the rebuild costs
~0.2 ms/sweep at the operating point — far less than one 268MB HBM pass):

  sweep 1: online column softmax stats (max, sum-of-exp) over row tiles.
  sweep 2: per-row softmax stats are tile-local (the full row is in VMEM);
           emits row argmax of pred (-> label1) and online col argmax
           (-> label2).
  sweep 3: masked accumulation of A' = pred * w1 * w2 (bg stripped):
           row sums (procrustes weights) and A' @ pts2 numerators.

The similarity matrix never exists in HBM. Matmul precision matches the
XLA path (bf16 operands, fp32 accumulation - the TPU default truncates
fp32 matmul operands to bf16 anyway).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_NEG = -1e30


def _pad_to(x, n, axis, value=0.0):
    pad = n - x.shape[axis]
    if pad <= 0:
        return x
    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, pad)
    return jnp.pad(x, widths, constant_values=value)


def _colstats_kernel(f1_ref, f2_ref, cm_ref, cs_ref, *, m1: int, tile: int):
    b, j = pl.program_id(0), pl.program_id(1)
    del b
    a = jax.lax.dot_general(
        f1_ref[0], f2_ref[0], (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )  # (tile, M2p)
    row0 = j * tile
    rows = jax.lax.broadcasted_iota(jnp.int32, a.shape, 0) + row0
    a = jnp.where(rows < m1, a, _NEG)

    tile_max = jnp.max(a, axis=0, keepdims=True)  # (1, M2p)
    @pl.when(j == 0)
    def _():
        cm_ref[0] = jnp.full_like(cm_ref[0], _NEG)
        cs_ref[0] = jnp.zeros_like(cs_ref[0])
    old_m = cm_ref[0]
    new_m = jnp.maximum(old_m, tile_max)
    tile_sum = jnp.sum(jnp.exp(a - new_m), axis=0, keepdims=True)
    cs_ref[0] = cs_ref[0] * jnp.exp(old_m - new_m) + tile_sum
    cm_ref[0] = new_m


def _pred_tile(a, cm, cs, s1_tile, s2, m2: int):
    """pred = rowsoftmax(a) * colsoftmax(a) * s1 * s2 for one row tile.

    a: (tile, M2p) logits with col pads already at _NEG.
    """
    rm = jnp.max(a, axis=1, keepdims=True)
    re = jnp.exp(a - rm)
    rs = jnp.sum(re, axis=1, keepdims=True)
    p_row = re / rs
    p_col = jnp.exp(a - cm) / jnp.maximum(cs, 1e-30)
    return p_row * p_col * s1_tile * s2


def _argmax_kernel(
    f1_ref, f2_ref, cm_ref, cs_ref, s1_ref, s2_ref, lab1_ref, lab2_ref,
    best_v, best_i, *, m1: int, m2: int, tile: int,
):
    b, j = pl.program_id(0), pl.program_id(1)
    del b
    a = jax.lax.dot_general(
        f1_ref[0], f2_ref[0], (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )
    cols = jax.lax.broadcasted_iota(jnp.int32, a.shape, 1)
    a = jnp.where(cols < m2, a, _NEG)
    row0 = j * tile
    rows_l = jax.lax.broadcasted_iota(jnp.int32, a.shape, 0)
    s1_tile = s1_ref[0, 0, pl.ds(row0, tile)][:, None]
    pred = _pred_tile(a, cm_ref[0], cs_ref[0], s1_tile, s2_ref[0], m2)
    # pad rows contribute zero everywhere (s1 pad = 0); make their argmax 0
    pred = jnp.where(rows_l + row0 < m1, pred, 0.0)

    # label1: first-occurrence argmax over columns (full row is local);
    # the output block is the full (1, M1p) row revisited across j — write
    # this tile's slice
    lab1_ref[0, 0, pl.ds(row0, tile)] = jnp.argmax(pred, axis=1).astype(jnp.int32)

    # label2: online first-occurrence argmax over rows
    @pl.when(j == 0)
    def _():
        best_v[...] = jnp.full_like(best_v, -1.0)
        best_i[...] = jnp.zeros_like(best_i)
    tile_best = jnp.max(pred, axis=0, keepdims=True)  # (1, M2p)
    tile_arg = jnp.argmax(pred, axis=0).astype(jnp.int32)[None, :] + row0
    take = tile_best > best_v[...]
    best_i[...] = jnp.where(take, tile_arg, best_i[...])
    best_v[...] = jnp.where(take, tile_best, best_v[...])

    @pl.when(j == pl.num_programs(1) - 1)
    def _():
        lab2_ref[0] = best_i[...]


def _accum_kernel(
    f1_ref, f2_ref, cm_ref, cs_ref, s1_ref, s2_ref, w1_ref, w2_ref,
    p2x_ref, p2y_ref, p2z_ref, wsum_ref, nx_ref, ny_ref, nz_ref,
    *, m1: int, m2: int, tile: int,
):
    b, j = pl.program_id(0), pl.program_id(1)
    del b
    a = jax.lax.dot_general(
        f1_ref[0], f2_ref[0], (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )
    cols = jax.lax.broadcasted_iota(jnp.int32, a.shape, 1)
    a = jnp.where(cols < m2, a, _NEG)
    row0 = j * tile
    s1_tile = s1_ref[0, 0, pl.ds(row0, tile)][:, None]
    pred = _pred_tile(a, cm_ref[0], cs_ref[0], s1_tile, s2_ref[0], m2)

    # A' = pred[:, 1:, 1:] * w1 * w2 — strip bg row/col, apply mutual masks
    w1_tile = w1_ref[0, 0, pl.ds(row0, tile)][:, None]
    rows_g = jax.lax.broadcasted_iota(jnp.int32, a.shape, 0) + row0
    keep = (cols >= 1) & (cols < m2) & (rows_g >= 1) & (rows_g < m1)
    ap = jnp.where(keep, pred * w1_tile * w2_ref[0], 0.0)

    wsum_ref[0, 0, pl.ds(row0, tile)] = jnp.sum(ap, axis=1)
    nx_ref[0, 0, pl.ds(row0, tile)] = jnp.sum(ap * p2x_ref[0], axis=1)
    ny_ref[0, 0, pl.ds(row0, tile)] = jnp.sum(ap * p2y_ref[0], axis=1)
    nz_ref[0, 0, pl.ds(row0, tile)] = jnp.sum(ap * p2z_ref[0], axis=1)


def fine_assignment_fused(
    feat1: jnp.ndarray,  # (B, M1, C) out_proj'd fine features incl. bg token
    feat2: jnp.ndarray,  # (B, M2, C)
    score: jnp.ndarray,  # (B, (M1-1)+(M2-1)) sigmoid overlap scores
    pts2: jnp.ndarray,  # (B, M2-1, 3) reference cloud
    temp: float = 0.1,
    tile: int = 256,
    interpret: bool = False,
):
    """Returns (pred_pts (B, M1-1, 3), weights (B, M1-1), label1 (B, M1-1)).

    Exactly the quantities `compute_fine_Rt_overlap` derives from the
    materialized similarity matrix: row-normalized soft target points
    (numerator/rowsum), A' row sums, and the foreground argmax labels.
    """
    B, M1, C = feat1.shape
    M2 = feat2.shape[1]
    n1, n2 = M1 - 1, M2 - 1

    f1n = feat1.astype(jnp.float32)
    f2n = feat2.astype(jnp.float32)
    f1n = f1n / (jnp.linalg.norm(f1n, axis=-1, keepdims=True) + 1e-12)
    f2n = f2n / (jnp.linalg.norm(f2n, axis=-1, keepdims=True) + 1e-12)
    f1n = (f1n / temp).astype(jnp.bfloat16)
    f2n = f2n.astype(jnp.bfloat16)

    def rup(x, m):
        return ((x + m - 1) // m) * m

    M1p = rup(M1, tile)
    M2p = rup(M2, 128)
    T = M1p // tile
    f1p = _pad_to(f1n, M1p, 1)
    f2p = _pad_to(f2n, M2p, 1)
    s1 = jnp.concatenate([jnp.ones((B, 1), jnp.float32), score[:, :n1].astype(jnp.float32)], axis=1)
    s2 = jnp.concatenate([jnp.ones((B, 1), jnp.float32), score[:, n1:].astype(jnp.float32)], axis=1)
    s1p = _pad_to(s1, M1p, 1)[:, None, :]  # (B, 1, M1p)
    s2p = _pad_to(s2, M2p, 1)[:, None, :]  # (B, 1, M2p)

    grid = (B, T)
    tile_spec = pl.BlockSpec((1, tile, C), lambda b, j: (b, j, 0), memory_space=pltpu.VMEM)
    full2 = pl.BlockSpec((1, M2p, C), lambda b, j: (b, 0, 0), memory_space=pltpu.VMEM)
    row_m2 = pl.BlockSpec((1, 1, M2p), lambda b, j: (b, 0, 0), memory_space=pltpu.VMEM)
    row_m1 = pl.BlockSpec((1, 1, M1p), lambda b, j: (b, 0, 0), memory_space=pltpu.VMEM)

    # sweep 1: column softmax stats
    cm, cs = pl.pallas_call(
        functools.partial(_colstats_kernel, m1=M1, tile=tile),
        grid=grid,
        in_specs=[tile_spec, full2],
        out_specs=(row_m2, row_m2),
        out_shape=(
            jax.ShapeDtypeStruct((B, 1, M2p), jnp.float32),
            jax.ShapeDtypeStruct((B, 1, M2p), jnp.float32),
        ),
        interpret=interpret,
    )(f1p, f2p)

    # sweep 2: labels
    lab1, lab2 = pl.pallas_call(
        functools.partial(_argmax_kernel, m1=M1, m2=M2, tile=tile),
        grid=grid,
        in_specs=[tile_spec, full2, row_m2, row_m2, row_m1, row_m2],
        out_specs=(row_m1, row_m2),
        out_shape=(
            jax.ShapeDtypeStruct((B, 1, M1p), jnp.int32),
            jax.ShapeDtypeStruct((B, 1, M2p), jnp.int32),
        ),
        scratch_shapes=[pltpu.VMEM((1, M2p), jnp.float32), pltpu.VMEM((1, M2p), jnp.int32)],
        interpret=interpret,
    )(f1p, f2p, cm, cs, s1p, s2p)
    label_full = lab1[:, 0, 1:M1]  # (B, n1) over M2 cols (0 = bg)
    label2 = lab2[:, 0, 1:M2]  # (B, n2) over M1 rows (0 = bg)

    w1 = (label_full > 0).astype(jnp.float32)
    w2 = (label2 > 0).astype(jnp.float32)
    w1p = _pad_to(jnp.concatenate([jnp.zeros((B, 1), jnp.float32), w1], axis=1), M1p, 1)[:, None, :]
    w2p = _pad_to(jnp.concatenate([jnp.zeros((B, 1), jnp.float32), w2], axis=1), M2p, 1)[:, None, :]

    # pts2 planes aligned to columns 1..M2-1
    p2 = pts2.astype(jnp.float32)
    planes = []
    for k in range(3):
        pk = jnp.concatenate([jnp.zeros((B, 1), jnp.float32), p2[..., k]], axis=1)
        planes.append(_pad_to(pk, M2p, 1)[:, None, :])

    wsum, nx, ny, nz = pl.pallas_call(
        functools.partial(_accum_kernel, m1=M1, m2=M2, tile=tile),
        grid=grid,
        in_specs=[tile_spec, full2, row_m2, row_m2, row_m1, row_m2, row_m1, row_m2]
        + [row_m2] * 3,
        out_specs=(row_m1, row_m1, row_m1, row_m1),
        out_shape=tuple(jax.ShapeDtypeStruct((B, 1, M1p), jnp.float32) for _ in range(4)),
        interpret=interpret,
    )(f1p, f2p, cm, cs, s1p, s2p, w1p, w2p, *planes)

    def unpack(x):
        return x[:, 0, 1:M1]  # (B, n1)

    weights = unpack(wsum)
    num = jnp.stack([unpack(nx), unpack(ny), unpack(nz)], axis=-1)  # (B, n1, 3)
    pred_pts = num / (weights[..., None] + 1e-6)
    return pred_pts, weights, label_full


def compute_fine_Rt_overlap_fused(
    feat1: jnp.ndarray,
    feat2: jnp.ndarray,
    score: jnp.ndarray,
    pts1: jnp.ndarray,
    pts2: jnp.ndarray,
    model_pts: jnp.ndarray | None = None,
    temp: float = 0.1,
    dis_thres: float = 0.15,
    interpret: bool = False,
):
    """Drop-in fused variant of ops/solver.compute_fine_Rt_overlap that takes
    the projected features instead of the materialized similarity matrix."""
    from unopose_tpu.ops.geometry import pairwise_sqdist
    from unopose_tpu.ops.procrustes import weighted_procrustes

    pts1 = pts1.astype(jnp.float32)
    pts2 = pts2.astype(jnp.float32)
    if model_pts is None:
        model_pts = pts2

    pred_pts, weights, label1 = fine_assignment_fused(
        feat1, feat2, score, pts2, temp=temp, interpret=interpret
    )
    R, t = weighted_procrustes(pred_pts, pts1, weights, weight_thresh=0.001)

    proj = jnp.matmul(pts1 - t[:, None, :], R)
    d = jnp.sqrt(jnp.maximum(pairwise_sqdist(proj, model_pts).min(axis=2), 0.0))
    mask = (label1 > 0).astype(jnp.float32)
    inlier = (d < dis_thres).astype(jnp.float32)
    pose_score = jnp.sum(inlier * mask, axis=1) / (jnp.sum(mask, axis=1) + 1e-8)
    pose_score = pose_score * jnp.mean(mask, axis=1)
    # max pre-threshold WSVD row weight: > 0.001 means the weighted
    # Procrustes ran in its nominal regime (not the identity fallback) —
    # the vacuousness gate for accuracy studies (weight_thresh semantics:
    # reference model_utils.py:527-566)
    max_w = jnp.max(weights, axis=1)
    return R, t, pose_score, max_w
