"""Fused coarse-hypothesis selection (MEASURED NEGATIVE — not wired in):
transform -> nearest-model-distance -> inlier-weighted score per
hypothesis, without the (B, P2, N1, N2) distance tensor (~740MB fp32 at
the defaults) ever existing in HBM. On the chip the full model measured
57.8 vs 55.4 ms with this kernel replacing the XLA selection pass: 4800
serialized per-hypothesis pipelines of tiny (K=3) matmuls + (256, 256)
VPU min-reductions lose to XLA's big batched GEMMs despite the HBM
traffic they avoid. Kept with its oracle test
(tests/test_solver.py::test_hypothesis_select_kernel_matches_xla) as the
documented negative and a starting point for a multi-hypothesis-batched
variant.

Replaces the XLA selection pass of ops/solver.compute_coarse_Rt_overlap
(reference model_utils.py:470-490: score = sum(w1) / (sum(d * w1) + 1e-8)
with d = min-over-model sqrt distance of the back-transformed points).
Per (batch, 128-hypothesis block), each hypothesis's whole pipeline runs in
VMEM: TP = (pts1 - t) @ R (DEFAULT bf16 matmul — parity with the XLA
path's jnp.matmul), the model cross term as a 3-pass bf16x3 dot
(HIGHEST-grade, matching ops/geometry.pairwise_sqdist's correctness
requirement — a plain bf16 cross term suffers catastrophic cancellation on
camera-frame clouds), min over the model axis, sqrt, and the w1-weighted
sum. The kernel emits the per-hypothesis weighted-distance sums; the
cheap final division happens in XLA.

Pads: N1/N2 pad to 128 multiples with w1 = 0 rows (no score contribution)
and far-away model points (never the min).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_HBLK = 128


def _kernel(
    p1_ref,  # (1, N1p, 3) f32 pts1
    rs_ref,  # (1, HBLK, 3, 3) f32
    ts_ref,  # (1, HBLK, 3) f32
    mx_ref,  # (1, 3, N2p) f32 model planes (padded points at +1e6)
    mn_ref,  # (1, 1, N2p) f32 |m|^2
    w1_ref,  # (1, 1, N1p) f32 (pad rows 0)
    out_ref,  # (1, 1, 8, HBLK) f32 weighted-distance sums (8 copied rows)
    *, n1p: int, n2p: int,
):
    p1 = p1_ref[0]  # (N1p, 3)
    M = mx_ref[0]  # (3, N2p)
    mn = mn_ref[0]  # (1, N2p)
    w1 = w1_ref[0]  # (1, N1p)
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, _HBLK), 1)
    acc = jnp.zeros((1, _HBLK), jnp.float32)
    for h in range(_HBLK):
        R = rs_ref[0, h]  # (3, 3)
        t = ts_ref[0, h].reshape(1, 3)
        tp = jax.lax.dot_general(
            (p1 - t).astype(jnp.bfloat16), R.astype(jnp.bfloat16),
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (N1p, 3) — DEFAULT-precision parity with the XLA path
        tpn = jnp.sum(tp * tp, axis=1, keepdims=True)  # (N1p, 1)
        # 3-pass bf16x3 cross term (see module docstring)
        tp_h = tp.astype(jnp.bfloat16)
        tp_l = (tp - tp_h.astype(jnp.float32)).astype(jnp.bfloat16)
        M_h = M.astype(jnp.bfloat16)
        M_l = (M - M_h.astype(jnp.float32)).astype(jnp.bfloat16)
        dot = lambda a, b: jax.lax.dot_general(
            a, b, dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        xy = dot(tp_h, M_h) + (dot(tp_h, M_l) + dot(tp_l, M_h))  # (N1p, N2p)
        d2 = jnp.maximum((tpn - 2.0 * xy) + mn, 0.0)
        d = jnp.sqrt(jnp.min(d2, axis=1, keepdims=True))  # (N1p, 1) min-then-sqrt
        s = jax.lax.dot_general(
            w1, d, dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (1, 1)
        acc = acc + jnp.where(lane == h, s, 0.0)
    out_ref[0, 0] = pltpu.repeat(acc, 8, 0)


def hypothesis_select_scores(
    pts1: jnp.ndarray,  # (B, N1, 3) f32
    model_pts: jnp.ndarray,  # (B, N2, 3) f32
    rs: jnp.ndarray,  # (B, P2, 3, 3) f32
    ts: jnp.ndarray,  # (B, P2, 3) f32
    w1: jnp.ndarray,  # (B, N1) f32 inlier weights
    interpret: bool = False,
) -> jnp.ndarray:
    """Returns (B, P2) scores = sum(w1) / (sum(d * w1) + 1e-8), matching
    ops/solver's ``_sel_scores`` without materializing (B, P2, N1, N2)."""
    B, N1, _ = pts1.shape
    N2 = model_pts.shape[1]
    P2 = rs.shape[1]
    n1p = -(-N1 // 128) * 128
    n2p = -(-N2 // 128) * 128
    p2p = -(-P2 // _HBLK) * _HBLK

    p1 = jnp.pad(pts1.astype(jnp.float32), ((0, 0), (0, n1p - N1), (0, 0)))
    w1p = jnp.pad(w1.astype(jnp.float32), ((0, 0), (0, n1p - N1)))[:, None, :]
    # pad model points far away: never the min for real points; pad pts1
    # rows see them but carry w1 = 0
    mp = jnp.pad(
        model_pts.astype(jnp.float32), ((0, 0), (0, n2p - N2), (0, 0)),
        constant_values=1e6,
    )
    mx = jnp.swapaxes(mp, 1, 2)  # (B, 3, N2p)
    mn = jnp.sum(mp * mp, axis=2)[:, None, :]  # (B, 1, N2p)
    rsp = jnp.pad(rs.astype(jnp.float32), ((0, 0), (0, p2p - P2), (0, 0), (0, 0)))
    tsp = jnp.pad(ts.astype(jnp.float32), ((0, 0), (0, p2p - P2), (0, 0)))

    grid = (B, p2p // _HBLK)
    kern = functools.partial(_kernel, n1p=n1p, n2p=n2p)
    sums = pl.pallas_call(
        kern,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, n1p, 3), lambda b, j: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, _HBLK, 3, 3), lambda b, j: (b, j, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, _HBLK, 3), lambda b, j: (b, j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 3, n2p), lambda b, j: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, n2p), lambda b, j: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, n1p), lambda b, j: (b, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 1, 8, _HBLK), lambda b, j: (b, j, 0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, p2p // _HBLK, 8, _HBLK), jnp.float32),
        interpret=interpret,
    )(p1, rsp, tsp, mx, mn, w1p)
    dsums = sums[:, :, 0, :].reshape(B, p2p)[:, :P2]
    return jnp.sum(w1, axis=1)[:, None] / (dsums + 1e-8)
