"""Batched fused hypothesis selection, take 2 (ALSO MEASURED NEGATIVE —
env-gated off: UNOPOSE_HYPSEL_V2=1 enables). Full-model A/B: 55.8 vs
53.6 ms — even with MXU-batched 8-hypothesis tiles the kernel loses ~2 ms
to the XLA selection pass, whose giant batched cross matmul + fused min
the compiler schedules better than our tile pipeline. Selection is
decisively XLA's; both kernel attempts and their measurements are kept as
the record.

The per-hypothesis kernel (ops/hyp_select.py) lost to XLA because its
matmuls were tiny and serialized. This version keeps MXU-friendly shapes:
XLA precomputes the transformed points TP = (pts1 - t) @ R for ALL
hypotheses (a big batched DEFAULT-bf16 matmul, (B, P2, N1, 3) = ~18MB),
and the kernel processes 8-hypothesis tiles whose (8*N1p, 3) rows share
ONE bf16x3 cross contraction against the model planes — (2048, 3) @
(3, N2p) per pass instead of 128 separate (256, 3) @ (3, 3)s. The
(B, P2, N1, N2) distance tensor still never exists in HBM. Min over the
model axis, sqrt, and the w1-weighted per-hypothesis sums run in VMEM;
the final division happens in XLA.

Numerics match ops/solver's ``_sel_scores``: TP is the same DEFAULT-bf16
product; the cross term is bf16x3 (HIGHEST-grade — the x.y cancellation
guard of ops/geometry.pairwise_sqdist); min-then-sqrt.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_HB = 8  # hypotheses per tile


def _kernel(
    tp_ref,  # (1, HB, N1p, 3) f32 transformed points of this hyp tile
    mx_ref,  # (1, 3, N2p) f32 model planes (pads at +1e6)
    mn_ref,  # (1, 1, N2p) f32 |m|^2
    w1c_ref,  # (1, N1p, 1) f32 w1 column (pad rows 0)
    sel_ref,  # (HB, HB*N1p) bf16 block-diagonal ones (segment-sum selector)
    out_ref,  # (1, 1, 8, 128) f32: lane 0 carries each hyp's weighted sum
    *, n1p: int, n2p: int,
):
    tp = tp_ref[0].reshape(_HB * n1p, 3)  # leading-dims merge: free
    M = mx_ref[0]  # (3, N2p)
    mn = mn_ref[0]  # (1, N2p)
    tpn = jnp.sum(tp * tp, axis=1, keepdims=True)  # (HB*N1p, 1)
    tp_h = tp.astype(jnp.bfloat16)
    tp_l = (tp - tp_h.astype(jnp.float32)).astype(jnp.bfloat16)
    M_h = M.astype(jnp.bfloat16)
    M_l = (M - M_h.astype(jnp.float32)).astype(jnp.bfloat16)
    dot = lambda a, b: jax.lax.dot_general(
        a, b, dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    xy = dot(tp_h, M_h) + (dot(tp_h, M_l) + dot(tp_l, M_h))  # (HB*N1p, N2p)
    d2 = jnp.maximum((tpn - 2.0 * xy) + mn, 0.0)
    d = jnp.sqrt(jnp.min(d2, axis=1, keepdims=True))  # (HB*N1p, 1)
    dw = d * pltpu.repeat(w1c_ref[0], _HB, 0)  # (HB*N1p, 1)
    # per-hypothesis sums via a constant block-diagonal selector matmul
    # ((2048, 1) -> (8, 256) reshape would be a sublane->lane relayout)
    sums = jax.lax.dot_general(
        sel_ref[...], dw.astype(jnp.float32),
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (HB, 1)
    out_ref[0, 0] = pltpu.repeat(sums, 128, 1)


def hypothesis_select_scores_v2(
    pts1: jnp.ndarray,  # (B, N1, 3) f32
    model_pts: jnp.ndarray,  # (B, N2, 3) f32
    rs: jnp.ndarray,  # (B, P2, 3, 3) f32
    ts: jnp.ndarray,  # (B, P2, 3) f32
    w1: jnp.ndarray,  # (B, N1) f32
    interpret: bool = False,
) -> jnp.ndarray:
    """(B, P2) scores = sum(w1) / (sum(d * w1) + 1e-8), no (B, P2, N1, N2)."""
    B, N1, _ = pts1.shape
    N2 = model_pts.shape[1]
    P2 = rs.shape[1]
    n1p = -(-N1 // 128) * 128
    n2p = -(-N2 // 128) * 128
    p2p = -(-P2 // _HB) * _HB

    # XLA-side TP: same DEFAULT-bf16 batched matmul as the XLA selection
    tp = jnp.matmul(pts1[:, None] - ts[:, :, None, :], rs)  # (B, P2, N1, 3)
    tp = jnp.pad(tp.astype(jnp.float32), ((0, 0), (0, p2p - P2), (0, n1p - N1), (0, 0)))
    w1c = jnp.pad(w1.astype(jnp.float32), ((0, 0), (0, n1p - N1)))[:, :, None]
    mp = jnp.pad(
        model_pts.astype(jnp.float32), ((0, 0), (0, n2p - N2), (0, 0)),
        constant_values=1e6,
    )
    mx = jnp.swapaxes(mp, 1, 2)
    mn = jnp.sum(mp * mp, axis=2)[:, None, :]

    import numpy as np

    selmat = np.zeros((_HB, _HB * n1p), np.float32)
    for h in range(_HB):
        selmat[h, h * n1p : (h + 1) * n1p] = 1.0
    sel = jnp.asarray(selmat, jnp.bfloat16)

    grid = (B, p2p // _HB)
    kern = functools.partial(_kernel, n1p=n1p, n2p=n2p)
    sums = pl.pallas_call(
        kern,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, _HB, n1p, 3), lambda b, j: (b, j, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 3, n2p), lambda b, j: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, n2p), lambda b, j: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n1p, 1), lambda b, j: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((_HB, _HB * n1p), lambda b, j: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 1, 8, 128), lambda b, j: (b, j, 0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, p2p // _HB, 8, 128), jnp.float32),
        interpret=interpret,
    )(tp, mx, mn, w1c, sel)
    dsums = sums[:, :, :, 0].reshape(B, p2p)[:, :P2]
    return jnp.sum(w1, axis=1)[:, None] / (dsums + 1e-8)
