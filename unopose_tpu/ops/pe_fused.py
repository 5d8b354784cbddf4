"""Fused fine-PE kernel: masked LRF + shared MLP + masked max-pool in VMEM.

The fine matcher's positional encoding (reference
oneref_predator_fine_point_matching.py:138-178) expands every point's
S-sample neighborhood through a 6->32->64->128 shared MLP and max-pools over
samples. As separate XLA ops the (B, {32,64,128}, P, S) activations round-trip
HBM (~7.5GB written+read per 16-pair batch) — the profiled top cost of the
whole forward. This Pallas kernel keeps one (P_blk, S) point-block's entire
pipeline — relative coords, masked per-neighborhood LRF (ops/lrf.py
batch_lrf_planar semantics), both scales' MLPs with inference-folded
BatchNorm, masked max — in VMEM, so only the grouped inputs (B, 3, P, S) and
the (B, 256, P) result touch HBM.

Inference-only (the training path keeps the XLA formulation for batch-stat
updates and gradients). Numerics: MLP matmuls in bf16 with fp32
accumulation — the same contraction precision as the XLA path on TPU
(default matmul precision truncates fp32 operands to bf16); LRF geometry in
fp32.
"""

from __future__ import annotations

import functools
from typing import Sequence

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from unopose_tpu.ops.eig3 import smallest_eigvec_sym3_planar

MLP_DIMS = (32, 64, 128)


def _masked_lrf_block(rx, ry, rz, m, r_lrf: float):
    """batch_lrf_planar on one (P_blk, S) block; m is a 0/1 f32 mask.

    Returns (o0, o1, o2) LRF coordinates scaled by 1/r_lrf. Every
    per-point scalar stays (P_blk, 1) — Mosaic wants >= 2-D values.
    """
    cnt = jnp.maximum(jnp.sum(m, axis=-1, keepdims=True), 1.0)  # (P_blk, 1)
    mean = lambda t: jnp.sum(t * m, axis=-1, keepdims=True) / cnt
    msum = lambda t: jnp.sum(t * m, axis=-1, keepdims=True)

    a = mean(rx * rx)
    b = mean(rx * ry)
    c = mean(rx * rz)
    d = mean(ry * ry)
    e = mean(ry * rz)
    f = mean(rz * rz)
    # use_newton: Mosaic has no acos lowering
    z0, z1, z2 = smallest_eigvec_sym3_planar(a, b, c, d, e, f, use_newton=True)  # (P_blk, 1)

    cp = -(z0 * rx + z1 * ry + z2 * rz)
    vote = msum((cp > 1e-3).astype(jnp.float32)) - msum((cp < -1e-3).astype(jnp.float32))
    sgn = jnp.where(vote < 0, -1.0, 1.0)
    z0, z1, z2 = z0 * sgn, z1 * sgn, z2 * sgn

    norm = z0 * rx + z1 * ry + z2 * rz  # (P_blk, S)
    vix = rx - norm * z0
    viy = ry - norm * z1
    viz = rz - norm * z2
    x_l2 = jnp.sqrt(rx * rx + ry * ry + rz * rz)
    w = (r_lrf - x_l2) ** 2 * (norm * norm)
    vx = msum(w * vix)
    vy = msum(w * viy)
    vz = msum(w * viz)
    vn = jnp.sqrt(vx * vx + vy * vy + vz * vz) + 1e-10
    x0, x1, x2 = vx / vn, vy / vn, vz / vn

    y0 = x1 * z2 - x2 * z1
    y1 = x2 * z0 - x0 * z2
    y2 = x0 * z1 - x1 * z0

    inv_r = 1.0 / r_lrf
    o0 = (x0 * rx + x1 * ry + x2 * rz) * inv_r
    o1 = (y0 * rx + y1 * ry + y2 * rz) * inv_r
    o2 = (z0 * rx + z1 * ry + z2 * rz) * inv_r
    return o0, o1, o2


def _scale_block(rx, ry, rz, m, r: float, Ws, bs, p_blk: int, s: int, pack: bool = False, lrf_m=None):
    """One scale: 6-channel planes -> MLP -> masked max. Returns (128, P_blk).

    ``m`` may be None: unmasked max (all slots participate — the first_k
    path whose pad slots are materialized duplicates). ``lrf_m`` optionally
    gives the LRF moment weights when they differ from the pool mask (the
    packed path's float multiset multiplicities).

    ``pack``: sample-pair packing — the max-pool is sample-order-invariant,
    so the two contiguous halves of the sample axis can ride as stacked
    channel groups of HALF the columns, with block-diagonal weights
    (prepared by the caller: Ws are (2cin, 2d), bs (2d, 1)). The MXU here is
    column-pass-bound (K<=128 contractions run at the same per-column rate
    as K=128), so halving columns at doubled M/K is a ~25% kernel win.
    Requires s % 256 == 0 (each half must keep a 128-multiple minor dim).
    """
    wm = lrf_m if lrf_m is not None else (m if m is not None else jnp.ones_like(rx))
    l0, l1, l2 = _masked_lrf_block(rx, ry, rz, wm, r)
    chans = jnp.stack([rx, ry, rz, l0, l1, l2], axis=0)  # (6, P_blk, S)
    if pack:
        s2 = s // 2
        h = jnp.concatenate(
            [chans[:, :, :s2].reshape(6, p_blk * s2), chans[:, :, s2:].reshape(6, p_blk * s2)],
            axis=0,
        ).astype(jnp.bfloat16)  # (12, L/2)
    else:
        h = chans.reshape(6, p_blk * s).astype(jnp.bfloat16)
    for W, b in zip(Ws, bs):
        z = jax.lax.dot_general(
            W.astype(jnp.bfloat16),
            h,
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (d, L)
        h = jnp.maximum(z + b, 0.0).astype(jnp.bfloat16)  # b is (d, 1)
    # masked max as a MULTIPLY: post-relu h >= 0 and every neighborhood has
    # >= 1 valid slot (the self point), so zeroing masked slots never changes
    # the max — and it avoids the compare+select+(-inf) pass (~5 ms/call
    # at the operating point, measured)
    mb = None if m is None else (m > 0.0).astype(jnp.bfloat16)
    if pack:
        s2 = s // 2
        za = h[:128].reshape(128, p_blk, s2)
        zb = h[128:].reshape(128, p_blk, s2)
        if mb is not None:
            za = za * mb[:, :s2][None]
            zb = zb * mb[:, s2:][None]
        return jnp.max(jnp.maximum(za, zb), axis=2).astype(jnp.float32)  # (128, P_blk)
    d_last = h.shape[0]
    h = h.reshape(d_last, p_blk, s)
    if mb is not None:
        h = h * mb[None, :, :]
    return jnp.max(h, axis=2).astype(jnp.float32)  # (128, P_blk)


def _pe_kernel(
    g1x_ref, g1y_ref, g1z_ref, m1_ref, g2x_ref, g2y_ref, g2z_ref, m2_ref,
    cx_ref, cy_ref, cz_ref,
    w10_ref, w11_ref, w12_ref, b10_ref, b11_ref, b12_ref,
    w20_ref, w21_ref, w22_ref, b20_ref, b21_ref, b22_ref,
    out_ref, *, r1: float, r2: float, p_blk: int, s1: int, s2: int,
):
    cx = cx_ref[0]  # centers come in as (p_blk, 1) columns
    cy = cy_ref[0]
    cz = cz_ref[0]
    f1 = _scale_block(
        g1x_ref[0] - cx, g1y_ref[0] - cy, g1z_ref[0] - cz, m1_ref[0], r1,
        (w10_ref[...], w11_ref[...], w12_ref[...]),
        (b10_ref[...], b11_ref[...], b12_ref[...]), p_blk, s1, pack=s1 % 256 == 0,
    )
    f2 = _scale_block(
        g2x_ref[0] - cx, g2y_ref[0] - cy, g2z_ref[0] - cz, m2_ref[0], r2,
        (w20_ref[...], w21_ref[...], w22_ref[...]),
        (b20_ref[...], b21_ref[...], b22_ref[...]), p_blk, s2, pack=s2 % 256 == 0,
    )
    # (256, p_blk) -> (p_blk, 256): Mosaic requires the minor block dim to
    # be 128-divisible, so the output lives points-major
    out_ref[0] = jnp.concatenate([f1, f2], axis=0).T


def pe_fused(
    grouped1,  # (g1x, g1y, g1z) each (B, P, S1): scale-1 neighborhoods
    mask1,  # (B, P, S1) bool
    grouped2,  # (g2x, g2y, g2z) each (B, P, S2): scale-2 neighborhoods
    mask2,  # (B, P, S2) bool
    center,  # (cx, cy, cz) each (B, P)
    w1: Sequence[jnp.ndarray],  # three (cin, d) folded kernels, scale 1
    b1: Sequence[jnp.ndarray],  # three (d,) folded biases
    w2: Sequence[jnp.ndarray],
    b2: Sequence[jnp.ndarray],
    r1: float,
    r2: float,
    p_blk: int = 64,
    interpret: bool = False,
) -> jnp.ndarray:
    """Fused two-scale PE. Returns (B, P, 256) float32 (pre-mlp3 features).

    Each scale has its OWN neighborhood (the reference's nsample1=64 /
    nsample2=256 budgets): running scale 1 on its 64 slots instead of a
    masked view of scale 2's 256 costs 37% less MLP work."""
    g1 = tuple(g.astype(jnp.float32) for g in grouped1)
    g2 = tuple(g.astype(jnp.float32) for g in grouped2)
    # Mosaic cannot merge a sub-128 minor dim (the in-kernel
    # (6, p_blk, S) -> (6, p_blk*S) flatten), so pad the sample dim to a
    # 128 multiple with masked-out slots — all math ignores them
    def pad_s(planes, mask):
        S = planes[0].shape[-1]
        Sp = ((S + 127) // 128) * 128
        if S == Sp:
            return planes, mask
        pad = [(0, 0), (0, 0), (0, Sp - S)]
        return tuple(jnp.pad(g, pad) for g in planes), jnp.pad(mask, pad)

    g1, mask1 = pad_s(g1, mask1)
    g2, mask2 = pad_s(g2, mask2)
    # centers as (B, P, 1) columns: a (1, p_blk) block of a (B, P) array
    # violates Mosaic's 128-divisible-minor-dim rule
    cx, cy, cz = (c.astype(jnp.float32)[..., None] for c in center)
    B, P, S1 = g1[0].shape
    S2 = g2[0].shape[-1]
    assert P % p_blk == 0, (P, p_blk)
    m1 = mask1.astype(jnp.float32)
    m2 = mask2.astype(jnp.float32)

    grid = (B, P // p_blk)
    blk_s1 = pl.BlockSpec((1, p_blk, S1), lambda b, j: (b, j, 0), memory_space=pltpu.VMEM)
    blk_s2 = pl.BlockSpec((1, p_blk, S2), lambda b, j: (b, j, 0), memory_space=pltpu.VMEM)
    blk2 = pl.BlockSpec((1, p_blk, 1), lambda b, j: (b, j, 0), memory_space=pltpu.VMEM)
    full = lambda a: pl.BlockSpec(a.shape, lambda b, j: (0,) * a.ndim, memory_space=pltpu.VMEM)

    # biases as (d, 1) columns: 1-D VMEM arrays are fragile under Mosaic.
    # Packable scales (S % 256 == 0) get block-diagonal weights for the
    # sample-pair packing (see _scale_block).
    def prep(Ws, bs, s):
        if s % 256 == 0:
            Ws = [
                jnp.concatenate(
                    [
                        jnp.concatenate([W, jnp.zeros_like(W)], axis=1),
                        jnp.concatenate([jnp.zeros_like(W), W], axis=1),
                    ],
                    axis=0,
                )
                for W in Ws
            ]
            bs = [jnp.tile(b.reshape(-1, 1), (2, 1)) for b in bs]
        else:
            bs = [b.reshape(-1, 1) for b in bs]
        return [*Ws, *bs]

    weights = prep(w1, b1, S1) + prep(w2, b2, S2)
    weights = [w.astype(jnp.float32) for w in weights]
    kernel = functools.partial(_pe_kernel, r1=float(r1), r2=float(r2), p_blk=p_blk, s1=S1, s2=S2)
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[blk_s1] * 3 + [blk_s1] + [blk_s2] * 3 + [blk_s2] + [blk2] * 3 + [full(w) for w in weights],
        out_specs=pl.BlockSpec((1, p_blk, 256), lambda b, j: (b, j, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, P, 256), jnp.float32),
        interpret=interpret,
    )(*g1, m1, *g2, m2, cx, cy, cz, *weights)
    return out


def _pe_kernel_packed(
    qual_ref,
    g2x_ref, g2y_ref, g2z_ref, w1m_ref, w2m_ref,
    cx_ref, cy_ref, cz_ref,
    w10_ref, w11_ref, w12_ref, b10_ref, b11_ref, b12_ref,
    w20_ref, w21_ref, w22_ref, b20_ref, b21_ref, b22_ref,
    wx0_ref, wx1_ref, wx2_ref, bx0_ref, bx1_ref, bx2_ref,
    out_ref, *, r1: float, r2: float, p_blk: int, s2: int,
):
    """Two paths, chosen per point-block by the prefetched ``qual`` flag:

    FAST (every neighborhood in the block has <= s2/2 hits — the common case
    on real surface clouds, measured max 145/256): the slots are globally
    compacted (hits leftmost), so both scales need only the first s2/2 slots
    — the pad mass rides the w2 bump weight. The two SCALES pack as the
    channel groups of ONE block-diagonal MLP pipeline over s2/2 columns:
    half the MXU passes and half the VPU elementwise of the full path.

    FULL (any neighborhood spills into the second half): per-scale 2-way
    sample-pair-packed processing of all s2 slots, as before. (A 4-way
    scale+half block-diagonal variant measured ~12 ms SLOWER at the
    operating point: the four slice/reshape relayouts of the channel
    stacks dominate whatever MXU depth it recovers.)"""
    cx = cx_ref[0]
    cy = cy_ref[0]
    cz = cz_ref[0]
    h2 = s2 // 2
    # whole flag array lives in SMEM (Mosaic rejects sub-(8,128) VMEM blocks)
    qual = qual_ref[pl.program_id(0), pl.program_id(1)]

    @pl.when(qual != 0)
    def _fast():
        rx = g2x_ref[0, :, :h2] - cx  # only the compacted first half
        ry = g2y_ref[0, :, :h2] - cy
        rz = g2z_ref[0, :, :h2] - cz
        m1 = w1m_ref[0, :, :h2].astype(jnp.float32)
        m2 = w2m_ref[0, :, :h2].astype(jnp.float32)
        l1 = _masked_lrf_block(rx, ry, rz, m1, r1)
        l2 = _masked_lrf_block(rx, ry, rz, m2, r2)
        chans = jnp.stack([rx, ry, rz, *l1, rx, ry, rz, *l2], axis=0)  # (12, p_blk, h2)
        h = chans.reshape(12, p_blk * h2).astype(jnp.bfloat16)
        for W, b in (
            (wx0_ref[...], bx0_ref[...]),
            (wx1_ref[...], bx1_ref[...]),
            (wx2_ref[...], bx2_ref[...]),
        ):
            z = jax.lax.dot_general(
                W.astype(jnp.bfloat16), h,
                dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            h = jnp.maximum(z + b, 0.0).astype(jnp.bfloat16)
        mb1 = (m1 > 0.0).astype(jnp.bfloat16)
        mb2 = (m2 > 0.0).astype(jnp.bfloat16)
        za = h[:128].reshape(128, p_blk, h2) * mb1[None]
        zb = h[128:].reshape(128, p_blk, h2) * mb2[None]
        f1 = jnp.max(za, axis=2).astype(jnp.float32)
        f2 = jnp.max(zb, axis=2).astype(jnp.float32)
        out_ref[0] = jnp.concatenate([f1, f2], axis=0).T

    @pl.when(qual == 0)
    def _full():
        rx = g2x_ref[0] - cx  # relative coords shared by BOTH scales
        ry = g2y_ref[0] - cy
        rz = g2z_ref[0] - cz
        # weights arrive bf16 (half the HBM read); upcast once in VMEM —
        # Mosaic rejects bf16 vector compares in packed layouts
        m1 = w1m_ref[0].astype(jnp.float32)
        # scale 1: float WEIGHTS (multiset multiplicities — r1 hits get 1,
        # the scan-first r1 hit carries the +(k1-cnt1) pad bump) drive the
        # LRF sums; the max-pool multiply-masks on weight > 0
        f1 = _scale_block(
            rx, ry, rz, m1, r1,
            (w10_ref[...], w11_ref[...], w12_ref[...]),
            (b10_ref[...], b11_ref[...], b12_ref[...]), p_blk, s2, pack=True, lrf_m=m1,
        )
        # scale 2: pad slots are materialized first-hit duplicates — unmasked
        f2 = _scale_block(
            rx, ry, rz, None, r2,
            (w20_ref[...], w21_ref[...], w22_ref[...]),
            (b20_ref[...], b21_ref[...], b22_ref[...]), p_blk, s2, pack=True,
        )
        out_ref[0] = jnp.concatenate([f1, f2], axis=0).T


def pe_fused_packed(
    grouped2,  # (g2x, g2y, g2z) each (B, P, S2): scale-2 slots, pad-filled
    w1,  # (B, P, S2) bf16 scale-1 multiset weights (0 = not an r1 hit)
    w2,  # (B, P, S2) bf16 scale-2 multiset weights (hits + pad-mass bump)
    total2,  # (B, P) int32 r2 hit counts (for the per-block fast-path flag)
    center,  # (cx, cy, cz) each (B, P)
    w1_mlp: Sequence[jnp.ndarray],
    b1_mlp: Sequence[jnp.ndarray],
    w2_mlp: Sequence[jnp.ndarray],
    b2_mlp: Sequence[jnp.ndarray],
    r1: float,
    r2: float,
    p_blk: int = 64,
    interpret: bool = False,
) -> jnp.ndarray:
    """Fused two-scale first_k PE on the PACKED grouping
    (ops/ball_query.two_scale_group_first_k_packed): both scales share scale
    2's globally-compacted slots — scale 1 is its per-slot multiset weights,
    so the separate (B, P, S1) materialization, its k2-wide selection sort
    and its extra HBM round trip all disappear. Point-blocks whose
    neighborhoods all fit in S2/2 hits take a half-budget cross-scale-packed
    path (see _pe_kernel_packed). Returns (B, P, 256) float32."""
    g2 = tuple(g.astype(jnp.float32) for g in grouped2)
    cx, cy, cz = (c.astype(jnp.float32)[..., None] for c in center)
    B, P, S2 = g2[0].shape
    assert P % p_blk == 0 and S2 % 256 == 0, (P, p_blk, S2)
    m1 = w1  # native dtype (bf16 from the packed grouping): the kernel
    # upcasts per-op; an XLA-side astype would round-trip 67MB through HBM

    # per-block fast-path flag: every hit of every neighborhood must live in
    # the compacted first half (hits are leftmost, so total2 <= S2/2 suffices)
    qual = (
        jnp.max(total2.reshape(B, P // p_blk, p_blk), axis=-1) <= S2 // 2
    ).astype(jnp.int32)

    grid = (B, P // p_blk)
    blk_s2 = pl.BlockSpec((1, p_blk, S2), lambda b, j: (b, j, 0), memory_space=pltpu.VMEM)
    blk2 = pl.BlockSpec((1, p_blk, 1), lambda b, j: (b, j, 0), memory_space=pltpu.VMEM)
    qual_spec = pl.BlockSpec(qual.shape, lambda b, j: (0, 0), memory_space=pltpu.SMEM)
    full = lambda a: pl.BlockSpec(a.shape, lambda b, j: (0,) * a.ndim, memory_space=pltpu.VMEM)

    def prep(WA, bA, WB, bB):
        # block-diagonal 2-way pack: channel group A | channel group B
        Ws = [
            jnp.concatenate(
                [
                    jnp.concatenate([Wa, jnp.zeros_like(Wb)], axis=1),
                    jnp.concatenate([jnp.zeros_like(Wa), Wb], axis=1),
                ],
                axis=0,
            )
            for Wa, Wb in zip(WA, WB)
        ]
        bs = [
            jnp.concatenate([ba.reshape(-1, 1), bb.reshape(-1, 1)], axis=0)
            for ba, bb in zip(bA, bB)
        ]
        return [*Ws, *bs]

    weights = (
        prep(w1_mlp, b1_mlp, w1_mlp, b1_mlp)  # full path scale 1: half | half
        + prep(w2_mlp, b2_mlp, w2_mlp, b2_mlp)  # full path scale 2: half | half
        + prep(w1_mlp, b1_mlp, w2_mlp, b2_mlp)  # fast path: scale 1 | scale 2
    )
    weights = [w.astype(jnp.float32) for w in weights]
    kernel = functools.partial(_pe_kernel_packed, r1=float(r1), r2=float(r2), p_blk=p_blk, s2=S2)
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[qual_spec] + [blk_s2] * 5 + [blk2] * 3 + [full(w) for w in weights],
        out_specs=pl.BlockSpec((1, p_blk, 256), lambda b, j: (b, j, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, P, 256), jnp.float32),
        interpret=interpret,
    )(qual, *g2, m1, w2, cx, cy, cz, *weights)
    return out


def _masked_lrf_block_t(rx, ry, rz, m, r_lrf: float):
    """_masked_lrf_block in SLOT-MAJOR layout: inputs are (S, p_cols) tiles
    (slots on the sublane axis), reductions run over axis 0, per-point
    scalars are (1, p_cols) rows."""
    cnt = jnp.maximum(jnp.sum(m, axis=0, keepdims=True), 1.0)  # (1, p_cols)
    mean = lambda t: jnp.sum(t * m, axis=0, keepdims=True) / cnt
    msum = lambda t: jnp.sum(t * m, axis=0, keepdims=True)

    a = mean(rx * rx)
    b = mean(rx * ry)
    c = mean(rx * rz)
    d = mean(ry * ry)
    e = mean(ry * rz)
    f = mean(rz * rz)
    z0, z1, z2 = smallest_eigvec_sym3_planar(a, b, c, d, e, f, use_newton=True)  # (1, p_cols)

    cp = -(z0 * rx + z1 * ry + z2 * rz)
    vote = msum((cp > 1e-3).astype(jnp.float32)) - msum((cp < -1e-3).astype(jnp.float32))
    sgn = jnp.where(vote < 0, -1.0, 1.0)
    z0, z1, z2 = z0 * sgn, z1 * sgn, z2 * sgn

    norm = z0 * rx + z1 * ry + z2 * rz  # (S, p_cols)
    vix = rx - norm * z0
    viy = ry - norm * z1
    viz = rz - norm * z2
    x_l2 = jnp.sqrt(rx * rx + ry * ry + rz * rz)
    w = (r_lrf - x_l2) ** 2 * (norm * norm)
    vx = msum(w * vix)
    vy = msum(w * viy)
    vz = msum(w * viz)
    vn = jnp.sqrt(vx * vx + vy * vy + vz * vz) + 1e-10
    x0, x1, x2 = vx / vn, vy / vn, vz / vn

    y0 = x1 * z2 - x2 * z1
    y1 = x2 * z0 - x0 * z2
    y2 = x0 * z1 - x1 * z0

    inv_r = 1.0 / r_lrf
    o0 = (x0 * rx + x1 * ry + x2 * rz) * inv_r
    o1 = (y0 * rx + y1 * ry + y2 * rz) * inv_r
    o2 = (z0 * rx + z1 * ry + z2 * rz) * inv_r
    return o0, o1, o2


def _pe_kernel_packed_t(
    qual_ref,
    gx_ref, gy_ref, gz_ref, w1_ref, w2_ref,  # (1, S2, p_cols) slot-major
    cx_ref, cy_ref, cz_ref,  # (1, 1, p_cols)
    wx0_ref, wx1_ref, wx2_ref, bx0_ref, bx1_ref, bx2_ref,
    out_ref, *, r1: float, r2: float, p_cols: int, s2: int,
):
    """Slot-major packed PE with per-block ADAPTIVE slot budgets.

    Slots live on the SUBLANE axis, points on the lane axis — so a tier can
    process any 64-multiple prefix of the slots (sublane slices have no
    128-divisibility constraint, unlike the point-major layout's lane
    slices, which capped the fast path at s2/2). Global compaction puts all
    hits leftmost, and the multiply-masked max-pool ignores everything past
    the hits, so a block's tier is exact as long as its prefix covers every
    neighborhood's hits: tier 2 = 64 slots (1 MLP chunk), 1 = 128 (2), 0 =
    the full s2 (4).

    The LRF moments are ALWAYS reduced over the full s2 slots (pad slots
    contribute exact zeros through the w1/w2 multiset masks, and the
    full-extent reduction is the one shape Mosaic reduces bitwise-
    consistently — prefix-sliced (64, p_cols) reductions were observed to
    drift vs the same math at (s2, p_cols), which the sign-discontinuous
    eigvec/vote steps then amplify). The moment sums are cheap VPU work;
    the adaptive win is in the MLP below.

    Every tier shares ONE cross-scale block-diagonal MLP (scale 1 | scale 2
    as channel groups) applied to 64-slot chunks of at most (12, 64 x
    p_cols) columns — peak VMEM stays at the single-chunk working set, and
    the MXU cost is proportional to the number of chunks, i.e. to the
    actual neighborhood density of each point-block. Because a tier-t
    block's hits all sit inside its prefix, the skipped chunks' masked
    max-pool contributions are exact zeros: every tier is bitwise equal to
    the full-budget path."""
    cx = cx_ref[0]  # (1, p_cols)
    cy = cy_ref[0]
    cz = cz_ref[0]
    qual = qual_ref[pl.program_id(0), pl.program_id(1)]

    def mlp_chunk(chs):
        h = chs  # (12, 64 * p_cols) bf16
        for W, b in (
            (wx0_ref[...], bx0_ref[...]),
            (wx1_ref[...], bx1_ref[...]),
            (wx2_ref[...], bx2_ref[...]),
        ):
            z = jax.lax.dot_general(
                W.astype(jnp.bfloat16), h,
                dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            h = jnp.maximum(z + b, 0.0).astype(jnp.bfloat16)
        return h  # (256, 64 * p_cols)

    def tier(s_t: int):
        rx = gx_ref[0] - cx  # (s2, p_cols)
        ry = gy_ref[0] - cy
        rz = gz_ref[0] - cz
        m1 = w1_ref[0].astype(jnp.float32)
        m2 = w2_ref[0].astype(jnp.float32)
        l1 = _masked_lrf_block_t(rx, ry, rz, m1, r1)
        l2 = _masked_lrf_block_t(rx, ry, rz, m2, r2)
        mb1 = (m1 > 0.0).astype(jnp.bfloat16)
        mb2 = (m2 > 0.0).astype(jnp.bfloat16)
        acc1 = jnp.zeros((128, p_cols), jnp.float32)
        acc2 = jnp.zeros((128, p_cols), jnp.float32)
        for k in range(s_t // 64):
            sl = slice(64 * k, 64 * (k + 1))
            chans = jnp.stack(
                [rx[sl], ry[sl], rz[sl], l1[0][sl], l1[1][sl], l1[2][sl],
                 rx[sl], ry[sl], rz[sl], l2[0][sl], l2[1][sl], l2[2][sl]],
                axis=0,
            )  # (12, 64, p_cols)
            h = mlp_chunk(chans.reshape(12, 64 * p_cols).astype(jnp.bfloat16))
            h = h.reshape(256, 64, p_cols)
            # multiply-mask max (see _scale_block): h >= 0 post-relu, every
            # neighborhood has >= 1 valid slot somewhere, zeros never win
            acc1 = jnp.maximum(acc1, jnp.max(h[:128] * mb1[sl][None], axis=1).astype(jnp.float32))
            acc2 = jnp.maximum(acc2, jnp.max(h[128:] * mb2[sl][None], axis=1).astype(jnp.float32))
        out_ref[0] = jnp.concatenate([acc1, acc2], axis=0).T

    @pl.when(qual == 2)
    def _quarter():
        tier(64)

    @pl.when(qual == 1)
    def _half():
        tier(128)

    @pl.when(qual == 0)
    def _full():
        tier(s2)


def pe_fused_packed_t(
    grouped2_t,  # (g2x, g2y, g2z) each (B, S2, P) SLOT-MAJOR, pad-filled
    w1_t,  # (B, S2, P) bf16 scale-1 multiset weights
    w2_t,  # (B, S2, P) bf16 scale-2 multiset weights
    total2,  # (B, P) int32 r2 hit counts
    center,  # (cx, cy, cz) each (B, P)
    w1_mlp: Sequence[jnp.ndarray],
    b1_mlp: Sequence[jnp.ndarray],
    w2_mlp: Sequence[jnp.ndarray],
    b2_mlp: Sequence[jnp.ndarray],
    r1: float,
    r2: float,
    p_cols: int = 128,
    interpret: bool = False,
) -> jnp.ndarray:
    """Slot-major packed first_k PE with adaptive per-block slot budgets
    (64/128/s2 — see _pe_kernel_packed_t). Numerically identical to
    pe_fused_packed; ~2x less MLP+LRF work on typical clouds, where most
    point-blocks' neighborhoods fit in 64 hits. Returns (B, P, 256) f32."""
    g = tuple(x.astype(jnp.float32) for x in grouped2_t)
    B, S2, P = g[0].shape
    assert P % p_cols == 0 and S2 % 256 == 0, (P, p_cols, S2)
    cx, cy, cz = (c.astype(jnp.float32)[:, None, :] for c in center)  # (B, 1, P)

    bmax = jnp.max(total2.reshape(B, P // p_cols, p_cols), axis=-1)
    qual = jnp.where(bmax <= 64, 2, jnp.where(bmax <= 128, 1, 0)).astype(jnp.int32)

    grid = (B, P // p_cols)
    blk_g = pl.BlockSpec((1, S2, p_cols), lambda b, j: (b, 0, j), memory_space=pltpu.VMEM)
    blk_c = pl.BlockSpec((1, 1, p_cols), lambda b, j: (b, 0, j), memory_space=pltpu.VMEM)
    qual_spec = pl.BlockSpec(qual.shape, lambda b, j: (0, 0), memory_space=pltpu.SMEM)
    full = lambda a: pl.BlockSpec(a.shape, lambda b, j: (0,) * a.ndim, memory_space=pltpu.VMEM)

    # ONE cross-scale block-diagonal weight set serves every tier
    Ws = [
        jnp.concatenate(
            [
                jnp.concatenate([Wa, jnp.zeros_like(Wb)], axis=1),
                jnp.concatenate([jnp.zeros_like(Wa), Wb], axis=1),
            ],
            axis=0,
        ).astype(jnp.float32)
        for Wa, Wb in zip(w1_mlp, w2_mlp)
    ]
    bs = [
        jnp.concatenate([ba.reshape(-1, 1), bb.reshape(-1, 1)], axis=0).astype(jnp.float32)
        for ba, bb in zip(b1_mlp, b2_mlp)
    ]
    weights = [*Ws, *bs]
    kernel = functools.partial(_pe_kernel_packed_t, r1=float(r1), r2=float(r2), p_cols=p_cols, s2=S2)
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[qual_spec] + [blk_g] * 5 + [blk_c] * 3 + [full(w) for w in weights],
        out_specs=pl.BlockSpec((1, p_cols, 256), lambda b, j: (b, j, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, P, 256), jnp.float32),
        interpret=interpret,
    )(qual, *g, w1_t, w2_t, cx, cy, cz, *weights)
    return out


# ---------------------------------------------------------------------------
# v4: grouping-fused slot-major PE — in-kernel banked gather + LRF + MLP + pool
# ---------------------------------------------------------------------------
#
# The remaining structural cost of every prior PE design is the slot
# MATERIALIZATION: the grouping pass gathers three (B, P, S2) f32 coordinate
# planes through HBM (ops/gather_pallas), the slot-major experiment then
# paid six XLA transposes on top, and the v3 split re-reads the slots to
# build channels. v4 moves the banked lane-gather INSIDE the PE kernel:
# the kernel consumes the pad-filled slot INDICES (int16) plus the bf16
# multiset weights — both slot-major, ~100MB/batch vs ~470MB of f32
# planes+channels — and the gathered coordinates never exist outside VMEM.
#
# Per-block ADAPTIVE tiers now scale EVERYTHING: slots are globally
# compacted (hits leftmost), so a block whose neighborhoods all fit in s_t
# hits gathers, LRF-reduces, and MLPs only the first s_t slots. Exactness:
# all LRF moment/vote contributions enter through w-weighted sums and every
# slot past the hits carries w == 0 — its contribution is an exact 0.0, and
# adding exact zeros never rounds, so the prefix-reduced sums equal the
# full-extent sums bitwise up to reduction-tree shape. The max-pool
# multiply-mask zeroes the same slots. (The LRF eigvec/vote steps are
# sign-discontinuous on no-eigengap frames, so ULP-level reduction-shape
# differences can flip degenerate frames — same caveat as every other
# reduction-order choice here; the oracle tolerance tests gate it.)

_GATHER_BANK = 128  # lane width of Mosaic's dynamic_gather


def _pe_kernel_gather_t(
    qual_ref,
    xr_ref, yr_ref, zr_ref,  # (1, 1, N) f32 permuted source rows
    ii_ref,  # (1, S2, p_cols) int16 slot-major pad-filled permuted positions
    w1_ref, w2_ref,  # (1, S2, p_cols) bf16 slot-major multiset weights
    cx_ref, cy_ref, cz_ref,  # (1, 1, p_cols) f32 centers
    wx0_ref, wx1_ref, wx2_ref, bx0_ref, bx1_ref, bx2_ref,
    out_ref, ch_ref, *, r1: float, r2: float, p_cols: int, s2: int, n: int,
    ablate: str = "",
):
    cx = cx_ref[0]  # (1, p_cols)
    cy = cy_ref[0]
    cz = cz_ref[0]
    qual = qual_ref[pl.program_id(0), pl.program_id(1)]

    def mlp_chunk(chs):
        h = chs  # (12, 64 * p_cols) bf16
        for W, b in (
            (wx0_ref[...], bx0_ref[...]),
            (wx1_ref[...], bx1_ref[...]),
            (wx2_ref[...], bx2_ref[...]),
        ):
            z = jax.lax.dot_general(
                W.astype(jnp.bfloat16), h,
                dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            h = jnp.maximum(z + b, 0.0).astype(jnp.bfloat16)
        return h  # (256, 64 * p_cols)

    def tier(s_t: int):
        ii = ii_ref[0, :s_t].astype(jnp.int32)  # (s_t, p_cols)
        li = ii & (_GATHER_BANK - 1)
        bi = ii >> 7

        def gather(src_ref):
            row = src_ref[0]  # (1, N)
            acc = jnp.zeros((s_t, p_cols), jnp.float32)
            for k in range(n // _GATHER_BANK):
                bank = pltpu.repeat(
                    row[:, _GATHER_BANK * k : _GATHER_BANK * (k + 1)], s_t, 0
                )
                vals = jnp.take_along_axis(bank, li, axis=1)
                acc = jnp.where(bi == k, vals, acc)
            return acc

        if ablate == "gather":  # ablation: fake slots (benchmarks only)
            rx = pltpu.repeat(xr_ref[0, :, :p_cols], s_t, 0) - cx
            ry = pltpu.repeat(yr_ref[0, :, :p_cols], s_t, 0) - cy
            rz = pltpu.repeat(zr_ref[0, :, :p_cols], s_t, 0) - cz
        else:
            rx = gather(xr_ref) - cx  # (s_t, p_cols)
            ry = gather(yr_ref) - cy
            rz = gather(zr_ref) - cz
        m1 = w1_ref[0, :s_t].astype(jnp.float32)
        m2 = w2_ref[0, :s_t].astype(jnp.float32)
        if ablate == "lrf":  # ablation: reuse rel coords as LRF channels
            l1 = (rx, ry, rz)
            l2 = (rx, ry, rz)
        else:
            l1 = _masked_lrf_block_t(rx, ry, rz, m1, r1)
            l2 = _masked_lrf_block_t(rx, ry, rz, m2, r2)
        mb1 = (m1 > 0.0).astype(jnp.bfloat16)
        mb2 = (m2 > 0.0).astype(jnp.bfloat16)
        acc1 = jnp.zeros((128, p_cols), jnp.float32)
        acc2 = jnp.zeros((128, p_cols), jnp.float32)
        if ablate == "scratch":
            # materialize the 12 channels in VMEM scratch (bf16), then run
            # the chunk loop on scratch LOADS: decouples the LRF dataflow
            # from the per-chunk stack/reshape (the measured ~9 ms
            # interaction in the fused form)
            for ci, v in enumerate((rx, ry, rz, *l1, rx, ry, rz, *l2)):
                ch_ref[ci, :s_t, :] = v.astype(jnp.bfloat16)
            for k in range(s_t // 64):
                sl = slice(64 * k, 64 * (k + 1))
                ch = ch_ref[:, sl, :]  # (12, 64, p_cols) bf16
                h = mlp_chunk(ch.reshape(12, 64 * p_cols))
                h = h.reshape(256, 64, p_cols)
                acc1 = jnp.maximum(acc1, jnp.max(h[:128] * mb1[sl][None], axis=1).astype(jnp.float32))
                acc2 = jnp.maximum(acc2, jnp.max(h[128:] * mb2[sl][None], axis=1).astype(jnp.float32))
            out_ref[0] = jnp.concatenate([acc1, acc2], axis=0).T
            return
        if ablate == "mlp":  # ablation: pool raw channels, no MLP
            a1 = jnp.max(rx * mb1.astype(jnp.float32) + ry + rz + l1[0] + l1[1] + l1[2], axis=0, keepdims=True)
            a2 = jnp.max(rx * mb2.astype(jnp.float32) + ry + rz + l2[0] + l2[1] + l2[2], axis=0, keepdims=True)
            out_ref[0] = jnp.concatenate(
                [pltpu.repeat(a1, 128, 0), pltpu.repeat(a2, 128, 0)], axis=0
            ).T
            return
        for k in range(s_t // 64):
            sl = slice(64 * k, 64 * (k + 1))
            chans = jnp.stack(
                [rx[sl], ry[sl], rz[sl], l1[0][sl], l1[1][sl], l1[2][sl],
                 rx[sl], ry[sl], rz[sl], l2[0][sl], l2[1][sl], l2[2][sl]],
                axis=0,
            )  # (12, 64, p_cols)
            h = mlp_chunk(chans.reshape(12, 64 * p_cols).astype(jnp.bfloat16))
            h = h.reshape(256, 64, p_cols)
            acc1 = jnp.maximum(acc1, jnp.max(h[:128] * mb1[sl][None], axis=1).astype(jnp.float32))
            acc2 = jnp.maximum(acc2, jnp.max(h[128:] * mb2[sl][None], axis=1).astype(jnp.float32))
        out_ref[0] = jnp.concatenate([acc1, acc2], axis=0).T

    @pl.when(qual == 2)
    def _quarter():
        tier(64)

    @pl.when(qual == 1)
    def _half():
        tier(128)

    @pl.when(qual == 0)
    def _full():
        tier(s2)


def pe_fused_gather_t(
    planes,  # (xp, yp, zp) each (B, N) f32: PERMUTED source coordinate rows
    idx_p,  # (B, P, S2) int16/int32 pad-filled permuted slot positions
    w1,  # (B, P, S2) bf16 scale-1 multiset weights
    w2,  # (B, P, S2) bf16 scale-2 multiset weights
    total2,  # (B, P) int32 r2 hit counts
    center,  # (cx, cy, cz) each (B, P)
    w1_mlp: Sequence[jnp.ndarray],
    b1_mlp: Sequence[jnp.ndarray],
    w2_mlp: Sequence[jnp.ndarray],
    b2_mlp: Sequence[jnp.ndarray],
    r1: float,
    r2: float,
    p_cols: int = 128,
    interpret: bool = False,
    ablate: str = "",
    force_tier=None,
) -> jnp.ndarray:
    """Grouping-fused slot-major PE (PE-v4): consumes slot INDICES from
    ops/ball_query.two_scale_group_first_k_packed_idx and gathers inside the
    kernel — no (B, P, S2) coordinate planes in HBM, per-block adaptive
    gather+LRF+MLP tiers (64/128/s2). Returns (B, P, 256) f32 (pre-mlp3)."""
    xp, yp, zp = (p.astype(jnp.float32) for p in planes)
    B, N = xp.shape
    _, P, S2 = idx_p.shape
    assert p_cols == _GATHER_BANK, "gather bank decomposition wants 128 lanes"
    assert P % p_cols == 0 and S2 % 256 == 0 and N % _GATHER_BANK == 0, (P, S2, N)
    # slot-major transposes of the narrow payloads only (int16 + bf16)
    iiT = jnp.swapaxes(idx_p, 1, 2)
    w1T = jnp.swapaxes(w1, 1, 2)
    w2T = jnp.swapaxes(w2, 1, 2)
    cx, cy, cz = (c.astype(jnp.float32)[:, None, :] for c in center)  # (B, 1, P)

    bmax = jnp.max(total2.reshape(B, P // p_cols, p_cols), axis=-1)
    qual = jnp.where(bmax <= 64, 2, jnp.where(bmax <= 128, 1, 0)).astype(jnp.int32)
    if force_tier is not None:  # benchmarks only: fixed slot budget everywhere
        qual = jnp.full_like(qual, force_tier)

    grid = (B, P // p_cols)
    blk_row = pl.BlockSpec((1, 1, N), lambda b, j: (b, 0, 0), memory_space=pltpu.VMEM)
    blk_s = pl.BlockSpec((1, S2, p_cols), lambda b, j: (b, 0, j), memory_space=pltpu.VMEM)
    blk_c = pl.BlockSpec((1, 1, p_cols), lambda b, j: (b, 0, j), memory_space=pltpu.VMEM)
    qual_spec = pl.BlockSpec(qual.shape, lambda b, j: (0, 0), memory_space=pltpu.SMEM)
    full = lambda a: pl.BlockSpec(a.shape, lambda b, j: (0,) * a.ndim, memory_space=pltpu.VMEM)

    # ONE cross-scale block-diagonal weight set serves every tier
    Ws = [
        jnp.concatenate(
            [
                jnp.concatenate([Wa, jnp.zeros_like(Wb)], axis=1),
                jnp.concatenate([jnp.zeros_like(Wa), Wb], axis=1),
            ],
            axis=0,
        ).astype(jnp.float32)
        for Wa, Wb in zip(w1_mlp, w2_mlp)
    ]
    bs = [
        jnp.concatenate([ba.reshape(-1, 1), bb.reshape(-1, 1)], axis=0).astype(jnp.float32)
        for ba, bb in zip(b1_mlp, b2_mlp)
    ]
    weights = [*Ws, *bs]
    kernel = functools.partial(
        _pe_kernel_gather_t, r1=float(r1), r2=float(r2), p_cols=p_cols, s2=S2, n=N,
        ablate=ablate,
    )
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[qual_spec] + [blk_row] * 3 + [blk_s] * 3 + [blk_c] * 3 + [full(w) for w in weights],
        out_specs=pl.BlockSpec((1, p_cols, 256), lambda b, j: (b, j, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, P, 256), jnp.float32),
        scratch_shapes=[pltpu.VMEM((12, S2, p_cols), jnp.bfloat16)],
        interpret=interpret,
    )(qual, xp[:, None, :], yp[:, None, :], zp[:, None, :], iiT, w1T, w2T, cx, cy, cz, *weights)
    return out


# ---------------------------------------------------------------------------
# v5: two-kernel split — gather+LRF+channel-store kernel -> slot-major MLP/pool
# ---------------------------------------------------------------------------
#
# The v4 ablation (benchmarks/profile_pe_v4.py) showed the mega-fusion's
# cost is an INTERACTION: gather (1.2 ms), LRF (~0.4 ms marginal when the
# MLP is ablated), and the chunked MLP (~4.4 ms marginal when the LRF
# channels are cheap aliases) each measure small, but real LRF values
# feeding the in-kernel channel-stack + MLP cost ~9 ms extra — and routing
# the channels through VMEM scratch does NOT fix it (17.8 vs 17.9 ms), so
# it is a Mosaic scheduling pathology of the combined dataflow, not a
# missing materialization. v5 splits at exactly the measured seam:
#
#   kernel A (pe_channels_gather_t): banked gather + both scales' LRF +
#     channel STORES to HBM, slot-major (B, 12, S2, P) bf16, tier-pruned
#     (blocks whose neighborhoods fit in s_t hits only gather/store the
#     first s_t slot rows; rows past the tier are never read downstream).
#   kernel B (pe_mlp_pool_packed_v5): reads 64-slot chunk blocks of A's
#     output + the slot-major multiset weights, runs the cross-scale
#     block-diagonal MLP cols-major per chunk and the multiply-masked max,
#     chunk count per block = ceil(bmax/64) — the v3 adaptive-tier MLP on
#     slot-major chunks.
#
# Bitwise vs pe_fused_packed_t / pe_fused_gather_t: identical reduction
# axes and the same pre-MLP bf16 cast point; tier prefixes only drop
# exact-zero contributions (see the v4 comment).


def _pe_kernel_channels_t(
    qual_ref,
    xr_ref, yr_ref, zr_ref,  # (1, 1, N) f32 permuted source rows
    ii_ref,  # (1, S2, p_cols) int16 slot-major pad-filled permuted positions
    w1_ref, w2_ref,  # (1, S2, p_cols) bf16 slot-major multiset weights
    cx_ref, cy_ref, cz_ref,  # (1, 1, p_cols) f32 centers
    out_ref,  # (1, 12, S2, p_cols) bf16 channel planes
    *, r1: float, r2: float, p_cols: int, s2: int, n: int,
):
    cx = cx_ref[0]
    cy = cy_ref[0]
    cz = cz_ref[0]
    qual = qual_ref[pl.program_id(0), pl.program_id(1)]

    def tier(s_t: int):
        ii = ii_ref[0, :s_t].astype(jnp.int32)
        li = ii & (_GATHER_BANK - 1)
        bi = ii >> 7

        def gather(src_ref):
            row = src_ref[0]
            acc = jnp.zeros((s_t, p_cols), jnp.float32)
            for k in range(n // _GATHER_BANK):
                bank = pltpu.repeat(
                    row[:, _GATHER_BANK * k : _GATHER_BANK * (k + 1)], s_t, 0
                )
                vals = jnp.take_along_axis(bank, li, axis=1)
                acc = jnp.where(bi == k, vals, acc)
            return acc

        rx = gather(xr_ref) - cx
        ry = gather(yr_ref) - cy
        rz = gather(zr_ref) - cz
        m1 = w1_ref[0, :s_t].astype(jnp.float32)
        m2 = w2_ref[0, :s_t].astype(jnp.float32)
        l1 = _masked_lrf_block_t(rx, ry, rz, m1, r1)
        l2 = _masked_lrf_block_t(rx, ry, rz, m2, r2)
        for ci, v in enumerate((rx, ry, rz, *l1, rx, ry, rz, *l2)):
            out_ref[0, ci, :s_t, :] = v.astype(jnp.bfloat16)

    @pl.when(qual == 2)
    def _quarter():
        tier(64)

    @pl.when(qual == 1)
    def _half():
        tier(128)

    @pl.when(qual == 0)
    def _full():
        tier(s2)


def _pe_kernel_mlp_v5(
    qual_ref,
    c0_ref, c1_ref, c2_ref, c3_ref,  # (1, 12, 64, p_cols) bf16 channel chunks
    m0_ref, m1_ref, m2_ref, m3_ref,  # (1, 2, 64, p_cols) bf16 weight chunks (w1|w2)
    wx0_ref, wx1_ref, wx2_ref, bx0_ref, bx1_ref, bx2_ref,
    out_ref, acc_ref, *, p_cols: int,
):
    qual = qual_ref[pl.program_id(0), pl.program_id(1)]

    def chunk_pool(c_ref, m_ref):
        h = c_ref[0].reshape(12, 64 * p_cols)  # (12, 64, p_cols) -> cols
        for W, b in (
            (wx0_ref[...], bx0_ref[...]),
            (wx1_ref[...], bx1_ref[...]),
            (wx2_ref[...], bx2_ref[...]),
        ):
            z = jax.lax.dot_general(
                W.astype(jnp.bfloat16), h,
                dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            h = jnp.maximum(z + b, 0.0).astype(jnp.bfloat16)
        h = h.reshape(256, 64, p_cols)
        mb1 = (m_ref[0, 0].astype(jnp.float32) > 0.0).astype(jnp.bfloat16)
        mb2 = (m_ref[0, 1].astype(jnp.float32) > 0.0).astype(jnp.bfloat16)
        # multiply-mask max (see _scale_block): h >= 0 post-relu, every
        # neighborhood has >= 1 valid slot somewhere, zeros never win
        return jnp.concatenate(
            [
                jnp.max(h[:128] * mb1[None], axis=1).astype(jnp.float32),
                jnp.max(h[128:] * mb2[None], axis=1).astype(jnp.float32),
            ],
            axis=0,
        )  # (256, p_cols)

    acc_ref[...] = chunk_pool(c0_ref, m0_ref)
    for c, (c_ref, m_ref) in enumerate(((c1_ref, m1_ref), (c2_ref, m2_ref), (c3_ref, m3_ref)), start=1):
        @pl.when(qual > c)
        def _(c_ref=c_ref, m_ref=m_ref):
            acc_ref[...] = jnp.maximum(acc_ref[...], chunk_pool(c_ref, m_ref))

    out_ref[0] = acc_ref[...].T


def pe_fused_v5(
    planes,  # (xp, yp, zp) each (B, N) f32: PERMUTED source coordinate rows
    idx_p,  # (B, P, S2) int16/int32 pad-filled permuted slot positions
    w1,  # (B, P, S2) bf16 scale-1 multiset weights
    w2,  # (B, P, S2) bf16 scale-2 multiset weights
    total2,  # (B, P) int32 r2 hit counts
    center,  # (cx, cy, cz) each (B, P)
    w1_mlp: Sequence[jnp.ndarray],
    b1_mlp: Sequence[jnp.ndarray],
    w2_mlp: Sequence[jnp.ndarray],
    b2_mlp: Sequence[jnp.ndarray],
    r1: float,
    r2: float,
    p_cols: int = 128,
    interpret: bool = False,
) -> jnp.ndarray:
    """PE-v5: gather+LRF+channel-store kernel -> slot-major chunked MLP/pool
    kernel (see the v5 module comment for the measured rationale). Consumes
    the index grouping (two_scale_group_first_k_packed_idx). Returns
    (B, P, 256) f32 pre-mlp3 features, bitwise-equal to pe_fused_gather_t.
    """
    xp, yp, zp = (p.astype(jnp.float32) for p in planes)
    B, N = xp.shape
    _, P, S2 = idx_p.shape
    assert p_cols == _GATHER_BANK, "gather bank decomposition wants 128 lanes"
    assert P % p_cols == 0 and S2 == 256 and N % _GATHER_BANK == 0, (P, S2, N)
    iiT = jnp.swapaxes(idx_p, 1, 2)
    w1T = jnp.swapaxes(w1, 1, 2)
    w2T = jnp.swapaxes(w2, 1, 2)
    cx, cy, cz = (c.astype(jnp.float32)[:, None, :] for c in center)  # (B, 1, P)

    bmax = jnp.max(total2.reshape(B, P // p_cols, p_cols), axis=-1)
    qual_a = jnp.where(bmax <= 64, 2, jnp.where(bmax <= 128, 1, 0)).astype(jnp.int32)
    qual_b = jnp.clip((bmax + 63) // 64, 1, 4).astype(jnp.int32)

    grid = (B, P // p_cols)
    blk_row = pl.BlockSpec((1, 1, N), lambda b, j: (b, 0, 0), memory_space=pltpu.VMEM)
    blk_s = pl.BlockSpec((1, S2, p_cols), lambda b, j: (b, 0, j), memory_space=pltpu.VMEM)
    blk_c = pl.BlockSpec((1, 1, p_cols), lambda b, j: (b, 0, j), memory_space=pltpu.VMEM)
    qual_spec = pl.BlockSpec(qual_a.shape, lambda b, j: (0, 0), memory_space=pltpu.SMEM)
    full = lambda a: pl.BlockSpec(a.shape, lambda b, j: (0,) * a.ndim, memory_space=pltpu.VMEM)

    # kernel A: channels (slot rows past a block's tier stay unwritten —
    # kernel B's chunk count for that block never reads them)
    kern_a = functools.partial(
        _pe_kernel_channels_t, r1=float(r1), r2=float(r2), p_cols=p_cols, s2=S2, n=N
    )
    chansT = pl.pallas_call(
        kern_a,
        grid=grid,
        in_specs=[qual_spec] + [blk_row] * 3 + [blk_s] * 3 + [blk_c] * 3,
        out_specs=pl.BlockSpec((1, 12, S2, p_cols), lambda b, j: (b, 0, 0, j), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, 12, S2, P), jnp.bfloat16),
        interpret=interpret,
    )(qual_a, xp[:, None, :], yp[:, None, :], zp[:, None, :], iiT, w1T, w2T, cx, cy, cz)

    # ONE cross-scale block-diagonal weight set
    Ws = [
        jnp.concatenate(
            [
                jnp.concatenate([Wa, jnp.zeros_like(Wb)], axis=1),
                jnp.concatenate([jnp.zeros_like(Wa), Wb], axis=1),
            ],
            axis=0,
        ).astype(jnp.float32)
        for Wa, Wb in zip(w1_mlp, w2_mlp)
    ]
    bs = [
        jnp.concatenate([ba.reshape(-1, 1), bb.reshape(-1, 1)], axis=0).astype(jnp.float32)
        for ba, bb in zip(b1_mlp, b2_mlp)
    ]
    weights = [*Ws, *bs]

    w12T = jnp.stack([w1T, w2T], axis=1)  # (B, 2, S2, P)
    chunk_spec = lambda c: pl.BlockSpec(
        (1, 12, 64, p_cols), lambda b, j, c=c: (b, 0, c, j), memory_space=pltpu.VMEM
    )
    wchunk_spec = lambda c: pl.BlockSpec(
        (1, 2, 64, p_cols), lambda b, j, c=c: (b, 0, c, j), memory_space=pltpu.VMEM
    )
    kern_b = functools.partial(_pe_kernel_mlp_v5, p_cols=p_cols)
    out = pl.pallas_call(
        kern_b,
        grid=grid,
        in_specs=[qual_spec]
        + [chunk_spec(c) for c in range(4)]
        + [wchunk_spec(c) for c in range(4)]
        + [full(w) for w in weights],
        out_specs=pl.BlockSpec((1, p_cols, 256), lambda b, j: (b, j, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, P, 256), jnp.float32),
        scratch_shapes=[pltpu.VMEM((256, p_cols), jnp.float32)],
        interpret=interpret,
    )(qual_b, chansT, chansT, chansT, chansT, w12T, w12T, w12T, w12T, *weights)
    return out


def fold_bn(W: jnp.ndarray, scale: jnp.ndarray, bias: jnp.ndarray, mean: jnp.ndarray, var: jnp.ndarray, eps: float = 1e-5):
    """Fold inference BatchNorm into the preceding linear: y = s*(Wx - mu)/sqrt(v+eps) + b."""
    inv = scale / jnp.sqrt(var + eps)
    return W * inv[None, :], bias - mean * inv


# ---------------------------------------------------------------------------
# v3: split PE — XLA channel construction + cols-major chunked MLP/pool kernel
# ---------------------------------------------------------------------------
#
# The point-major fused kernel (above) pays two in-VMEM relayouts per block:
# the 12-plane (p_blk, S) -> (12, p_blk*S) channel flatten feeding the MXU,
# and the (256, p_blk*S) -> (256, p_blk, S) un-flatten feeding the masked
# max-pool — plus a final output transpose. v3 removes ALL of them by
# exploiting that HBM is linear: the (B, 12, P, w) tile layout the XLA
# channel pass writes and the (B, 12, P/p_blk, p_blk*w) channel-major flat
# layout the MLP wants are THE SAME BYTES (free reshape), so the relayout
# never happens in VMEM. The MLP then runs columns-major ((cols, d) = the
# MXU reading the (12, cols) chans block transposed, which the MXU does
# natively), the pool becomes a free sublane-split + max over contiguous
# row blocks, and the output lands points-major with no transpose.
#
# Masks vanish entirely: the scale-1 channels are ZEROED on non-r1 slots in
# the XLA pass, which replaces those slots with an exact copy of the self
# point (rel = 0 -> all six channels 0) — a member of every scale-1
# neighborhood multiset, so the unmasked max is exact. Scale-2 pad slots
# materialize first2 duplicates (reference padding), also max-neutral.
#
# Per-block ADAPTIVE chunks: slots are globally compacted (hits leftmost,
# ops/ball_query._first_k_budget_select), so a block whose neighborhoods
# all have <= c*w hits only needs the first c chunks — skipped chunks hold
# only pad duplicates / zeroed slots. MXU work scales with actual
# neighborhood density (~2x saving on real clouds vs the fixed half-budget
# fast path).


def _pe_mlp_pool_kernel(
    qual_ref,
    c0_ref, c1_ref, c2_ref, c3_ref,
    w0_ref, w1_ref, w2_ref, b0_ref, b1_ref, b2_ref,
    out_ref, acc_ref, *, p_blk: int, w: int,
):
    tier = qual_ref[pl.program_id(0), pl.program_id(1)]
    cols = p_blk * w

    def chunk_pool(ch):  # ch (12, cols) bf16 -> (p_blk, 256) f32 pooled
        h = jax.lax.dot_general(
            ch, w0_ref[...].astype(jnp.bfloat16),
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (cols, 64)
        h = jnp.maximum(h + b0_ref[...], 0.0).astype(jnp.bfloat16)
        h = jax.lax.dot_general(
            h, w1_ref[...].astype(jnp.bfloat16),
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (cols, 128)
        h = jnp.maximum(h + b1_ref[...], 0.0).astype(jnp.bfloat16)
        h = jax.lax.dot_general(
            h, w2_ref[...].astype(jnp.bfloat16),
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (cols, 256)
        h = jnp.maximum(h + b2_ref[...], 0.0)
        # (cols, 256) -> (p_blk, w, 256): major-axis split, no relayout;
        # max over the w contiguous rows of each point
        return jnp.max(h.reshape(p_blk, w, 256), axis=1)

    acc_ref[...] = chunk_pool(c0_ref[0])
    for c, ref in enumerate((c1_ref, c2_ref, c3_ref), start=1):
        @pl.when(tier > c)
        def _(ref=ref):
            acc_ref[...] = jnp.maximum(acc_ref[...], chunk_pool(ref[0]))

    out_ref[0] = acc_ref[...]


def pe_channels_packed(grouped2, w1, w2, center, r1: float, r2: float, nchunks: int = 4):
    """XLA side of PE-v3: build the 12 cross-scale MLP input channels on the
    packed grouping, split into ``nchunks`` contiguous slot chunks.

    Channel order matches the block-diagonal weight packing: scale 1 =
    [rel*m1 (3), lrf1*m1 (3)], scale 2 = [rel (3), lrf2 (3)]. Scale-1
    zeroing implements the pool mask (see module comment); scale 2 is
    unmasked because pad slots duplicate the first hit (reference padding
    semantics, max-neutral). LRF moments: scale 1 weighted by the w1
    multiset multiplicities, scale 2 by the plain mean over all S slots
    (equal to the weighted form — pads are materialized duplicates).

    Returns (chunks, qual_hint_shape) where chunks is a list of
    (B, 12, P, w) bfloat16 arrays.
    """
    from unopose_tpu.ops.lrf import batch_lrf_planar

    gx, gy, gz = (g.astype(jnp.float32) for g in grouped2)
    cx, cy, cz = (c.astype(jnp.float32)[..., None] for c in center)
    rel = (gx - cx, gy - cy, gz - cz)
    l1 = batch_lrf_planar(center, grouped2, r1, mask=w1)
    l2 = batch_lrf_planar(center, grouped2, r2, mask=None)
    m1 = (w1 > 0).astype(jnp.float32)
    chans = jnp.stack(
        [*(r * m1 for r in rel), *(l * m1 for l in l1), *rel, *l2], axis=1
    ).astype(jnp.bfloat16)  # (B, 12, P, S)
    S = chans.shape[-1]
    w = S // nchunks
    return [chans[..., c * w : (c + 1) * w] for c in range(nchunks)], w


def pe_mlp_pool_packed(
    chunks,  # list of nchunks (B, 12, P, w) bf16 channel chunk arrays
    total2,  # (B, P) int32 r2 hit counts (drives the per-block tier)
    w1_mlp: Sequence[jnp.ndarray],
    b1_mlp: Sequence[jnp.ndarray],
    w2_mlp: Sequence[jnp.ndarray],
    b2_mlp: Sequence[jnp.ndarray],
    p_blk: int = 64,
    interpret: bool = False,
) -> jnp.ndarray:
    """PE-v3 kernel driver: chunked cols-major MLP + unmasked max-pool over
    pre-built packed channels (see pe_channels_packed). Returns (B, P, 256)
    float32 pooled features (pre-mlp3)."""
    nc = len(chunks)
    assert nc == 4, "kernel is specialized to 4 chunks"
    B, _, P, w = chunks[0].shape
    cols = p_blk * w
    assert P % p_blk == 0 and cols % 128 == 0, (P, p_blk, w)
    # tile -> flat: same HBM bytes, free reshape. The block axis rides
    # inside the flattened minor dim (Mosaic wants the block's last two
    # dims divisible by (8, 128) or equal to the array's — (12, cols) with
    # 12 == array dim qualifies; a (…, 1, cols) block of a 4-D array does
    # not)
    flat = [c.reshape(B, 12, (P // p_blk) * cols) for c in chunks]

    bmax = jnp.max(total2.reshape(B, P // p_blk, p_blk), axis=-1)
    qual = jnp.clip((bmax + w - 1) // w, 1, nc).astype(jnp.int32)

    # ONE cross-scale block-diagonal weight set (scale 1 | scale 2)
    Ws = [
        jnp.concatenate(
            [
                jnp.concatenate([Wa, jnp.zeros_like(Wb)], axis=1),
                jnp.concatenate([jnp.zeros_like(Wa), Wb], axis=1),
            ],
            axis=0,
        ).astype(jnp.float32)
        for Wa, Wb in zip(w1_mlp, w2_mlp)
    ]
    bs = [
        jnp.concatenate([ba.reshape(1, -1), bb.reshape(1, -1)], axis=1).astype(jnp.float32)
        for ba, bb in zip(b1_mlp, b2_mlp)
    ]
    weights = [*Ws, *bs]

    grid = (B, P // p_blk)
    blk_c = pl.BlockSpec((1, 12, cols), lambda b, j: (b, 0, j), memory_space=pltpu.VMEM)
    qual_spec = pl.BlockSpec(qual.shape, lambda b, j: (0, 0), memory_space=pltpu.SMEM)
    full = lambda a: pl.BlockSpec(a.shape, lambda b, j: (0,) * a.ndim, memory_space=pltpu.VMEM)

    kernel = functools.partial(_pe_mlp_pool_kernel, p_blk=p_blk, w=w)
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[qual_spec] + [blk_c] * nc + [full(x) for x in weights],
        out_specs=pl.BlockSpec((1, p_blk, 256), lambda b, j: (b, j, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, P, 256), jnp.float32),
        scratch_shapes=[pltpu.VMEM((p_blk, 256), jnp.float32)],
        interpret=interpret,
    )(qual, *flat, *weights)
    return out
