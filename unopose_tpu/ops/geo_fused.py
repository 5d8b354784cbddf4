"""Fused geometric-structure-embedding kernel (distance + angular RPE).

The geo embedding (models/embedding.py, reference transformer.py:287-350)
is transcendental-bound: 4 sinusoid passes (1 distance + angle_k angular)
of 128 frequencies over every (i, j) node pair, each followed by a 256x256
projection, with every intermediate round-tripping HBM. Profiled at
~13 ms/cloud on v5e — the largest stage pair of the whole forward.

TPU-native rewrite:

1. **Pre-projected tables.** For a STATICALLY bounded index domain
   ``x in [0, x_max]`` the map ``f(x) = sinusoid(x) @ W + b`` is a fixed
   smooth curve per forward step. Sample f on a T-point grid *after* the
   projection (T x D), folding BOTH the transcendentals and the projection
   GEMM into one MXU contraction.

2. **3-point Lagrange stencil instead of gathers.** TPUs have no fast
   per-element gather, so the evaluation is a dense contraction: build
   ``E[i, j] = l_delta(r_i)`` where ``delta = j - q_i in {-1, 0, 1}`` and
   ``l`` are the quadratic Lagrange weights on the centered stencil
   (~8 VPU ops per entry), then ``E @ table``. Reconstruction error is
   O(|f'''| h^3 / 16) — ~2e-4 at T=128 over the production domains, an
   order below the 1e-3 reference-parity gate. At T=128 the contraction
   depth K = T fills the systolic array exactly once per eval (a
   second-order Taylor formulation needs K = 3T = three passes for the
   same order); the pre-rewrite path paid ~1.9k VPU ops per element on
   polynomial sincos alone.

The Pallas kernel fuses, per (batch, row-block): pairwise distances,
distance-table evaluation, angle_k cross-product angles (branchless
atan2 — Mosaic has no atan lowering), angle-table evaluation, the max
reduction over k, and the final sum — writing ONLY the (B, N, N, D)
result to HBM. Gradients are not needed: the reference stop-gradients
the embedding inputs (transformer.py:300) and the tables are rebuilt
from the projection weights every step.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def atan_poly01(u: jnp.ndarray) -> jnp.ndarray:
    """Near-minimax atan on u in [0, 1] (Chebyshev LS fit in u^2, max err
    ~2.9e-7 rad, ~16 VPU ops)."""
    u2 = u * u
    p = -0.005021087850713095
    p = 0.025331775490924545 + u2 * p
    p = -0.06087457203230464 + u2 * p
    p = 0.10002210544512247 + u2 * p
    p = -0.14047822793196393 + u2 * p
    p = 0.1997402878865833 + u2 * p
    p = -0.33332232628435243 + u2 * p
    p = 0.9999999227777523 + u2 * p
    return u * p


def atan2_pos_sin(s: jnp.ndarray, c: jnp.ndarray) -> jnp.ndarray:
    """Branchless atan2(s, c) for s >= 0 — result in [0, pi].

    Mirrors jnp.arctan2 on the geo embedding's (sin_v, cos_v) inputs where
    sin_v = |cross| >= 0. The degenerate (0, 0) input must be pre-guarded
    by the caller (the embedding maps it to angle 0 via cos_v := 1).
    """
    ac = jnp.abs(c)
    lo = jnp.minimum(s, ac)
    hi = jnp.maximum(jnp.maximum(s, ac), 1e-30)
    a = atan_poly01(lo / hi)
    a = jnp.where(s > ac, jnp.float32(np.pi / 2) - a, a)
    return jnp.where(c < 0, jnp.float32(np.pi) - a, a)


def build_taylor_table(
    W: jnp.ndarray,  # (D_sin, D) projection kernel (concat sin/cos layout)
    b: jnp.ndarray,  # (D,)
    x_max: float,
    T: int,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """(T, D) table f(grid) plus scale, f(x) = sinusoid(x) @ W + b with the
    concat [sin_0.., cos_0..] layout of models/embedding.sinusoidal_embedding.

    Returns (table (T, D) fp32, scale = 1/h) with grid position
    pos = x * scale; the kernel evaluates f by a 3-point Lagrange stencil
    around q = round(pos).
    """
    D_sin = W.shape[0]
    om = jnp.exp(jnp.arange(0, D_sin, 2, dtype=jnp.float32) * (-np.log(10000.0) / D_sin))
    h = x_max / (T - 1)
    grid = jnp.arange(T, dtype=jnp.float32) * h
    arg = grid[:, None] * om[None, :]  # (T, D_sin/2)
    f0 = jnp.concatenate([jnp.sin(arg), jnp.cos(arg)], axis=-1)  # (T, D_sin)
    # the table GEMM is tiny (T x D_sin x D) but its values anchor the whole
    # reconstruction — default (bf16-accumulated) precision costs 5e-3
    t0 = jnp.matmul(f0, W.astype(jnp.float32), precision=jax.lax.Precision.HIGHEST)
    return t0 + b.astype(jnp.float32), float(1.0 / h)


def _taylor_eval(pos, tab, T: int, r_blk: int, Np: int, D: int, mm_dtype):
    """pos (r_blk, Np) in grid units -> (r_blk*Np, D) fp32: quadratic
    Lagrange weights on the {q-1, q, q+1} stencil, evaluated as a dense
    (rows, T) @ (T, D) contraction (K = T = one systolic pass at T=128)."""
    pos = jnp.clip(pos, 0.0, T - 1.0)
    # clamp the stencil center to [1, T-2]: at the edges |r| grows to <= 1,
    # where the centered quadratic is still second-order accurate
    q = jnp.clip(jnp.floor(pos + 0.5), 1.0, T - 2.0)
    r = (pos - q)[:, :, None]  # (r_blk, Np, 1)
    iota = jax.lax.broadcasted_iota(jnp.int32, (r_blk, Np, T), 2)  # Mosaic: iota must be int
    delta = iota - q.astype(jnp.int32)[:, :, None]
    l_m = 0.5 * r * (r - 1.0)
    l_0 = 1.0 - r * r
    l_p = 0.5 * r * (r + 1.0)
    E = jnp.where(
        delta == 0, l_0, jnp.where(delta == -1, l_m, jnp.where(delta == 1, l_p, 0.0))
    )  # (r_blk, Np, T)
    E = E.reshape(r_blk * Np, T)
    # bf16 operands + HIGHEST is rejected by Mosaic ("Bad lhs type"); the
    # operand dtype already fixes the contraction precision, and the fp32
    # accumulator carries the result
    prec = jax.lax.Precision.HIGHEST if mm_dtype == jnp.float32 else jax.lax.Precision.DEFAULT
    return jax.lax.dot_general(
        E.astype(mm_dtype), tab.astype(mm_dtype),
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=prec,
    )  # (r_blk*Np, D)


def _geo_kernel(
    rowpack_ref,  # (1, r_blk, 3 + 3k) packed row points + k anchor vectors —
    # ONE block per tile: 12 separate (1, r_blk, 1) inputs cost 12 tiny DMAs
    # per grid step (measured ~2x the whole kernel's compute time)
    cx_ref, cy_ref, cz_ref,  # col points (1, 1, Np)
    *rest,  # tab_d (T, D), tab_a (T, D), out
    r_blk: int,
    Np: int,
    D: int,
    T: int,
    k: int,
    scale_d: float,
    scale_a: float,
    factor_a: float,
    inv_sigma_d: float,
    out_dtype,
):
    tab_d = rest[0][...]  # (T, D)
    tab_a = rest[1][...]
    if len(rest) == 4:
        qscale_ref, out_ref = rest[2], rest[3]  # (1, D) 127/bound, int8 out
    else:
        qscale_ref, out_ref = None, rest[2]

    rp = rowpack_ref[0]  # (r_blk, 3 + 3k)
    rx = rp[:, 0:1]  # (r_blk, 1)
    ry = rp[:, 1:2]
    rz = rp[:, 2:3]
    ax = cx_ref[0] - rx  # (r_blk, Np): p_j - p_i
    ay = cy_ref[0] - ry
    az = cz_ref[0] - rz

    mm_dtype = jnp.float32 if jnp.dtype(out_dtype).itemsize >= 4 else jnp.bfloat16
    d = jnp.sqrt(ax * ax + ay * ay + az * az)
    acc = _taylor_eval(d * (inv_sigma_d * scale_d), tab_d, T, r_blk, Np, D, mm_dtype)

    acc_a = None
    for kk in range(k):
        vx = rp[:, 3 + 3 * kk : 4 + 3 * kk]  # (r_blk, 1)
        vy = rp[:, 4 + 3 * kk : 5 + 3 * kk]
        vz = rp[:, 5 + 3 * kk : 6 + 3 * kk]
        cxp = vy * az - vz * ay
        cyp = vz * ax - vx * az
        czp = vx * ay - vy * ax
        sin_v = jnp.sqrt(cxp * cxp + cyp * cyp + czp * czp)
        cos_v = vx * ax + vy * ay + vz * az
        cos_v = jnp.where(jnp.logical_and(sin_v == 0.0, cos_v == 0.0), 1.0, cos_v)
        a_idx = atan2_pos_sin(sin_v, cos_v) * factor_a
        e = _taylor_eval(a_idx * scale_a, tab_a, T, r_blk, Np, D, mm_dtype)
        acc_a = e if acc_a is None else jnp.maximum(acc_a, e)

    e = (acc + acc_a).reshape(r_blk, Np, D)
    if qscale_ref is not None:
        # symmetric per-channel int8: |e[..., c]| <= bound[c] by construction
        # (Lagrange |w|-sum x per-channel table maxima), so no clip needed
        out_ref[0] = jnp.round(e * qscale_ref[...][None]).astype(jnp.int8)
    else:
        out_ref[0] = e.astype(out_dtype)


def geo_rpe_fused(
    points: jnp.ndarray,  # (B, N, 3) fp32
    ref_vec: jnp.ndarray,  # (B, N, k, 3) fp32 knn anchor vectors
    tab_d: jnp.ndarray,  # (3T, D) from build_taylor_table
    tab_a: jnp.ndarray,  # (3T, D)
    scale_d: float,  # grid-units-per-index for the d table
    scale_a: float,
    sigma_d: float,
    factor_a: float,
    r_blk: int = 8,
    out_dtype=jnp.float32,
    quantize: bool = False,
    interpret: bool = False,
):
    """Fused distance+angular RPE -> (B, N, N, D). See module docstring.

    ``quantize=True`` writes the embedding as symmetric per-channel int8 and
    returns (e8 (B, N, N, D) int8, scale (D,) fp32 dequant factors) — HALF
    the HBM bytes of bf16 for both this kernel's write and every RPE
    layer's read, on a chip measured at ~90 GB/s write / ~170 GB/s read.
    The bound is exact: |e[..., c]| <= 1.25 * (max_t|tab_d[t,c]| +
    max_t|tab_a[t,c]|) (1.25 = max Lagrange |weight| sum), so the
    quantization step is <= bound/127 — ~0.4% of the channel range,
    the same order as the bf16 rounding it replaces.
    """
    B, N, _ = points.shape
    k = ref_vec.shape[2]
    T, D = tab_d.shape
    Np = ((N + 127) // 128) * 128
    Nr = ((N + r_blk - 1) // r_blk) * r_blk
    pts = jnp.pad(points.astype(jnp.float32), ((0, 0), (0, max(Np, Nr) - N), (0, 0)))
    rv = jnp.pad(ref_vec.astype(jnp.float32), ((0, 0), (0, Nr - N), (0, 0), (0, 0)))

    # pack [p, v_1..v_k] into one (B, Nr, 3+3k) row input: ONE DMA per tile
    rowpack = jnp.concatenate(
        [pts[:, :Nr, :]] + [rv[:, :, kk, :] for kk in range(k)], axis=2
    )
    cols = [pts[:, :Np, i].reshape(B, 1, Np) for i in range(3)]  # (B, 1, Np)

    grid = (B, Nr // r_blk)
    rowpack_spec = pl.BlockSpec((1, r_blk, 3 + 3 * k), lambda b, j: (b, j, 0), memory_space=pltpu.VMEM)
    col_spec = pl.BlockSpec((1, 1, Np), lambda b, j: (b, 0, 0), memory_space=pltpu.VMEM)
    tab_spec = pl.BlockSpec((T, D), lambda b, j: (0, 0), memory_space=pltpu.VMEM)

    kernel = functools.partial(
        _geo_kernel,
        r_blk=r_blk, Np=Np, D=D, T=T, k=k,
        scale_d=float(scale_d), scale_a=float(scale_a),
        factor_a=float(factor_a), inv_sigma_d=float(1.0 / sigma_d),
        out_dtype=out_dtype,
    )

    in_specs = [rowpack_spec] + [col_spec] * 3 + [tab_spec] * 2
    inputs = [rowpack, *cols, tab_d.astype(jnp.float32), tab_a.astype(jnp.float32)]
    if quantize:
        bound = 1.25 * (
            jnp.max(jnp.abs(tab_d), axis=0) + jnp.max(jnp.abs(tab_a), axis=0)
        )  # (D,) exact channel bound
        qscale = (127.0 / jnp.maximum(bound, 1e-20)).astype(jnp.float32)[None, :]
        in_specs.append(pl.BlockSpec((1, D), lambda b, j: (0, 0), memory_space=pltpu.VMEM))
        inputs.append(qscale)
        store_dtype = jnp.int8
    else:
        store_dtype = out_dtype
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, r_blk, Np, D), lambda b, j: (b, j, 0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, Nr, Np, D), store_dtype),
        interpret=interpret,
    )(*inputs)
    out = out[:, :N, :N, :]
    if quantize:
        return out, (1.0 / qscale[0]).astype(jnp.float32)
    return out
