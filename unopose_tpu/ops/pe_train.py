"""Fused TRAIN-path fine-PE MLP/BN/pool stack with a custom VJP.

The train step's dominant backward block is the PE MLP/BN stack: the XLA
formulation materializes the (B, {32,64,128}, P, S) fp32 activation family
three times (fwd, remat recompute, bwd) — measured 98.9 ms of the 162 ms
backward at bs=8 (benchmarks/profile_train_bwd.py). This module replaces
it with a pass-structured Pallas pipeline in which NO per-slot activation
ever reaches HBM:

  forward:  3 stats passes (partial-depth recompute, accumulate per-channel
            sum / sum-of-squares across grid steps -> flax-exact batch
            mean/var, fast-variance form) + 1 pooled-output pass.
  backward: 3 "A" passes (deepest layer first: recompute to depth, apply
            the BN backward of the layers above using their already-known
            channel sums, accumulate this layer's sum(g) / sum(g*zhat)) +
            1 "B" pass accumulating the weight gradients.

Gradient structure exploited: the grouped channels carry NO gradient (the
cloud coordinates are data and the fine init pose is a GT-noise label, so
autodiff never differentiates through the channel construction) — the VJP
returns zero cotangents for ``chans`` and only computes (dW, dgamma,
dbeta). BN semantics match flax.linen.BatchNorm exactly: batch stats are
biased fast-variance (E[z^2] - E[z]^2, clipped at 0) in fp32; the ReLU
max-pool backward splits ties evenly like jnp.max's VJP (pads are
duplicates, so ties are the common case).

Matmuls run bf16 x bf16 with fp32 accumulation — the same effective
precision as the XLA train path on TPU (DEFAULT-precision fp32 matmuls
truncate operands to bf16). Everything is padded to 128 lanes with zero
weights/affines, so pad lanes carry exact zeros through every pass.

Reference semantics: oneref_predator_fine_point_matching.py:138-178
(Conv2d+BN2d+ReLU shared MLPs, max over samples).
"""

from __future__ import annotations

import functools
from typing import Sequence

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

DIMS = (6, 32, 64, 128)  # cin, then the three MLP widths
P_BLK = 32
# contraction input dtype: bf16 in production (the TPU XLA train path's
# effective precision); tests flip to float32 to oracle-check the math
# itself against true-fp32 autodiff
_MM_DTYPE = jnp.bfloat16


def _pad128(a, axis):
    d = a.shape[axis]
    if d == 128:
        return a.astype(jnp.float32)
    pad = [(0, 0)] * a.ndim
    pad[axis] = (0, 128 - d)
    return jnp.pad(a.astype(jnp.float32), pad)


def _layers_to(chans_ref, w_refs, ab_refs, depth, cols):
    """Recompute the chain to layer ``depth``: returns (chans2d, ys, z_depth)
    where chans2d is (6, cols) bf16 (layer 1's input, channels-major — the
    first matmul contracts its dim 0, no transpose), ys[l] (l>=1) is the
    post-ReLU output of layer l (cols, 128) bf16, and z_depth is layer
    ``depth``'s raw pre-BN (cols, 128) fp32. Lanes past the true widths are
    exact zeros (zero-padded weights/affines)."""
    chans2d = chans_ref[0].reshape(6, cols).astype(_MM_DTYPE)
    ys = [None]
    h = None
    z = None
    for l in range(depth):
        if l == 0:
            z = jax.lax.dot_general(
                chans2d, w_refs[0][...].astype(_MM_DTYPE),
                dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # (cols, 128)
        else:
            z = jax.lax.dot_general(
                h, w_refs[l][...].astype(_MM_DTYPE),
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
        if l == depth - 1:
            break
        a = ab_refs[l][0][0:1, :]  # (1, 128)
        b = ab_refs[l][0][1:2, :]
        h = jnp.maximum(a * z + b, 0.0).astype(_MM_DTYPE)
        ys.append(h)
    return chans2d, ys, z


def _kernel_stats(chans_ref, *refs, depth: int, cols: int):
    *param_refs, acc_ref = refs
    w_refs = param_refs[:depth]
    ab_refs = param_refs[depth:]
    _, _, z = _layers_to(chans_ref, w_refs, ab_refs, depth, cols)
    s1 = jnp.sum(z, axis=0, keepdims=True)  # (1, 128)
    s2 = jnp.sum(z * z, axis=0, keepdims=True)
    upd = jnp.concatenate([s1, s2, jnp.zeros((6, 128), jnp.float32)], axis=0)

    @pl.when((pl.program_id(0) == 0) & (pl.program_id(1) == 0))
    def _init():
        acc_ref[...] = jnp.zeros((8, 128), jnp.float32)

    acc_ref[...] += upd


def _kernel_fwd(chans_ref, w0, w1, w2, ab0, ab1, ab2, out_ref, *, cols: int, p_blk: int, s: int):
    _, _, z3 = _layers_to(chans_ref, (w0, w1, w2), (ab0, ab1), 3, cols)
    a = ab2[0][0:1, :]
    b = ab2[0][1:2, :]
    y3 = jnp.maximum(a * z3 + b, 0.0)  # (cols, 128) fp32
    out_ref[0] = jnp.max(y3.reshape(p_blk, s, 128), axis=1)


def _pool_bwd(y3, dpool_ref, p_blk, s):
    """dy3 from the max-pool VJP: ties split evenly (jnp.max semantics)."""
    y3r = y3.reshape(p_blk, s, 128)
    mx = jnp.max(y3r, axis=1, keepdims=True)
    eq = (y3r == mx).astype(jnp.float32)
    cnt = jnp.sum(eq, axis=1, keepdims=True)
    dp = dpool_ref[0][:, None, :]  # (p_blk, 1, 128)
    return (eq / cnt * dp).reshape(p_blk * s, 128)


def _bn_bwd_chain(chans_ref, dpool_ref, w_refs, ab_refs, stat_refs, corr_refs, to_layer, cols, p_blk, s, n_total):
    """Recompute forward; back-propagate from the pool down to ``to_layer``
    (1-indexed). Returns (g_to, zhat_to, ys) where g = dL/d(BN output
    pre-ReLU-gate) of that layer. corr_refs[l] holds the (2, 128) channel
    sums [sum(g), sum(g*zhat)] of DEEPER layers (l > to_layer)."""
    chans2d, ys, z3 = _layers_to(chans_ref, w_refs, ab_refs[:2], 3, cols)
    a3 = ab_refs[2][0][0:1, :]
    b3 = ab_refs[2][0][1:2, :]
    pre3 = a3 * z3 + b3
    y3 = jnp.maximum(pre3, 0.0)
    dy3 = _pool_bwd(y3, dpool_ref, p_blk, s)
    g = dy3 * (pre3 > 0.0).astype(jnp.float32)  # layer-3 g
    l = 3
    while l > to_layer:
        # BN backward of layer l -> gradient w.r.t. z_l, then through W_l
        mu = stat_refs[l - 1][0][0:1, :]
        inv = stat_refs[l - 1][0][1:2, :]  # 1/sigma
        gam = stat_refs[l - 1][0][2:3, :]
        zl = z3 if l == 3 else None
        if l != 3:
            # recompute z_l: ys[l-1] is this layer's input
            zl = jax.lax.dot_general(
                ys[l - 1], w_refs[l - 1][...].astype(_MM_DTYPE),
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
        zhat = (zl - mu) * inv
        sg = corr_refs[l - 1][0][0:1, :]
        sgz = corr_refs[l - 1][0][1:2, :]
        dz = gam * inv * (g - sg * (1.0 / n_total) - zhat * (sgz * (1.0 / n_total)))
        # dy_{l-1} = dz @ W_l^T ; gate by ReLU of layer l-1
        dy = jax.lax.dot_general(
            dz.astype(_MM_DTYPE), w_refs[l - 1][...].astype(_MM_DTYPE),
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (cols, 128) w.r.t. ys[l-1]
        # f32 compare: Mosaic rejects bf16 vector compares in packed layouts
        g = dy * (ys[l - 1].astype(jnp.float32) > 0.0).astype(jnp.float32)
        l -= 1
    # zhat of to_layer
    mu = stat_refs[to_layer - 1][0][0:1, :]
    inv = stat_refs[to_layer - 1][0][1:2, :]
    if to_layer == 3:
        zt = z3
    elif to_layer == 1:
        zt = jax.lax.dot_general(
            chans2d, w_refs[0][...].astype(_MM_DTYPE),
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
    else:
        zt = jax.lax.dot_general(
            ys[to_layer - 1], w_refs[to_layer - 1][...].astype(_MM_DTYPE),
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
    zhat_t = (zt - mu) * inv
    return g, zhat_t, ys, chans2d


def _kernel_bwdA(chans_ref, dpool_ref, *refs, to_layer: int, cols: int, p_blk: int, s: int, n_total: float):
    w_refs = refs[0:3]
    ab_refs = refs[3:6]
    stat_refs = refs[6:9]
    corr_refs = refs[9:12]
    acc_ref = refs[12]
    g, zhat, _, _ = _bn_bwd_chain(
        chans_ref, dpool_ref, w_refs, ab_refs, stat_refs, corr_refs, to_layer, cols, p_blk, s, n_total
    )
    s1 = jnp.sum(g, axis=0, keepdims=True)
    s2 = jnp.sum(g * zhat, axis=0, keepdims=True)
    upd = jnp.concatenate([s1, s2, jnp.zeros((6, 128), jnp.float32)], axis=0)

    @pl.when((pl.program_id(0) == 0) & (pl.program_id(1) == 0))
    def _init():
        acc_ref[...] = jnp.zeros((8, 128), jnp.float32)

    acc_ref[...] += upd


def _kernel_bwdB(chans_ref, dpool_ref, *refs, cols: int, p_blk: int, s: int, n_total: float):
    w_refs = refs[0:3]
    ab_refs = refs[3:6]
    stat_refs = refs[6:9]
    corr_refs = refs[9:12]
    dw0_ref, dw1_ref, dw2_ref = refs[12:15]
    # one chain recompute; dz_l for every layer using the known sums
    g, zhat, ys, chans2d = _bn_bwd_chain(
        chans_ref, dpool_ref, w_refs, ab_refs, stat_refs, corr_refs, 1, cols, p_blk, s, n_total
    )
    dws = [dw0_ref, dw1_ref, dw2_ref]

    @pl.when((pl.program_id(0) == 0) & (pl.program_id(1) == 0))
    def _init():
        dw0_ref[...] = jnp.zeros((8, 128), jnp.float32)
        dw1_ref[...] = jnp.zeros((32, 128), jnp.float32)
        dw2_ref[...] = jnp.zeros((64, 128), jnp.float32)

    # walk back UP the chain accumulating dW_l = ys[l-1]^T dz_l. We already
    # have g/zhat at layer 1; recompute the deeper layers' (g, zhat) by
    # rerunning the backward chain at each depth (cheap relative to HBM
    # round-trips; each is in-VMEM).
    for l in (1, 2, 3):
        if l == 1:
            gl, zhatl = g, zhat
        else:
            gl, zhatl, _, _ = _bn_bwd_chain(
                chans_ref, dpool_ref, w_refs, ab_refs, stat_refs, corr_refs, l, cols, p_blk, s, n_total
            )
        mu = stat_refs[l - 1][0][0:1, :]
        inv = stat_refs[l - 1][0][1:2, :]
        gam = stat_refs[l - 1][0][2:3, :]
        sg = corr_refs[l - 1][0][0:1, :]
        sgz = corr_refs[l - 1][0][1:2, :]
        dz = gam * inv * (gl - sg * (1.0 / n_total) - zhatl * (sgz * (1.0 / n_total)))
        if l == 1:
            dw = jax.lax.dot_general(
                chans2d, dz.astype(_MM_DTYPE),
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # (6, 128)
            dw0_ref[...] += jnp.concatenate([dw, jnp.zeros((2, 128), jnp.float32)], axis=0)
        else:
            dw = jax.lax.dot_general(
                ys[l - 1], dz.astype(_MM_DTYPE),
                dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # (128in, 128out); rows past the true cin are exact zeros
            dws[l - 1][...] += dw[: dws[l - 1].shape[0], :]


def _grid_call(kernel, chans, extra_inputs, out_shapes, out_specs, p_blk, interpret=False):
    B = chans.shape[0]
    P = chans.shape[2]
    S = chans.shape[3]
    cols = p_blk * S
    flat = chans.reshape(B, 6, P * S)
    grid = (B, P // p_blk)
    in_specs = [pl.BlockSpec((1, 6, cols), lambda b, j: (b, 0, j), memory_space=pltpu.VMEM)]
    inputs = [flat]
    for a, spec in extra_inputs:
        in_specs.append(spec)
        inputs.append(a)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shapes,
        interpret=interpret,
    )(*inputs)


def _full(a):
    return pl.BlockSpec(a.shape, lambda b, j: (0,) * a.ndim, memory_space=pltpu.VMEM)


def _row_spec():
    return pl.BlockSpec((1, 2, 128), lambda b, j: (0, 0, 0), memory_space=pltpu.VMEM)


def _acc_spec(rows=8):
    return pl.BlockSpec((rows, 128), lambda b, j: (0, 0), memory_space=pltpu.VMEM)


def _stats_of(chans, Wp, abs_, depth, p_blk, interpret):
    S = chans.shape[3]
    cols = p_blk * S
    kern = functools.partial(_kernel_stats, depth=depth, cols=cols)
    extra = [(Wp[l], _full(Wp[l])) for l in range(depth)] + [
        (abs_[l], _row_spec()) for l in range(depth - 1)
    ]
    acc = _grid_call(
        kern, chans, extra,
        jax.ShapeDtypeStruct((8, 128), jnp.float32), _acc_spec(), p_blk, interpret,
    )
    return acc[0], acc[1]  # sum z, sum z^2


def pe_mlp_bn_pool_train(
    chans: jnp.ndarray,  # (B, 6, P, S) fp32 channel planes (stop-gradient)
    Ws: Sequence[jnp.ndarray],  # (6,32), (32,64), (64,128)
    gammas: Sequence[jnp.ndarray],
    betas: Sequence[jnp.ndarray],
    eps: float = 1e-5,
    p_blk: int | None = None,
    interpret: bool = False,
):
    """Train-mode fused MLP+BN+ReLU+max-pool over the sample axis.

    Returns (pooled (B, P, 128) f32, (mus, vars)) where mus/vars are the
    flax-exact biased batch statistics per layer (for the running update).
    Differentiable w.r.t. Ws/gammas/betas ONLY (chans get zero cotangents).
    """
    if p_blk is None:
        # cols = p_blk * S ~ 4096 keeps the deepest (bwdB) kernel's live
        # set under the 16MB scoped-VMEM stack limit
        S = chans.shape[3]
        p_blk = max(8, 4096 // S)
        while chans.shape[2] % p_blk:
            p_blk //= 2
    return _pe_train_vjp(chans, tuple(Ws), tuple(gammas), tuple(betas), eps, p_blk, interpret)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6))
def _pe_train_vjp(chans, Ws, gammas, betas, eps, p_blk, interpret):
    out, _ = _pe_train_fwd_impl(chans, Ws, gammas, betas, eps, p_blk, interpret)
    return out


def _pe_train_fwd_impl(chans, Ws, gammas, betas, eps, p_blk, interpret):
    B, _, P, S = chans.shape
    n_total = float(B * P * S)
    Wp = [_pad128(W, 1) if W.shape[0] == 6 else _pad128(_pad128(W, 0), 1) for W in Ws]
    mus, vars_, abs_, stats_rows = [], [], [], []
    for l in range(3):
        sz, sz2 = _stats_of(chans, Wp, abs_, l + 1, p_blk, interpret)
        mu = sz / n_total
        var = jnp.maximum(sz2 / n_total - mu * mu, 0.0)
        inv = 1.0 / jnp.sqrt(var + eps)
        gam = _pad128(gammas[l][None], 1)[0]
        bet = _pad128(betas[l][None], 1)[0]
        a = gam * inv
        b = bet - gam * mu * inv
        abs_.append(jnp.stack([a, b])[None])  # (1, 2, 128)
        stats_rows.append(jnp.stack([mu, inv, gam])[None])  # (1, 3, 128) -> padded below
        mus.append(mu[: Ws[l].shape[1]])
        vars_.append(var[: Ws[l].shape[1]])

    cols = p_blk * S
    kern = functools.partial(_kernel_fwd, cols=cols, p_blk=p_blk, s=S)
    extra = [(Wp[l], _full(Wp[l])) for l in range(3)] + [(abs_[l], _row_spec()) for l in range(3)]
    pooled = _grid_call(
        kern, chans, extra,
        jax.ShapeDtypeStruct((B, P, 128), jnp.float32),
        pl.BlockSpec((1, p_blk, 128), lambda b, j: (b, j, 0), memory_space=pltpu.VMEM),
        p_blk, interpret,
    )
    return (pooled, (mus, vars_)), (chans, Ws, gammas, betas, abs_, stats_rows)


def _pe_train_fwd(chans, Ws, gammas, betas, eps, p_blk, interpret):
    out, res = _pe_train_fwd_impl(chans, Ws, gammas, betas, eps, p_blk, interpret)
    return out, res


def _pe_train_bwd(eps, p_blk, interpret, res, cts):
    chans, Ws, gammas, betas, abs_, stats_rows = res
    dpool, _ = cts  # cotangent of (mus, vars) is zero (running-stat update only)
    B, _, P, S = chans.shape
    cols = p_blk * S
    n_total = float(B * P * S)
    Wp = [_pad128(W, 1) if W.shape[0] == 6 else _pad128(_pad128(W, 0), 1) for W in Ws]
    def stat_spec():
        return pl.BlockSpec((1, 3, 128), lambda b, j: (0, 0, 0), memory_space=pltpu.VMEM)

    dpool_spec = pl.BlockSpec((1, p_blk, 128), lambda b, j: (b, j, 0), memory_space=pltpu.VMEM)
    zero_corr = jnp.zeros((1, 2, 128), jnp.float32)

    def run_A(to_layer, corrs):
        kern = functools.partial(
            _kernel_bwdA, to_layer=to_layer, cols=cols, p_blk=p_blk, s=S, n_total=n_total
        )
        extra = (
            [(dpool, dpool_spec)]
            + [(Wp[l], _full(Wp[l])) for l in range(3)]
            + [(abs_[l], _row_spec()) for l in range(3)]
            + [(stats_rows[l], stat_spec()) for l in range(3)]
            + [(corrs[l], _row_spec()) for l in range(3)]
        )
        acc = _grid_call(
            kern, chans, extra,
            jax.ShapeDtypeStruct((8, 128), jnp.float32), _acc_spec(), p_blk, interpret,
        )
        return jnp.stack([acc[0], acc[1]])[None]  # (1, 2, 128)

    corrs = [zero_corr, zero_corr, zero_corr]
    corrs[2] = run_A(3, corrs)
    corrs[1] = run_A(2, corrs)
    corrs[0] = run_A(1, corrs)

    kern = functools.partial(_kernel_bwdB, cols=cols, p_blk=p_blk, s=S, n_total=n_total)
    extra = (
        [(dpool, dpool_spec)]
        + [(Wp[l], _full(Wp[l])) for l in range(3)]
        + [(abs_[l], _row_spec()) for l in range(3)]
        + [(stats_rows[l], stat_spec()) for l in range(3)]
        + [(corrs[l], _row_spec()) for l in range(3)]
    )
    dws = _grid_call(
        kern, chans, extra,
        [
            jax.ShapeDtypeStruct((8, 128), jnp.float32),
            jax.ShapeDtypeStruct((32, 128), jnp.float32),
            jax.ShapeDtypeStruct((64, 128), jnp.float32),
        ],
        [_acc_spec(8), _acc_spec(32), _acc_spec(64)],
        p_blk, interpret,
    )
    dWs = tuple(
        dws[l][: Ws[l].shape[0], : Ws[l].shape[1]].astype(Ws[l].dtype) for l in range(3)
    )
    dgammas = tuple(corrs[l][0, 1, : gammas[l].shape[0]].astype(gammas[l].dtype) for l in range(3))
    dbetas = tuple(corrs[l][0, 0, : betas[l].shape[0]].astype(betas[l].dtype) for l in range(3))
    return (jnp.zeros_like(chans), dWs, dgammas, dbetas)


_pe_train_vjp.defvjp(_pe_train_fwd, _pe_train_bwd)


# ---------------------------------------------------------------------------
# Frozen-BN fast-train variant: BN uses RUNNING statistics (eval-form affine)
# during training — an OPT-IN deviation from the reference recipe (which uses
# batch statistics). With constant (mu, sigma) the BN backward loses its
# global mean/zhat correction sums, so the whole stack needs ONE forward
# kernel and ONE backward kernel (recompute + per-layer dz + dW/dgamma/dbeta
# accumulation) instead of the exact path's 8 sequential passes.
# ---------------------------------------------------------------------------


def _kernel_bwd_frozen(
    chans_ref, dpool_ref,
    w0, w1, w2, ab0, ab1, ab2, st0, st1, st2,
    dw0_ref, dw1_ref, dw2_ref, gb0_ref, gb1_ref, gb2_ref,
    *, cols: int, p_blk: int, s: int,
):
    w_refs = (w0, w1, w2)
    ab_refs = (ab0, ab1, ab2)
    stat_refs = (st0, st1, st2)
    chans2d, ys, z3 = _layers_to(chans_ref, w_refs, ab_refs[:2], 3, cols)
    a3 = ab_refs[2][0][0:1, :]
    b3 = ab_refs[2][0][1:2, :]
    pre3 = a3 * z3 + b3
    y3 = jnp.maximum(pre3, 0.0)
    dy = _pool_bwd(y3, dpool_ref, p_blk, s)

    @pl.when((pl.program_id(0) == 0) & (pl.program_id(1) == 0))
    def _init():
        dw0_ref[...] = jnp.zeros((8, 128), jnp.float32)
        dw1_ref[...] = jnp.zeros((32, 128), jnp.float32)
        dw2_ref[...] = jnp.zeros((64, 128), jnp.float32)
        gb0_ref[...] = jnp.zeros((8, 128), jnp.float32)
        gb1_ref[...] = jnp.zeros((8, 128), jnp.float32)
        gb2_ref[...] = jnp.zeros((8, 128), jnp.float32)

    dws = (dw0_ref, dw1_ref, dw2_ref)
    gbs = (gb0_ref, gb1_ref, gb2_ref)
    zs = {3: z3}
    for l in (3, 2, 1):
        if l not in zs:
            src = chans2d if l == 1 else ys[l - 1]
            dims = (((0,), (0,)), ((), ())) if l == 1 else (((1,), (0,)), ((), ()))
            zs[l] = jax.lax.dot_general(
                src, w_refs[l - 1][...].astype(_MM_DTYPE),
                dimension_numbers=dims, preferred_element_type=jnp.float32,
            )
        mu = stat_refs[l - 1][0][0:1, :]
        inv = stat_refs[l - 1][0][1:2, :]
        gam = stat_refs[l - 1][0][2:3, :]
        zhat = (zs[l] - mu) * inv
        if l == 3:
            g = dy * (pre3 > 0.0).astype(jnp.float32)
        else:
            a_l = ab_refs[l - 1][0][0:1, :]
            b_l = ab_refs[l - 1][0][1:2, :]
            g = dy * ((a_l * zs[l] + b_l) > 0.0).astype(jnp.float32)
        # frozen BN: dz = gamma/sigma * g, no batch-stat correction terms
        dz = gam * inv * g
        sg = jnp.sum(g, axis=0, keepdims=True)
        sgz = jnp.sum(g * zhat, axis=0, keepdims=True)
        gbs[l - 1][...] += jnp.concatenate([sg, sgz, jnp.zeros((6, 128), jnp.float32)], axis=0)
        if l == 1:
            dw = jax.lax.dot_general(
                chans2d, dz.astype(_MM_DTYPE),
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            dw0_ref[...] += jnp.concatenate([dw, jnp.zeros((2, 128), jnp.float32)], axis=0)
        else:
            dw = jax.lax.dot_general(
                ys[l - 1], dz.astype(_MM_DTYPE),
                dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            dws[l - 1][...] += dw[: dws[l - 1].shape[0], :]
            dy = jax.lax.dot_general(
                dz.astype(_MM_DTYPE), w_refs[l - 1][...].astype(_MM_DTYPE),
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )


def pe_mlp_bn_pool_frozen(
    chans: jnp.ndarray,  # (B, 6, P, S) fp32 (stop-gradient)
    Ws: Sequence[jnp.ndarray],
    gammas: Sequence[jnp.ndarray],
    betas: Sequence[jnp.ndarray],
    means: Sequence[jnp.ndarray],
    vars_: Sequence[jnp.ndarray],
    eps: float = 1e-5,
    p_blk: int | None = None,
    interpret: bool = False,
):
    """Frozen-BN train-mode stack: BN normalizes with the RUNNING stats
    (use_running_average=True semantics). Returns pooled (B, P, 128) f32.
    Differentiable w.r.t. Ws/gammas/betas; no stat updates."""
    if p_blk is None:
        S = chans.shape[3]
        p_blk = max(8, 4096 // S)
        while chans.shape[2] % p_blk:
            p_blk //= 2
    return _pe_frozen_vjp(
        chans, tuple(Ws), tuple(gammas), tuple(betas),
        tuple(jnp.asarray(m) for m in means), tuple(jnp.asarray(v) for v in vars_),
        eps, p_blk, interpret,
    )


def _frozen_fwd_impl(chans, Ws, gammas, betas, means, vars_, eps, p_blk, interpret):
    B, _, P, S = chans.shape
    Wp = [_pad128(W, 1) if W.shape[0] == 6 else _pad128(_pad128(W, 0), 1) for W in Ws]
    abs_, stats_rows = [], []
    for l in range(3):
        mu = _pad128(means[l][None], 1)[0]
        var = _pad128(vars_[l][None], 1)[0]
        inv = 1.0 / jnp.sqrt(var + eps)
        gam = _pad128(gammas[l][None], 1)[0]
        bet = _pad128(betas[l][None], 1)[0]
        abs_.append(jnp.stack([gam * inv, bet - gam * mu * inv])[None])
        stats_rows.append(jnp.stack([mu, inv, gam])[None])
    cols = p_blk * S
    kern = functools.partial(_kernel_fwd, cols=cols, p_blk=p_blk, s=S)
    extra = [(Wp[l], _full(Wp[l])) for l in range(3)] + [(abs_[l], _row_spec()) for l in range(3)]
    pooled = _grid_call(
        kern, chans, extra,
        jax.ShapeDtypeStruct((B, P, 128), jnp.float32),
        pl.BlockSpec((1, p_blk, 128), lambda b, j: (b, j, 0), memory_space=pltpu.VMEM),
        p_blk, interpret,
    )
    return pooled, (chans, Ws, gammas, abs_, stats_rows)


@functools.partial(jax.custom_vjp, nondiff_argnums=(6, 7, 8))
def _pe_frozen_vjp(chans, Ws, gammas, betas, means, vars_, eps, p_blk, interpret):
    out, _ = _frozen_fwd_impl(chans, Ws, gammas, betas, means, vars_, eps, p_blk, interpret)
    return out


def _frozen_fwd(chans, Ws, gammas, betas, means, vars_, eps, p_blk, interpret):
    out, res = _frozen_fwd_impl(chans, Ws, gammas, betas, means, vars_, eps, p_blk, interpret)
    return out, res


def _frozen_bwd(eps, p_blk, interpret, res, dpool):
    chans, Ws, gammas, abs_, stats_rows = res
    B, _, P, S = chans.shape
    cols = p_blk * S
    Wp = [_pad128(W, 1) if W.shape[0] == 6 else _pad128(_pad128(W, 0), 1) for W in Ws]

    def stat_spec():
        return pl.BlockSpec((1, 3, 128), lambda b, j: (0, 0, 0), memory_space=pltpu.VMEM)

    dpool_spec = pl.BlockSpec((1, p_blk, 128), lambda b, j: (b, j, 0), memory_space=pltpu.VMEM)
    kern = functools.partial(_kernel_bwd_frozen, cols=cols, p_blk=p_blk, s=S)
    extra = (
        [(dpool, dpool_spec)]
        + [(Wp[l], _full(Wp[l])) for l in range(3)]
        + [(abs_[l], _row_spec()) for l in range(3)]
        + [(stats_rows[l], stat_spec()) for l in range(3)]
    )
    outs = _grid_call(
        kern, chans, extra,
        [
            jax.ShapeDtypeStruct((8, 128), jnp.float32),
            jax.ShapeDtypeStruct((32, 128), jnp.float32),
            jax.ShapeDtypeStruct((64, 128), jnp.float32),
            jax.ShapeDtypeStruct((8, 128), jnp.float32),
            jax.ShapeDtypeStruct((8, 128), jnp.float32),
            jax.ShapeDtypeStruct((8, 128), jnp.float32),
        ],
        [_acc_spec(8), _acc_spec(32), _acc_spec(64), _acc_spec(8), _acc_spec(8), _acc_spec(8)],
        p_blk, interpret,
    )
    dws_raw, gbs = outs[:3], outs[3:]
    dWs = tuple(dws_raw[l][: Ws[l].shape[0], : Ws[l].shape[1]].astype(Ws[l].dtype) for l in range(3))
    dgammas = tuple(gbs[l][1, : gammas[l].shape[0]].astype(gammas[l].dtype) for l in range(3))
    dbetas = tuple(gbs[l][0, : gammas[l].shape[0]].astype(gammas[l].dtype) for l in range(3))
    zeros3 = tuple(jnp.zeros_like(g) for g in gammas)
    return (jnp.zeros_like(chans), dWs, dgammas, dbetas, zeros3, zeros3)


_pe_frozen_vjp.defvjp(_frozen_fwd, _frozen_bwd)
