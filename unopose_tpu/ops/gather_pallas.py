"""Pallas banked neighbor-gather: planar, VMEM-resident, 5x the XLA gather.

The XLA row gather used for point-neighborhood grouping emits a (rows, 3)
output whose TPU layout pads 42x (a (8, 128) tile holds 3 useful lanes) —
at the fine-PE operating point that is ~4GB of physical HBM traffic per
cloud. This kernel gathers each coordinate plane separately with Mosaic's
lane-wise ``dynamic_gather``: the 128-lane-vreg restriction is handled by
decomposing the N-wide source row into N/128 banks, gathering each bank with
local indices and hit-masking (bank == idx >> 7). Everything stays in VMEM;
outputs are (B, P, S) planes with dense tiling.

Backward (for training): the gather's VJP is a scatter-add, implemented as
segment_sum over globalized indices.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_TP = 128  # center rows per program


def _kernel(x_ref, y_ref, z_ref, i_ref, ox_ref, oy_ref, oz_ref, *, n: int, s: int):
    ii = i_ref[0].astype(jnp.int32)  # (TP, S); int16 inputs upcast in VMEM
    for src, dst in ((x_ref, ox_ref), (y_ref, oy_ref), (z_ref, oz_ref)):
        row = src[0]  # (1, N)
        for sc in range(s // 128):
            chunk = ii[:, sc * 128 : (sc + 1) * 128]
            li = chunk & 127
            bi = chunk >> 7
            acc = jnp.zeros((_TP, 128), jnp.float32)
            for k in range(n // 128):
                bank = pltpu.repeat(row[:, 128 * k : 128 * (k + 1)], _TP, 0)
                vals = jnp.take_along_axis(bank, li, axis=1)
                acc = jnp.where(bi == k, vals, acc)
            dst[0, :, sc * 128 : (sc + 1) * 128] = acc


def _pallas_ok(B: int, N: int, P: int, S: int) -> bool:
    return jax.default_backend() == "tpu" and N % 128 == 0 and P % _TP == 0 and S % 128 == 0


def _gather_planar_fwd_impl(x, y, z, idx):
    B, N = x.shape
    _, P, S = idx.shape
    kern = functools.partial(_kernel, n=N, s=S)
    outs = pl.pallas_call(
        kern,
        grid=(B, P // _TP),
        in_specs=[pl.BlockSpec((1, 1, N), lambda b, t: (b, 0, 0), memory_space=pltpu.VMEM)] * 3
        + [pl.BlockSpec((1, _TP, S), lambda b, t: (b, t, 0), memory_space=pltpu.VMEM)],
        out_specs=[pl.BlockSpec((1, _TP, S), lambda b, t: (b, t, 0), memory_space=pltpu.VMEM)] * 3,
        out_shape=[jax.ShapeDtypeStruct((B, P, S), jnp.float32)] * 3,
    )(x[:, None, :], y[:, None, :], z[:, None, :], idx)
    return tuple(outs)


def _gather_planar_xla(x, y, z, idx):
    from unopose_tpu.ops.fps import gather_points

    pts = jnp.stack([x, y, z], axis=-1)
    g = gather_points(pts, idx)  # (B, P, S, 3)
    gp = jnp.moveaxis(g, 3, 1)
    return gp[:, 0], gp[:, 1], gp[:, 2]


@jax.custom_vjp
def gather_planar(x: jnp.ndarray, y: jnp.ndarray, z: jnp.ndarray, idx: jnp.ndarray):
    """Gather three (B, N) planes at (B, P, S) indices -> three (B, P, S)."""
    B, N = x.shape
    _, P, S = idx.shape
    if _pallas_ok(B, N, P, S):
        return _gather_planar_fwd_impl(x, y, z, idx)
    return _gather_planar_xla(x, y, z, idx)


def _fwd(x, y, z, idx):
    return gather_planar(x, y, z, idx), (idx, x.shape)


def _bwd(res, g):
    idx, (B, N) = res
    gidx = (idx.astype(jnp.int32) + (jnp.arange(B, dtype=jnp.int32) * N)[:, None, None]).reshape(-1)
    grads = tuple(
        jax.ops.segment_sum(gc.astype(jnp.float32).reshape(-1), gidx, num_segments=B * N).reshape(B, N)
        for gc in g
    )
    return (*grads, None)


gather_planar.defvjp(_fwd, _bwd)
