"""Fused multi-head self-attention for the ViT backbone (inference).

The XLA formulation of a 261-token DINOv2 block materializes the
(B, 12, 261, 261) score tensor in HBM four times per block (write scores,
softmax read+write, context read) and pays three (B, N, D) -> (B, H, N, hd)
transposes for q/k/v — ~6 ms of pure memory traffic per 32-image batch
across the 12 blocks. This kernel runs ONE image per grid step with all
heads' scores living only in VMEM: the (N, D) qkv slabs stream in, heads
are static 64-lane column slices, softmax is fp32, and only the (N, D)
context output returns to HBM.

Inference-only (no VJP; the training path keeps the XLA einsum form).
Reference behavior: timm ViT block attention (see models/vit.py:52-75).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _attn_kernel(q_ref, k_ref, v_ref, o_ref, *, num_heads: int, head_dim: int, scale: float):
    q = q_ref[0]  # (N, D)
    k = k_ref[0]
    v = v_ref[0]
    outs = []
    for h in range(num_heads):
        sl = slice(h * head_dim, (h + 1) * head_dim)
        s = jax.lax.dot_general(
            q[:, sl],
            k[:, sl],
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * scale  # (N, N) fp32
        m = jnp.max(s, axis=1, keepdims=True)
        p = jnp.exp(s - m)
        l = jnp.sum(p, axis=1, keepdims=True)
        p = (p / l).astype(v.dtype)
        o = jax.lax.dot_general(
            p,
            v[:, sl],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        outs.append(o.astype(o_ref.dtype))
    o_ref[0] = jnp.concatenate(outs, axis=1)


def mha_fused(
    q: jnp.ndarray,  # (B, N, D)
    k: jnp.ndarray,
    v: jnp.ndarray,
    num_heads: int,
    interpret: bool = False,
) -> jnp.ndarray:
    """Multi-head self-attention, softmax(q k^T / sqrt(hd)) v, heads packed
    along the feature axis (column h*hd:(h+1)*hd = head h). Returns (B, N, D)
    in q's dtype. fp32 softmax."""
    B, N, D = q.shape
    assert D % num_heads == 0, (D, num_heads)
    hd = D // num_heads
    kernel = functools.partial(_attn_kernel, num_heads=num_heads, head_dim=hd, scale=hd**-0.5)
    spec = pl.BlockSpec((1, N, D), lambda b: (b, 0, 0), memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kernel,
        grid=(B,),
        in_specs=[spec, spec, spec],
        out_specs=spec,
        out_shape=jax.ShapeDtypeStruct((B, N, D), q.dtype),
        interpret=interpret,
    )(q, k, v)
