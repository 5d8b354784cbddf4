"""Attention primitives for the matching transformers.

Flax counterparts of reference transformer.py:
  * MultiHeadAttention / AttentionLayer / TransformerLayer (:95-227) —
    post-norm vanilla MHA with residual + 2x FFN,
  * RPEMultiHeadAttention / RPEAttentionLayer / RPETransformerLayer
    (:353-466) — additive relative positional scores from a precomputed
    (B, N, M, C) geometric embedding,
  * focused LinearAttention / LinearTransformerLayer (:517-612) — O(N d^2)
    kernelized attention for the dense 2049-token fine stage.

All modules take an explicit ``dtype`` for activations; parameters stay fp32.
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp
from einops import rearrange


class MultiHeadAttention(nn.Module):
    d_model: int
    num_heads: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, q_in, k_in, v_in, key_weights=None, key_masks=None, attention_factors=None):
        h = self.num_heads
        dph = self.d_model // h
        q = rearrange(nn.Dense(self.d_model, dtype=self.dtype, name="proj_q")(q_in), "b n (h c) -> b h n c", h=h)
        k = rearrange(nn.Dense(self.d_model, dtype=self.dtype, name="proj_k")(k_in), "b m (h c) -> b h m c", h=h)
        v = rearrange(nn.Dense(self.d_model, dtype=self.dtype, name="proj_v")(v_in), "b m (h c) -> b h m c", h=h)

        scores = jnp.einsum("bhnc,bhmc->bhnm", q, k) / dph**0.5
        if attention_factors is not None:
            scores = attention_factors[:, None] * scores
        if key_weights is not None:
            scores = scores * key_weights[:, None, None, :]
        if key_masks is not None:
            scores = jnp.where(key_masks[:, None, None, :], -jnp.inf, scores)
        attn = jax.nn.softmax(scores.astype(jnp.float32), axis=-1).astype(self.dtype)
        out = jnp.matmul(attn, v)
        return rearrange(out, "b h n c -> b n (h c)"), attn


class _FoldedPosProj(nn.Module):
    """proj_p applied on the q side instead of the embedding side.

    The reference computes ``einsum(q, proj_p(e))`` with e the full
    (B, N, M, C) geometric embedding (transformer.py:391-393) — a
    (N*M, C)x(C, C) GEMM per layer, ~81 GFLOPs at the operating point and a
    second full-size (B, N, M, C) materialization. By associativity
    ``q . (e W + b) == (W^T q) . e + q . b``, so projecting q costs ~60x
    less compute and removes the intermediate entirely; the big tensor is
    only ever *read* once per layer by the score einsum. Exact up to fp
    reassociation. Parameters live under the same {kernel, bias} names and
    shapes as the nn.Dense it replaces, so checkpoint converters are
    unaffected.
    """

    d_model: int
    num_heads: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, q):
        """q (B, h, N, c) -> (q_tilde (B, h, N, d_model), q_bias (B, h, N))."""
        h = self.num_heads
        c = self.d_model // h
        kernel = self.param("kernel", nn.initializers.lecun_normal(), (self.d_model, self.d_model))
        bias = self.param("bias", nn.initializers.zeros, (self.d_model,))
        W = kernel.reshape(self.d_model, h, c).astype(self.dtype)
        b = bias.reshape(h, c).astype(self.dtype)
        qt = jnp.einsum("bhnc,dhc->bhnd", q, W)
        qb = jnp.einsum("bhnc,hc->bhn", q, b)
        return qt, qb


class RPEMultiHeadAttention(nn.Module):
    """MHA with additive relative positional scores q . proj_p(embed_qk)."""

    d_model: int
    num_heads: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, q_in, k_in, v_in, embed_qk, key_weights=None, key_masks=None, attention_factors=None):
        h = self.num_heads
        dph = self.d_model // h
        q = rearrange(nn.Dense(self.d_model, dtype=self.dtype, name="proj_q")(q_in), "b n (h c) -> b h n c", h=h)
        k = rearrange(nn.Dense(self.d_model, dtype=self.dtype, name="proj_k")(k_in), "b m (h c) -> b h m c", h=h)
        v = rearrange(nn.Dense(self.d_model, dtype=self.dtype, name="proj_v")(v_in), "b m (h c) -> b h m c", h=h)
        qt, qb = _FoldedPosProj(self.d_model, h, dtype=self.dtype, name="proj_p")(q)
        if isinstance(embed_qk, tuple):
            # int8-quantized embedding (e8, per-channel scale) from the fused
            # geo kernel: fold the dequant scale into q-tilde (tiny) so the
            # big tensor is read as int8 — HALF the HBM traffic of bf16 on
            # the bandwidth-bound chip; the convert fuses into the einsum
            e8, esc = embed_qk
            qt = qt * esc.astype(self.dtype)[None, None, None, :]
            scores_p = jnp.einsum("bhnd,bnmd->bhnm", qt, e8.astype(self.dtype)) + qb[..., None]
        else:
            scores_p = jnp.einsum("bhnd,bnmd->bhnm", qt, embed_qk.astype(self.dtype)) + qb[..., None]
        scores = (jnp.einsum("bhnc,bhmc->bhnm", q, k) + scores_p) / dph**0.5
        if attention_factors is not None:
            scores = attention_factors[:, None] * scores
        if key_weights is not None:
            scores = scores * key_weights[:, None, None, :]
        if key_masks is not None:
            scores = jnp.where(key_masks[:, None, None, :], -jnp.inf, scores)
        attn = jax.nn.softmax(scores.astype(jnp.float32), axis=-1).astype(self.dtype)
        out = jnp.matmul(attn, v)
        return rearrange(out, "b h n c -> b n (h c)"), attn


class AttentionOutput(nn.Module):
    """Post-attention FFN: expand 2x -> act -> squeeze, residual + LayerNorm
    (reference transformer.py:185-200)."""

    d_model: int
    activation: str = "relu"
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        h = nn.Dense(self.d_model * 2, dtype=self.dtype, name="expand")(x)
        h = getattr(nn, self.activation)(h)
        h = nn.Dense(self.d_model, dtype=self.dtype, name="squeeze")(h)
        return nn.LayerNorm(dtype=jnp.float32, name="norm")(x + h).astype(self.dtype)


class TransformerLayer(nn.Module):
    """Vanilla attention layer + output FFN (reference transformer.py:153-227)."""

    d_model: int
    num_heads: int
    activation: str = "relu"
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, memory, memory_weights=None, memory_masks=None, attention_factors=None):
        hidden, attn = MultiHeadAttention(self.d_model, self.num_heads, dtype=self.dtype, name="attention")(
            x, memory, memory, key_weights=memory_weights, key_masks=memory_masks, attention_factors=attention_factors
        )
        hidden = nn.Dense(self.d_model, dtype=self.dtype, name="linear")(hidden)
        out = nn.LayerNorm(dtype=jnp.float32, name="norm")(hidden + x).astype(self.dtype)
        out = AttentionOutput(self.d_model, self.activation, dtype=self.dtype, name="output")(out)
        return out, attn


class RPETransformerLayer(nn.Module):
    """RPE attention layer + output FFN (reference transformer.py:410-466)."""

    d_model: int
    num_heads: int
    activation: str = "relu"
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, memory, position_states, memory_weights=None, memory_masks=None, attention_factors=None):
        hidden, attn = RPEMultiHeadAttention(self.d_model, self.num_heads, dtype=self.dtype, name="attention")(
            x,
            memory,
            memory,
            position_states,
            key_weights=memory_weights,
            key_masks=memory_masks,
            attention_factors=attention_factors,
        )
        hidden = nn.Dense(self.d_model, dtype=self.dtype, name="linear")(hidden)
        out = nn.LayerNorm(dtype=jnp.float32, name="norm")(hidden + x).astype(self.dtype)
        out = AttentionOutput(self.d_model, self.activation, dtype=self.dtype, name="output")(out)
        return out, attn


class LinearAttention(nn.Module):
    """Focused linear attention (reference transformer.py:517-568).

    kernel = relu(.) + 1e-6 scaled by a learned softplus scale; features are
    raised to ``focusing_factor`` and renormalized to preserve norm; the
    einsum contraction order is chosen statically from the shapes.
    """

    d_model: int
    num_heads: int
    focusing_factor: float = 3.0
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, q_in, k_in, v_in):
        q = nn.Dense(self.d_model, dtype=self.dtype, name="proj_q")(q_in)
        k = nn.Dense(self.d_model, dtype=self.dtype, name="proj_k")(k_in)
        v = nn.Dense(self.d_model, dtype=self.dtype, name="proj_v")(v_in)
        scale_p = self.param("scale", nn.initializers.zeros, (1, 1, self.d_model))
        scale = jax.nn.softplus(scale_p).astype(jnp.float32)

        # fp32 island: powers + renormalization are precision sensitive
        q = (jax.nn.relu(q.astype(jnp.float32)) + 1e-6) / scale
        k = (jax.nn.relu(k.astype(jnp.float32)) + 1e-6) / scale
        q_norm = jnp.linalg.norm(q, axis=-1, keepdims=True)
        k_norm = jnp.linalg.norm(k, axis=-1, keepdims=True)
        q = q**self.focusing_factor
        k = k**self.focusing_factor
        q = q / jnp.linalg.norm(q, axis=-1, keepdims=True) * q_norm
        k = k / jnp.linalg.norm(k, axis=-1, keepdims=True) * k_norm

        h = self.num_heads
        q, k, v = (rearrange(x, "b n (h c) -> (b h) n c", h=h) for x in (q, k, v.astype(jnp.float32)))
        i, j = q.shape[-2], k.shape[-2]
        c, d = k.shape[-1], v.shape[-1]

        z = 1.0 / (jnp.einsum("bic,bc->bi", q, k.sum(axis=1)) + 1e-6)
        if i * j * (c + d) > c * d * (i + j):
            kv = jnp.einsum("bjc,bjd->bcd", k, v)
            x = jnp.einsum("bic,bcd,bi->bid", q, kv, z)
        else:
            qk = jnp.einsum("bic,bjc->bij", q, k)
            x = jnp.einsum("bij,bjd,bi->bid", qk, v, z)
        return rearrange(x, "(b h) n c -> b n (h c)", h=h).astype(self.dtype)


class LinearTransformerLayer(nn.Module):
    """Linear attention layer + FFN output (reference transformer.py:571-612)."""

    d_model: int
    num_heads: int
    focusing_factor: float = 3.0
    activation: str = "relu"
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, memory):
        hidden = LinearAttention(self.d_model, self.num_heads, self.focusing_factor, dtype=self.dtype, name="attention")(
            x, memory, memory
        )
        hidden = nn.Dense(self.d_model, dtype=self.dtype, name="linear")(hidden)
        out = nn.LayerNorm(dtype=jnp.float32, name="norm")(hidden + x).astype(self.dtype)
        out = AttentionOutput(self.d_model, self.activation, dtype=self.dtype, name="output")(out)
        return out
