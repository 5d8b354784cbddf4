"""Composed matching transformers.

Flax counterparts of reference transformer.py:469-514 (GeometricTransformer:
alternating RPE-self / vanilla-cross blocks over two point sets) and
:615-671 (SparseToDenseTransformer: sparse geometric attention + linear
dense update for the fine stage).
"""

from __future__ import annotations

from typing import Sequence, Tuple

import flax.linen as nn
import jax.numpy as jnp

from unopose_tpu.ops.fps import gather_points
from unopose_tpu.models.attention import LinearTransformerLayer, RPETransformerLayer, TransformerLayer


class GeometricTransformer(nn.Module):
    """blocks like ("self", "cross"): self = RPE layer conditioned on the
    per-cloud geometric embedding, cross = vanilla layer between clouds."""

    blocks: Sequence[str]
    d_model: int
    num_heads: int
    activation: str = "relu"
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, feats0, emb0, feats1, emb1, masks0=None, masks1=None):
        for i, block in enumerate(self.blocks):
            if block == "self":
                layer = RPETransformerLayer(
                    self.d_model, self.num_heads, self.activation, dtype=self.dtype, name=f"layer{i}"
                )
                feats0, _ = layer(feats0, feats0, emb0, memory_masks=masks0)
                feats1, _ = layer(feats1, feats1, emb1, memory_masks=masks1)
            elif block == "cross":
                layer = TransformerLayer(
                    self.d_model, self.num_heads, self.activation, dtype=self.dtype, name=f"layer{i}"
                )
                feats0, _ = layer(feats0, feats1, memory_masks=masks1)
                feats1, _ = layer(feats1, feats0, memory_masks=masks0)
            else:
                raise ValueError(block)
        return feats0, feats1


class SparseToDenseTransformer(nn.Module):
    """Fine-stage block (reference transformer.py:615-671).

    Gathers the coarse-FPS subset out of the dense token set (preserving the
    bg token at position 0), runs the GeometricTransformer on the sparse set,
    then updates all dense tokens by linear cross-attention to the sparse set.

    Deviation from the reference, by design: the reference gathers sparse
    features with ``fps_idx`` on the bg-augmented array
    (transformer.py:655-662), which shifts every gathered feature by one
    dense slot relative to its geometry. We index the un-augmented dense
    block so sparse token j carries the features of the same point whose LRF
    coordinates produced geo embedding j. Set ``parity_gather=True`` to
    reproduce the reference quirk exactly — required when running converted
    reference checkpoints (utils/ref_convert.py), whose weights were trained
    against the shifted gather.
    """

    d_model: int
    sparse_blocks: Sequence[str]
    num_heads: int = 4
    activation: str = "relu"
    focusing_factor: float = 3.0
    with_bg_token: bool = True
    replace_bg_token: bool = True
    parity_gather: bool = False
    dtype: jnp.dtype = jnp.float32

    def _sample_feats(self, dense_feats, fps_idx):
        if self.with_bg_token:
            bg = dense_feats[:, :1]
            if self.parity_gather:
                # reference quirk: index the bg-augmented array directly
                feats = gather_points(dense_feats, fps_idx)
            else:
                feats = gather_points(dense_feats[:, 1:], fps_idx)
            return jnp.concatenate([bg, feats], axis=1)
        return gather_points(dense_feats, fps_idx)

    @nn.compact
    def __call__(self, dense_feats0, emb0, fps_idx0, dense_feats1, emb1, fps_idx1, masks0=None, masks1=None):
        feats0 = self._sample_feats(dense_feats0, fps_idx0)
        feats1 = self._sample_feats(dense_feats1, fps_idx1)
        feats0, feats1 = GeometricTransformer(
            self.sparse_blocks, self.d_model, self.num_heads, self.activation, dtype=self.dtype, name="sparse_layer"
        )(feats0, emb0, feats1, emb1, masks0, masks1)

        dense_layer = LinearTransformerLayer(
            self.d_model, self.num_heads, self.focusing_factor, self.activation, dtype=self.dtype, name="dense_layer"
        )
        if self.with_bg_token and self.replace_bg_token:
            new0 = dense_layer(dense_feats0[:, 1:], feats0[:, 1:])
            dense_feats0 = jnp.concatenate([feats0[:, :1], new0], axis=1)
            new1 = dense_layer(dense_feats1[:, 1:], feats1[:, 1:])
            dense_feats1 = jnp.concatenate([feats1[:, :1], new1], axis=1)
        else:
            dense_feats0 = dense_layer(dense_feats0, feats0)
            dense_feats1 = dense_layer(dense_feats1, feats1)
        return dense_feats0, dense_feats1
