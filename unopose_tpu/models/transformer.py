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
        # Both clouds share every layer's weights, so when their token counts
        # match (always true in UNOPose: 197/197 sparse, 2049/2049 dense) the
        # two per-cloud SELF layers stack into ONE 2B-batch call —
        # mathematically identical (per-row independent), half the kernel
        # launches, and the small 197-token attention shapes tile the MXU
        # twice as densely. The int8 geo embedding tuples share one static
        # per-channel scale (see ops/geo_fused.geo_rpe_fused), so they stack
        # along batch too. CROSS layers are inherently sequential in the
        # reference (parallel=False, transformer.py:502-508: cloud 1 attends
        # the ALREADY-UPDATED cloud 0), so they stay two per-cloud calls.
        t0, t1 = (emb0, emb1) if not isinstance(emb0, tuple) else (emb0[0], emb1[0])
        stackable = (
            feats0.shape == feats1.shape
            and isinstance(emb0, tuple) == isinstance(emb1, tuple)
            and t0.shape == t1.shape
            and (not isinstance(emb0, tuple) or emb0[1] is emb1[1])
            and (masks0 is None) == (masks1 is None)
        )
        if stackable:
            B = feats0.shape[0]
            emb = (jnp.concatenate([t0, t1], axis=0), emb0[1]) if isinstance(emb0, tuple) else jnp.concatenate(
                [emb0, emb1], axis=0
            )
            masks = None if masks0 is None else jnp.concatenate([masks0, masks1], axis=0)
            for i, block in enumerate(self.blocks):
                if block == "self":
                    layer = RPETransformerLayer(
                        self.d_model, self.num_heads, self.activation, dtype=self.dtype, name=f"layer{i}"
                    )
                    x = jnp.concatenate([feats0, feats1], axis=0)
                    x, _ = layer(x, x, emb, memory_masks=masks)
                    feats0, feats1 = x[:B], x[B:]
                elif block == "cross":
                    layer = TransformerLayer(
                        self.d_model, self.num_heads, self.activation, dtype=self.dtype, name=f"layer{i}"
                    )
                    feats0, _ = layer(feats0, feats1, memory_masks=masks1)
                    feats1, _ = layer(feats1, feats0, memory_masks=masks0)
                else:
                    raise ValueError(block)
            return feats0, feats1
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
        # both clouds share the dense layer's weights and token counts, so the
        # two per-cloud updates stack into ONE 2B-batch call (mathematically
        # identical — linear attention normalizes per batch row), matching the
        # sparse stage's stacking above: half the kernel launches and denser
        # MXU tiles on the 2048-token GEMMs
        B = dense_feats0.shape[0]
        if self.with_bg_token and self.replace_bg_token:
            new = dense_layer(
                jnp.concatenate([dense_feats0[:, 1:], dense_feats1[:, 1:]], axis=0),
                jnp.concatenate([feats0[:, 1:], feats1[:, 1:]], axis=0),
            )
            dense_feats0 = jnp.concatenate([feats0[:, :1], new[:B]], axis=1)
            dense_feats1 = jnp.concatenate([feats1[:, :1], new[B:]], axis=1)
        else:
            new = dense_layer(
                jnp.concatenate([dense_feats0, dense_feats1], axis=0),
                jnp.concatenate([feats0, feats1], axis=0),
            )
            dense_feats0, dense_feats1 = new[:B], new[B:]
        return dense_feats0, dense_feats1
