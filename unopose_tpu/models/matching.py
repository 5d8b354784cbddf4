"""Coarse and fine point-matching stages with overlap ("predator") heads.

Flax counterparts of reference oneref_predator_coarse_point_matching.py:14-117
and oneref_predator_fine_point_matching.py:13-178. The modules are pure
feature->logits networks: they return per-block similarity matrices, overlap
scores and saliency scores. Loss computation (train) and pose solving (eval)
are applied by the top-level model / engine, keeping these modules
functional and shape-static.
"""

from __future__ import annotations

from typing import List, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from unopose_tpu.models.attention import TransformerLayer
from unopose_tpu.models.transformer import GeometricTransformer, SparseToDenseTransformer
from unopose_tpu.ops.ball_query import ball_query, group_points, two_scale_group
from unopose_tpu.ops.geometry import compute_feature_similarity
from unopose_tpu.ops.lrf import batch_lrf


def _block_outputs(atten, scores, n1: int):
    """Split per-token scores and compute saliency from the similarity matrix
    (reference coarse :62-76 / fine :85-99).

    scores: (B, n1+1+n2+1, 1) raw head outputs on [bg, f1..., bg, f2...].
    """
    s1 = scores[:, 1 : n1 + 1]  # (B, n1, 1)
    s2 = scores[:, n1 + 2 :]  # (B, n2, 1)
    a = atten[:, 1:, 1:].astype(jnp.float32)
    m1 = jnp.matmul(jax.nn.softmax(a, axis=2), s2.astype(jnp.float32))
    m2 = jnp.matmul(jax.nn.softmax(jnp.swapaxes(a, 1, 2), axis=2), s1.astype(jnp.float32))
    score = jax.nn.sigmoid(jnp.concatenate([s1, s2], axis=1)[..., 0].astype(jnp.float32))
    saliency = jax.nn.sigmoid(jnp.concatenate([m1, m2], axis=1)[..., 0])
    return jnp.clip(score, 0.0, 1.0), jnp.clip(saliency, 0.0, 1.0)


class _CoarseBlock(nn.Module):
    """One coarse stage: GeometricTransformer + per-block score head.

    Scan-compatible body — the nblock copies are stacked with nn.scan to
    keep the compiled program small."""

    hidden_dim: int
    num_heads: int
    dtype: jnp.dtype

    @nn.compact
    def __call__(self, carry, geo1, geo2):
        f1, f2 = carry
        f1, f2 = GeometricTransformer(
            ("self", "cross"), self.hidden_dim, self.num_heads, dtype=self.dtype, name="transformer"
        )(f1, geo1, f2, geo2)
        scores = nn.Dense(1, dtype=self.dtype, name="score_head")(jnp.concatenate([f1, f2], axis=1))
        return (f1, f2), (f1, f2, scores)


class CoarsePointMatching(nn.Module):
    nblock: int = 3
    input_dim: int = 256
    hidden_dim: int = 256
    out_dim: int = 256
    num_heads: int = 4
    temp: float = 0.1
    sim_type: str = "cosine"
    normalize_feat: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, f1, geo1, f2, geo2, all_blocks: bool = False):
        """f1 (B, n1, C), geo1 (B, n1+1, n1+1, C), f2 (B, n2, C), geo2 likewise.

        Returns (attens, scores, saliencies): lists over the evaluated blocks
        (all ``nblock`` when ``all_blocks`` — training — else just the last).
        """
        B, n1 = f1.shape[:2]
        in_proj = nn.Dense(self.hidden_dim, dtype=self.dtype, name="in_proj")
        out_proj = nn.Dense(self.out_dim, dtype=self.dtype, name="out_proj")
        bg_token = self.param("bg_token", nn.initializers.normal(0.02), (1, 1, self.hidden_dim))
        bg = jnp.broadcast_to(bg_token.astype(self.dtype), (B, 1, self.hidden_dim))

        f1 = jnp.concatenate([bg, in_proj(f1.astype(self.dtype))], axis=1)
        f2 = jnp.concatenate([bg, in_proj(f2.astype(self.dtype))], axis=1)

        Scanned = nn.scan(
            _CoarseBlock,
            variable_axes={"params": 0},
            split_rngs={"params": True},
            in_axes=(nn.broadcast, nn.broadcast),
            length=self.nblock,
            metadata_params={nn.meta.PARTITION_NAME: None},
        )
        _, (f1s, f2s, scores_s) = Scanned(self.hidden_dim, self.num_heads, self.dtype, name="blocks")(
            (f1, f2), geo1, geo2
        )

        blocks = range(self.nblock) if all_blocks else [self.nblock - 1]
        attens, scores_l, sals = [], [], []
        for idx in blocks:
            atten = compute_feature_similarity(
                out_proj(f1s[idx]).astype(jnp.float32),
                out_proj(f2s[idx]).astype(jnp.float32),
                self.sim_type,
                self.temp,
                self.normalize_feat,
            )
            score, sal = _block_outputs(atten, scores_s[idx], n1)
            attens.append(atten)
            scores_l.append(score)
            sals.append(sal)
        return attens, scores_l, sals


class FinePositionalEncoding(nn.Module):
    """Two-scale local-geometry encoding (reference fine :138-178).

    For each point: ball-query neighborhoods at (r1, ns1) and (r2, ns2),
    per-neighborhood LRF coordinates (use_lrf) concatenated with relative
    xyz (use_xyz), shared 1x1-conv MLPs with BatchNorm, max-pool over
    neighbors, concat scales, project to out_dim. Runs in fp32 (the
    reference pins this block out of autocast, fine :163-165).
    """

    out_dim: int = 256
    r1: float = 0.1
    r2: float = 0.2
    nsample1: int = 64
    nsample2: int = 256
    use_lrf: bool = True
    use_xyz: bool = True
    use_bn: bool = True

    def _scale(self, pts, grouped, r, mlp_dims, train, name):
        rel = grouped - pts[:, :, None, :]
        feats = []
        if self.use_xyz:
            feats.append(rel)
        if self.use_lrf:
            feats.append(batch_lrf(pts, grouped, r))
        else:
            feats.append(rel)
        x = jnp.concatenate(feats, axis=-1) if len(feats) > 1 else feats[0]
        for i, d in enumerate(mlp_dims):
            x = nn.Dense(d, use_bias=not self.use_bn, dtype=jnp.float32, name=f"{name}_fc{i}")(x)
            if self.use_bn:
                x = nn.BatchNorm(
                    use_running_average=not train, momentum=0.9, epsilon=1e-5, dtype=jnp.float32, name=f"{name}_bn{i}"
                )(x)
            x = nn.relu(x)
        return jnp.max(x, axis=2)  # max over neighbors -> (B, P, d)

    @nn.compact
    def __call__(self, pts: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        pts = pts.astype(jnp.float32)
        grouped1, grouped2 = two_scale_group(self.r1, self.nsample1, self.r2, self.nsample2, pts)
        f1 = self._scale(pts, grouped1, self.r1, (32, 64, 128), train, "mlp1")
        f2 = self._scale(pts, grouped2, self.r2, (32, 64, 128), train, "mlp2")
        feat = jnp.concatenate([f1, f2], axis=-1)
        return nn.Dense(self.out_dim, dtype=jnp.float32, name="mlp3")(feat)


class _FineBlock(nn.Module):
    """One fine stage: SparseToDenseTransformer + per-block score head
    (scan-compatible body, same rationale as _CoarseBlock)."""

    hidden_dim: int
    num_heads: int
    focusing_factor: float
    dtype: jnp.dtype

    @nn.compact
    def __call__(self, carry, geo1, fps_idx1, geo2, fps_idx2):
        f1, f2 = carry
        f1, f2 = SparseToDenseTransformer(
            self.hidden_dim,
            sparse_blocks=("self", "cross"),
            num_heads=self.num_heads,
            focusing_factor=self.focusing_factor,
            with_bg_token=True,
            replace_bg_token=True,
            dtype=self.dtype,
            name="transformer",
        )(f1, geo1, fps_idx1, f2, geo2, fps_idx2)
        scores = nn.Dense(1, dtype=self.dtype, name="score_head")(jnp.concatenate([f1, f2], axis=1))
        return (f1, f2), (f1, f2, scores)


class FinePointMatching(nn.Module):
    nblock: int = 3
    input_dim: int = 256
    hidden_dim: int = 256
    out_dim: int = 256
    num_heads: int = 4
    temp: float = 0.1
    sim_type: str = "cosine"
    normalize_feat: bool = True
    focusing_factor: float = 3.0
    pe_radius1: float = 0.1
    pe_radius2: float = 0.2
    nsample1: int = 64
    nsample2: int = 256
    use_lrf: bool = True
    use_xyz: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, p1, f1, geo1, fps_idx1, p2, f2, geo2, fps_idx2, init_R, init_t, train: bool = False):
        """p1/p2 (B, n, 3) dense clouds (normalized), f1/f2 (B, n, C) dense
        features, geo* (B, 197, 197, C) sparse embeddings, fps_idx* (B, 196).
        init_R/init_t: coarse pose (p1 gets pre-aligned into p2's frame,
        reference fine :65-69)."""
        B, n1 = p1.shape[:2]
        p1_aligned = jnp.matmul(p1 - init_t[:, None, :], init_R)

        pe = FinePositionalEncoding(
            out_dim=self.hidden_dim,
            r1=self.pe_radius1,
            r2=self.pe_radius2,
            nsample1=self.nsample1,
            nsample2=self.nsample2,
            use_lrf=self.use_lrf,
            use_xyz=self.use_xyz,
            name="pe",
        )
        in_proj = nn.Dense(self.hidden_dim, dtype=self.dtype, name="in_proj")
        out_proj = nn.Dense(self.out_dim, dtype=self.dtype, name="out_proj")
        bg_token = self.param("bg_token", nn.initializers.normal(0.02), (1, 1, self.hidden_dim))
        bg = jnp.broadcast_to(bg_token.astype(self.dtype), (B, 1, self.hidden_dim))

        f1 = in_proj(f1.astype(self.dtype)) + pe(p1_aligned, train).astype(self.dtype)
        f1 = jnp.concatenate([bg, f1], axis=1)
        f2 = in_proj(f2.astype(self.dtype)) + pe(p2, train).astype(self.dtype)
        f2 = jnp.concatenate([bg, f2], axis=1)

        Scanned = nn.scan(
            _FineBlock,
            variable_axes={"params": 0},
            split_rngs={"params": True},
            in_axes=(nn.broadcast,) * 4,
            length=self.nblock,
            metadata_params={nn.meta.PARTITION_NAME: None},
        )
        _, (f1s, f2s, scores_s) = Scanned(
            self.hidden_dim, self.num_heads, self.focusing_factor, self.dtype, name="blocks"
        )((f1, f2), geo1, fps_idx1, geo2, fps_idx2)

        blocks = range(self.nblock) if train else [self.nblock - 1]
        attens, scores_l, sals = [], [], []
        for idx in blocks:
            atten = compute_feature_similarity(
                out_proj(f1s[idx]).astype(jnp.float32),
                out_proj(f2s[idx]).astype(jnp.float32),
                self.sim_type,
                self.temp,
                self.normalize_feat,
            )
            score, sal = _block_outputs(atten, scores_s[idx], n1)
            attens.append(atten)
            scores_l.append(score)
            sals.append(sal)
        return attens, scores_l, sals
