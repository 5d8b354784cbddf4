"""Positional / geometric structure embeddings.

Flax counterparts of the reference transformer.py:258-350
(SinusoidalPositionalEmbedding + GeoTransformer-style
GeometricStructureEmbedding: pairwise-distance sinusoids + k-NN triplet
angular sinusoids, projected and max-reduced).
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from unopose_tpu.ops.geometry import pairwise_sqdist


def sinusoidal_embedding(indices: jnp.ndarray, d_model: int) -> jnp.ndarray:
    """Sinusoidal embedding, concatenated layout: [sin_0..sin_{d/2-1},
    cos_0..cos_{d/2-1}] of (index * 10000^(-2i/d)).

    The reference (transformer.py:258-284) interleaves (sin, cos) pairs;
    since the embedding always feeds a learned projection, the layouts are
    equivalent up to a fixed permutation of that projection's input rows —
    concat avoids the interleaving shuffle, which showed up as (d/2, 2)
    padding fusions in profiles. (A weight converter for reference matcher
    checkpoints must permute proj_d/proj_a rows with
    perm = [0, 2, ..., d-2, 1, 3, ..., d-1].)
    """
    if d_model % 2 != 0:
        raise ValueError(f"odd d_model: {d_model}")
    div = jnp.exp(jnp.arange(0, d_model, 2, dtype=jnp.float32) * (-np.log(10000.0) / d_model))
    om = indices[..., None].astype(jnp.float32) * div  # (..., d/2)
    return jnp.concatenate([jnp.sin(om), jnp.cos(om)], axis=-1)


class GeometricStructureEmbedding(nn.Module):
    """GeoTransformer relative position embedding on a sparse point set.

    Reference transformer.py:287-350; config knobs sigma_d/sigma_a/angle_k/
    reduction_a mirror configs/main_cfg.py:142-148. Computed once per cloud
    on the (coarse_npoint + 1 bg) points; consumed by RPE attention.
    """

    hidden_dim: int = 256
    sigma_d: float = 0.2
    sigma_a: float = 15.0
    angle_k: int = 3
    reduction_a: str = "max"
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, points: jnp.ndarray) -> jnp.ndarray:
        """points (B, N, 3) -> embeddings (B, N, N, hidden_dim)."""
        points = jax.lax.stop_gradient(points.astype(jnp.float32))
        B, N, _ = points.shape
        k = self.angle_k
        factor_a = 180.0 / (self.sigma_a * np.pi)

        dist = jnp.sqrt(pairwise_sqdist(points, points))  # (B, N, N)
        d_indices = dist / self.sigma_d

        # k nearest neighbors (exclude self): smallest k+1, drop first
        _, knn_idx = jax.lax.top_k(-dist, k + 1)  # (B, N, k+1)
        knn_idx = knn_idx[..., 1:]  # (B, N, k)
        knn_pts = jnp.take_along_axis(points[:, None, :, :], knn_idx[..., None], axis=2)  # (B, N, k, 3)
        ref_vec = knn_pts - points[:, :, None, :]  # (B, N, k, 3)
        anc_vec = points[:, None, :, :] - points[:, :, None, :]  # (B, N, N, 3)
        rv = ref_vec[:, :, None, :, :]  # (B, N, 1, k, 3)
        av = anc_vec[:, :, :, None, :]  # (B, N, N, 1, 3)
        sin_v = jnp.linalg.norm(jnp.cross(rv, av), axis=-1)  # (B, N, N, k)
        cos_v = jnp.sum(rv * av, axis=-1)
        angles = jnp.arctan2(sin_v, cos_v)
        a_indices = angles * factor_a

        d_emb = sinusoidal_embedding(d_indices, self.hidden_dim)
        d_emb = nn.Dense(self.hidden_dim, dtype=self.dtype, name="proj_d")(d_emb.astype(self.dtype))

        # fold the k axis into a running reduction: the (B, N, N, k, D)
        # angular tensor is ~1GB at the operating point; per-k passes keep
        # the peak at 1/k and avoid its layout copies
        proj_a = nn.Dense(self.hidden_dim, dtype=self.dtype, name="proj_a")
        a_emb = None
        for kk in range(k):
            e = proj_a(sinusoidal_embedding(a_indices[..., kk], self.hidden_dim).astype(self.dtype))
            if a_emb is None:
                a_emb = e
            elif self.reduction_a == "max":
                a_emb = jnp.maximum(a_emb, e)
            elif self.reduction_a == "mean":
                a_emb = a_emb + e
            else:
                raise ValueError(self.reduction_a)
        if self.reduction_a == "mean":
            a_emb = a_emb / k

        return d_emb + a_emb
