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
    """Sinusoidal embedding with interleaved (sin, cos) pairs.

    Matches reference transformer.py:258-284 layout: output[..., 2i] = sin,
    output[..., 2i+1] = cos of (index * 10000^(-2i/d)).
    """
    if d_model % 2 != 0:
        raise ValueError(f"odd d_model: {d_model}")
    div = jnp.exp(jnp.arange(0, d_model, 2, dtype=jnp.float32) * (-np.log(10000.0) / d_model))
    om = indices[..., None].astype(jnp.float32) * div  # (..., d/2)
    emb = jnp.stack([jnp.sin(om), jnp.cos(om)], axis=-1)  # (..., d/2, 2)
    return emb.reshape(*indices.shape, d_model)


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

        a_emb = sinusoidal_embedding(a_indices, self.hidden_dim)
        a_emb = nn.Dense(self.hidden_dim, dtype=self.dtype, name="proj_a")(a_emb.astype(self.dtype))
        if self.reduction_a == "max":
            a_emb = jnp.max(a_emb, axis=3)
        elif self.reduction_a == "mean":
            a_emb = jnp.mean(a_emb, axis=3)
        else:
            raise ValueError(self.reduction_a)

        return d_emb + a_emb
