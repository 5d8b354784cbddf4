"""Three-NN interpolation (pointnet2 feature propagation).

Counterpart of the reference CUDA kernels _ext_src/src/interpolate.cpp:1-104
/ interpolate_gpu.cu:1-159 (three_nn + three_interpolate with scatter-add
grad). Unused by the UNOPose forward (only the unused PointnetFPModule
consumes it, reference pointnet2_modules.py:140) but part of the point-op
API surface. Pure XLA: top-k for the 3-NN search; the gather's VJP is the
scatter-add."""

from __future__ import annotations

import jax
import jax.numpy as jnp

from unopose_tpu.ops.fps import gather_points
from unopose_tpu.ops.geometry import pairwise_sqdist


def three_nn(unknown: jnp.ndarray, known: jnp.ndarray):
    """For each of (B, n, 3) unknown points: its 3 nearest of (B, m, 3) known.

    Returns (dist (B, n, 3), idx (B, n, 3) int32) — euclidean distances,
    ascending (reference pointnet2_utils.py:120-149 wraps sqrt(dist2))."""
    d2 = pairwise_sqdist(unknown.astype(jnp.float32), known.astype(jnp.float32))
    neg, idx = jax.lax.top_k(-d2, 3)
    return jnp.sqrt(jnp.maximum(-neg, 0.0)), idx.astype(jnp.int32)


def three_interpolate(features: jnp.ndarray, idx: jnp.ndarray, weight: jnp.ndarray) -> jnp.ndarray:
    """Weighted interpolation of (B, m, C) features at (B, n, 3) neighbor
    indices with (B, n, 3) weights -> (B, n, C). Differentiable."""
    gathered = gather_points(features, idx)  # (B, n, 3, C)
    return jnp.sum(gathered * weight[..., None].astype(features.dtype), axis=2)


def interpolate_features(unknown: jnp.ndarray, known: jnp.ndarray, features: jnp.ndarray) -> jnp.ndarray:
    """Convenience: full 3-NN inverse-distance feature propagation
    (reference PointnetFPModule semantics)."""
    dist, idx = three_nn(unknown, known)
    recip = 1.0 / jnp.maximum(dist, 1e-8)
    weight = recip / jnp.sum(recip, axis=-1, keepdims=True)
    return three_interpolate(features, idx, weight)
