"""Core geometry ops (pure JAX, CPU-testable, static shapes).

TPU-first counterparts of the reference's numeric utilities
(reference: core/unopose/utils/model_utils.py:230-282,
core/unopose/utils/data_utils.py:216-283). Everything here is jittable and
batched; host-side (numpy) variants used by the data pipeline live in
unopose_tpu/data/preprocess.py.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def pairwise_sqdist(x: jnp.ndarray, y: jnp.ndarray, normalized: bool = False) -> jnp.ndarray:
    """Squared pairwise distances between batched point sets.

    Args:
        x: (*, N, C)
        y: (*, M, C)
        normalized: if both inputs are unit-norm, d2 = 2 - 2 x.y.

    Returns:
        (*, N, M) squared distances, clamped at 0.
    """
    # HIGHEST precision is a correctness requirement on TPU: the default
    # matmul truncates inputs to bf16, and for camera-frame clouds (z offset
    # >> extent) the x.y term suffers catastrophic cancellation — observed
    # d^2 errors of +-0.2 against ball radii of 0.01-0.04.
    xy = jnp.matmul(
        x.astype(jnp.float32),
        jnp.swapaxes(y, -1, -2).astype(jnp.float32),
        precision=jax.lax.Precision.HIGHEST,
    )
    if normalized:
        sq = 2.0 - 2.0 * xy
    else:
        x2 = jnp.sum(x.astype(jnp.float32) ** 2, axis=-1)[..., :, None]
        y2 = jnp.sum(y.astype(jnp.float32) ** 2, axis=-1)[..., None, :]
        sq = x2 - 2.0 * xy + y2
    return jnp.maximum(sq, 0.0)


def pairwise_dist(x: jnp.ndarray, y: jnp.ndarray) -> jnp.ndarray:
    """Euclidean pairwise distances (*, N, M)."""
    return jnp.sqrt(pairwise_sqdist(x, y))


def compute_feature_similarity(
    feat1: jnp.ndarray,
    feat2: jnp.ndarray,
    sim_type: str = "cosine",
    temp: float = 1.0,
    normalize_feat: bool = True,
) -> jnp.ndarray:
    """Temperature-scaled similarity matrix between two token sets.

    Mirrors reference core/unopose/utils/model_utils.py:260-282.

    Args:
        feat1: (B, N, C)
        feat2: (B, M, C)
    Returns:
        (B, N, M) attention/similarity logits.
    """
    if normalize_feat:
        feat1 = feat1 / (jnp.linalg.norm(feat1, axis=-1, keepdims=True) + 1e-12)
        feat2 = feat2 / (jnp.linalg.norm(feat2, axis=-1, keepdims=True) + 1e-12)
    if sim_type == "cosine":
        # fp32: the similarity matrix is the correspondence signal the
        # solvers consume (the reference computes it in fp32)
        atten = jnp.matmul(
            feat1.astype(jnp.float32),
            jnp.swapaxes(feat2, -1, -2).astype(jnp.float32),
            precision=jax.lax.Precision.HIGHEST,
        )
    elif sim_type == "L2":
        atten = jnp.sqrt(pairwise_sqdist(feat1, feat2, normalized=True))
    else:
        raise ValueError(f"unknown sim_type: {sim_type}")
    return atten / temp


def backproject(depth: jnp.ndarray, K: jnp.ndarray) -> jnp.ndarray:
    """Backproject a depth map into an organized XYZ cloud map.

    Device-side equivalent of reference core/unopose/utils/data_utils.py:216-229.

    Args:
        depth: (H, W) metric depth.
        K: (3, 3) camera intrinsics.
    Returns:
        (H, W, 3) camera-frame cloud.
    """
    H, W = depth.shape
    xs = jnp.arange(W, dtype=depth.dtype) - K[0, 2]
    ys = jnp.arange(H, dtype=depth.dtype) - K[1, 2]
    X, Y = jnp.meshgrid(xs, ys)
    return jnp.stack((X * depth / K[0, 0], Y * depth / K[1, 1], depth), axis=2)


def transform_pts(pts: jnp.ndarray, R: jnp.ndarray, t: jnp.ndarray) -> jnp.ndarray:
    """Apply SE(3): R @ p + t for batched clouds. pts (B,N,3), R (B,3,3), t (B,3)."""
    return jnp.einsum("bij,bnj->bni", R, pts) + t[:, None, :]


def inverse_transform_pts(pts: jnp.ndarray, R: jnp.ndarray, t: jnp.ndarray) -> jnp.ndarray:
    """Apply inverse SE(3): R^T (p - t) == (p - t) @ R. pts (B,N,3)."""
    return jnp.matmul(pts - t[:, None, :], R)


def normalize_vec(v: jnp.ndarray, axis: int = -1, eps: float = 1e-12) -> jnp.ndarray:
    return v / (jnp.linalg.norm(v, axis=axis, keepdims=True) + eps)
