"""Closed-form eigendecomposition of batched symmetric 3x3 matrices.

TPU replacement for the torch.svd calls on tiny covariance matrices in the
reference's LRF computation (core/unopose/utils/model_utils.py:766-823 and
core/unopose/model/pointnet2/pointnet2_utils.py:429-481). Uses the standard
trigonometric eigenvalue formula plus the matrix-product eigenvector trick —
all elementwise VPU math, no iterative decomposition.
"""

from __future__ import annotations

import jax.numpy as jnp


def eigvals_sym3(A: jnp.ndarray) -> jnp.ndarray:
    """Eigenvalues of symmetric (..., 3, 3) matrices, descending (l1 >= l2 >= l3)."""
    A = A.astype(jnp.float32)
    a00, a11, a22 = A[..., 0, 0], A[..., 1, 1], A[..., 2, 2]
    a01, a02, a12 = A[..., 0, 1], A[..., 0, 2], A[..., 1, 2]
    p1 = a01 * a01 + a02 * a02 + a12 * a12
    q = (a00 + a11 + a22) / 3.0
    p2 = (a00 - q) ** 2 + (a11 - q) ** 2 + (a22 - q) ** 2 + 2.0 * p1
    p = jnp.sqrt(jnp.maximum(p2 / 6.0, 0.0))
    safe_p = jnp.where(p > 0, p, 1.0)
    B = (A - q[..., None, None] * jnp.eye(3, dtype=A.dtype)) / safe_p[..., None, None]
    detB = (
        B[..., 0, 0] * (B[..., 1, 1] * B[..., 2, 2] - B[..., 1, 2] * B[..., 2, 1])
        - B[..., 0, 1] * (B[..., 1, 0] * B[..., 2, 2] - B[..., 1, 2] * B[..., 2, 0])
        + B[..., 0, 2] * (B[..., 1, 0] * B[..., 2, 1] - B[..., 1, 1] * B[..., 2, 0])
    )
    r = jnp.clip(detB / 2.0, -1.0, 1.0)
    phi = jnp.arccos(r) / 3.0
    l1 = q + 2.0 * p * jnp.cos(phi)
    l3 = q + 2.0 * p * jnp.cos(phi + 2.0 * jnp.pi / 3.0)
    l2 = 3.0 * q - l1 - l3
    # degenerate: A is (near-)spherical -> all eigenvalues = q
    isotropic = p2 <= 1e-30
    l1 = jnp.where(isotropic, q, l1)
    l2 = jnp.where(isotropic, q, l2)
    l3 = jnp.where(isotropic, q, l3)
    return jnp.stack([l1, l2, l3], axis=-1)


def _eigvec_for(A: jnp.ndarray, lam_a: jnp.ndarray, lam_b: jnp.ndarray) -> jnp.ndarray:
    """Eigenvector of A for the remaining eigenvalue, via (A - lam_a I)(A - lam_b I).

    By Cayley-Hamilton, M = (A - lam_a I)(A - lam_b I) has columns spanning the
    eigenspace of the third eigenvalue. Take the largest-norm column, with a
    fallback to e_z for (near-)isotropic matrices.
    """
    eye = jnp.eye(3, dtype=A.dtype)
    M = jnp.matmul(A - lam_a[..., None, None] * eye, A - lam_b[..., None, None] * eye)
    norms = jnp.linalg.norm(M, axis=-2)  # (..., 3) column norms
    best = jnp.argmax(norms, axis=-1)
    v = jnp.take_along_axis(M, best[..., None, None], axis=-1)[..., 0]
    vn = jnp.linalg.norm(v, axis=-1, keepdims=True)
    fallback = jnp.broadcast_to(jnp.array([0.0, 0.0, 1.0], dtype=A.dtype), v.shape)
    scale = jnp.max(jnp.abs(A), axis=(-2, -1), keepdims=False)[..., None]
    v = jnp.where(vn > 1e-20 * jnp.maximum(scale, 1e-30) ** 2, v / jnp.maximum(vn, 1e-30), fallback)
    return v


def smallest_eigvec_sym3(A: jnp.ndarray) -> jnp.ndarray:
    """Unit eigenvector for the smallest eigenvalue of symmetric (..., 3, 3) A.

    Matches the role of ``v[..., -1]`` from torch.svd of a PSD covariance
    (descending singular values) in the reference LRF.
    """
    A = A.astype(jnp.float32)
    lams = eigvals_sym3(A)
    return _eigvec_for(A, lams[..., 0], lams[..., 1])


def largest_eigvec_sym3(A: jnp.ndarray) -> jnp.ndarray:
    A = A.astype(jnp.float32)
    lams = eigvals_sym3(A)
    return _eigvec_for(A, lams[..., 1], lams[..., 2])
