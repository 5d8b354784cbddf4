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


def smallest_eigvec_sym3_planar(a, b, c, d, e, f, use_newton: bool = False):
    """Channel-planar variant of smallest_eigvec_sym3 for symmetric
    [[a, b, c], [b, d, e], [c, e, f]] given as 6 same-shaped arrays.

    Returns (v0, v1, v2) unit-eigenvector components, each shaped like the
    inputs. Planar form keeps every intermediate in well-tiled (..., lanes)
    layouts — a (..., 3, 3) matrix tensor puts the 3x3 in the tiled minor
    dims and wastes ~99% of each (8, 128) register tile on TPU.
    ``use_newton``: acos-free eigenvalue trisection (required inside Pallas
    kernels — Mosaic has no acos lowering).
    """
    a, b, c, d, e, f = (x.astype(jnp.float32) for x in (a, b, c, d, e, f))
    p1 = b * b + c * c + e * e
    q = (a + d + f) / 3.0
    p2 = (a - q) ** 2 + (d - q) ** 2 + (f - q) ** 2 + 2.0 * p1
    p = jnp.sqrt(jnp.maximum(p2 / 6.0, 0.0))
    sp = jnp.where(p > 0, p, 1.0)
    # B = (A - q I) / p
    ba, bd, bf = (a - q) / sp, (d - q) / sp, (f - q) / sp
    bb, bc, be = b / sp, c / sp, e / sp
    detB = ba * (bd * bf - be * be) - bb * (bb * bf - be * bc) + bc * (bb * be - bd * bc)
    r = jnp.clip(detB / 2.0, -1.0, 1.0)
    cp1, cp3 = cos_phi_pair(r, use_newton=use_newton)
    l1 = q + 2.0 * p * cp1
    l3 = q + 2.0 * p * cp3
    l2 = 3.0 * q - l1 - l3
    iso = p2 <= 1e-30
    l1 = jnp.where(iso, q, l1)
    l2 = jnp.where(iso, q, l2)

    # M = (A - l1 I)(A - l2 I) = A^2 - (l1 + l2) A + l1 l2 I; columns of M
    # span the l3 (smallest) eigenspace.
    s, pr = l1 + l2, l1 * l2
    sq00 = a * a + b * b + c * c
    sq01 = a * b + b * d + c * e
    sq02 = a * c + b * e + c * f
    sq11 = b * b + d * d + e * e
    sq12 = b * c + d * e + e * f
    sq22 = c * c + e * e + f * f
    m00 = sq00 - s * a + pr
    m01 = sq01 - s * b
    m02 = sq02 - s * c
    m11 = sq11 - s * d + pr
    m12 = sq12 - s * e
    m22 = sq22 - s * f + pr

    n0 = m00 * m00 + m01 * m01 + m02 * m02
    n1 = m01 * m01 + m11 * m11 + m12 * m12
    n2 = m02 * m02 + m12 * m12 + m22 * m22
    best01 = n0 >= n1
    nbest = jnp.where(best01, n0, n1)
    use2 = n2 > nbest
    v0 = jnp.where(use2, m02, jnp.where(best01, m00, m01))
    v1 = jnp.where(use2, m12, jnp.where(best01, m01, m11))
    v2 = jnp.where(use2, m22, jnp.where(best01, m02, m12))
    nrm = jnp.sqrt(v0 * v0 + v1 * v1 + v2 * v2)
    scale = jnp.maximum(jnp.max(jnp.stack([jnp.abs(a), jnp.abs(d), jnp.abs(f)]), axis=0), 1e-30)
    ok = nrm > 1e-20 * scale * scale
    inv = jnp.where(ok, 1.0 / jnp.maximum(nrm, 1e-30), 0.0)
    return v0 * inv, v1 * inv, jnp.where(ok, v2 * inv, 1.0)


def _cos_acos_div3_newton(r: jnp.ndarray, iters: int = 6) -> jnp.ndarray:
    """cos(arccos(r) / 3) without acos — Newton on the triple-angle cubic
    4c^3 - 3c = r, whose relevant root lies in [1/2, 1] for r in [-1, 1].

    Mosaic (Pallas TPU) has no acos lowering; this is pure mul/add/clamp.
    Quadratic convergence except at the double root r = -1 (two equal top
    eigenvalues), where the result is still accurate to ~1e-3 — more than
    enough for the (A - l1)(A - l2) projector that consumes it.
    """
    r = jnp.clip(r, -1.0, 1.0)
    c = 0.5 + 0.5 * jnp.sqrt(jnp.maximum((r + 1.0) * 0.5, 0.0))  # good init, exact at both ends
    for _ in range(iters):
        f = 4.0 * c * c * c - 3.0 * c - r
        df = jnp.maximum(12.0 * c * c - 3.0, 1e-3)
        c = jnp.clip(c - f / df, 0.5, 1.0)
    return c


def cos_phi_pair(r: jnp.ndarray, use_newton: bool = False):
    """(cos(phi), cos(phi + 2*pi/3)) for phi = arccos(r)/3, r in [-1, 1]."""
    if use_newton:
        c1 = _cos_acos_div3_newton(r)
        s1 = jnp.sqrt(jnp.maximum(1.0 - c1 * c1, 0.0))  # sin(phi) >= 0 on [0, pi/3]
        c3 = -0.5 * c1 - (jnp.sqrt(3.0) / 2.0) * s1
        return c1, c3
    phi = jnp.arccos(jnp.clip(r, -1.0, 1.0)) / 3.0
    return jnp.cos(phi), jnp.cos(phi + 2.0 * jnp.pi / 3.0)
