"""Weighted Procrustes / Kabsch alignment without general SVD.

The reference solves pose hypotheses with torch.svd over (sometimes 6000·B)
3x3 correlation matrices (reference: core/unopose/utils/model_utils.py:667-763).
General SVD lowers poorly on TPU (sequential Jacobi sweeps on tiny matrices),
so we solve Wahba's problem with the quaternion (Davenport q-method / Horn)
formulation instead: the optimal rotation is the top eigenvector of a
symmetric 4x4 matrix built from the 3x3 correlation — found with a fixed
number of batched power-iteration steps (pure VPU-friendly 4x4 matvecs,
fully vectorized over hypotheses). This is algebraically identical to
SVD-with-det-correction for the full-rank case and degrades gracefully
(returns a valid rotation) for rank-deficient H.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_POWER_ITERS = 30


def quat_to_rotmat(q: jnp.ndarray) -> jnp.ndarray:
    """Unit quaternion (w, x, y, z) (..., 4) -> rotation matrix (..., 3, 3)."""
    w, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    r00 = 1 - 2 * (y * y + z * z)
    r01 = 2 * (x * y - z * w)
    r02 = 2 * (x * z + y * w)
    r10 = 2 * (x * y + z * w)
    r11 = 1 - 2 * (x * x + z * z)
    r12 = 2 * (y * z - x * w)
    r20 = 2 * (x * z - y * w)
    r21 = 2 * (y * z + x * w)
    r22 = 1 - 2 * (x * x + y * y)
    return jnp.stack(
        [
            jnp.stack([r00, r01, r02], axis=-1),
            jnp.stack([r10, r11, r12], axis=-1),
            jnp.stack([r20, r21, r22], axis=-1),
        ],
        axis=-2,
    )


def _davenport_K(H: jnp.ndarray) -> jnp.ndarray:
    """Build Horn's symmetric 4x4 matrix from a 3x3 correlation H = sum w s r^T.

    The top eigenvector q of K maximizes sum_i w_i r_i . R(q) s_i.
    """
    Sxx, Sxy, Sxz = H[..., 0, 0], H[..., 0, 1], H[..., 0, 2]
    Syx, Syy, Syz = H[..., 1, 0], H[..., 1, 1], H[..., 1, 2]
    Szx, Szy, Szz = H[..., 2, 0], H[..., 2, 1], H[..., 2, 2]
    k00 = Sxx + Syy + Szz
    k01 = Syz - Szy
    k02 = Szx - Sxz
    k03 = Sxy - Syx
    k11 = Sxx - Syy - Szz
    k12 = Sxy + Syx
    k13 = Szx + Sxz
    k22 = -Sxx + Syy - Szz
    k23 = Syz + Szy
    k33 = -Sxx - Syy + Szz
    return jnp.stack(
        [
            jnp.stack([k00, k01, k02, k03], axis=-1),
            jnp.stack([k01, k11, k12, k13], axis=-1),
            jnp.stack([k02, k12, k22, k23], axis=-1),
            jnp.stack([k03, k13, k23, k33], axis=-1),
        ],
        axis=-2,
    )


def top_eigvec_sym4(K: jnp.ndarray, n_squarings: int = 14) -> jnp.ndarray:
    """Top eigenvector of a batch of symmetric 4x4 matrices.

    Shift by the Frobenius norm so the largest-algebraic eigenvalue becomes
    the largest-magnitude one, then square the matrix ``n_squarings`` times
    (normalizing each round): A^(2^n) converges to the rank-1 projector
    v v^T, whose largest-norm column is the eigenvector. Column selection
    makes this robust to any initial-vector orthogonality (e.g. 180-degree
    rotations, where a fixed power-iteration start can fail).
    """
    K = K.astype(jnp.float32)
    shift = jnp.linalg.norm(K, axis=(-2, -1), keepdims=True) + 1e-12
    A = K / shift + 1.2 * jnp.eye(4, dtype=K.dtype)
    for _ in range(n_squarings):
        # HIGHEST precision: the TPU default truncates matmul inputs to
        # bf16, which destroys the small spectral gaps this iteration
        # resolves. These are 4x4 matmuls — full fp32 costs nothing.
        A = jnp.matmul(A, A, precision=jax.lax.Precision.HIGHEST)
        A = A / (jnp.linalg.norm(A, axis=(-2, -1), keepdims=True) + 1e-12)
    col_norms = jnp.linalg.norm(A, axis=-2)  # (..., 4)
    best = jnp.argmax(col_norms, axis=-1)
    v = jnp.take_along_axis(A, best[..., None, None], axis=-1)[..., 0]
    return v / (jnp.linalg.norm(v, axis=-1, keepdims=True) + 1e-12)


def _top_eigvec_sym4_planar(k_entries, n_squarings: int = 14):
    """Planar repeated-squaring top eigenvector of symmetric 4x4 matrices.

    k_entries: 10 arrays (k00,k01,k02,k03,k11,k12,k13,k22,k23,k33), each of
    shape (...,). Identical math to ``top_eigvec_sym4`` but every entry is a
    separate well-tiled array — a (..., 4, 4) tensor puts the 4x4 in the
    tiled minor dims and wastes ~97% of each (8, 128) register tile (this
    iteration alone cost ~29ms/batch in the tensor form).
    """
    a, b, c, d, e, f, g, h, i, j = (x.astype(jnp.float32) for x in k_entries)
    fro = jnp.sqrt(a * a + e * e + h * h + j * j + 2 * (b * b + c * c + d * d + f * f + g * g + i * i)) + 1e-12
    a, b, c, d, e, f, g, h, i, j = (x / fro for x in (a, b, c, d, e, f, g, h, i, j))
    a, e, h, j = a + 1.2, e + 1.2, h + 1.2, j + 1.2

    for _ in range(n_squarings):
        na = a * a + b * b + c * c + d * d
        nb = a * b + b * e + c * f + d * g
        nc = a * c + b * f + c * h + d * i
        nd = a * d + b * g + c * i + d * j
        ne = b * b + e * e + f * f + g * g
        nf = b * c + e * f + f * h + g * i
        ng = b * d + e * g + f * i + g * j
        nh = c * c + f * f + h * h + i * i
        ni = c * d + f * g + h * i + i * j
        nj = d * d + g * g + i * i + j * j
        fro = jnp.sqrt(
            na * na + ne * ne + nh * nh + nj * nj + 2 * (nb * nb + nc * nc + nd * nd + nf * nf + ng * ng + ni * ni)
        ) + 1e-12
        a, b, c, d, e, f, g, h, i, j = (x / fro for x in (na, nb, nc, nd, ne, nf, ng, nh, ni, nj))

    # pick the largest-norm column of the (near rank-1) matrix
    n0 = a * a + b * b + c * c + d * d
    n1 = b * b + e * e + f * f + g * g
    n2 = c * c + f * f + h * h + i * i
    n3 = d * d + g * g + i * i + j * j
    cols = (
        (a, b, c, d),
        (b, e, f, g),
        (c, f, h, i),
        (d, g, i, j),
    )
    best = jnp.argmax(jnp.stack([n0, n1, n2, n3]), axis=0)
    v = [None] * 4
    for comp in range(4):
        val = cols[3][comp]
        for cand in (2, 1, 0):
            val = jnp.where(best == cand, cols[cand][comp], val)
        v[comp] = val
    q = jnp.stack(v, axis=-1)
    return q / (jnp.linalg.norm(q, axis=-1, keepdims=True) + 1e-12)


def kabsch_rotation_planar(h_entries):
    """Planar Kabsch: 9 correlation-entry arrays (Hxx, Hxy, Hxz, Hyx, Hyy,
    Hyz, Hzx, Hzy, Hzz), each (...,) -> 9 rotation-entry arrays
    (r00..r22) of the same shape. Everything stays in well-tiled planes —
    no (..., 3, 3) or (..., 4) minor-dim tensors."""
    Sxx, Sxy, Sxz, Syx, Syy, Syz, Szx, Szy, Szz = (x.astype(jnp.float32) for x in h_entries)
    k_entries = (
        Sxx + Syy + Szz,
        Syz - Szy,
        Szx - Sxz,
        Sxy - Syx,
        Sxx - Syy - Szz,
        Sxy + Syx,
        Szx + Sxz,
        -Sxx + Syy - Szz,
        Syz + Szy,
        -Sxx - Syy + Szz,
    )
    q = _top_eigvec_sym4_planar(k_entries)  # (..., 4)
    w, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    r00 = 1 - 2 * (y * y + z * z)
    r01 = 2 * (x * y - z * w)
    r02 = 2 * (x * z + y * w)
    r10 = 2 * (x * y + z * w)
    r11 = 1 - 2 * (x * x + z * z)
    r12 = 2 * (y * z - x * w)
    r20 = 2 * (x * z - y * w)
    r21 = 2 * (y * z + x * w)
    r22 = 1 - 2 * (x * x + y * y)
    return r00, r01, r02, r10, r11, r12, r20, r21, r22


def kabsch_rotation(H: jnp.ndarray) -> jnp.ndarray:
    """Optimal rotation R maximizing sum_i w_i r_i . (R s_i) for H = sum_i w_i s_i r_i^T.

    R maps src points into the ref frame (r ~= R s). Equivalent to the
    SVD solution V diag(1,1,det) U^T of the reference implementation
    (core/unopose/utils/model_utils.py:722-727) for full-rank H.
    """
    H = H.astype(jnp.float32)
    Sxx, Sxy, Sxz = H[..., 0, 0], H[..., 0, 1], H[..., 0, 2]
    Syx, Syy, Syz = H[..., 1, 0], H[..., 1, 1], H[..., 1, 2]
    Szx, Szy, Szz = H[..., 2, 0], H[..., 2, 1], H[..., 2, 2]
    k_entries = (
        Sxx + Syy + Szz,  # k00
        Syz - Szy,  # k01
        Szx - Sxz,  # k02
        Sxy - Syx,  # k03
        Sxx - Syy - Szz,  # k11
        Sxy + Syx,  # k12
        Szx + Sxz,  # k13
        -Sxx + Syy - Szz,  # k22
        Syz + Szy,  # k23
        -Sxx - Syy + Szz,  # k33
    )
    q = _top_eigvec_sym4_planar(k_entries)
    return quat_to_rotmat(q)


def weighted_procrustes(
    src_points: jnp.ndarray,
    ref_points: jnp.ndarray,
    weights: jnp.ndarray | None = None,
    weight_thresh: float = 0.0,
    eps: float = 1e-5,
):
    """Weighted rigid alignment src -> ref.

    Mirrors reference core/unopose/utils/model_utils.py:667-743 semantics:
    weights below ``weight_thresh`` are zeroed, weights are sum-normalized,
    centroids are weighted, and the returned (R, t) satisfy ref ~= R src + t.

    Args:
        src_points: (B, N, 3)
        ref_points: (B, N, 3)
        weights: (B, N) or None (uniform)
    Returns:
        R: (B, 3, 3), t: (B, 3)
    """
    src_points = src_points.astype(jnp.float32)
    ref_points = ref_points.astype(jnp.float32)
    if weights is None:
        weights = jnp.ones(src_points.shape[:-1], dtype=jnp.float32)
    weights = jnp.where(weights < weight_thresh, 0.0, weights)
    weights = weights / (jnp.sum(weights, axis=-1, keepdims=True) + eps)
    w = weights[..., None]  # (B, N, 1)

    src_centroid = jnp.sum(src_points * w, axis=-2, keepdims=True)
    ref_centroid = jnp.sum(ref_points * w, axis=-2, keepdims=True)
    src_c = src_points - src_centroid
    ref_c = ref_points - ref_centroid

    # H = src_c^T (w * ref_c): (B, 3, 3). fp32 accumulation — the rotation
    # accuracy is bounded by H's accuracy.
    H = jnp.einsum("...ni,...nj->...ij", src_c, w * ref_c, precision=jax.lax.Precision.HIGHEST)
    R = kabsch_rotation(H)
    t = ref_centroid[..., 0, :] - jnp.einsum("...ij,...j->...i", R, src_centroid[..., 0, :])
    return R, t
