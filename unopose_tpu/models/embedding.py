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


def bounded_sincos(om: jnp.ndarray):
    """(sin(om), cos(om)) for moderate arguments via quadrant reduction +
    degree-7/6 minimax polynomials on |r| <= pi/4.

    XLA:TPU's generic sin/cos pay a full IEEE range reduction (~9.5e9
    evals/s measured on v5e — the geo embedding was transcendental-bound on
    them). This form is ~25 VPU ops. Error: poly <3e-8 plus the quadrant
    rounding k*ulp(pi/2) — <1e-6 for |om|<=16, <1e-4 even at |om|~1e3.
    """
    om = om.astype(jnp.float32)
    k = jnp.round(om * jnp.float32(2.0 / np.pi))
    r = om - k * jnp.float32(np.pi / 2.0)
    r2 = r * r
    sr = r * (1.0 - r2 / 6.0 * (1.0 - r2 / 20.0 * (1.0 - r2 / 42.0)))
    cr = 1.0 - r2 / 2.0 * (1.0 - r2 / 12.0 * (1.0 - r2 / 30.0))
    q = k.astype(jnp.int32) & 3  # two's-complement & gives mod 4 for negatives
    sin = jnp.where(q == 0, sr, jnp.where(q == 1, cr, jnp.where(q == 2, -sr, -cr)))
    cos = jnp.where(q == 0, cr, jnp.where(q == 1, -sr, jnp.where(q == 2, -cr, sr)))
    return sin, cos


def sinusoidal_embedding(
    indices: jnp.ndarray, d_model: int, poly_xmax: float | None = None, exact: bool = False
) -> jnp.ndarray:
    """Sinusoidal embedding, concatenated layout: [sin_0..sin_{d/2-1},
    cos_0..cos_{d/2-1}] of (index * 10000^(-2i/d)).

    The reference (transformer.py:258-284) interleaves (sin, cos) pairs;
    since the embedding always feeds a learned projection, the layouts are
    equivalent up to a fixed permutation of that projection's input rows —
    concat avoids the interleaving shuffle, which showed up as (d/2, 2)
    padding fusions in profiles. (A weight converter for reference matcher
    checkpoints must permute proj_d/proj_a rows with
    perm = [0, 2, ..., d-2, 1, 3, ..., d-1].)

    ``poly_xmax``: when the caller can STATICALLY bound |index| <= poly_xmax,
    the frequencies with argument x = index * omega_i <= 0.5 (the geometric
    tail — ~2/3 of them at the operating point) use 3-term Taylor
    polynomials instead of sin/cos (max error 2.2e-5, two orders below the
    1e-3 reference-parity gate). The embedding is transcendental-bound on
    the VPU — this cuts most of that cost.
    """
    if d_model % 2 != 0:
        raise ValueError(f"odd d_model: {d_model}")
    div = jnp.exp(jnp.arange(0, d_model, 2, dtype=jnp.float32) * (-np.log(10000.0) / d_model))
    x = indices[..., None].astype(jnp.float32)

    if exact:
        om = x * div
        return jnp.concatenate([jnp.sin(om), jnp.cos(om)], axis=-1)

    if poly_xmax is None:
        s, c = bounded_sincos(x * div)
        return jnp.concatenate([s, c], axis=-1)

    # first index i0 with omega_i * xmax <= 0.5: the tail skips even the
    # quadrant reduction (plain small-angle Taylor)
    i0 = int(np.ceil(d_model / 2 * np.log(2.0 * poly_xmax) / np.log(10000.0)))
    i0 = max(0, min(d_model // 2, i0))
    sin_hi, cos_hi = bounded_sincos(x * div[:i0])
    om = x * div[i0:]  # |om| <= 0.5
    om2 = om * om
    sin_lo = om * (1.0 - om2 / 6.0 * (1.0 - om2 / 20.0))
    cos_lo = 1.0 - om2 / 2.0 * (1.0 - om2 / 12.0)
    return jnp.concatenate([sin_hi, sin_lo, cos_hi, cos_lo], axis=-1)


class _DenseVars(nn.Module):
    """Declares the exact param tree of an nn.Dense child (kernel, bias)
    without applying it — the fused geo path consumes the raw weights to
    build pre-projected Taylor tables (ops/geo_fused.build_taylor_table)."""

    in_features: int
    features: int

    @nn.compact
    def __call__(self):
        kernel = self.param("kernel", nn.initializers.lecun_normal(), (self.in_features, self.features))
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        return kernel, bias


class GeometricStructureEmbedding(nn.Module):
    """GeoTransformer relative position embedding on a sparse point set.

    Reference transformer.py:287-350; config knobs sigma_d/sigma_a/angle_k/
    reduction_a mirror configs/main_cfg.py:142-148. Computed once per cloud
    on the (coarse_npoint + 1 bg) points; consumed by RPE attention.

    ``table_size > 0`` replaces the per-element sinusoid + projection with a
    per-forward lookup table ``T[j] = sinusoid(x_j) @ W + b`` (exact trig on
    just table_size grid points) sampled by linear interpolation; max error
    ~(x_max/table_size)^2/8 ~= 1e-5, two orders below the 1e-3
    reference-parity gate. Measured on v5e the random row-gathers cost MORE
    than the transcendentals they replace (gathers are HBM-bound; sin/cos
    are VPU-bound and fuse into the projection GEMM), so the default is 0 =
    exact; the table stays available for backends where gathers win.
    """

    hidden_dim: int = 256
    sigma_d: float = 0.2
    sigma_a: float = 15.0
    angle_k: int = 3
    reduction_a: str = "max"
    table_size: int = 0
    # static bound on the distance indices (max pairwise dist / sigma_d).
    # UNOPose feeds LRF-normalized coords plus the (1,1,1) bg point, so
    # 2*sqrt(3)/sigma_d bounds it exactly; the bound turns the geometric
    # tail of the d-sinusoid into small-angle polynomials. None = no bound
    # assumed (generic callers).
    d_index_max: float | None = None
    # fused Pallas path (ops/geo_fused.py): 3-point Lagrange evaluation of
    # the pre-projected sinusoid curves from a T-point table — the whole
    # embedding (distances, angles, both sinusoid projections, max-over-k,
    # final sum) runs in one kernel. Requires d_index_max and reduction_a
    # == 'max'. 0 = off; typical T = 128 (error ~2e-4, see geo_fused).
    # Inference-only: the kernel has no VJP (the reference stop-gradients
    # the inputs, but the projection weights would need one for training).
    fused_table: int = 0
    fused_interpret: bool = False
    # fused path writes the embedding as symmetric per-channel int8 and
    # returns (e8, scale) — half the HBM bytes for this write AND every RPE
    # layer's read (quant step ~0.4% of channel range, same order as the
    # bf16 rounding it replaces; bound exact from the tables)
    quant_int8: bool = False
    dtype: jnp.dtype = jnp.float32

    def _make_table(self, proj: nn.Dense, x_max: jnp.ndarray) -> jnp.ndarray:
        """(table_size, hidden_dim) projected sinusoid values on a uniform
        grid over [0, x_max]; rows j and j+1 bracket index x/h."""
        T = self.table_size
        grid = jnp.arange(T, dtype=jnp.float32) * (x_max / (T - 1))
        return proj(sinusoidal_embedding(grid, self.hidden_dim).astype(self.dtype))

    def _lookup(self, table: jnp.ndarray, x: jnp.ndarray, x_max: jnp.ndarray) -> jnp.ndarray:
        """Linear interpolation of table rows at x in [0, x_max]; x (B, N, N)
        -> (B, N, N, hidden_dim)."""
        T = self.table_size
        pos = jnp.clip(x / x_max, 0.0, 1.0) * (T - 1)
        i0 = jnp.minimum(pos.astype(jnp.int32), T - 2)
        f = (pos - i0.astype(jnp.float32)).astype(table.dtype)[..., None]
        flat = i0.reshape(-1)
        lo = jnp.take(table, flat, axis=0, mode="clip").reshape(x.shape + (self.hidden_dim,))
        hi = jnp.take(table, flat + 1, axis=0, mode="clip").reshape(x.shape + (self.hidden_dim,))
        return lo + f * (hi - lo)

    @nn.compact
    def __call__(self, points: jnp.ndarray, train: bool = False) -> jnp.ndarray:
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

        if (
            self.fused_table
            and not train  # kernel has no VJP; training uses the XLA path
            and self.d_index_max is not None
            and self.reduction_a == "max"
            and not self.table_size
            and (jax.default_backend() == "tpu" or self.fused_interpret)
        ):
            from unopose_tpu.ops.geo_fused import build_taylor_table, geo_rpe_fused

            kd, bd = _DenseVars(self.hidden_dim, self.hidden_dim, name="proj_d")()
            ka, ba = _DenseVars(self.hidden_dim, self.hidden_dim, name="proj_a")()
            tab_d, scale_d = build_taylor_table(kd, bd, float(self.d_index_max), self.fused_table)
            tab_a, scale_a = build_taylor_table(ka, ba, float(np.pi * factor_a), self.fused_table)
            return geo_rpe_fused(
                points, ref_vec, tab_d, tab_a, scale_d, scale_a,
                sigma_d=self.sigma_d, factor_a=factor_a,
                out_dtype=self.dtype, quantize=self.quant_int8,
                interpret=self.fused_interpret,
            )
        # planar channel math: the (B, N, N) anchor-vector planes keep the
        # big tensors 2-D-tiled; a trailing width-3 axis (and the 5-D
        # jnp.cross it forces) wastes ~98% of each (8, 128) register tile
        ax = points[:, None, :, 0] - points[:, :, None, 0]  # (B, N, N)
        ay = points[:, None, :, 1] - points[:, :, None, 1]
        az = points[:, None, :, 2] - points[:, :, None, 2]

        proj_d = nn.Dense(self.hidden_dim, dtype=self.dtype, name="proj_d")
        proj_a = nn.Dense(self.hidden_dim, dtype=self.dtype, name="proj_a")

        if self.table_size:
            d_max = jnp.maximum(jnp.max(jax.lax.stop_gradient(d_indices)), 1e-6)
            d_emb = self._lookup(self._make_table(proj_d, d_max), d_indices, d_max)
            a_max = jnp.float32(np.pi * factor_a)
            a_table = self._make_table(proj_a, a_max)  # shared by all k
        else:
            d_emb = sinusoidal_embedding(d_indices, self.hidden_dim, poly_xmax=self.d_index_max)
            d_emb = proj_d(d_emb.astype(self.dtype))

        # fold the k axis into a running reduction: the (B, N, N, k, D)
        # angular tensor is ~1GB at the operating point; per-k passes keep
        # the peak at 1/k and avoid its layout copies
        a_emb = None
        for kk in range(k):
            rx = ref_vec[:, :, kk, 0][:, :, None]  # (B, N, 1)
            ry = ref_vec[:, :, kk, 1][:, :, None]
            rz = ref_vec[:, :, kk, 2][:, :, None]
            cx = ry * az - rz * ay
            cy = rz * ax - rx * az
            cz = rx * ay - ry * ax
            sin_v = jnp.sqrt(cx * cx + cy * cy + cz * cz)  # (B, N, N)
            cos_v = rx * ax + ry * ay + rz * az
            # degenerate anchor (m == n: zero vector) must give angle 0, not
            # arctan2(0, -0.0) = pi — the sum above can round to -0.0
            cos_v = jnp.where((sin_v == 0.0) & (cos_v == 0.0), 1.0, cos_v)
            a_idx = jnp.arctan2(sin_v, cos_v) * factor_a
            if self.table_size:
                e = self._lookup(a_table, a_idx, a_max)
            else:
                # angle in [0, pi] exactly (arctan2 of a nonnegative sine),
                # so the polynomial split bound is static and tight
                e = proj_a(
                    sinusoidal_embedding(
                        a_idx, self.hidden_dim, poly_xmax=float(np.pi * factor_a)
                    ).astype(self.dtype)
                )
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
