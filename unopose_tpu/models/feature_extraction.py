"""2D feature extraction + lifting to point clouds.

Flax counterparts of reference oneref_feature_extraction.py:
  * ViTAE (:45-236): ViT pyramid (4 tapped levels concatenated) + linear
    upscaling to a dense per-pixel feature map, bilinear-resized to the crop
    resolution. ``up_type='linear'``: Linear(4D -> 16*out_dim) reshaping each
    token to a 4x4 feature patch; ``'deconv'``: two stride-2 transposed convs.
  * ViTEncoderOneRef (:239-298): runs the extractor on the query and the
    single reference crop, gathers per-point pixel features at the
    ``rgb_choose`` flat indices, normalizes both clouds by the reference
    radius, and FPS-subsamples the reference to ``fine_npoint`` points.

Everything is channels-last (B, H, W, C).
"""

from __future__ import annotations

from typing import Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from unopose_tpu.models.vit import make_vit
from unopose_tpu.ops.fps import gather_points, sample_pts_feats


def get_chosen_pixel_feats(feat_map: jnp.ndarray, choose: jnp.ndarray) -> jnp.ndarray:
    """Gather per-point features from a dense (B, H, W, C) map at flat
    (B, P) indices into the row-major H*W grid (reference model_utils.py:215-227)."""
    B, H, W, C = feat_map.shape
    flat = feat_map.reshape(B, H * W, C)
    return gather_points(flat, choose)


def bilinear_gather(feat_map: jnp.ndarray, choose: jnp.ndarray, out_size: int) -> jnp.ndarray:
    """Bilinearly sample a low-res (B, g, g, C) feature map at the pixel
    centers of flat indices into a virtual (out_size, out_size) grid.

    Numerically equivalent to ``jax.image.resize(..., 'bilinear')`` (half-pixel
    centers, edge clamp — torch align_corners=False) followed by a flat
    gather, but touches only the requested pixels: the reference's
    materialize-224^2-then-gather path (oneref_feature_extraction.py:229 +
    model_utils.py:215-227) writes ~25x more HBM than the gather needs.
    """
    B, g, g2, C = feat_map.shape
    assert g == g2
    flat = feat_map.reshape(B, g * g, C)
    choose = choose.astype(jnp.int32)
    r = (choose // out_size).astype(jnp.float32)
    c = (choose % out_size).astype(jnp.float32)
    scale = g / out_size

    def src(v):
        s = jnp.clip((v + 0.5) * scale - 0.5, 0.0, g - 1.0)
        lo = jnp.clip(jnp.floor(s), 0, g - 1)
        hi = jnp.minimum(lo + 1, g - 1)
        return lo.astype(jnp.int32), hi.astype(jnp.int32), (s - lo).astype(feat_map.dtype)

    y0, y1, wy = src(r)
    x0, x1, wx = src(c)

    def take(yy, xx):
        return gather_points(flat, yy * g + xx)

    wy = wy[..., None]
    wx = wx[..., None]
    top = take(y0, x0) * (1 - wx) + take(y0, x1) * wx
    bot = take(y1, x0) * (1 - wx) + take(y1, x1) * wx
    return top * (1 - wy) + bot * wy


class ViTAE(nn.Module):
    vit_type: str = "vit_base_patch14_reg4_dinov2"
    up_type: str = "linear"
    embed_dim: int = 768
    out_dim: int = 256
    use_pyramid_feat: bool = True
    img_size: int = 224
    dtype: jnp.dtype = jnp.float32
    int8_gemm: bool = False  # W8A8 ViT block GEMMs at inference (vit.DenseQ)
    fused_attn: object = None  # None = auto (TPU inference); False forces the
    # exact XLA attention + erf GELU (reference-faithful numerics)

    @nn.compact
    def __call__(self, x: jnp.ndarray, upsample: bool = True, train: bool = False) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """(B, H, W, 3) -> dense feature map (B, H, W, out_dim), cls (B, D).

        With ``upsample=False`` the (B, 4*grid, 4*grid, out_dim) map is
        returned un-resized — callers that only need sparse pixels sample it
        directly with ``bilinear_gather`` (equivalent values, ~25x less HBM
        traffic than materializing the full-resolution map)."""
        B, H, W, _ = x.shape
        vit = make_vit(self.vit_type, img_size=self.img_size, dtype=self.dtype,
                       int8_gemm=self.int8_gemm, fused_attn=self.fused_attn, name="vit")
        outs, cls = vit(x, train=train)
        npfx = vit.num_prefix_tokens
        outs = [o[:, npfx:, :] for o in outs]
        feat = jnp.concatenate(outs, axis=2) if self.use_pyramid_feat else outs[-1]

        side = vit.grid  # tokens per image side
        if self.up_type == "linear":
            up = nn.Dense(16 * self.out_dim, dtype=self.dtype, name="output_upscaling")(feat)
            up = up.reshape(B, side, side, 4, 4, self.out_dim)
            up = up.transpose(0, 1, 3, 2, 4, 5).reshape(B, side * 4, side * 4, self.out_dim)
        elif self.up_type == "deconv":
            g = feat.reshape(B, side, side, feat.shape[-1])
            g = nn.ConvTranspose(self.out_dim * 2, (2, 2), strides=(2, 2), dtype=self.dtype, name="deconv1")(g)
            g = nn.LayerNorm(epsilon=1e-6, dtype=jnp.float32, name="ln")(g).astype(self.dtype)
            g = nn.gelu(g, approximate=False)
            up = nn.ConvTranspose(self.out_dim, (2, 2), strides=(2, 2), dtype=self.dtype, name="deconv2")(g)
        else:
            raise ValueError(self.up_type)

        if not upsample:
            return up, cls
        dense = jax.image.resize(up.astype(jnp.float32), (B, H, W, self.out_dim), method="bilinear")
        return dense.astype(self.dtype), cls


class ViTEncoderOneRef(nn.Module):
    """Query + one-reference feature lifting (reference :239-298)."""

    npoint: int = 2048  # fine_npoint: reference cloud subsample size
    vit_type: str = "vit_base_patch14_reg4_dinov2"
    up_type: str = "linear"
    embed_dim: int = 768
    out_dim: int = 256
    use_pyramid_feat: bool = True
    img_size: int = 224
    dtype: jnp.dtype = jnp.float32
    int8_gemm: bool = False
    fused_attn: object = None  # see ViTAE

    def setup(self):
        self.rgb_net = ViTAE(
            vit_type=self.vit_type,
            up_type=self.up_type,
            embed_dim=self.embed_dim,
            out_dim=self.out_dim,
            use_pyramid_feat=self.use_pyramid_feat,
            img_size=self.img_size,
            dtype=self.dtype,
            int8_gemm=self.int8_gemm,
            fused_attn=self.fused_attn,
        )

    def get_img_feats(self, img: jnp.ndarray, choose: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        low, _ = self.rgb_net(img, upsample=False, train=train)
        return bilinear_gather(low, choose, img.shape[1])

    def __call__(
        self,
        rgb: jnp.ndarray,  # (B, H, W, 3) query crop
        rgb_choose: jnp.ndarray,  # (B, P1) flat pixel indices of observed points
        pts: jnp.ndarray,  # (B, P1, 3) observed cloud, camera frame [m]
        tem1_rgb: Optional[jnp.ndarray] = None,  # (B, H, W, 3) reference crop
        tem1_choose: Optional[jnp.ndarray] = None,  # (B, P2)
        tem1_pts: Optional[jnp.ndarray] = None,  # (B, P2, 3)
        dense_po: Optional[jnp.ndarray] = None,  # precomputed ref cloud (cache path)
        dense_fo: Optional[jnp.ndarray] = None,  # precomputed ref features
        tem1_radius: Optional[jnp.ndarray] = None,  # precomputed ref radius (B,)
        train: bool = False,
    ):
        dense_pm = pts

        if dense_po is not None and dense_fo is not None:
            # onboarding-cache path (reference :252-263): features precomputed;
            # dense_po arrives UNNORMALIZED (meters). The radius may be cached
            # alongside (exact: computed from the full template cloud by
            # encode_template) or recomputed from the subsample (reference
            # fallback, :256-259).
            dense_fm = self.get_img_feats(rgb, rgb_choose, train=train)
            if tem1_radius is not None:
                radius = tem1_radius
            else:
                mean = jnp.mean(dense_po, axis=1, keepdims=True)
                radius = jnp.max(jnp.linalg.norm(dense_po - mean, axis=-1), axis=-1)
            r = radius[:, None, None] + 1e-6
            return dense_pm / r, dense_fm, dense_po / r, dense_fo, radius

        # normalize both clouds by the reference radius (max dist to centroid)
        mean = jnp.mean(tem1_pts, axis=1, keepdims=True)
        radius = jnp.max(jnp.linalg.norm(tem1_pts - mean, axis=-1), axis=-1)
        r = radius[:, None, None] + 1e-6
        dense_pm = dense_pm / r
        tem1_pts = tem1_pts / r

        dense_fm, tem_feat = self.encode_pair(rgb, rgb_choose, tem1_rgb, tem1_choose, train=train)
        dense_po, dense_fo = sample_pts_feats(tem1_pts, tem_feat, self.npoint)
        return dense_pm, dense_fm, dense_po, dense_fo, radius

    def encode_pair(self, rgb, rgb_choose, tem1_rgb, tem1_choose, train: bool = False):
        """Run query + reference crops through the backbone as ONE batched
        forward (the reference runs two sequential ViT passes,
        oneref_feature_extraction.py:248,279) — halves per-call overheads and
        improves MXU utilization at small batch."""
        B, P1 = rgb_choose.shape
        P2 = tem1_choose.shape[1]
        imgs = jnp.concatenate([rgb, tem1_rgb], axis=0)
        low, _ = self.rgb_net(imgs, upsample=False, train=train)
        q_feat = bilinear_gather(low[:B], rgb_choose, rgb.shape[1])
        t_feat = bilinear_gather(low[B:], tem1_choose, rgb.shape[1])
        return q_feat, t_feat
