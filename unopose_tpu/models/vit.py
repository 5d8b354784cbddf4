"""DINOv2-style Vision Transformer backbone (flax, channels-last, bf16-ready).

Rebuilt for TPU from the capability spec of the reference backbone
(core/unopose/model/oneref_feature_extraction.py:24-42 — a timm
VisionTransformer whose forward taps ``norm(x)`` at 4 pyramid depths
{d-1, d-n-1, d-2n-1, d-3n-1}, n = d//4). Supports the reference's
variants: reg_tokens (DINOv2 register tokens), no_embed_class (pos embed
on patch tokens only), LayerScale init_values, LN eps 1e-6.

The patch embedding is expressed as reshape + one big matmul (instead of a
conv) so it lands on the MXU as a single (B*T, P*P*3) x (P*P*3, D) GEMM.
"""

from __future__ import annotations

from typing import List, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp


class DenseQ(nn.Module):
    """nn.Dense with an optional int8 fast path (W8A8, per-output-channel
    weight scales + per-token dynamic activation scales, int32 accumulate).
    The v5e MXU runs int8 at ~2x its bf16 rate (measured 277 vs 169 TOPS
    asymptotic), and the frozen DINOv2 backbone tolerates W8A8 (feature
    parity gated by tests + the converted-weight study). Param tree is
    identical to nn.Dense (kernel, bias) so checkpoint converters are
    unaffected; the non-int8 path reproduces nn.Dense(dtype) numerics."""

    features: int
    dtype: jnp.dtype = jnp.float32
    int8: bool = False

    @nn.compact
    def __call__(self, x):
        kernel = self.param("kernel", nn.initializers.lecun_normal(), (x.shape[-1], self.features))
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        if not self.int8:
            x = x.astype(self.dtype)
            return jnp.dot(x, kernel.astype(self.dtype)) + bias.astype(self.dtype)
        xf = x.astype(jnp.float32)
        sx = jnp.maximum(jnp.max(jnp.abs(xf), axis=-1, keepdims=True), 1e-6) * (1.0 / 127.0)
        xq = jnp.round(xf / sx).astype(jnp.int8)
        kf = kernel.astype(jnp.float32)
        sw = jnp.maximum(jnp.max(jnp.abs(kf), axis=0, keepdims=True), 1e-12) * (1.0 / 127.0)
        wq = jnp.round(kf / sw).astype(jnp.int8)
        y = jax.lax.dot_general(
            xq, wq,
            dimension_numbers=(((x.ndim - 1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        ).astype(jnp.float32)
        return (y * (sx * sw) + bias).astype(self.dtype)


class Mlp(nn.Module):
    hidden: int
    out: int
    dtype: jnp.dtype = jnp.float32
    # tanh-approximate gelu (TPU inference): XLA's erf lowering costs
    # ~4.6 ms/32-image batch on v5e vs ~0.5 ms for tanh; the approximation
    # error (~3e-4 typical, ~1e-3 max) is below the bf16 matmul rounding
    # the backbone already runs at. Exact erf is kept for training and the
    # fp32 parity paths (timm uses exact gelu).
    gelu_tanh: bool = False
    int8: bool = False

    @nn.compact
    def __call__(self, x):
        x = DenseQ(self.hidden, dtype=self.dtype, int8=self.int8, name="fc1")(x)
        x = nn.gelu(x, approximate=self.gelu_tanh)
        x = DenseQ(self.out, dtype=self.dtype, int8=self.int8, name="fc2")(x)
        return x


class ViTBlock(nn.Module):
    """Pre-norm block with optional LayerScale (timm `Block` semantics).

    Signature is scan-compatible: (carry, _) -> (carry, carry). The blocks
    are stacked with nn.scan (params get a leading depth axis) so the XLA
    program contains ONE block body instead of ``depth`` copies — this cuts
    whole-model compile time several-fold, which matters a lot over the
    axon remote-compile tunnel.
    """

    dim: int
    num_heads: int
    mlp_ratio: float = 4.0
    init_values: Optional[float] = None
    dtype: jnp.dtype = jnp.float32
    # inference-only fused attention kernel (ops/vit_attn.py): True on TPU
    # inference; the XLA einsum path remains for training (the kernel has no
    # VJP — the frozen backbone still gets differentiated before optax masks
    # its updates) and CPU tests
    fused_attn: bool = False
    # int8 (W8A8) qkv/proj/mlp GEMMs — inference only, see DenseQ
    int8: bool = False

    @nn.compact
    def __call__(self, x, _=None):
        h = nn.LayerNorm(epsilon=1e-6, dtype=jnp.float32, name="norm1")(x).astype(self.dtype)
        qkv = DenseQ(self.dim * 3, dtype=self.dtype, int8=self.int8, name="qkv")(h)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        B, N, _ = q.shape
        hd = self.dim // self.num_heads
        if self.fused_attn:
            from unopose_tpu.ops.vit_attn import mha_fused

            out = mha_fused(q, k, v, self.num_heads)
        else:
            q = q.reshape(B, N, self.num_heads, hd).transpose(0, 2, 1, 3)
            k = k.reshape(B, N, self.num_heads, hd).transpose(0, 2, 1, 3)
            v = v.reshape(B, N, self.num_heads, hd).transpose(0, 2, 1, 3)
            attn = jnp.einsum("bhnc,bhmc->bhnm", q, k) / hd**0.5
            if jnp.dtype(self.dtype).itemsize >= 4:
                attn = jax.nn.softmax(attn.astype(jnp.float32), axis=-1).astype(self.dtype)
            else:
                # bf16 softmax (max-subtracted, so stable): skips two fp32
                # round-trips of the (2B, 12, 261, 261) score tensor per block;
                # ~0.8% relative prob noise on a frozen backbone
                attn = jax.nn.softmax(attn, axis=-1)
            out = jnp.einsum("bhnm,bhmc->bhnc", attn, v).transpose(0, 2, 1, 3).reshape(B, N, self.dim)
        out = DenseQ(self.dim, dtype=self.dtype, int8=self.int8, name="attn_proj")(out)
        if self.init_values is not None:
            ls1 = self.param("ls1", nn.initializers.constant(self.init_values), (self.dim,))
            out = out * ls1.astype(self.dtype)
        x = x + out

        h = nn.LayerNorm(epsilon=1e-6, dtype=jnp.float32, name="norm2")(x).astype(self.dtype)
        # the fused_attn gate doubles as "TPU inference": same conditions
        # under which the tanh-gelu deviation is acceptable (see Mlp)
        h = Mlp(int(self.dim * self.mlp_ratio), self.dim, dtype=self.dtype,
                gelu_tanh=self.fused_attn, int8=self.int8, name="mlp")(h)
        if self.init_values is not None:
            ls2 = self.param("ls2", nn.initializers.constant(self.init_values), (self.dim,))
            h = h * ls2.astype(self.dtype)
        out = x + h
        return out, out


class ViTPyramid(nn.Module):
    """ViT returning ``norm(x)`` at 4 evenly spaced depths + the final cls token.

    Input images are channels-last (B, H, W, 3).
    """

    img_size: int = 224
    patch_size: int = 14
    embed_dim: int = 768
    depth: int = 12
    num_heads: int = 12
    mlp_ratio: float = 4.0
    init_values: Optional[float] = 1e-5
    reg_tokens: int = 4
    no_embed_class: bool = True
    dtype: jnp.dtype = jnp.float32
    # None = auto: fused attention kernel on TPU inference (train=False) only
    fused_attn: Optional[bool] = None
    # int8 (W8A8) block GEMMs at inference; ~2x MXU rate on v5e. Off by
    # default — opt in via config after checking the feature-delta gate
    # (tests/test_model.py int8 parity test).
    int8_gemm: bool = False

    @property
    def grid(self) -> int:
        return self.img_size // self.patch_size

    @property
    def num_prefix_tokens(self) -> int:
        return 1 + self.reg_tokens

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> Tuple[List[jnp.ndarray], jnp.ndarray]:
        B, H, W, _ = x.shape
        g, P, D = self.grid, self.patch_size, self.embed_dim
        assert H == W == self.img_size, (H, W, self.img_size)

        # patchify as one GEMM: (B, g, P, g, P, 3) -> (B, g*g, P*P*3) @ (P*P*3, D)
        patches = x.reshape(B, g, P, g, P, 3).transpose(0, 1, 3, 2, 4, 5).reshape(B, g * g, P * P * 3)
        tokens = nn.Dense(D, dtype=self.dtype, name="patch_embed")(patches.astype(self.dtype))

        pos_embed = self.param("pos_embed", nn.initializers.normal(0.02), (1, g * g, D))
        cls_token = self.param("cls_token", nn.initializers.normal(0.02), (1, 1, D))
        prefix = [jnp.broadcast_to(cls_token.astype(self.dtype), (B, 1, D))]
        if self.reg_tokens:
            reg_token = self.param("reg_token", nn.initializers.normal(0.02), (1, self.reg_tokens, D))
            prefix.append(jnp.broadcast_to(reg_token.astype(self.dtype), (B, self.reg_tokens, D)))

        if self.no_embed_class:
            tokens = tokens + pos_embed.astype(self.dtype)
            tokens = jnp.concatenate(prefix + [tokens], axis=1)
        else:
            # pos embed covers prefix tokens too (non-reg4 variants)
            pos_full = self.param("pos_embed_prefix", nn.initializers.normal(0.02), (1, self.num_prefix_tokens, D))
            tokens = jnp.concatenate(prefix + [tokens], axis=1)
            tokens = tokens + jnp.concatenate([pos_full, pos_embed], axis=1).astype(self.dtype)

        norm = nn.LayerNorm(epsilon=1e-6, dtype=jnp.float32, name="norm")
        # pyramid taps at {d-1-i*(d//4)} (reference oneref_feature_extraction.py
        # :34-41) are the ends of 4 consecutive segments: scan each segment
        # and norm its carry — collecting every block's output just to keep 4
        # costs a (depth, B, T, D) stack (150MB+ of dynamic-update-slices)
        n = self.depth // 4
        seg_lens = [self.depth - 3 * n] + [n] * 3
        fused = self.fused_attn
        if fused is None:
            fused = (not train) and jax.devices()[0].platform == "tpu"
        outs: List[jnp.ndarray] = []
        for si, seg_len in enumerate(seg_lens):
            Scanned = nn.scan(
                ViTBlock,
                variable_axes={"params": 0},
                split_rngs={"params": True},
                length=seg_len,
                metadata_params={nn.meta.PARTITION_NAME: None},
            )
            tokens, _ = Scanned(
                D, self.num_heads, self.mlp_ratio, self.init_values, dtype=self.dtype,
                fused_attn=fused, int8=self.int8_gemm and fused, name=f"blocks{si}"
            )(tokens, None)
            outs.append(norm(tokens).astype(self.dtype))
        # order shallow -> deep, matching the reference's enumeration order
        cls = outs[-1][:, 0, :]
        return outs, cls


VIT_VARIANTS = {
    # mirrors the variant table in reference oneref_feature_extraction.py:67-152
    "vit_base": dict(embed_dim=768, depth=12, num_heads=12, init_values=None, reg_tokens=0, no_embed_class=False, patch_size=16),
    "vit_large": dict(embed_dim=1024, depth=24, num_heads=16, init_values=None, reg_tokens=0, no_embed_class=False, patch_size=16),
    "vit_small_patch14_dinov2": dict(embed_dim=384, depth=12, num_heads=6, init_values=1e-5, reg_tokens=0, no_embed_class=False, patch_size=14),
    "vit_base_patch14_dinov2": dict(embed_dim=768, depth=12, num_heads=12, init_values=1e-5, reg_tokens=0, no_embed_class=False, patch_size=14),
    "vit_large_patch14_dinov2": dict(embed_dim=1024, depth=24, num_heads=16, init_values=1e-5, reg_tokens=0, no_embed_class=False, patch_size=14),
    "vit_small_patch14_reg4_dinov2": dict(embed_dim=384, depth=12, num_heads=6, init_values=1e-5, reg_tokens=4, no_embed_class=True, patch_size=14),
    "vit_base_patch14_reg4_dinov2": dict(embed_dim=768, depth=12, num_heads=12, init_values=1e-5, reg_tokens=4, no_embed_class=True, patch_size=14),
    "vit_large_patch14_reg4_dinov2": dict(embed_dim=1024, depth=24, num_heads=16, init_values=1e-5, reg_tokens=4, no_embed_class=True, patch_size=14),
    # tiny variant for CPU tests / multi-chip dry runs (same code path as reg4)
    "vit_tiny_test": dict(embed_dim=32, depth=4, num_heads=2, init_values=1e-5, reg_tokens=4, no_embed_class=True, patch_size=14),
}


def make_vit(vit_type: str, img_size: int = 224, dtype: jnp.dtype = jnp.float32, **overrides) -> ViTPyramid:
    if vit_type not in VIT_VARIANTS:
        raise ValueError(f"unknown vit_type {vit_type}; known: {sorted(VIT_VARIANTS)}")
    kw = dict(VIT_VARIANTS[vit_type])
    kw.update(overrides)
    return ViTPyramid(img_size=img_size, dtype=dtype, **kw)
