"""Architecture parity: our flax ViTPyramid vs HuggingFace Dinov2WithRegisters
(an independent torch implementation of the same architecture) with randomly
initialized weights mapped through a converter.

This is the strongest offline numerics gate available (no pretrained weights
in this environment): if block math, LayerScale, register tokens,
no-embed-class positional handling and the final norm all match an
independent implementation to ~1e-4, loading the real timm checkpoint via
utils/checkpoint.convert_timm_vit_to_flax reduces to the (structurally
tested) key mapping."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

from unopose_tpu.models.vit import ViTPyramid
from unopose_tpu.utils.checkpoint import convert_timm_vit_to_flax

DIM, DEPTH, HEADS, PATCH, IMG, REG = 64, 4, 4, 14, 56, 4  # grid 4x4


def hf_model():
    from transformers import Dinov2WithRegistersConfig, Dinov2WithRegistersModel

    cfg = Dinov2WithRegistersConfig(
        hidden_size=DIM,
        num_hidden_layers=DEPTH,
        num_attention_heads=HEADS,
        intermediate_size=DIM * 4,
        patch_size=PATCH,
        image_size=IMG,
        num_register_tokens=REG,
        layerscale_value=1e-5,
        hidden_act="gelu",
        use_swiglu_ffn=False,
        attention_probs_dropout_prob=0.0,
        hidden_dropout_prob=0.0,
    )
    torch.manual_seed(0)
    model = Dinov2WithRegistersModel(cfg).eval()
    # randomize LayerScale away from the constant init so the test is sharp
    with torch.no_grad():
        for layer in model.encoder.layer:
            layer.layer_scale1.lambda1.uniform_(0.5, 1.5)
            layer.layer_scale2.lambda1.uniform_(0.5, 1.5)
    return model


def hf_to_timm_state_dict(model):
    """HF Dinov2WithRegisters -> timm-style keys (the converter's input)."""
    sd = {k: v.detach().numpy() for k, v in model.state_dict().items()}
    out = {
        "patch_embed.proj.weight": sd["embeddings.patch_embeddings.projection.weight"],
        "patch_embed.proj.bias": sd["embeddings.patch_embeddings.projection.bias"],
        # HF gives the cls token a positional embedding (slot 0); the timm
        # reg4/no_embed_class layout does not — fold it into the cls token
        # (identical math for HF, which always adds the two)
        "cls_token": sd["embeddings.cls_token"] + sd["embeddings.position_embeddings"][:, :1, :],
        "reg_token": sd["embeddings.register_tokens"],
        "pos_embed": sd["embeddings.position_embeddings"][:, 1:, :],
        "norm.weight": sd["layernorm.weight"],
        "norm.bias": sd["layernorm.bias"],
    }
    for i in range(DEPTH):
        p = f"encoder.layer.{i}."
        q = np.concatenate(
            [sd[p + "attention.attention.query.weight"], sd[p + "attention.attention.key.weight"],
             sd[p + "attention.attention.value.weight"]], axis=0)
        qb = np.concatenate(
            [sd[p + "attention.attention.query.bias"], sd[p + "attention.attention.key.bias"],
             sd[p + "attention.attention.value.bias"]], axis=0)
        out[f"blocks.{i}.attn.qkv.weight"] = q
        out[f"blocks.{i}.attn.qkv.bias"] = qb
        out[f"blocks.{i}.attn.proj.weight"] = sd[p + "attention.output.dense.weight"]
        out[f"blocks.{i}.attn.proj.bias"] = sd[p + "attention.output.dense.bias"]
        out[f"blocks.{i}.norm1.weight"] = sd[p + "norm1.weight"]
        out[f"blocks.{i}.norm1.bias"] = sd[p + "norm1.bias"]
        out[f"blocks.{i}.norm2.weight"] = sd[p + "norm2.weight"]
        out[f"blocks.{i}.norm2.bias"] = sd[p + "norm2.bias"]
        out[f"blocks.{i}.mlp.fc1.weight"] = sd[p + "mlp.fc1.weight"]
        out[f"blocks.{i}.mlp.fc1.bias"] = sd[p + "mlp.fc1.bias"]
        out[f"blocks.{i}.mlp.fc2.weight"] = sd[p + "mlp.fc2.weight"]
        out[f"blocks.{i}.mlp.fc2.bias"] = sd[p + "mlp.fc2.bias"]
        out[f"blocks.{i}.ls1.gamma"] = sd[p + "layer_scale1.lambda1"]
        out[f"blocks.{i}.ls2.gamma"] = sd[p + "layer_scale2.lambda1"]
    return out


def test_flax_vit_matches_hf_dinov2(rng):
    model = hf_model()
    x = rng.normal(size=(2, IMG, IMG, 3)).astype(np.float32)

    with torch.no_grad():
        hf_out = model(torch.from_numpy(x.transpose(0, 3, 1, 2)), output_hidden_states=True)
    # HF last_hidden_state applies the final layernorm; token order:
    # [cls, reg x4, patches]
    want = hf_out.last_hidden_state.numpy()

    params = convert_timm_vit_to_flax(hf_to_timm_state_dict(model), depth=DEPTH, reg_tokens=REG)
    vit = ViTPyramid(
        img_size=IMG, patch_size=PATCH, embed_dim=DIM, depth=DEPTH, num_heads=HEADS,
        init_values=1e-5, reg_tokens=REG, no_embed_class=True,
    )
    outs, cls = vit.apply({"params": jax.tree_util.tree_map(jnp.asarray, params)}, jnp.asarray(x))
    got = np.asarray(outs[-1])  # final tap = norm(last block)

    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, atol=2e-4, rtol=1e-3)
    np.testing.assert_allclose(np.asarray(cls), want[:, 0], atol=2e-4, rtol=1e-3)


def test_mha_fused_kernel_matches_einsum(rng):
    """ops/vit_attn.mha_fused (interpret mode) == the XLA einsum attention,
    fp32 softmax, across head counts and a non-tile-aligned token count."""
    from unopose_tpu.ops.vit_attn import mha_fused

    for B, N, H, hd in ((2, 37, 4, 16), (1, 261, 12, 64)):
        D = H * hd
        q = jnp.asarray(rng.normal(size=(B, N, D)).astype(np.float32))
        k = jnp.asarray(rng.normal(size=(B, N, D)).astype(np.float32))
        v = jnp.asarray(rng.normal(size=(B, N, D)).astype(np.float32))

        qh = np.asarray(q).reshape(B, N, H, hd).transpose(0, 2, 1, 3)
        kh = np.asarray(k).reshape(B, N, H, hd).transpose(0, 2, 1, 3)
        vh = np.asarray(v).reshape(B, N, H, hd).transpose(0, 2, 1, 3)
        s = np.einsum("bhnc,bhmc->bhnm", qh, kh) / hd**0.5
        s = s - s.max(-1, keepdims=True)
        p = np.exp(s)
        p = p / p.sum(-1, keepdims=True)
        want = np.einsum("bhnm,bhmc->bhnc", p, vh).transpose(0, 2, 1, 3).reshape(B, N, D)

        got = np.asarray(mha_fused(q, k, v, H, interpret=True))
        np.testing.assert_allclose(got, want, atol=2e-5, rtol=1e-4)
