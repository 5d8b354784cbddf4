"""Reference (PyTorch UNOPose) checkpoint -> flax variables converter.

Maps a released UNOPose state_dict (reference module tree:
oneref_grf_predator_pose_estimation_model.py:11-24 — feature_extraction /
geo_embedding / coarse_point_matching / fine_point_matching) onto the
unopose_tpu flax param/batch_stats trees, handling the three deliberate
layout deviations of the TPU rebuild:

  1. sinusoidal embedding layout: the reference interleaves (sin, cos)
     pairs (transformer.py:268-283); the flax model concatenates all sins
     then all coss (models/embedding.py) — proj_d/proj_a input rows are
     permuted accordingly;
  2. scanned blocks: per-block tensors are STACKED along a leading nblock
     axis (models/matching.py uses nn.scan over _CoarseBlock/_FineBlock);
  3. torch nn.Linear (out, in) weights -> flax Dense (in, out) kernels;
     1x1 convs in the fine PE (pointnet2/pytorch_utils.py SharedMLP/Conv1d)
     -> planar matmul kernels / Dense.

The SparseToDenseTransformer gather off-by-one (reference
transformer.py:655-662 gathers fps_idx on the bg-augmented array) is a
*computational* quirk, reproduced by ``parity_gather=True`` on the flax
module (models/transformer.py), not a weight-layout issue.

The reference's unused ``fine_point_matching.dis_proj`` Linear (declared at
oneref_predator_fine_point_matching.py:23 but never called in forward) is
dropped.
"""

from __future__ import annotations

import logging
from typing import Dict, Tuple

import numpy as np

from unopose_tpu.utils.checkpoint import convert_timm_vit_to_flax

logger = logging.getLogger(__name__)


def _np(sd: dict) -> dict:
    return {k: (v.numpy() if hasattr(v, "numpy") else np.asarray(v)) for k, v in sd.items()}


def _linear(sd: dict, prefix: str) -> dict:
    out = {"kernel": np.ascontiguousarray(sd[prefix + "weight"].T)}
    if prefix + "bias" in sd:
        out["bias"] = sd[prefix + "bias"]
    return out


def _layernorm(sd: dict, prefix: str) -> dict:
    return {"scale": sd[prefix + "weight"], "bias": sd[prefix + "bias"]}


def _sincos_permuted_linear(sd: dict, prefix: str) -> dict:
    """Linear applied to a sinusoidal embedding: permute the input rows from
    the reference's interleaved (sin_0, cos_0, sin_1, ...) layout to the
    flax concat (sin_0..sin_{d/2-1}, cos_0..) layout."""
    w = sd[prefix + "weight"]  # (out, d)
    d = w.shape[1]
    perm = np.concatenate([np.arange(0, d, 2), np.arange(1, d, 2)])
    return {"kernel": np.ascontiguousarray(w[:, perm].T), "bias": sd[prefix + "bias"]}


def _attention_output(sd: dict, prefix: str) -> dict:
    """AttentionOutput (reference transformer.py:185-200): expand/squeeze/norm."""
    return {
        "expand": _linear(sd, prefix + "expand."),
        "squeeze": _linear(sd, prefix + "squeeze."),
        "norm": _layernorm(sd, prefix + "norm."),
    }


def _vanilla_layer(sd: dict, prefix: str) -> dict:
    """TransformerLayer (reference :213-227): attention.attention.{proj_q,k,v},
    attention.linear, attention.norm, output.* -> flax TransformerLayer tree."""
    a = prefix + "attention."
    return {
        "attention": {
            "proj_q": _linear(sd, a + "attention.proj_q."),
            "proj_k": _linear(sd, a + "attention.proj_k."),
            "proj_v": _linear(sd, a + "attention.proj_v."),
        },
        "linear": _linear(sd, a + "linear."),
        "norm": _layernorm(sd, a + "norm."),
        "output": _attention_output(sd, prefix + "output."),
    }


def _rpe_layer(sd: dict, prefix: str) -> dict:
    """RPETransformerLayer (reference :446-466): adds proj_p."""
    out = _vanilla_layer(sd, prefix)
    out["attention"]["proj_p"] = _linear(sd, prefix + "attention.attention.proj_p.")
    return out


def _linear_attn_layer(sd: dict, prefix: str) -> dict:
    """LinearTransformerLayer (reference :599-612): focused linear attention
    with a learned (1, 1, d) softplus scale."""
    a = prefix + "attention."
    return {
        "attention": {
            "proj_q": _linear(sd, a + "attention.proj_q."),
            "proj_k": _linear(sd, a + "attention.proj_k."),
            "proj_v": _linear(sd, a + "attention.proj_v."),
            "scale": sd[a + "attention.scale"],
        },
        "linear": _linear(sd, a + "linear."),
        "norm": _layernorm(sd, a + "norm."),
        "output": _attention_output(sd, prefix + "output."),
    }


def _geometric_transformer(sd: dict, prefix: str, blocks=("self", "cross")) -> dict:
    """GeometricTransformer (reference :469-514): layers.i is an RPE layer for
    'self' blocks, vanilla for 'cross'."""
    out = {}
    for i, b in enumerate(blocks):
        conv = _rpe_layer if b == "self" else _vanilla_layer
        out[f"layer{i}"] = conv(sd, f"{prefix}layers.{i}.")
    return out


def _stack_blocks(trees: list) -> dict:
    """Stack per-block param trees along a leading axis (nn.scan layout)."""
    import jax

    return jax.tree_util.tree_map(lambda *xs: np.stack(xs), *trees)


def _shared_mlp(sd: dict, prefix: str, n_layers: int, flax_name: str) -> Tuple[dict, dict]:
    """SharedMLP (reference pytorch_utils.py:25-49): layer{i}.conv (1x1 Conv2d,
    no bias) + layer{i}.normlayer.bn -> planar kernels + BatchNorm params/stats."""
    params: dict = {}
    stats: dict = {}
    for i in range(n_layers):
        w = sd[f"{prefix}layer{i}.conv.weight"]  # (out, in, 1, 1)
        params[f"{flax_name}_fc{i}_kernel"] = np.ascontiguousarray(w[:, :, 0, 0].T)
        bnp = f"{prefix}layer{i}.normlayer.bn."
        params[f"{flax_name}_bn{i}"] = {"scale": sd[bnp + "weight"], "bias": sd[bnp + "bias"]}
        stats[f"{flax_name}_bn{i}"] = {"mean": sd[bnp + "running_mean"], "var": sd[bnp + "running_var"]}
    return params, stats


def convert_fine_pe(sd: dict, prefix: str = "PE.") -> Tuple[dict, dict]:
    """PositionalEncoding (reference oneref_predator_fine_point_matching.py:138-178):
    mlp1/mlp2 SharedMLPs + mlp3 Conv1d -> FinePositionalEncoding tree."""
    params: dict = {}
    stats: dict = {}
    for name in ("mlp1", "mlp2"):
        p, s = _shared_mlp(sd, f"{prefix}{name}.", 3, name)
        params.update(p)
        stats.update(s)
    w3 = sd[prefix + "mlp3.conv.weight"]  # (out, in, 1)
    params["mlp3"] = {"kernel": np.ascontiguousarray(w3[:, :, 0].T), "bias": sd[prefix + "mlp3.conv.bias"]}
    return params, stats


def convert_geo_embedding(sd: dict, prefix: str = "geo_embedding.") -> dict:
    return {
        "proj_d": _sincos_permuted_linear(sd, prefix + "proj_d."),
        "proj_a": _sincos_permuted_linear(sd, prefix + "proj_a."),
    }


def convert_coarse_matching(sd: dict, prefix: str = "coarse_point_matching.", nblock: int = 3) -> dict:
    blocks = [
        {
            "transformer": _geometric_transformer(sd, f"{prefix}transformers.{i}."),
            "score_head": _linear(sd, f"{prefix}score_heads.{i}."),
        }
        for i in range(nblock)
    ]
    return {
        "in_proj": _linear(sd, prefix + "in_proj."),
        "out_proj": _linear(sd, prefix + "out_proj."),
        "bg_token": sd[prefix + "bg_token"],
        "blocks": _stack_blocks(blocks),
    }


def convert_fine_matching(sd: dict, prefix: str = "fine_point_matching.", nblock: int = 3) -> Tuple[dict, dict]:
    blocks = [
        {
            "transformer": {
                "sparse_layer": _geometric_transformer(sd, f"{prefix}transformers.{i}.sparse_layer."),
                "dense_layer": _linear_attn_layer(sd, f"{prefix}transformers.{i}.dense_layer."),
            },
            "score_head": _linear(sd, f"{prefix}score_heads.{i}."),
        }
        for i in range(nblock)
    ]
    pe_params, pe_stats = convert_fine_pe(sd, prefix + "PE.")
    params = {
        "in_proj": _linear(sd, prefix + "in_proj."),
        "out_proj": _linear(sd, prefix + "out_proj."),
        "bg_token": sd[prefix + "bg_token"],
        "pe": pe_params,
        "blocks": _stack_blocks(blocks),
    }
    return params, {"pe": pe_stats}


def convert_encoder(sd: dict, prefix: str = "feature_extraction.", depth: int = 12, reg_tokens: int = 4,
                    no_embed_class: bool = True) -> dict:
    """ViTEncoderOneRef (reference oneref_feature_extraction.py:239-298):
    rgb_net.vit.* (timm naming) + rgb_net.output_upscaling (linear up_type)."""
    vit_sd = {k[len(prefix + "rgb_net.vit."):]: v for k, v in sd.items() if k.startswith(prefix + "rgb_net.vit.")}
    rgb_net = {
        "vit": convert_timm_vit_to_flax(vit_sd, depth=depth, reg_tokens=reg_tokens, no_embed_class=no_embed_class)
    }
    up = prefix + "rgb_net.output_upscaling."
    if up + "weight" in sd:
        rgb_net["output_upscaling"] = _linear(sd, up)
    return {"rgb_net": rgb_net}


def convert_unopose_state_dict(
    state_dict: dict,
    nblock_coarse: int = 3,
    nblock_fine: int = 3,
    depth: int = 12,
    reg_tokens: int = 4,
    no_embed_class: bool = True,
) -> Dict[str, dict]:
    """Full-model conversion: reference UNOPose state_dict -> flax
    ``{"params": ..., "batch_stats": ...}`` for models/unopose.py."""
    sd = _np(state_dict)
    fine_params, fine_stats = convert_fine_matching(sd, nblock=nblock_fine)
    variables = {
        "params": {
            "encoder": convert_encoder(sd, depth=depth, reg_tokens=reg_tokens, no_embed_class=no_embed_class),
            "geo_embed": convert_geo_embedding(sd),
            "coarse_matching": convert_coarse_matching(sd, nblock=nblock_coarse),
            "fine_matching": fine_params,
        },
        "batch_stats": {"fine_matching": fine_stats},
    }
    n_in = len([k for k in sd if not k.endswith("div_term") and "dis_proj" not in k])
    n_out = len(jax_leaves(variables))
    logger.info("converted reference checkpoint: %d torch tensors -> %d flax leaves", n_in, n_out)
    return variables


def jax_leaves(tree):
    import jax

    return jax.tree_util.tree_leaves(tree)


def load_reference_checkpoint(path: str) -> dict:
    """Load a torch UNOPose checkpoint (raw state_dict or wrapped in 'model')
    into numpy arrays, stripping DDP 'module.' prefixes."""
    import torch

    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    sd = ckpt.get("model", ckpt.get("state_dict", ckpt))
    sd = {k[len("module."):] if k.startswith("module.") else k: v for k, v in sd.items()}
    return _np(sd)
