"""Orbax checkpointing + PyTorch->JAX weight conversion.

Counterpart of reference utils/my_checkpoint.py (periodic checkpoints of
model+optimizer+iteration, keep-2, reference configs/main_cfg.py:61-64) and
of load_timm_pretrained (:116-200) — here a torch->flax key mapping for the
timm DINOv2 checkpoint the backbone is initialized from."""

from __future__ import annotations

import logging
import os
import os.path as osp
from typing import Any, Optional

import jax
import numpy as np

logger = logging.getLogger(__name__)


class Checkpointer:
    """Thin orbax wrapper with the reference's keep-N/period semantics."""

    def __init__(self, directory: str, max_to_keep: int = 2, period: int = 5000):
        import orbax.checkpoint as ocp

        self.directory = osp.abspath(directory)
        os.makedirs(self.directory, exist_ok=True)
        self.period = period
        options = ocp.CheckpointManagerOptions(max_to_keep=max_to_keep, create=True)
        self.manager = ocp.CheckpointManager(self.directory, options=options)

    def save(self, step: int, state: Any):
        import orbax.checkpoint as ocp

        self.manager.save(step, args=ocp.args.StandardSave(jax.device_get(state)))
        self.manager.wait_until_finished()
        logger.info("saved checkpoint at step %d -> %s", step, self.directory)

    def latest_step(self) -> Optional[int]:
        return self.manager.latest_step()

    def restore(self, state_template: Any, step: Optional[int] = None) -> Any:
        import orbax.checkpoint as ocp

        step = step if step is not None else self.manager.latest_step()
        if step is None:
            return None
        return self.manager.restore(step, args=ocp.args.StandardRestore(jax.device_get(state_template)))

    def restore_pytree(self, step: Optional[int] = None) -> Optional[dict]:
        """Restore the raw saved pytree (nested dicts of arrays) without a
        template — enough for eval, which only needs ``['params']`` (and
        ``['batch_stats']`` when present) out of the saved train state."""
        import orbax.checkpoint as ocp

        step = step if step is not None else self.manager.latest_step()
        if step is None:
            return None
        return self.manager.restore(step, args=ocp.args.StandardRestore())


# --------------------------------------------------------------------------
# torch (timm DINOv2) -> flax ViTPyramid conversion
# --------------------------------------------------------------------------


def convert_timm_vit_to_flax(state_dict: dict, depth: int = 12, reg_tokens: int = 4, no_embed_class: bool = True) -> dict:
    """Map a timm VisionTransformer state_dict (as numpy arrays) onto the
    ViTPyramid param tree (models/vit.py).

    Key mapping (per-block tensors are STACKED along a leading depth axis —
    ViTPyramid scans its blocks):
        patch_embed.proj.{weight,bias} -> patch_embed (conv -> GEMM reshape)
        cls_token / reg_token / pos_embed -> same names
        blocks.i.norm{1,2}.{weight,bias} -> blocks.norm{1,2}.{scale,bias}[i]
        blocks.i.attn.qkv.{weight,bias} -> blocks.qkv[i]
        blocks.i.attn.proj.* -> blocks.attn_proj[i]
        blocks.i.ls{1,2}.gamma -> blocks.ls{1,2}[i]
        blocks.i.mlp.fc{1,2}.* -> blocks.mlp.fc{1,2}[i]
        norm.{weight,bias} -> norm.{scale,bias}
    """

    def t(x):
        return np.asarray(x)

    sd = {k: t(v) for k, v in state_dict.items()}
    params: dict = {}

    # patch embed conv (D, 3, P, P) -> dense kernel (P*P*3, D), matching the
    # (g, P, g, P, 3) -> (g*g, P*P*3) patchify order in ViTPyramid.__call__
    w = sd["patch_embed.proj.weight"]  # (D, 3, P, P)
    D, C, P, _ = w.shape
    kernel = w.transpose(2, 3, 1, 0).reshape(P * P * C, D)
    params["patch_embed"] = {"kernel": kernel, "bias": sd["patch_embed.proj.bias"]}

    params["cls_token"] = sd["cls_token"]
    if reg_tokens and "reg_token" in sd:
        params["reg_token"] = sd["reg_token"]
    if no_embed_class:
        params["pos_embed"] = sd["pos_embed"]
    else:
        # timm prepends the prefix-token embeddings to pos_embed; ViTPyramid
        # keeps them as a separate "pos_embed_prefix" param
        npfx = 1 + reg_tokens
        params["pos_embed_prefix"] = sd["pos_embed"][:, :npfx]
        params["pos_embed"] = sd["pos_embed"][:, npfx:]

    # ViTPyramid scans 4 tap-aligned segments ("blocks0".."blocks3"); the
    # segment lengths are [depth - 3*(depth//4)] + [depth//4] * 3
    n = depth // 4
    seg_lens = [depth - 3 * n] + [n] * 3
    start = 0
    for si, seg_len in enumerate(seg_lens):
        rng_ids = range(start, start + seg_len)
        start += seg_len

        def stack(fmt, ids=rng_ids):
            return np.stack([sd[fmt.format(i)] for i in ids])

        blocks = {
            "norm1": {"scale": stack("blocks.{}.norm1.weight"), "bias": stack("blocks.{}.norm1.bias")},
            "norm2": {"scale": stack("blocks.{}.norm2.weight"), "bias": stack("blocks.{}.norm2.bias")},
            "qkv": {
                "kernel": stack("blocks.{}.attn.qkv.weight").transpose(0, 2, 1),
                "bias": stack("blocks.{}.attn.qkv.bias"),
            },
            "attn_proj": {
                "kernel": stack("blocks.{}.attn.proj.weight").transpose(0, 2, 1),
                "bias": stack("blocks.{}.attn.proj.bias"),
            },
            "mlp": {
                "fc1": {
                    "kernel": stack("blocks.{}.mlp.fc1.weight").transpose(0, 2, 1),
                    "bias": stack("blocks.{}.mlp.fc1.bias"),
                },
                "fc2": {
                    "kernel": stack("blocks.{}.mlp.fc2.weight").transpose(0, 2, 1),
                    "bias": stack("blocks.{}.mlp.fc2.bias"),
                },
            },
        }
        if "blocks.0.ls1.gamma" in sd:
            blocks["ls1"] = stack("blocks.{}.ls1.gamma")
            blocks["ls2"] = stack("blocks.{}.ls2.gamma")
        params[f"blocks{si}"] = blocks

    params["norm"] = {"scale": sd["norm.weight"], "bias": sd["norm.bias"]}
    return params


def load_timm_checkpoint(path: str) -> dict:
    """Load a .pth timm checkpoint into numpy arrays (torch cpu only)."""
    import torch

    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    model = ckpt.get("model", ckpt)
    return {k: v.numpy() if hasattr(v, "numpy") else np.asarray(v) for k, v in model.items()}


VIT_PARAM_PATH = ("encoder", "rgb_net", "vit")


def graft_vit_params(params: dict, vit_params: dict, path=VIT_PARAM_PATH) -> dict:
    """Replace the ViT subtree of a UNOPose param tree with converted
    pretrained weights, checking structure/shape leaf by leaf."""
    import jax.numpy as jnp

    sub = params
    for k in path:
        if k not in sub:
            raise KeyError(f"param path {'/'.join(path)} not found at {k!r}; have {sorted(sub)}")
        sub = sub[k]

    def cast_like(new, old):
        new = np.asarray(new)
        old_shape = tuple(old.shape)
        if tuple(new.shape) != old_shape:
            raise ValueError(f"pretrained shape {new.shape} != model shape {old_shape}")
        return jnp.asarray(new, dtype=old.dtype)

    grafted = jax.tree_util.tree_map(cast_like, vit_params, sub)
    out = dict(params)
    node = out
    for k in path[:-1]:
        node[k] = dict(node[k])
        node = node[k]
    node[path[-1]] = grafted
    return out


def maybe_load_pretrained_vit(params: dict, fe_cfg) -> tuple:
    """Graft converted timm DINOv2 weights into ``params`` per the
    feature-extraction config. Mirrors the reference's load-then-freeze
    protocol (oneref_feature_extraction.py:173-198), including pos-embed
    interpolation when the checkpoint grid differs from the model grid.

    Returns (params, loaded: bool). Raises if ``pretrained`` is set but the
    checkpoint file is missing (the reference asserts here); warns when a
    frozen ViT is left at random init (test configs only).
    """
    from unopose_tpu.models.vit import VIT_VARIANTS

    pretrained = fe_cfg.get("pretrained", False)
    freeze = fe_cfg.get("freeze_vit", False)
    if not pretrained:
        if freeze:
            logger.warning(
                "freeze_vit without pretrained weights: the frozen backbone stays at "
                "random init (the reference asserts 'freeze must use pretrained' — "
                "only test/debug configs should hit this)"
            )
        return params, False

    ckpt = fe_cfg.get("vit_ckpt", "")
    if not ckpt or not osp.exists(ckpt):
        raise FileNotFoundError(
            f"model.feature_extraction.pretrained=True but vit_ckpt does not exist: {ckpt!r} "
            "(set pretrained=False to train from scratch)"
        )

    vit_type = fe_cfg.get("vit_type", "vit_base_patch14_reg4_dinov2")
    variant = VIT_VARIANTS[vit_type]
    sd = load_timm_checkpoint(ckpt)

    grid = fe_cfg.get("img_size", 224) // variant["patch_size"]
    pe = sd["pos_embed"]
    if variant["no_embed_class"]:
        sd["pos_embed"] = interpolate_pos_embed_np(pe, grid)
    else:
        npfx = 1 + variant["reg_tokens"]
        sd["pos_embed"] = np.concatenate([pe[:, :npfx], interpolate_pos_embed_np(pe[:, npfx:], grid)], axis=1)

    vit_params = convert_timm_vit_to_flax(
        sd,
        depth=variant["depth"],
        reg_tokens=variant["reg_tokens"],
        no_embed_class=variant["no_embed_class"],
    )
    logger.info("loaded pretrained ViT weights from %s (%s, grid %d)", ckpt, vit_type, grid)
    return graft_vit_params(params, vit_params), True


def interpolate_pos_embed_np(pos_embed: np.ndarray, new_grid: int) -> np.ndarray:
    """Bicubic-resample (1, g*g, D) patch position embeddings to a new grid
    size (reference model_utils.py:105-134). Uses scipy zoom (bicubic-like)."""
    from scipy.ndimage import zoom

    _, n, d = pos_embed.shape
    g = int(round(n**0.5))
    if g == new_grid:
        return pos_embed
    grid = pos_embed.reshape(g, g, d)
    scale = new_grid / g
    out = zoom(grid, (scale, scale, 1.0), order=3)
    return out.reshape(1, new_grid * new_grid, d).astype(pos_embed.dtype)
