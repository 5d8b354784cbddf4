"""Checkpointing + torch->flax converter tests."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from unopose_tpu.models.vit import make_vit
from unopose_tpu.utils.checkpoint import Checkpointer, convert_timm_vit_to_flax, interpolate_pos_embed_np


def fake_timm_state_dict(depth=4, dim=32, patch=14, grid=2, reg_tokens=4, rng=None):
    """Random tensors in the timm DINOv2 checkpoint layout."""
    rng = rng or np.random.default_rng(0)
    sd = {
        "patch_embed.proj.weight": rng.normal(size=(dim, 3, patch, patch)).astype(np.float32),
        "patch_embed.proj.bias": rng.normal(size=(dim,)).astype(np.float32),
        "cls_token": rng.normal(size=(1, 1, dim)).astype(np.float32),
        "reg_token": rng.normal(size=(1, reg_tokens, dim)).astype(np.float32),
        "pos_embed": rng.normal(size=(1, grid * grid, dim)).astype(np.float32),
        "norm.weight": np.ones(dim, np.float32),
        "norm.bias": np.zeros(dim, np.float32),
    }
    for i in range(depth):
        p = f"blocks.{i}."
        sd[p + "norm1.weight"] = np.ones(dim, np.float32)
        sd[p + "norm1.bias"] = np.zeros(dim, np.float32)
        sd[p + "norm2.weight"] = np.ones(dim, np.float32)
        sd[p + "norm2.bias"] = np.zeros(dim, np.float32)
        sd[p + "attn.qkv.weight"] = rng.normal(size=(3 * dim, dim)).astype(np.float32) * 0.02
        sd[p + "attn.qkv.bias"] = np.zeros(3 * dim, np.float32)
        sd[p + "attn.proj.weight"] = rng.normal(size=(dim, dim)).astype(np.float32) * 0.02
        sd[p + "attn.proj.bias"] = np.zeros(dim, np.float32)
        sd[p + "mlp.fc1.weight"] = rng.normal(size=(4 * dim, dim)).astype(np.float32) * 0.02
        sd[p + "mlp.fc1.bias"] = np.zeros(4 * dim, np.float32)
        sd[p + "mlp.fc2.weight"] = rng.normal(size=(dim, 4 * dim)).astype(np.float32) * 0.02
        sd[p + "mlp.fc2.bias"] = np.zeros(dim, np.float32)
        sd[p + "ls1.gamma"] = np.full(dim, 1e-5, np.float32)
        sd[p + "ls2.gamma"] = np.full(dim, 1e-5, np.float32)
    return sd


def test_converter_matches_flax_tree(rng):
    """Converted params must drop into the flax ViT param tree (same
    structure, same shapes) and produce finite outputs."""
    vit = make_vit("vit_tiny_test", img_size=28)
    x = jnp.asarray(rng.normal(size=(2, 28, 28, 3)).astype(np.float32))
    ref_params = vit.init(jax.random.PRNGKey(0), x)["params"]
    conv = convert_timm_vit_to_flax(fake_timm_state_dict(), depth=4, reg_tokens=4)

    ref_flat = jax.tree_util.tree_leaves_with_path(ref_params)
    conv_flat = {jax.tree_util.keystr(k): v for k, v in jax.tree_util.tree_leaves_with_path(conv)}
    for k, v in ref_flat:
        ks = jax.tree_util.keystr(k)
        assert ks in conv_flat, f"missing converted param {ks}"
        assert conv_flat[ks].shape == v.shape, f"shape mismatch {ks}: {conv_flat[ks].shape} vs {v.shape}"
    assert len(conv_flat) == len(ref_flat)

    outs, cls = vit.apply({"params": jax.tree_util.tree_map(jnp.asarray, conv)}, x)
    assert np.isfinite(np.asarray(cls)).all()
    assert len(outs) == 4


def test_converter_patch_embed_equivalence(rng):
    """Conv patch embedding == reshaped GEMM: apply both ways to one patch."""
    sd = fake_timm_state_dict()
    conv = convert_timm_vit_to_flax(sd, depth=4, reg_tokens=4)
    patch = rng.normal(size=(14, 14, 3)).astype(np.float32)
    # conv formulation: sum over (c, ph, pw) of w[d, c, ph, pw] * patch[ph, pw, c]
    want = np.einsum("dchw,hwc->d", sd["patch_embed.proj.weight"], patch) + sd["patch_embed.proj.bias"]
    got = patch.reshape(-1) @ conv["patch_embed"]["kernel"] + conv["patch_embed"]["bias"]
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_interpolate_pos_embed():
    pe = np.arange(1 * 16 * 4, dtype=np.float32).reshape(1, 16, 4)  # 4x4 grid
    out = interpolate_pos_embed_np(pe, 8)
    assert out.shape == (1, 64, 4)
    same = interpolate_pos_embed_np(pe, 4)
    np.testing.assert_array_equal(same, pe)


def test_pretrained_graft_into_train_state(tmp_path):
    """create_train_state grafts converted timm weights into the ViT subtree
    (with pos-embed interpolation from the checkpoint grid to the model grid)
    and leaves the matcher params at their initialized values."""
    import torch

    from unopose_tpu.configs.main_cfg import get_tiny_cfg
    from unopose_tpu.engine.train import create_train_state
    from unopose_tpu.models import UNOPose
    from unopose_tpu.utils.checkpoint import maybe_load_pretrained_vit
    from tests.test_model import IMG, NPTS, NCOARSE, NTEM, tiny_inputs

    sd = fake_timm_state_dict(grid=4)  # ckpt grid 4 != model grid 28//14=2
    path = tmp_path / "vit.pth"
    torch.save({"model": {k: torch.from_numpy(v) for k, v in sd.items()}}, path)

    cfg = get_tiny_cfg(IMG, NPTS, NCOARSE, NTEM)
    cfg.model.feature_extraction.merge(dict(pretrained=True, vit_ckpt=str(path), freeze_vit=True))
    model = UNOPose.from_config(cfg.model, dtype=jnp.float32, backbone_dtype=jnp.float32)
    batch = tiny_inputs(np.random.default_rng(0), B=2, train=True)
    state = create_train_state(model, cfg, batch, seed=0)

    expected_sd = dict(sd)
    expected_sd["pos_embed"] = interpolate_pos_embed_np(sd["pos_embed"], 2)
    expected = convert_timm_vit_to_flax(expected_sd, depth=4, reg_tokens=4)

    vit = state.params["encoder"]["rgb_net"]["vit"]
    got = {jax.tree_util.keystr(k): v for k, v in jax.tree_util.tree_leaves_with_path(vit)}
    for k, v in jax.tree_util.tree_leaves_with_path(expected):
        np.testing.assert_allclose(np.asarray(got[jax.tree_util.keystr(k)]), np.asarray(v), rtol=1e-6)

    # non-ViT params must equal the plain init (graft touches only the backbone)
    cfg2 = get_tiny_cfg(IMG, NPTS, NCOARSE, NTEM)
    plain = create_train_state(model, cfg2, batch, seed=0)
    np.testing.assert_array_equal(
        np.asarray(state.params["coarse_matching"]["in_proj"]["kernel"]),
        np.asarray(plain.params["coarse_matching"]["in_proj"]["kernel"]),
    )

    # missing checkpoint file must raise (reference asserts here)
    cfg.model.feature_extraction.vit_ckpt = str(tmp_path / "nope.pth")
    with pytest.raises(FileNotFoundError):
        maybe_load_pretrained_vit(state.params, cfg.model.feature_extraction)


def test_restore_eval_variables(tmp_path):
    """--eval-only restores the latest trained checkpoint from the output dir
    (reference main_unopose.py:116-120 resume_or_load -> do_save_results)."""
    from unopose_tpu.configs.main_cfg import get_tiny_cfg
    from unopose_tpu.engine.train import create_train_state
    from unopose_tpu.main_unopose import restore_eval_variables
    from unopose_tpu.models import UNOPose
    from tests.test_model import IMG, NPTS, NCOARSE, NTEM, tiny_inputs

    cfg = get_tiny_cfg(IMG, NPTS, NCOARSE, NTEM)
    cfg.misc.output_dir = str(tmp_path)
    cfg.test.instance_batch_size = 2
    cfg.dataloader.test.merge(dict(n_sample_observed_point=NPTS, n_sample_template_point=NTEM))
    model = UNOPose.from_config(cfg.model, dtype=jnp.float32, backbone_dtype=jnp.float32)
    batch = tiny_inputs(np.random.default_rng(0), B=2, train=True)
    state = create_train_state(model, cfg, batch, seed=3)
    Checkpointer(str(tmp_path / "ckpt")).save(7, state)

    variables = restore_eval_variables(model, cfg)
    for a, b in zip(
        jax.tree_util.tree_leaves(state.params), jax.tree_util.tree_leaves(variables["params"])
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    # load_from pointing at nothing restorable must raise, not silently eval random weights
    cfg.misc.load_from = str(tmp_path / "absent")
    with pytest.raises(FileNotFoundError):
        restore_eval_variables(model, cfg)


def test_checkpointer_roundtrip(tmp_path, rng):
    from unopose_tpu.configs.main_cfg import get_tiny_cfg
    from unopose_tpu.engine.train import create_train_state
    from unopose_tpu.models import UNOPose
    from tests.test_model import IMG, NPTS, NCOARSE, NTEM, tiny_inputs

    cfg = get_tiny_cfg(IMG, NPTS, NCOARSE, NTEM)
    model = UNOPose.from_config(cfg.model, dtype=jnp.float32, backbone_dtype=jnp.float32)
    batch = tiny_inputs(np.random.default_rng(0), B=2, train=True)
    state = create_train_state(model, cfg, batch, seed=0)

    ckpt = Checkpointer(str(tmp_path / "ckpt"), max_to_keep=2, period=1)
    ckpt.save(5, state)
    assert ckpt.latest_step() == 5
    restored = ckpt.restore(state)
    for a, b in zip(jax.tree_util.tree_leaves(state.params), jax.tree_util.tree_leaves(restored.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    # keep-N: saving two more drops step 5
    ckpt.save(6, state)
    ckpt.save(7, state)
    assert ckpt.latest_step() == 7
