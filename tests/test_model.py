"""Model-level tests on a tiny config (CPU): init, train/infer forward,
loss computation, gradient flow, and jit-ability."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from unopose_tpu.configs.main_cfg import get_tiny_cfg
from unopose_tpu.losses import process_loss
from unopose_tpu.models import UNOPose, compute_train_losses
from unopose_tpu.models.vit import make_vit

IMG, NPTS, NCOARSE, NTEM = 28, 64, 16, 96


def tiny_inputs(rng, B=2, train=True):
    d = dict(
        rgb=rng.uniform(-1, 1, size=(B, IMG, IMG, 3)).astype(np.float32),
        rgb_choose=rng.integers(0, IMG * IMG, size=(B, NPTS)).astype(np.int32),
        pts=rng.uniform(-0.1, 0.1, size=(B, NPTS, 3)).astype(np.float32) + np.array([0, 0, 0.5], np.float32),
        tem1_rgb=rng.uniform(-1, 1, size=(B, IMG, IMG, 3)).astype(np.float32),
        tem1_choose=rng.integers(0, IMG * IMG, size=(B, NTEM)).astype(np.int32),
        tem1_pts=rng.uniform(-0.1, 0.1, size=(B, NTEM, 3)).astype(np.float32) + np.array([0, 0, 0.6], np.float32),
    )
    if train:
        d["rotation_label"] = np.stack([np.eye(3, dtype=np.float32)] * B)
        d["translation_label"] = rng.uniform(-0.05, 0.05, size=(B, 3)).astype(np.float32) + np.array(
            [0, 0, 0.1], np.float32
        )
    return {k: jnp.asarray(v) for k, v in d.items()}


@pytest.fixture(scope="module")
def tiny_model():
    cfg = get_tiny_cfg(IMG, NPTS, NCOARSE, NTEM)
    model = UNOPose.from_config(cfg.model, dtype=jnp.float32, backbone_dtype=jnp.float32)
    rng = np.random.default_rng(0)
    inputs = tiny_inputs(rng, B=2, train=True)
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "sample": jax.random.PRNGKey(1)}, inputs, train=True
    )
    return cfg, model, variables, inputs


def test_vit_pyramid_shapes(rng):
    vit = make_vit("vit_tiny_test", img_size=IMG)
    x = jnp.asarray(rng.normal(size=(2, IMG, IMG, 3)).astype(np.float32))
    vars_ = vit.init(jax.random.PRNGKey(0), x)
    outs, cls = vit.apply(vars_, x)
    assert len(outs) == 4
    assert all(o.shape == (2, 5 + 4, 32) for o in outs)  # 4 patches + cls + 4 reg
    assert cls.shape == (2, 32)


def test_train_forward_and_losses(tiny_model):
    cfg, model, variables, inputs = tiny_model
    outputs, mutated = model.apply(
        variables, inputs, train=True, rngs={"sample": jax.random.PRNGKey(2)}, mutable=["batch_stats"]
    )
    assert len(outputs["coarse_attens"]) == 3  # all blocks at train time
    assert outputs["coarse_attens"][0].shape == (2, NCOARSE + 1, NCOARSE + 1)
    assert outputs["fine_attens"][0].shape == (2, NPTS + 1, NPTS + 1)
    terms = compute_train_losses(outputs, inputs, cfg.model)
    summed = process_loss(terms)
    assert np.isfinite(float(summed["loss"]))
    # all expected loss families present
    for fam in ("coarse_hard_score_loss0", "coarse_hard_atten_loss2", "fine_saliency_loss1", "fine_acc"):
        assert fam in terms, sorted(terms)


def test_infer_forward(tiny_model):
    cfg, model, variables, inputs = tiny_model
    out = model.apply(
        variables,
        inputs,
        train=False,
        rngs={"sample": jax.random.PRNGKey(3)},
        mutable=False,
    )
    assert out["pred_R"].shape == (2, 3, 3)
    assert out["pred_t"].shape == (2, 3)
    R = np.asarray(out["pred_R"])
    assert np.allclose(R @ R.transpose(0, 2, 1), np.eye(3), atol=1e-3)  # valid rotations
    assert np.isfinite(np.asarray(out["pred_pose_score"])).all()


def test_gradients_flow(tiny_model):
    cfg, model, variables, inputs = tiny_model
    params = variables["params"]
    others = {k: v for k, v in variables.items() if k != "params"}

    def loss_fn(p):
        outputs, _ = model.apply(
            {"params": p, **others}, inputs, train=True, rngs={"sample": jax.random.PRNGKey(4)}, mutable=["batch_stats"]
        )
        return process_loss(compute_train_losses(outputs, inputs, cfg.model))["loss"]

    val, grads = jax.value_and_grad(loss_fn)(params)
    assert np.isfinite(float(val))
    leaves = jax.tree_util.tree_leaves(grads)
    assert all(np.isfinite(np.asarray(l)).all() for l in leaves)
    # matcher weights must receive nonzero gradient
    gnorm = sum(float(jnp.sum(jnp.abs(l))) for l in jax.tree_util.tree_leaves(grads["coarse_matching"]))
    assert gnorm > 0


def test_infer_jits(tiny_model):
    cfg, model, variables, inputs = tiny_model

    @jax.jit
    def infer(v, x, key):
        return model.apply(v, x, train=False, rngs={"sample": key}, mutable=False)

    out = infer(variables, inputs, jax.random.PRNGKey(5))
    assert out["pred_R"].shape == (2, 3, 3)


def test_fine_only_variant(rng):
    """NetOneRef ablation: no coarse stage, identity init pose."""
    from unopose_tpu.configs.main_cfg import get_tiny_cfg
    from unopose_tpu.losses import process_loss
    from unopose_tpu.models import compute_train_losses

    cfg = get_tiny_cfg(IMG, NPTS, NCOARSE, NTEM)
    cfg.model.fine_only = True
    model = UNOPose.from_config(cfg.model, dtype=jnp.float32, backbone_dtype=jnp.float32)
    inputs = tiny_inputs(np.random.default_rng(3), B=2, train=True)
    variables = model.init({"params": jax.random.PRNGKey(0), "sample": jax.random.PRNGKey(1)}, inputs, train=True)
    assert "coarse_matching" not in variables["params"]
    outputs, _ = model.apply(
        variables, inputs, train=True, rngs={"sample": jax.random.PRNGKey(2)}, mutable=["batch_stats"]
    )
    assert "coarse_attens" not in outputs
    terms = compute_train_losses(outputs, inputs, cfg.model)
    assert all(not k.startswith("coarse") for k in terms)
    assert np.isfinite(float(process_loss(terms)["loss"]))


def test_soft_loss_and_circle_loss(rng):
    from unopose_tpu.losses import compute_soft_loss, node_correspondence_targets, weighted_circle_loss

    B, n1, n2 = 2, 10, 12
    nodes1 = jnp.asarray(rng.normal(size=(B, n1, 3)).astype(np.float32))
    nodes2 = jnp.asarray(rng.normal(size=(B, n2, 3)).astype(np.float32))
    gt_r = jnp.broadcast_to(jnp.eye(3), (B, 3, 3))
    gt_t = jnp.zeros((B, 3))
    row, col = node_correspondence_targets(nodes1, nodes2, gt_r, gt_t)
    assert row.shape == (B, n1, n2 + 1) and col.shape == (B, n2, n1 + 1)
    np.testing.assert_allclose(np.asarray(row).sum(-1), 1.0, atol=1e-5)
    atten = jnp.asarray(rng.normal(size=(B, n1 + 1, n2 + 1)).astype(np.float32))
    out = compute_soft_loss([atten], row, col)
    assert np.isfinite(float(out["coarse_soft_loss0"].sum()))

    d = jnp.asarray(rng.uniform(0, 2, size=(B, n1, n2)).astype(np.float32))
    pos = d < 0.3
    neg = d > 1.5
    loss = weighted_circle_loss(pos, neg, d, jnp.sqrt(jnp.where(pos, 0.5, 0.0)))
    assert loss.shape == (B,) and np.isfinite(np.asarray(loss)).all()
