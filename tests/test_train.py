"""Engine tests: schedule shape, sharded train step on the 8-device CPU mesh,
frozen backbone, NaN-grad hygiene."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from unopose_tpu.configs.main_cfg import get_tiny_cfg
from unopose_tpu.engine.schedule import flat_and_anneal_schedule
from unopose_tpu.engine.train import (
    create_train_state,
    make_train_step,
    sanitize_grads,
    shard_train_step,
)
from unopose_tpu.models import UNOPose
from unopose_tpu.parallel.mesh import batch_sharding, make_mesh, replicated

from tests.test_model import IMG, NPTS, NCOARSE, NTEM, tiny_inputs


def test_schedule_matches_reference_formula():
    """Spot-check warmup/flat/anneal values against the reference lambda
    (lr_scheduler.py:207-259) recomputed by hand."""
    s = flat_and_anneal_schedule(
        total_iters=1000, warmup_iters=100, warmup_factor=0.001, anneal_point=0.2, anneal_method="cosine"
    )
    assert float(s(0)) == pytest.approx(0.001)
    assert float(s(50)) == pytest.approx(0.001 + (1 - 0.001) * 0.5, rel=1e-5)
    assert float(s(100)) == pytest.approx(1.0)
    assert float(s(150)) == pytest.approx(1.0)  # flat region
    assert float(s(200)) == pytest.approx(1.0)  # anneal start
    assert float(s(600)) == pytest.approx(0.5, rel=1e-5)  # cosine midpoint
    assert float(s(1000)) == pytest.approx(0.0, abs=1e-6)
    assert float(s(1500)) == pytest.approx(0.0, abs=1e-6)


def test_sanitize_grads():
    g = {"a": jnp.asarray([1.0, jnp.nan, jnp.inf, -jnp.inf])}
    out = sanitize_grads(g)
    np.testing.assert_array_equal(np.asarray(out["a"]), [1.0, 0.0, 0.0, 0.0])


@pytest.fixture(scope="module")
def train_setup():
    cfg = get_tiny_cfg(IMG, NPTS, NCOARSE, NTEM)
    cfg.train.max_iter = 4
    model = UNOPose.from_config(cfg.model, dtype=jnp.float32, backbone_dtype=jnp.float32)
    rng = np.random.default_rng(1)
    batch = tiny_inputs(rng, B=8, train=True)
    state = create_train_state(model, cfg, batch, seed=0)
    return cfg, model, batch, state


def test_sharded_train_step(train_setup):
    cfg, model, batch, state = train_setup
    mesh = make_mesh(8)
    assert mesh.devices.size == 8
    step = shard_train_step(make_train_step(model, cfg), mesh)
    state_in = jax.device_put(state, replicated(mesh))
    batch_in = jax.tree_util.tree_map(lambda x: jax.device_put(x, batch_sharding(mesh)), batch)
    vit_before = jax.tree_util.tree_map(np.asarray, jax.device_get(state_in.params["encoder"]["rgb_net"]["vit"]))
    # materialize before the step: donation invalidates the input buffers
    before = jax.tree_util.tree_map(np.asarray, jax.device_get(state_in.params["coarse_matching"]))

    new_state, metrics = step(state_in, batch_in, jax.random.PRNGKey(0))
    assert int(new_state.step) == 1
    assert np.isfinite(float(metrics["loss"]))
    assert float(metrics["grad_norm"]) > 0

    # frozen ViT params unchanged
    vit_after = jax.device_get(new_state.params["encoder"]["rgb_net"]["vit"])
    for a, b in zip(jax.tree_util.tree_leaves(vit_before), jax.tree_util.tree_leaves(vit_after)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    # trainable matcher params changed
    after = jax.tree_util.tree_leaves(jax.device_get(new_state.params["coarse_matching"]))
    assert any(
        np.abs(np.asarray(a) - np.asarray(b)).max() > 0
        for a, b in zip(jax.tree_util.tree_leaves(before), after)
    )

    # a second step also runs (donated buffers, new batch stats)
    new_state2, metrics2 = step(new_state, batch_in, jax.random.PRNGKey(1))
    assert int(new_state2.step) == 2
    assert np.isfinite(float(metrics2["loss"]))


def test_model_ema_updates(train_setup):
    cfg, model, batch, _ = train_setup
    cfg2 = cfg.clone()
    cfg2.train.model_ema = dict(enabled=True, decay=0.5)
    state = create_train_state(model, cfg2, batch, seed=0)
    assert state.ema_params is not None
    from unopose_tpu.engine.train import make_train_step

    step = jax.jit(make_train_step(model, cfg2))
    new_state, _ = step(state, batch, jax.random.PRNGKey(0))
    # ema moved halfway toward the new params for a trainable leaf
    p0 = np.asarray(jax.tree_util.tree_leaves(state.params["coarse_matching"])[0])
    p1 = np.asarray(jax.tree_util.tree_leaves(new_state.params["coarse_matching"])[0])
    e1 = np.asarray(jax.tree_util.tree_leaves(new_state.ema_params["coarse_matching"])[0])
    np.testing.assert_allclose(e1, 0.5 * p0 + 0.5 * p1, atol=1e-6)
