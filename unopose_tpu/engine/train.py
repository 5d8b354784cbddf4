"""Training engine: optimizer, sharded train step, and the iteration loop.

TPU-native counterpart of reference core/unopose/engine/engine.py:87-220 +
engine_utils.py:53-83:
  * Adam (betas 0.5/0.999, eps 1e-6) with the flat-and-anneal schedule,
  * frozen-backbone masking (freeze_vit) instead of requires_grad=False,
  * NaN-gradient zeroing (engine_utils.py:14-18) and optional global-norm
    clipping inside the jitted step,
  * loss clamping + metric emission (losses.process_loss),
  * one pjit'd step over a 1-D data mesh: params replicated, batch sharded;
    the gradient all-reduce the reference gets from DDP is inserted by GSPMD.
"""

from __future__ import annotations

import time
from typing import Any, Callable, Dict, Iterator, Optional, Tuple

import flax
import jax
import jax.numpy as jnp
import optax
from flax import traverse_util
from flax.training import train_state
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from unopose_tpu.engine.schedule import build_schedule_from_cfg
from unopose_tpu.losses import process_loss
from unopose_tpu.models.unopose import UNOPose, compute_train_losses
from unopose_tpu.parallel.mesh import batch_sharding, make_mesh, replicated
from unopose_tpu.utils.config import CN


class TrainState(train_state.TrainState):
    batch_stats: Any = None
    ema_params: Any = None  # optional model EMA (reference cfg train.model_ema)


def _freeze_labels(params, frozen_substr: str = "vit") -> Any:
    """Label tree: 'frozen' for any param path containing ``frozen_substr``
    (the pretrained backbone), else 'train'. Mirrors freeze_vit
    (reference oneref_feature_extraction.py:194-198)."""
    flat = traverse_util.flatten_dict(params)
    labels = {k: ("frozen" if any(frozen_substr in p for p in k) else "train") for k in flat}
    return traverse_util.unflatten_dict(labels)


def build_optimizer(cfg: CN, params) -> optax.GradientTransformation:
    """cfg: full config (optimizer + lr_multiplier + train nodes)."""
    sched = build_schedule_from_cfg(cfg.lr_multiplier, base_lr=cfg.optimizer.lr)
    chain = []
    clip = cfg.train.get("clip_grad", CN())
    if clip.get("enabled", False):
        chain.append(optax.clip_by_global_norm(clip.params.max_norm))
    chain.append(
        optax.adam(
            learning_rate=sched,
            b1=cfg.optimizer.betas[0],
            b2=cfg.optimizer.betas[1],
            eps=cfg.optimizer.eps,
        )
    )
    if cfg.optimizer.get("weight_decay", 0.0):
        chain.insert(-1, optax.add_decayed_weights(cfg.optimizer.weight_decay))
    tx = optax.chain(*chain)
    if cfg.model.feature_extraction.get("freeze_vit", False):
        tx = optax.multi_transform(
            {"train": tx, "frozen": optax.set_to_zero()}, param_labels=_freeze_labels(params)
        )
    return tx


def create_train_state(model: UNOPose, cfg: CN, sample_inputs: Dict[str, jnp.ndarray], seed: int = 0) -> TrainState:
    variables = model.init(
        {"params": jax.random.PRNGKey(seed), "sample": jax.random.PRNGKey(seed + 1)}, sample_inputs, train=True
    )
    params = variables["params"]
    # graft pretrained DINOv2 weights before freezing (the reference loads the
    # timm checkpoint at model construction, oneref_feature_extraction.py:173-198)
    from unopose_tpu.utils.checkpoint import maybe_load_pretrained_vit

    params, _ = maybe_load_pretrained_vit(params, cfg.model.feature_extraction)
    tx = build_optimizer(cfg, params)
    ema = params if cfg.train.get("model_ema", CN()).get("enabled", False) else None
    return TrainState.create(
        apply_fn=model.apply, params=params, tx=tx, batch_stats=variables.get("batch_stats", {}), ema_params=ema
    )


def sanitize_grads(grads):
    """Zero non-finite gradients (reference engine_utils.py:14-18)."""
    return jax.tree_util.tree_map(lambda g: jnp.nan_to_num(g, nan=0.0, posinf=0.0, neginf=0.0), grads)


def make_train_step(model: UNOPose, cfg: CN) -> Callable:
    """Build the (un-jitted) train step; jit/shard with ``shard_train_step``.

    With ``freeze_vit`` the frozen backbone params are SPLIT OUT of the
    differentiated tree: autodiff then stops at the ViT-output boundary, so
    the 2x ViT backward (the single largest FLOP block of the step — the
    backbone dominates the forward) and its saved activations disappear
    entirely. The previous formulation differentiated the full tree and let
    ``optax.set_to_zero`` discard the backbone grads AFTER computing them —
    ``grad_norm``/sanitize kept the whole dead backward alive. Reference
    parity: ``requires_grad=False`` in torch prunes the same subgraph
    (oneref_feature_extraction.py:194-198), and torch's grad norm likewise
    covers only trainable params.
    """
    freeze = cfg.model.feature_extraction.get("freeze_vit", False)

    def train_step(state: TrainState, batch: Dict[str, jnp.ndarray], key: jax.Array):
        flat_params = traverse_util.flatten_dict(state.params)
        if freeze:
            flat_labels = traverse_util.flatten_dict(_freeze_labels(state.params))
            frozen = {k: v for k, v in flat_params.items() if flat_labels[k] == "frozen"}
            trainable = {k: v for k, v in flat_params.items() if flat_labels[k] == "train"}
        else:
            frozen, trainable = {}, dict(flat_params)

        def loss_fn(train_flat):
            params = traverse_util.unflatten_dict({**frozen, **train_flat})
            outputs, mutated = model.apply(
                {"params": params, "batch_stats": state.batch_stats},
                batch,
                train=True,
                rngs={"sample": key},
                mutable=["batch_stats"],
            )
            terms = compute_train_losses(outputs, batch, cfg.model)
            loss_dict = process_loss(terms)
            return loss_dict["loss"], (loss_dict, mutated)

        (loss, (loss_dict, mutated)), g_train = jax.value_and_grad(loss_fn, has_aux=True)(trainable)
        g_train = sanitize_grads(g_train)
        metrics = dict(loss_dict)
        # trainable-only by construction (frozen grads are never computed),
        # matching torch's grad-norm over params with grads
        metrics["grad_norm"] = optax.global_norm(g_train)
        grads = traverse_util.unflatten_dict(
            {**{k: jnp.zeros_like(v) for k, v in frozen.items()}, **g_train}
        )
        new_state = state.apply_gradients(grads=grads, batch_stats=mutated.get("batch_stats", state.batch_stats))
        if state.ema_params is not None:
            decay = cfg.train.get("model_ema", CN()).get("decay", 0.999)
            # EMA only the trainable subtree: frozen params never move, so
            # their EMA is the identity — skipping them saves the ~86M-param
            # backbone's read-modify-write every step
            new_flat = traverse_util.flatten_dict(new_state.params)
            ema_flat = traverse_util.flatten_dict(state.ema_params)
            upd = {
                k: (decay * ema_flat[k] + (1.0 - decay) * new_flat[k]) if k in trainable else ema_flat[k]
                for k in ema_flat
            }
            new_state = new_state.replace(ema_params=traverse_util.unflatten_dict(upd))
        return new_state, metrics

    return train_step


def shard_train_step(train_step: Callable, mesh: Mesh) -> Callable:
    """jit the step with replicated state and dim-0-sharded batch."""
    rep = replicated(mesh)
    bsh = batch_sharding(mesh)
    return jax.jit(
        train_step,
        in_shardings=(rep, bsh, rep),
        out_shardings=(rep, rep),
        donate_argnums=(0,),
    )


def train_loop(
    model: UNOPose,
    cfg: CN,
    data_iter: Iterator[Dict[str, jnp.ndarray]],
    mesh: Optional[Mesh] = None,
    state: Optional[TrainState] = None,
    start_iter: int = 0,
    max_iter: Optional[int] = None,
    writer=None,
    checkpointer=None,
    seed: int = 1,
    eval_fn: Optional[Callable] = None,
) -> TrainState:
    """Iteration-based loop (reference engine.py:140-220).

    data_iter yields global batches (already numpy/jnp, channel-last).
    ``writer``: object with .write(step, metrics_dict); ``checkpointer``:
    object with .save(step, state) / .period.
    """
    mesh = mesh or make_mesh()
    max_iter = max_iter or cfg.train.max_iter
    if state is None:
        first = next(data_iter)
        state = create_train_state(model, cfg, first, seed=cfg.train.get("seed", seed))
        data_iter = _chain_first(first, data_iter)
    # resume (reference engine.py:102-111: checkpointer.resume_or_load)
    if checkpointer is not None and hasattr(checkpointer, "latest_step"):
        latest = checkpointer.latest_step()
        if latest is not None and latest > start_iter:
            state = checkpointer.restore(state)
            start_iter = latest
    state = jax.device_put(state, replicated(mesh))

    step_fn = shard_train_step(make_train_step(model, cfg), mesh)
    key = jax.random.PRNGKey(cfg.train.get("seed", seed))
    log_period = cfg.train.get("log_period", 50)
    ckpt_period = cfg.train.get("checkpointer", CN()).get("period", 5000)

    t_last = time.perf_counter()
    last_logged = start_iter - 1
    for it in range(start_iter, max_iter):
        batch = next(data_iter)
        batch = jax.tree_util.tree_map(lambda x: jax.device_put(x, batch_sharding(mesh)), batch)
        key, sub = jax.random.split(key)
        state, metrics = step_fn(state, batch, sub)

        if writer is not None and (it % log_period == 0 or it == max_iter - 1):
            m = {k: float(v) for k, v in jax.device_get(metrics).items()}
            # halt on a non-finite total loss (reference engine.py:169:
            # ``assert torch.isfinite(losses).all()``) — gradients are
            # sanitized every step, but a NaN loss means the model state is
            # already broken and further steps would silently train on garbage
            if not _np_isfinite(m.get("loss", 0.0)):
                raise FloatingPointError(f"non-finite loss at iteration {it}: {m}")
            m["iter_time"] = (time.perf_counter() - t_last) / (it - last_logged)
            writer.write(it, m)
            # periodic input-crop visualization (reference engine.py:211-219;
            # our batches carry no roi_mask — the model consumes masked crops)
            if cfg.train.get("vis_img_tbx", False) and hasattr(writer, "write_image"):
                import numpy as np

                from unopose_tpu.data.preprocess import IMAGENET_MEAN, IMAGENET_STD

                img = np.asarray(jax.device_get(batch["rgb"][0]), np.float32)
                img = np.clip((img * IMAGENET_STD + IMAGENET_MEAN) * 255.0, 0, 255).astype(np.uint8)
                writer.write_image(it, "input_image", img)
            t_last = time.perf_counter()
            last_logged = it
        if checkpointer is not None and ((it + 1) % ckpt_period == 0 or it == max_iter - 1):
            checkpointer.save(it + 1, state)
        if eval_fn is not None and cfg.train.get("eval_period", 0) and (it + 1) % cfg.train.eval_period == 0:
            eval_fn(state, it + 1)
    return state


def _np_isfinite(x: float) -> bool:
    import math

    return math.isfinite(x)


def _chain_first(first, rest):
    yield first
    yield from rest
