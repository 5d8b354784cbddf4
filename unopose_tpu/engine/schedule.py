"""Flat-and-anneal LR schedule.

Optax counterpart of the reference scheduler
(lib/torch_utils/solver/lr_scheduler.py:148-268): warmup
(linear/pow/exp/constant) -> flat region -> anneal
(cosine/linear/poly/exp/step) to ``target_lr_factor``. Returns a
multiplicative factor schedule; multiply by the base LR when building the
optimizer."""

from __future__ import annotations

from bisect import bisect_right
from typing import Sequence

import jax.numpy as jnp
import numpy as np


def flat_and_anneal_schedule(
    total_iters: int,
    warmup_iters: int = 0,
    warmup_factor: float = 0.1,
    warmup_method: str = "linear",
    warmup_pow: float = 2.0,
    anneal_point: float = 0.72,
    anneal_method: str = "cosine",
    target_lr_factor: float = 0.0,
    poly_power: float = 1.0,
    step_gamma: float = 0.1,
    steps: Sequence[float] = (2.0 / 3.0, 8.0 / 9.0),
    base_lr: float = 1.0,
):
    if warmup_method not in ("constant", "linear", "pow", "exp"):
        raise ValueError(warmup_method)
    if anneal_method not in ("cosine", "linear", "poly", "exp", "step", "none"):
        raise ValueError(anneal_method)
    if anneal_method == "step":
        anneal_start = steps[0] * total_iters
    else:
        if not 0.0 <= anneal_point <= 1.0:
            raise ValueError(anneal_point)
        anneal_start = anneal_point * total_iters

    def schedule(count):
        x = jnp.asarray(count, jnp.float32)
        alpha = x / max(warmup_iters, 1)
        if warmup_method == "linear":
            wf = (1 - warmup_factor) * alpha + warmup_factor
        elif warmup_method == "pow":
            wf = (1 - warmup_factor) * alpha**warmup_pow + warmup_factor
        elif warmup_method == "exp":
            wf = warmup_factor ** (1 - alpha)
        else:
            wf = jnp.full_like(x, warmup_factor)

        frac = jnp.clip((x - anneal_start) / max(total_iters - anneal_start, 1e-8), 0.0, 1.0)
        if anneal_method == "cosine":
            af = target_lr_factor + 0.5 * (1 - target_lr_factor) * (1 + jnp.cos(jnp.pi * frac))
        elif anneal_method == "linear":
            af = target_lr_factor + (1 - target_lr_factor) * (1 - frac)
        elif anneal_method == "poly":
            af = target_lr_factor + (1 - target_lr_factor) * (1 - frac) ** poly_power
        elif anneal_method == "exp":
            af = jnp.maximum(target_lr_factor, 5e-3) ** frac
        elif anneal_method == "step":
            milestones = np.asarray([s * total_iters for s in steps])
            n_passed = jnp.sum(x[None] >= milestones).astype(jnp.float32)
            af = step_gamma**n_passed
        else:
            af = jnp.ones_like(x)

        flat_or_anneal = jnp.where(x < anneal_start, 1.0, af)
        factor = jnp.where(x < warmup_iters, wf, flat_or_anneal)
        factor = jnp.where(x >= total_iters, target_lr_factor if anneal_method != "step" else af, factor)
        return base_lr * factor

    return schedule


def build_schedule_from_cfg(cfg, base_lr: float):
    """cfg: the ``lr_multiplier`` config node (configs/main_cfg.py)."""
    return flat_and_anneal_schedule(
        total_iters=cfg.total_iters,
        warmup_iters=cfg.get("warmup_iters", 0),
        warmup_factor=cfg.get("warmup_factor", 0.1),
        warmup_method=cfg.get("warmup_method", "linear"),
        anneal_point=cfg.get("anneal_point", 0.72),
        anneal_method=cfg.get("anneal_method", "cosine"),
        target_lr_factor=cfg.get("target_lr_factor", 0.0),
        base_lr=base_lr,
    )
