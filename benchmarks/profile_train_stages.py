"""Round-4: train-side stage attribution (VERDICT r3 item 5).

Splits the train step into: full step / loss forward only / forward+backward
(no optimizer) / the 2x frozen-ViT forward alone / optimizer+EMA tail.
Uses the in-jit fori harness (benchmarks/_timing.py) so sub-5 ms stages
resolve despite the axon dispatch floor.

cd /root/repo && python benchmarks/profile_train_stages.py [per_chip_batch]
"""

from __future__ import annotations

import json
import sys
import os.path as osp

sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))

import numpy as np


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/unopose_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

    from benchmarks._timing import timed_loop
    from unopose_tpu.configs.main_cfg import get_cfg
    from unopose_tpu.data.loader import synthetic_train_iter
    from unopose_tpu.engine.train import create_train_state, make_train_step
    from unopose_tpu.losses import process_loss
    from unopose_tpu.models import UNOPose
    from unopose_tpu.models.unopose import compute_train_losses

    per_chip = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    cfg = get_cfg()
    cfg.model.feature_extraction.pretrained = False
    model = UNOPose.from_config(cfg.model, dtype=jnp.bfloat16, backbone_dtype=jnp.bfloat16)

    B = per_chip * len(jax.devices())
    batch = {k: jnp.asarray(v) for k, v in next(synthetic_train_iter(B)).items()}
    state = create_train_state(model, cfg, batch, seed=0)
    state = jax.device_put(state)
    print(f"backend: {jax.default_backend()}, batch {B}", flush=True)

    results = {}
    key = jax.random.PRNGKey(0)

    # full step (state chained through the carry via the eps trick is not
    # possible — time it as new_state per iter by re-feeding the SAME state;
    # eps perturbs the batch so the body cannot hoist)
    step = make_train_step(model, cfg)

    def full_step(eps, state, batch, key):
        b = dict(batch)
        b["pts"] = b["pts"] + eps
        _, metrics = step(state, b, key)
        return metrics

    timed_loop("train_full_step", full_step, state, batch, key, k=8, results=results)

    def fwd_loss(eps, params, bs, batch, key):
        b = dict(batch)
        b["pts"] = b["pts"] + eps
        outputs, _ = model.apply(
            {"params": params, "batch_stats": bs}, b, train=True, rngs={"sample": key}, mutable=["batch_stats"]
        )
        return process_loss(compute_train_losses(outputs, b, cfg.model))["loss"]

    timed_loop("train_fwd_loss", fwd_loss, state.params, state.batch_stats, batch, key, k=8, results=results)

    def fwd_bwd(eps, params, bs, batch, key):
        from flax import traverse_util

        from unopose_tpu.engine.train import _freeze_labels

        flat = traverse_util.flatten_dict(params)
        labels = traverse_util.flatten_dict(_freeze_labels(params))
        frozen = {k: v for k, v in flat.items() if labels[k] == "frozen"}
        trainable = {k: v for k, v in flat.items() if labels[k] == "train"}

        def loss_fn(tr):
            p = traverse_util.unflatten_dict({**frozen, **tr})
            b = dict(batch)
            b["pts"] = b["pts"] + eps
            outputs, _ = model.apply(
                {"params": p, "batch_stats": bs}, b, train=True, rngs={"sample": key}, mutable=["batch_stats"]
            )
            return process_loss(compute_train_losses(outputs, b, cfg.model))["loss"]

        return jax.value_and_grad(loss_fn)(trainable)[1]

    timed_loop("train_fwd_bwd_frozen_split", fwd_bwd, state.params, state.batch_stats, batch, key, k=8, results=results)

    def fwd_bwd_all(eps, params, bs, batch, key):
        def loss_fn(p):
            b = dict(batch)
            b["pts"] = b["pts"] + eps
            outputs, _ = model.apply(
                {"params": p, "batch_stats": bs}, b, train=True, rngs={"sample": key}, mutable=["batch_stats"]
            )
            return process_loss(compute_train_losses(outputs, b, cfg.model))["loss"]

        return jax.value_and_grad(loss_fn)(params)[1]

    timed_loop("train_fwd_bwd_full_tree", fwd_bwd_all, state.params, state.batch_stats, batch, key, k=6, results=results)

    # the 2x backbone forward alone, under train flags
    enc = model.bind({"params": state.params, "batch_stats": state.batch_stats}, rngs={"sample": key})

    def vit_pair(eps, rgb, tem):
        f1, _ = enc.encoder.rgb_net(rgb + eps, train=True)
        f2, _ = enc.encoder.rgb_net(tem + eps, train=True)
        return f1.sum() + f2.sum()

    try:
        timed_loop("train_vit_pair_fwd", vit_pair, batch["rgb"], batch["tem1_rgb"], k=8, results=results)
    except Exception as e:  # bound-module introspection is best-effort
        print(f"vit_pair skipped: {e}", flush=True)

    print(json.dumps(results))
    with open(osp.join(osp.dirname(__file__), "profile_train_stages.json"), "w") as f:
        json.dump(results, f, indent=1)


if __name__ == "__main__":
    main()
