"""Round-4: train-side stage attribution (VERDICT r3 item 5).

Splits the train step into: full step / loss forward only / forward+backward
(no optimizer) / the 2x frozen-ViT forward alone. Every stage here is
>> the ~4 ms axon dispatch floor, so plain host-chained dispatch timing is
honest to ~2% and compiles each program ONCE (the in-jit fori harness
would compile two multi-minute loop programs per stage over the tunnel).

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


    import time

    def _leaf0(tree):
        leaves = [l for l in jax.tree_util.tree_leaves(tree) if hasattr(l, "dtype")]
        for l in leaves:
            if l.dtype.kind == "f":
                return l.reshape(-1)[0]
        return leaves[0].reshape(-1)[0].astype("float32")

    def timed(name, fn, *args, iters=5, results=None):
        jfn = jax.jit(fn)
        t0 = time.perf_counter()
        out = jfn(np.float32(0.0), *args)
        float(_leaf0(out))
        print(f"[{name}] compile+first: {time.perf_counter() - t0:.1f}s", flush=True)

        def chain(n):
            eps = np.float32(0.0)
            for _ in range(n):
                out = jfn(eps, *args)
                eps = _leaf0(out) * np.float32(0.0)
            return float(_leaf0(out))

        chain(1)
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            chain(iters)
            ts.append((time.perf_counter() - t0) / iters)
        dt = min(ts)
        print(f"{name:36s} {dt * 1e3:9.1f} ms", flush=True)
        if results is not None:
            results[name] = round(dt * 1e3, 2)
        return dt

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

    timed("train_full_step", full_step, state, batch, key, results=results)

    def fwd_loss(eps, params, bs, batch, key):
        b = dict(batch)
        b["pts"] = b["pts"] + eps
        outputs, _ = model.apply(
            {"params": params, "batch_stats": bs}, b, train=True, rngs={"sample": key}, mutable=["batch_stats"]
        )
        return process_loss(compute_train_losses(outputs, b, cfg.model))["loss"]

    timed("train_fwd_loss", fwd_loss, state.params, state.batch_stats, batch, key, results=results)

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

    timed("train_fwd_bwd_frozen_split", fwd_bwd, state.params, state.batch_stats, batch, key, results=results)

    def fwd_bwd_all(eps, params, bs, batch, key):
        def loss_fn(p):
            b = dict(batch)
            b["pts"] = b["pts"] + eps
            outputs, _ = model.apply(
                {"params": p, "batch_stats": bs}, b, train=True, rngs={"sample": key}, mutable=["batch_stats"]
            )
            return process_loss(compute_train_losses(outputs, b, cfg.model))["loss"]

        return jax.value_and_grad(loss_fn)(params)[1]

    try:
        timed("train_fwd_bwd_full_tree", fwd_bwd_all, state.params, state.batch_stats, batch, key, results=results)
    except Exception as e:
        # measured round 4: RESOURCE_EXHAUSTED on the v5e chip — the frozen
        # backbone's saved activations alone overflow HBM at bs=8, which is
        # the memory half of the frozen-split argument (engine/train.py)
        results["train_fwd_bwd_full_tree"] = f"OOM: {type(e).__name__}"
        print(f"train_fwd_bwd_full_tree failed: {type(e).__name__}", flush=True)

    # the 2x backbone forward alone, under train flags
    enc = model.bind({"params": state.params, "batch_stats": state.batch_stats}, rngs={"sample": key})

    def vit_pair(eps, rgb, tem):
        f1, _ = enc.encoder.rgb_net(rgb + eps, train=True)
        f2, _ = enc.encoder.rgb_net(tem + eps, train=True)
        return f1.sum() + f2.sum()

    try:
        timed("train_vit_pair_fwd", vit_pair, batch["rgb"], batch["tem1_rgb"], results=results)
    except Exception as e:  # bound-module introspection is best-effort
        print(f"vit_pair skipped: {e}", flush=True)

    print(json.dumps(results))
    with open(osp.join(osp.dirname(__file__), "profile_train_stages.json"), "w") as f:
        json.dump(results, f, indent=1)


if __name__ == "__main__":
    main()
