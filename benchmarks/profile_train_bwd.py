"""Round-5: per-module BACKWARD attribution of the train step (VERDICT r4
weak #2 / next #2). The 161 ms backward was a black box; this splits it by
differentiating nested param subsets — grads w.r.t. a subset only build the
backward slice reaching those params, so deltas between nested subsets give
per-module backward cost (plus whatever fwd XLA can additionally prune).

Subsets, downstream -> upstream (each includes the previous):
  fwd        : loss forward only
  fine_nope  : fine_matching WITHOUT the PE MLPs      -> matcher-block bwd
  fine       : + PE MLPs (mlp1/mlp2/mlp3)             -> PE train-path bwd
  +coarse    : + coarse_matching                      -> coarse bwd
  +geo       : + geo_embed                            -> geo bwd
  all        : every non-ViT param (production step)  -> encoder-head + rest

cd /root/repo && python benchmarks/profile_train_bwd.py [per_chip_batch]
"""

from __future__ import annotations

import json
import sys
import time
import os.path as osp

sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))

import numpy as np


def _leaf0(tree):
    import jax

    leaves = [l for l in jax.tree_util.tree_leaves(tree) if hasattr(l, "dtype")]
    for l in leaves:
        if l.dtype.kind == "f":
            return l.reshape(-1)[0]
    return leaves[0].reshape(-1)[0].astype("float32")


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/unopose_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp
    from flax import traverse_util

    from unopose_tpu.configs.main_cfg import get_cfg
    from unopose_tpu.data.loader import synthetic_train_iter
    from unopose_tpu.engine.train import create_train_state
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

    flat_params = traverse_util.flatten_dict(state.params)

    def subset(pred):
        train = {k: v for k, v in flat_params.items() if pred(k)}
        frozen = {k: v for k, v in flat_params.items() if not pred(k)}
        return train, frozen

    def is_pe(k):
        return any(p.startswith(("mlp1_", "mlp2_")) or p == "mlp3" for p in k)

    preds = {
        "fwd": lambda k: False,
        "fine_nope": lambda k: "fine_matching" in k and not is_pe(k),
        "fine": lambda k: "fine_matching" in k,
        "fine+coarse": lambda k: ("fine_matching" in k) or ("coarse_matching" in k),
        "fine+coarse+geo": lambda k: ("fine_matching" in k) or ("coarse_matching" in k) or ("geo_embed" in k),
        "all_non_vit": lambda k: not any("vit" in p for p in k),
    }

    def timed(name, jfn, *args, iters=5):
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
        dt = min(ts) * 1e3
        print(f"{name:24s} {dt:9.1f} ms", flush=True)
        return dt

    results = {}
    key = jax.random.PRNGKey(0)
    bstats = state.batch_stats
    for name, pred in preds.items():
        train, frozen = subset(pred)
        n_par = sum(int(np.prod(v.shape)) for v in train.values())

        if name == "fwd":
            # params/stats as ARGS, not closure constants: baked-in constants
            # blow the axon remote-compile payload limit (HTTP 413)
            def fn(eps, batch, train_arg, frozen_arg, bstats_arg):
                params = traverse_util.unflatten_dict({**frozen_arg, **train_arg})
                outputs, _ = model.apply(
                    {"params": params, "batch_stats": bstats_arg},
                    {**batch, "pts": batch["pts"] + eps},
                    train=True, rngs={"sample": key}, mutable=["batch_stats"],
                )
                return process_loss(compute_train_losses(outputs, batch, cfg.model))["loss"]
        else:
            def fn(eps, batch, train_arg, frozen_arg, bstats_arg):
                def loss_fn(train_flat):
                    params = traverse_util.unflatten_dict({**frozen_arg, **train_flat})
                    outputs, _ = model.apply(
                        {"params": params, "batch_stats": bstats_arg},
                        {**batch, "pts": batch["pts"] + eps},
                        train=True, rngs={"sample": key}, mutable=["batch_stats"],
                    )
                    return process_loss(compute_train_losses(outputs, batch, cfg.model))["loss"]

                loss, g = jax.value_and_grad(loss_fn)(train_arg)
                # return the WHOLE grad tree as an output: jit outputs are
                # never DCE'd (consuming only leaves[:1] let XLA prune most
                # of the backward — measured 85 ms for a step that really
                # costs 245); the timing loop only FETCHES the loss leaf,
                # so no device->host grad transfer pollutes the timing
                return loss, g

        results[name] = {
            "ms": round(timed(name, jax.jit(fn), batch, train, frozen, bstats), 1),
            "params": n_par,
        }

    print(json.dumps(results))
    out = {k: v["ms"] for k, v in results.items()}
    fwd = out["fwd"]
    attr = {
        "matcher_blocks_bwd": round(out["fine_nope"] - fwd, 1),
        "pe_bwd": round(out["fine"] - out["fine_nope"], 1),
        "coarse_bwd": round(out["fine+coarse"] - out["fine"], 1),
        "geo_bwd": round(out["fine+coarse+geo"] - out["fine+coarse"], 1),
        "encoder_head_rest_bwd": round(out["all_non_vit"] - out["fine+coarse+geo"], 1),
        "fwd": round(fwd, 1),
        "full_fwd_bwd": round(out["all_non_vit"], 1),
    }
    print(json.dumps(attr))


if __name__ == "__main__":
    main()
