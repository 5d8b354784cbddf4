"""Training-step benchmark: samples/sec for the full UNOPose train step
(forward + losses + grads + Adam, frozen ViT) on the available chips.

Run: cd /root/repo && python benchmarks/train_bench.py [per_chip_batch]
Prints one JSON line {"metric": "train_samples_per_sec", ...}.
"""

from __future__ import annotations

import json
import sys
import time
import os.path as osp

sys.path.insert(0, osp.join(osp.dirname(osp.abspath(__file__)), ".."))

import numpy as np

ITERS = 6


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/unopose_jax_cache")
    import jax.numpy as jnp

    from unopose_tpu.configs.main_cfg import get_cfg
    from unopose_tpu.data.loader import synthetic_train_iter
    from unopose_tpu.engine.train import create_train_state, make_train_step, shard_train_step
    from unopose_tpu.models import UNOPose
    from unopose_tpu.parallel.mesh import batch_sharding, make_mesh, replicated

    per_chip = int(sys.argv[1]) if len(sys.argv) > 1 else 8  # reference per-rank bs
    n_dev = len(jax.devices())
    B = per_chip * n_dev
    import os

    cfg = get_cfg()
    # synthetic benchmark: random-init backbone (the pretrained DINOv2
    # checkpoint is not present on bench hosts; weights don't change timing)
    cfg.model.feature_extraction.pretrained = False
    if os.environ.get("UNOPOSE_TRAIN_PE_DTYPE"):
        cfg.model.fine_point_matching.pe_dtype = os.environ["UNOPOSE_TRAIN_PE_DTYPE"]
    model = UNOPose.from_config(cfg.model, dtype=jnp.bfloat16, backbone_dtype=jnp.bfloat16)

    it = synthetic_train_iter(B)
    batch = {k: jnp.asarray(v) for k, v in next(it).items()}
    print(f"devices: {n_dev}, global batch {B}", file=sys.stderr)

    t0 = time.perf_counter()
    state = create_train_state(model, cfg, batch, seed=0)
    print(f"init: {time.perf_counter() - t0:.0f}s", file=sys.stderr)

    mesh = make_mesh()
    state = jax.device_put(state, replicated(mesh))
    batch = jax.tree_util.tree_map(lambda x: jax.device_put(x, batch_sharding(mesh)), batch)
    step = shard_train_step(make_train_step(model, cfg), mesh)

    key = jax.random.PRNGKey(0)
    t0 = time.perf_counter()
    state, metrics = step(state, batch, key)
    loss0 = float(metrics["loss"])
    print(f"compile+first step: {time.perf_counter() - t0:.0f}s loss {loss0:.3f}", file=sys.stderr)

    t0 = time.perf_counter()
    for i in range(ITERS):
        key = jax.random.fold_in(key, i)
        state, metrics = step(state, batch, key)
    lossN = float(metrics["loss"])  # forces the chain
    dt = (time.perf_counter() - t0) / ITERS
    print(f"steady: {dt * 1e3:.0f} ms/step, loss {lossN:.3f}", file=sys.stderr)
    print(
        json.dumps(
            {
                "metric": "train_samples_per_sec",
                "value": round(B / dt, 2),
                "unit": "samples/s",
                "per_chip_batch": per_chip,
                "n_devices": n_dev,
            }
        )
    )


if __name__ == "__main__":
    main()
