"""Worker for the two-process distributed TRAINING integration test.

Launched one-per-rank by tests/test_distributed.py: initializes
jax.distributed over a local coordinator, builds the real sharded train
step (replicated state, dim-0-sharded batch over a mesh spanning BOTH
processes' devices) and runs a few steps — the TPU counterpart of the
reference's DDP gradient all-reduce
(core/unopose/main_unopose.py:175-182, detectron2 launch + DDP;
engine_utils.py:53-83 optim_step). Rank 0 dumps the final params +
per-step losses for the test to compare against a single-process run.
"""

import argparse
import os.path as osp
import sys

REPO = osp.dirname(osp.dirname(osp.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, osp.join(REPO, "tests"))


def run_training(nsteps: int = 3, global_batch: int = 4, n_devices=None):
    """Build tiny model + deterministic global batch, run the real sharded
    train step over the first ``n_devices`` global devices (default: all),
    return (param_leaves, losses)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from __graft_entry__ import _full_inputs
    from unopose_tpu.configs.main_cfg import get_tiny_cfg
    from unopose_tpu.engine.train import create_train_state, make_train_step, shard_train_step
    from unopose_tpu.models import UNOPose
    from unopose_tpu.parallel.mesh import make_mesh, replicate_state, shard_batch

    cfg = get_tiny_cfg()
    model = UNOPose.from_config(cfg.model, dtype=jnp.float32, backbone_dtype=jnp.float32)
    rng = np.random.default_rng(0)
    batch = _full_inputs(rng, B=global_batch, img=28, npts=64, ntem=96, train=True)

    mesh = make_mesh(n_devices)  # every global device (2 procs x 1 cpu device each)
    state = create_train_state(model, cfg, batch, seed=0)
    state = replicate_state(state, mesh)
    step = shard_train_step(make_train_step(model, cfg), mesh)

    losses = []
    with mesh:
        sharded = shard_batch(batch, mesh)
        for i in range(nsteps):
            state, metrics = step(state, sharded, jax.random.PRNGKey(100 + i))
            losses.append(float(metrics["loss"]))
    leaves = [np.asarray(l) for l in jax.tree_util.tree_leaves(state.params)]
    return leaves, losses


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--rank", type=int, required=True)
    p.add_argument("--nprocs", type=int, required=True)
    p.add_argument("--coordinator", required=True)
    p.add_argument("--out", required=True)
    p.add_argument("--local-devices", type=int, default=1,
                   help="virtual CPU devices per process (combined multi-host x multi-device topology)")
    p.add_argument("--global-batch", type=int, default=4)
    args = p.parse_args()

    import jax

    # the axon TPU plugin ignores JAX_PLATFORMS; force CPU via jax.config
    jax.config.update("jax_platforms", "cpu")
    if args.local_devices > 1:
        # N virtual devices per process: the combined topology where
        # per-process batch slicing and GSPMD cross-host collectives compose
        # (reference multi-node multi-GPU, main_unopose.py:175-182)
        jax.config.update("jax_num_cpu_devices", args.local_devices)
    jax.distributed.initialize(
        coordinator_address=args.coordinator, num_processes=args.nprocs, process_id=args.rank
    )
    assert jax.process_count() == args.nprocs
    assert len(jax.local_devices()) == args.local_devices
    assert len(jax.devices()) == args.nprocs * args.local_devices

    import numpy as np

    leaves, losses = run_training(global_batch=args.global_batch)
    if jax.process_index() == 0:
        np.savez(args.out, losses=np.asarray(losses), *leaves)

    from unopose_tpu.parallel.mesh import sync_processes

    sync_processes("train_done")


if __name__ == "__main__":
    main()
