"""Worker for the two-process distributed inference integration test.

Launched as a subprocess (one per rank) by tests/test_distributed.py:
initializes jax.distributed over a local coordinator, drives run_inference
end-to-end on the shared FakeDataset (per-rank CSV slices), barriers, and
merges on rank 0 — the TPU counterpart of the reference's
InferenceSampler + comm.synchronize flow (my_distributed_sampler.py:244-277,
engine.py:201).
"""

import argparse
import os.path as osp
import sys

REPO = osp.dirname(osp.dirname(osp.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, osp.join(REPO, "tests"))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--rank", type=int, required=True)
    p.add_argument("--nprocs", type=int, required=True)
    p.add_argument("--coordinator", required=True)
    p.add_argument("--out", required=True)
    args = p.parse_args()

    import jax

    # the axon TPU plugin ignores JAX_PLATFORMS; force CPU via jax.config
    jax.config.update("jax_platforms", "cpu")
    jax.distributed.initialize(
        coordinator_address=args.coordinator, num_processes=args.nprocs, process_id=args.rank
    )
    assert jax.process_count() == args.nprocs

    from test_inference import FakeDataset, _fake_infer_fn

    from unopose_tpu.engine.inference import merge_csv_shards, run_inference
    from unopose_tpu.parallel.mesh import sync_processes

    ds = FakeDataset(n_images=5, seed=7)
    run_inference(_fake_infer_fn, ds, args.out, instance_batch_size=2)
    sync_processes("eval_done")
    if jax.process_index() == 0:
        merge_csv_shards(args.out, args.nprocs)
    sync_processes("merged")


if __name__ == "__main__":
    main()
