"""CLI launcher — counterpart of reference core/unopose/main_unopose.py.

    python -m unopose_tpu.main_unopose --config <module:fn> [--eval-only]
        [--synthetic-data] [key=value ...]

Loads the config (default unopose_tpu.configs.main_cfg:get_cfg), applies
dotted CLI overrides, builds the model, and runs training (engine/train.py)
or evaluation-and-save (engine/inference.py). Multi-host: call
``jax.distributed.initialize()`` automatically when JAX_COORDINATOR_ADDRESS
is set; each process loads its slice of the global batch."""

from __future__ import annotations

import argparse
import importlib
import os
import os.path as osp
import sys


def parse_args(argv=None):
    p = argparse.ArgumentParser(description="unopose_tpu launcher")
    p.add_argument("--config", default="unopose_tpu.configs.main_cfg:get_cfg")
    p.add_argument("--eval-only", action="store_true", help="run inference + save BOP CSV only")
    p.add_argument("--synthetic-data", action="store_true", help="train on the synthetic in-memory pipeline")
    p.add_argument("--resume", action="store_true")
    p.add_argument("--num-devices", type=int, default=None)
    p.add_argument("opts", nargs="*", help="dotted config overrides key=value")
    return p.parse_args(argv)


def load_cfg(spec: str):
    mod_name, _, fn_name = spec.partition(":")
    mod = importlib.import_module(mod_name)
    return getattr(mod, fn_name or "get_cfg")()


def main(argv=None):
    args = parse_args(argv)
    cfg = load_cfg(args.config).apply_overrides(args.opts)

    if os.environ.get("JAX_COORDINATOR_ADDRESS"):
        import jax

        jax.distributed.initialize()

    import jax
    import jax.numpy as jnp

    from unopose_tpu.models import UNOPose
    from unopose_tpu.parallel.mesh import is_main_process, make_mesh
    from unopose_tpu.utils.writer import ConsolePrinter, JSONWriter, MultiWriter, setup_logger

    out_dir = cfg.misc.output_dir
    logger = setup_logger(out_dir if is_main_process() else None, rank=jax.process_index())
    logger.info("config: %s", cfg.flatten())

    dtype = jnp.float32 if cfg.train.get("matcher_dtype", "float32") == "float32" else jnp.bfloat16
    bdtype = jnp.bfloat16 if cfg.train.get("backbone_dtype", "bfloat16") == "bfloat16" else jnp.float32
    model = UNOPose.from_config(cfg.model, dtype=dtype, backbone_dtype=bdtype)

    if args.eval_only:
        run_eval(model, cfg, out_dir)
        return

    from unopose_tpu.data.loader import synthetic_train_iter, train_loader
    from unopose_tpu.engine.train import train_loop
    from unopose_tpu.utils.checkpoint import Checkpointer

    mesh = make_mesh(args.num_devices)
    if args.synthetic_data:
        data_iter = synthetic_train_iter(
            cfg.misc.train_batch_size,
            img_size=cfg.dataloader.train.img_size,
            n_pts=cfg.dataloader.train.n_sample_observed_point,
            n_tem=cfg.dataloader.train.n_sample_template_point,
        )
    else:
        from unopose_tpu.data.dataset_train import DatasetPoseFreeOneRef

        dataset = DatasetPoseFreeOneRef(
            cfg.dataloader.train,
            num_img_per_epoch=cfg.dataloader.train.get("num_img_per_epoch", -1),
            seed=cfg.train.seed + jax.process_index(),
        )
        data_iter = train_loader(
            dataset,
            cfg.misc.train_batch_size // jax.process_count(),
            num_workers=cfg.dataloader.train.get("num_workers", 8),
            seed=cfg.train.seed,
        )

    ckpt = Checkpointer(
        osp.join(out_dir, "ckpt"),
        max_to_keep=cfg.train.checkpointer.max_to_keep,
        period=cfg.train.checkpointer.period,
    )
    from unopose_tpu.utils.writer import TensorboardWriter

    writer = MultiWriter(
        ConsolePrinter(cfg.train.max_iter),
        JSONWriter(osp.join(out_dir, "metrics.json")),
        TensorboardWriter(osp.join(out_dir, "tb")) if is_main_process() else None,
    )

    # periodic in-training eval (reference engine.py:191-201 do_save_results)
    eval_fn = None
    test_dir = osp.join(cfg.dataloader.test.data_dir, cfg.dataloader.test.eval_dataset_name)
    if cfg.train.get("eval_period", 0) and osp.isdir(test_dir) and osp.exists(cfg.dataloader.test.detection_path):

        def eval_fn(state, step):
            variables = {"params": state.params}
            if state.batch_stats:
                variables["batch_stats"] = state.batch_stats
            run_eval(model, cfg, out_dir, variables=variables, tag=f"_iter{step:07d}")

    train_loop(model, cfg, data_iter, mesh=mesh, writer=writer, checkpointer=ckpt, eval_fn=eval_fn)
    writer.close()


def restore_eval_variables(model, cfg):
    """Build eval variables: restore the trained checkpoint named by
    ``cfg.misc.load_from`` (an orbax checkpoint directory, or a run output
    dir containing ``ckpt/``) or fall back to the latest checkpoint under
    the output dir — the counterpart of the reference's
    ``resume_or_load(load_from) -> do_save_results`` (main_unopose.py:116-120).
    Without any checkpoint, graft the pretrained backbone and warn (random
    matcher weights are only useful as a pipeline test)."""
    import logging

    import jax
    import numpy as np

    from __graft_entry__ import _full_inputs
    from unopose_tpu.utils.checkpoint import Checkpointer, maybe_load_pretrained_vit

    logger = logging.getLogger(__name__)
    fe = cfg.model.feature_extraction
    sample = _full_inputs(
        np.random.default_rng(0),
        B=cfg.test.instance_batch_size,
        img=fe.get("img_size", 224),
        npts=cfg.dataloader.test.n_sample_observed_point,
        ntem=cfg.dataloader.test.n_sample_template_point,
    )
    variables = model.init({"params": jax.random.PRNGKey(0), "sample": jax.random.PRNGKey(1)}, sample, train=False)
    variables = dict(variables)

    load_from = cfg.misc.get("load_from", "")
    if load_from:
        # an explicit load_from is authoritative — never fall back elsewhere
        candidates = [load_from, osp.join(load_from, "ckpt")]
    else:
        candidates = [osp.join(cfg.misc.output_dir, "ckpt")]

    for cand in candidates:
        if not osp.isdir(cand):
            continue
        ckpt = Checkpointer(cand)
        step = ckpt.latest_step()
        if step is None:
            continue
        restored = ckpt.restore_pytree(step)
        variables["params"] = restored["params"]
        if restored.get("batch_stats"):
            variables["batch_stats"] = restored["batch_stats"]
        logger.info("restored trained checkpoint step %d from %s", step, cand)
        return variables

    if load_from:
        raise FileNotFoundError(f"misc.load_from={load_from!r} holds no restorable checkpoint")
    params, loaded = maybe_load_pretrained_vit(variables["params"], fe)
    variables["params"] = params
    logger.warning(
        "no trained checkpoint found (misc.load_from unset, none under %s): evaluating with %s — "
        "results are a pipeline test only",
        cfg.misc.output_dir,
        "pretrained backbone + random matchers" if loaded else "fully random weights",
    )
    return variables


def run_eval(model, cfg, out_dir, variables=None, tag=""):
    from unopose_tpu.data.dataset_test import BOPTestsetPoseFreeOneRef
    from unopose_tpu.engine.inference import make_infer_fn, make_template_fn, merge_csv_shards, run_inference

    dataset = BOPTestsetPoseFreeOneRef(
        cfg.dataloader.test,
        eval_dataset_name=cfg.dataloader.test.eval_dataset_name,
        detection_path=cfg.dataloader.test.detection_path,
    )
    if variables is None:
        variables = restore_eval_variables(model, cfg)
    infer_fn = make_infer_fn(model, variables)
    # per-reference template-feature caching (on by default: the rot50
    # cross-scene map reuses refs across many query images)
    template_fn = make_template_fn(model, variables) if cfg.test.get("template_cache", True) else None
    name = cfg.dataloader.test.eval_dataset_name
    save_path = osp.join(out_dir, f"result_{cfg.misc.exp_name}{tag}_{name}-test.csv")
    os.makedirs(out_dir, exist_ok=True)
    run_inference(
        infer_fn,
        dataset,
        save_path,
        instance_batch_size=cfg.test.instance_batch_size,
        template_fn=template_fn,
    )

    # multi-process: each rank wrote its image slice; rank 0 merges and
    # scores (reference comm.synchronize + single-rank eval, engine.py:74-84)
    import jax as _jax

    if _jax.process_count() > 1:
        from unopose_tpu.parallel.mesh import sync_processes

        sync_processes()
        if _jax.process_index() != 0:
            return
        merge_csv_shards(save_path, _jax.process_count())

    # score the CSV with the built-in BOP19 evaluator when GT is on disk
    # (reference engine.py:74-84 shells out to the vendored bop_toolkit here)
    import json

    from unopose_tpu.eval.bop_eval import evaluate_bop

    dataset_dir = osp.join(cfg.dataloader.test.data_dir, name)
    if osp.exists(osp.join(dataset_dir, "test_targets_bop19.json")):
        scores = evaluate_bop(save_path, dataset_dir, split=cfg.bop_eval.get("split", "test"))
        out_json = save_path.replace(".csv", "_scores.json")
        json.dump(scores, open(out_json, "w"), indent=2)
        print(json.dumps({k: v for k, v in scores.items() if k in ("AR", "n_images")}))
        # per-object recall tables: console + txt dumps next to the CSV
        # (reference bop_eval_utils.py:340-454)
        from unopose_tpu.data.dataset_refs import get_ref
        from unopose_tpu.eval.bop_eval import format_per_object_tables, write_per_object_tables

        try:
            id2obj = get_ref(name, cfg.dataloader.test.data_dir).id2obj
        except Exception:
            id2obj = None
        by_col, _ = format_per_object_tables(scores, id2obj=id2obj)
        print(by_col)
        write_per_object_tables(scores, save_path, id2obj=id2obj)


if __name__ == "__main__":
    main()
