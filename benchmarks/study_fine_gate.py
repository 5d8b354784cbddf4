"""Round-5: NON-VACUOUS fine-stage pose gate (VERDICT r4 weak #3 / next #4).

The production-path study's random-init weights leave the fine dual-softmax
architecturally diffuse: every WSVD row weight falls below the reference's
0.001 cutoff, both configs hit the identity fallback, and the headline
"final pose deltas exactly 0" cannot fail. This study closes that hole by
first TRAINING the full-size model briefly on the study's own scene family
(same-view correlated scenes with known GT poses drive the fine matching
loss, which directly peaks the assignment), gating on the model's own
``fine_wsvd_max_w`` output clearing the threshold, and then running the
standard production-vs-faithful A/B with the probed weights — so the fine
WSVD path demonstrably executes and final-pose deltas are a real gate.

cd /root/repo && python benchmarks/study_fine_gate.py
(~20 min: a few hundred train steps on the chip + the A/B roles.)

Reference semantics guarded: core/unopose/utils/model_utils.py:527-566.
"""

from __future__ import annotations

import json
import os
import os.path as osp
import subprocess
import sys

import numpy as np

sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))
sys.path.insert(0, osp.dirname(osp.abspath(__file__)))

WORK = os.environ.get("UNOPOSE_STUDY_WORK", "/tmp/unopose_study_gate")
MAX_STEPS = int(os.environ.get("GATE_MAX_STEPS", "400"))
CHECK_EVERY = 25
GATE = 1e-3  # reference WSVD weight threshold (model_utils.py:548)


def role_train_probe():
    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/unopose_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

    from study_production_path import SEED, B, scene_batch
    from unopose_tpu.configs.main_cfg import get_cfg
    from unopose_tpu.engine.train import create_train_state, make_train_step
    from unopose_tpu.models import UNOPose

    cfg = get_cfg()
    cfg.model.feature_extraction.pretrained = False
    model = UNOPose.from_config(cfg.model, dtype=jnp.bfloat16, backbone_dtype=jnp.bfloat16)
    print(f"backend: {jax.default_backend()}", flush=True)

    rng = np.random.default_rng(SEED)
    probe_np, _, _ = scene_batch(rng, B)
    probe = {k: jnp.asarray(v) for k, v in probe_np.items()}
    state = create_train_state(model, cfg, {**probe, "rotation_label": jnp.eye(3)[None].repeat(B, 0),
                                            "translation_label": jnp.zeros((B, 3))}, seed=0)
    state = jax.device_put(state)
    step = jax.jit(make_train_step(model, cfg), donate_argnums=0)

    @jax.jit
    def gate_fwd(params, batch_stats, inputs, key):
        out = model.apply(
            {"params": params, "batch_stats": batch_stats}, inputs,
            train=False, rngs={"sample": key}, mutable=False,
        )
        return out["fine_wsvd_max_w"], out["pred_pose_score"]

    train_rng = np.random.default_rng(SEED + 1)
    hit = None
    for i in range(MAX_STEPS):
        inputs, R_gt, t_gt = scene_batch(train_rng, B)
        batch = {k: jnp.asarray(v) for k, v in inputs.items()}
        batch["rotation_label"] = jnp.asarray(R_gt)
        batch["translation_label"] = jnp.asarray(t_gt)
        state, metrics = step(state, batch, jax.random.PRNGKey(100 + i))
        if (i + 1) % CHECK_EVERY == 0 or i == 0:
            mw, ps = gate_fwd(state.params, state.batch_stats, probe, jax.random.PRNGKey(7))
            mw = np.asarray(mw)
            print(
                f"step {i + 1}: loss {float(metrics['loss']):.3f} "
                f"fine_wsvd_max_w {mw.min():.4f}..{mw.max():.4f} pscore {np.asarray(ps).mean():.3f}",
                flush=True,
            )
            if (mw > GATE).all():
                hit = i + 1
                break
    assert hit is not None, "fine assignment never cleared the WSVD threshold"
    print(f"gate cleared at step {hit}", flush=True)

    variables = {"batch_stats": state.batch_stats, "params": state.params}
    leaves = jax.tree_util.tree_leaves(variables)
    os.makedirs(WORK, exist_ok=True)
    np.savez(osp.join(WORK, "params.npz"), *[np.asarray(l) for l in leaves])
    print(f"saved {len(leaves)} probed param leaves -> {WORK}/params.npz", flush=True)


def main():
    if len(sys.argv) > 1 and sys.argv[1] == "--role" and sys.argv[2] == "train-probe":
        return role_train_probe()

    os.makedirs(WORK, exist_ok=True)
    me = osp.abspath(__file__)
    study = osp.join(osp.dirname(me), "study_production_path.py")
    env = dict(os.environ)
    env["UNOPOSE_STUDY_WORK"] = WORK
    env.setdefault("STUDY_REPS", "13")  # 52 pairs

    def sub(script, *extra):
        r = subprocess.run([sys.executable, script, *extra], env=env)
        if r.returncode != 0:
            raise RuntimeError(f"subprocess {extra} failed rc={r.returncode}")

    if not osp.exists(osp.join(WORK, "params.npz")):
        sub(me, "--role", "train-probe")
    sub(study, "--role", "run", "--config", "faithful", "--device", "cpu")
    sub(study, "--role", "run", "--config", "production", "--device", "tpu")
    sub(study, "--role", "compare")
    with open(osp.join(WORK, "summary.json")) as f:
        print(json.dumps(json.load(f)["configs"].get("production", {}).get("wsvd_nominal_frac"), indent=2))


if __name__ == "__main__":
    main()
