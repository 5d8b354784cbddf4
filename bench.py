"""Flagship benchmark: query-reference pairs/sec for full UNOPose inference
on one TPU chip.

Measures the complete per-pair inference path the reference times into the
BOP CSV (oneref_inference_utils_v1.py:81-109): both ViT-B/14 forwards
(query + reference crop), feature lifting, FPS, LRF, geometric embeddings,
coarse matching + 6000-hypothesis search, fine matching + WSVD — at the
reference's instance batch size of 16 (configs/main_cfg.py:92).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
``vs_baseline`` compares against a derived A100 PyTorch reference
throughput (no number is published in the reference repo). BASELINE.md
"Derived A100 throughput denominator" has the full FLOP inventory
(~278 GFLOPs/pair): 120 pairs/s is the GENEROUS TF32-enabled best case;
the reference's literal fp32 defaults land at ~25-35 pairs/s. The >=5x
target from BASELINE.json corresponds to vs_baseline >= 5.
"""

from __future__ import annotations

import functools
import json
import sys
import time
import os.path as osp

sys.path.insert(0, osp.dirname(osp.abspath(__file__)))

import numpy as np

A100_REFERENCE_PAIRS_PER_SEC = 120.0  # TF32 best-case; derivation in BASELINE.md
import os
BATCH = int(os.environ.get("UNOPOSE_BENCH_BATCH", "16"))
WARMUP = 2
ITERS = 10


def main():
    import jax

    # persistent compile cache: the full-model compile is minutes over the
    # axon tunnel; cached reruns start in seconds
    jax.config.update("jax_compilation_cache_dir", "/tmp/unopose_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

    from __graft_entry__ import _full_inputs
    from unopose_tpu.configs.main_cfg import get_cfg
    from unopose_tpu.models import UNOPose

    cfg = get_cfg()
    if os.environ.get("UNOPOSE_BENCH_INT8"):
        cfg.model.feature_extraction.int8_gemm = True
    # bf16 matchers at inference: the accuracy-critical paths (similarity,
    # softmax, PE, solvers) are pinned fp32 inside the modules
    model = UNOPose.from_config(cfg.model, dtype=jnp.bfloat16, backbone_dtype=jnp.bfloat16)
    rng = np.random.default_rng(0)
    inputs = _full_inputs(rng, B=BATCH)

    print(f"backend: {jax.default_backend()} devices: {jax.devices()}", file=sys.stderr)
    t0 = time.perf_counter()
    # jit the init: eager init dispatches thousands of small ops over the
    # axon relay (~4.5 ms floor each, ~5 min total); one compiled program
    # runs in seconds and hits the persistent cache on reruns
    init_fn = jax.jit(lambda inp: model.init({"params": jax.random.PRNGKey(0), "sample": jax.random.PRNGKey(1)}, inp, train=False))
    variables = init_fn(inputs)
    # force execution (block_until_ready does not block on the axon relay)
    _ = float(jax.tree_util.tree_leaves(variables)[0].reshape(-1)[0])
    print(f"init: {time.perf_counter() - t0:.1f}s", file=sys.stderr)

    @jax.jit
    def infer(variables, inputs, key):
        return model.apply(variables, inputs, train=False, rngs={"sample": key}, mutable=False)

    key = jax.random.PRNGKey(2)
    t0 = time.perf_counter()
    out = infer(variables, inputs, key)
    _ = float(out["pred_t"][0, 0])  # force execution: block_until_ready does
    # not actually block on the axon relay backend
    print(f"compile+first run: {time.perf_counter() - t0:.1f}s", file=sys.stderr)

    # Steady-state device throughput: n back-to-back batches inside ONE
    # compiled lax.scan — per-step results are collected (so every batch is
    # fully computed) and each step folds its index into the sampling key
    # and chains a zero-valued dependency through EVERY model input (pts,
    # rgb, template rgb/pts), so XLA can hoist nothing: a pts-only chain
    # lets it pull both loop-invariant ViT branches out of the loop and
    # under-reports by ~25% (51.8 vs 68.7 ms/iter,
    # benchmarks/profile_loop_modes.py). Rationale for in-jit looping: a
    # serving engine streams batches with the next dispatch enqueued behind
    # the current one, so device time per batch IS the deployed cost; a
    # host-side dispatch chain instead adds the axon tunnel's ~4 ms/op
    # submission floor (72.6 ms/iter for the same program).
    CHAIN_KEYS = ("pts", "rgb", "tem1_rgb", "tem1_pts")

    @functools.partial(jax.jit, static_argnums=2)
    def run_scan(variables, inputs, n, key):
        def body(carry, i):
            ins = dict(inputs)
            for k in CHAIN_KEYS:
                ins[k] = inputs[k] + carry.astype(inputs[k].dtype)
            out = model.apply(
                variables, ins, train=False,
                rngs={"sample": jax.random.fold_in(key, i)}, mutable=False,
            )
            return out["pred_t"][0, 0] * 0.0, (out["pred_R"], out["pred_t"], out["pred_pose_score"])

        _, outs = jax.lax.scan(body, jnp.float32(0.0), jnp.arange(n))
        return outs

    # warm up with the SAME static n as the timed run: a different n is a
    # different program, and the timed call would pay its compile
    for _ in range(WARMUP):
        outs = run_scan(variables, inputs, ITERS, jax.random.PRNGKey(3))
        _ = float(outs[1][0, 0, 0])
    # min over several timed calls: the axon tunnel occasionally stalls a
    # single dispatch for hundreds of ms (measured 0.7s -> 35s outliers);
    # steady calls repeat within ~1% so the min is the honest device cost
    dt = float("inf")
    for trial in range(3):
        t0 = time.perf_counter()
        outs = run_scan(variables, inputs, ITERS, jax.random.PRNGKey(4 + trial))
        _ = float(outs[1][-1, 0, 0])
        dt = min(dt, time.perf_counter() - t0)
    out = {"pred_R": outs[0][-1], "pred_t": outs[1][-1]}

    pairs_per_sec = BATCH * ITERS / dt
    print(
        f"steady: {dt / ITERS * 1e3:.1f} ms / {BATCH}-pair batch "
        f"(pred_R finite: {bool(jnp.isfinite(out['pred_R']).all())})",
        file=sys.stderr,
    )
    print(
        json.dumps(
            {
                "metric": "query_ref_pairs_per_sec_per_chip",
                "value": round(pairs_per_sec, 2),
                "unit": "pairs/s",
                "vs_baseline": round(pairs_per_sec / A100_REFERENCE_PAIRS_PER_SEC, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
