"""One-process A/B on the real chip: UNOPOSE_PE_V4=0 (point-major packed
kernel + materialized grouping) vs =1 (PE-v4 grouping-fused slot-major
kernel with in-kernel gather). One process = one axon claim — claims are
minutes in degraded tunnel states, so every variant runs in one session.

cd /root/repo && python benchmarks/bench_ab_pe_v4.py
"""

from __future__ import annotations

import functools
import json
import os
import sys
import time
import os.path as osp

sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))

import numpy as np

BATCH = 16
ITERS = 10
CHAIN_KEYS = ("pts", "rgb", "tem1_rgb", "tem1_pts")


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/unopose_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

    from __graft_entry__ import _full_inputs
    from unopose_tpu.configs.main_cfg import get_cfg
    from unopose_tpu.models import UNOPose

    cfg = get_cfg()
    model = UNOPose.from_config(cfg.model, dtype=jnp.bfloat16, backbone_dtype=jnp.bfloat16)
    rng = np.random.default_rng(0)
    inputs = _full_inputs(rng, B=BATCH)
    print(f"backend: {jax.default_backend()}", flush=True)

    t0 = time.perf_counter()
    init_fn = jax.jit(
        lambda inp: model.init(
            {"params": jax.random.PRNGKey(0), "sample": jax.random.PRNGKey(1)}, inp, train=False
        )
    )
    variables = init_fn(inputs)
    _ = float(jax.tree_util.tree_leaves(variables)[0].reshape(-1)[0])
    print(f"init: {time.perf_counter() - t0:.1f}s", flush=True)

    def bench_variant(name):
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
                return out["pred_t"][0, 0] * 0.0, (out["pred_R"], out["pred_t"])

            _, outs = jax.lax.scan(body, jnp.float32(0.0), jnp.arange(n))
            return outs

        t0 = time.perf_counter()
        outs = run_scan(variables, inputs, ITERS, jax.random.PRNGKey(3))
        _ = float(outs[1][-1, 0, 0])
        print(f"[{name}] compile+first: {time.perf_counter() - t0:.1f}s", flush=True)
        outs = run_scan(variables, inputs, ITERS, jax.random.PRNGKey(3))
        _ = float(outs[1][-1, 0, 0])
        dt = float("inf")
        for trial in range(3):
            t0 = time.perf_counter()
            outs = run_scan(variables, inputs, ITERS, jax.random.PRNGKey(4 + trial))
            _ = float(outs[1][-1, 0, 0])
            dt = min(dt, time.perf_counter() - t0)
        finite = bool(jnp.isfinite(outs[0][-1]).all())
        ms = dt / ITERS * 1e3
        print(
            f"[{name}] steady: {ms:.1f} ms/batch = {BATCH * ITERS / dt:.1f} pairs/s "
            f"(finite {finite})",
            flush=True,
        )
        return ms

    os.environ["UNOPOSE_PE_V4"] = "0"
    os.environ["UNOPOSE_PE_V5"] = "1"
    v5 = bench_variant("pe_v5")
    os.environ["UNOPOSE_PE_V5"] = "0"
    base = bench_variant("default")
    os.environ["UNOPOSE_PE_V4"] = "1"
    v4 = bench_variant("pe_v4")
    print(json.dumps({"default_ms": round(base, 2), "pe_v4_ms": round(v4, 2), "pe_v5_ms": round(v5, 2)}))


if __name__ == "__main__":
    main()
