"""Round-3: reconcile the three ways of timing the full model on the
tunneled chip.

  a) single-dispatch host loop (round-2 bench.py): pays ~4 ms/op submission
  b) in-jit lax.fori_loop with only `pts` chained (round-3 profiler): XLA
     hoists every loop-invariant subgraph (query ViT, template branch...)
  c) in-jit lax.scan / fori with ALL inputs chained: nothing hoistable --
     the honest steady-state device cost

cd /root/repo && python benchmarks/profile_loop_modes.py
"""

from __future__ import annotations

import sys
import time
import os.path as osp

sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))

import numpy as np


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
    inputs = _full_inputs(rng, B=16)
    init_fn = jax.jit(
        lambda inp: model.init(
            {"params": jax.random.PRNGKey(0), "sample": jax.random.PRNGKey(1)}, inp, train=False
        )
    )
    variables = init_fn(inputs)
    _ = float(jax.tree_util.tree_leaves(variables)[0].reshape(-1)[0])
    print("init done", flush=True)

    CHAIN_KEYS = ("pts", "rgb", "tem1_rgb", "tem1_pts")

    def chained_inputs(inputs, eps, keys):
        ins = dict(inputs)
        for k in keys:
            ins[k] = inputs[k] + eps.astype(inputs[k].dtype)
        return ins

    # ---- a) single dispatch host loop -------------------------------------
    infer = jax.jit(lambda v, i, k: model.apply(v, i, train=False, rngs={"sample": k}, mutable=False))
    out = infer(variables, inputs, jax.random.PRNGKey(2))
    _ = float(out["pred_t"][0, 0])

    def host_loop(n, key):
        local = dict(inputs)
        for i in range(n):
            key = jax.random.fold_in(key, i)
            out = infer(variables, local, key)
            local["pts"] = inputs["pts"] + out["pred_t"][:1, :1] * 0.0
        return float(out["pred_t"][0, 0])

    host_loop(2, jax.random.PRNGKey(3))
    t0 = time.perf_counter()
    host_loop(10, jax.random.PRNGKey(4))
    dt_a = (time.perf_counter() - t0) / 10
    print(f"a) host-chained dispatch        {dt_a * 1e3:8.1f} ms/iter", flush=True)

    # ---- b/c) in-jit loops --------------------------------------------------
    def make_scan(chain_keys):
        def run(variables, inputs, n, key):
            def body(carry, i):
                ins = chained_inputs(inputs, carry, chain_keys)
                out = model.apply(
                    variables, ins, train=False, rngs={"sample": jax.random.fold_in(key, i)}, mutable=False
                )
                return out["pred_t"][0, 0] * 0.0, (out["pred_R"], out["pred_t"], out["pred_pose_score"])

            _, outs = jax.lax.scan(body, jnp.float32(0.0), jnp.arange(n))
            return outs

        return jax.jit(run, static_argnums=2)

    def make_fori(chain_keys):
        def run(variables, inputs, n, key):
            def body(i, carry):
                ins = chained_inputs(inputs, carry, chain_keys)
                out = model.apply(
                    variables, ins, train=False, rngs={"sample": jax.random.fold_in(key, i)}, mutable=False
                )
                acc = jnp.float32(0.0)
                for l in jax.tree_util.tree_leaves(out):
                    acc = acc + jnp.sum(l).astype(jnp.float32)
                return acc * 0.0

            return jax.lax.fori_loop(0, n, body, jnp.float32(0.0))

        return jax.jit(run, static_argnums=2)

    def time_looped(name, fn, n_lo, n_hi):
        # difference cancels dispatch+readback; separate compiles per n
        r = fn(variables, inputs, n_lo, jax.random.PRNGKey(5))
        _ = float(jax.tree_util.tree_leaves(r)[0].reshape(-1)[-1])
        r = fn(variables, inputs, n_hi, jax.random.PRNGKey(5))
        _ = float(jax.tree_util.tree_leaves(r)[0].reshape(-1)[-1])

        def run(n):
            ts = []
            for _ in range(3):
                t0 = time.perf_counter()
                r = fn(variables, inputs, n, jax.random.PRNGKey(6))
                _ = float(jax.tree_util.tree_leaves(r)[0].reshape(-1)[-1])
                ts.append(time.perf_counter() - t0)
            return min(ts)

        t_lo, t_hi = run(n_lo), run(n_hi)
        dt = (t_hi - t_lo) / (n_hi - n_lo)
        print(f"{name:32s} {dt * 1e3:8.1f} ms/iter  (lo {t_lo * 1e3:.0f} ms, hi {t_hi * 1e3:.0f} ms)", flush=True)
        return dt

    time_looped("b) fori, pts-only chain", make_fori(("pts",)), 5, 10)
    time_looped("c) fori, all-inputs chain", make_fori(CHAIN_KEYS), 5, 10)
    time_looped("d) scan, pts-only chain", make_scan(("pts",)), 5, 10)
    time_looped("e) scan, all-inputs chain", make_scan(CHAIN_KEYS), 5, 10)


if __name__ == "__main__":
    main()
