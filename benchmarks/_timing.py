"""Shared TPU micro-benchmark harness that subtracts the axon dispatch floor.

Single-dispatch timings on the tunneled chip have a ~3.5-4 ms floor, so any
stage under ~5 ms is unmeasurable that way (round-2 PROFILE.md). ``timed_loop``
repeats the stage K times INSIDE one jitted lax.fori_loop — chaining a scalar
through the carried argument so XLA cannot hoist the body — and divides by K.
"""

from __future__ import annotations

import time

import numpy as np


def _leaf0(tree):
    import jax

    leaves = [l for l in jax.tree_util.tree_leaves(tree) if hasattr(l, "dtype")]
    for l in leaves:
        if l.dtype.kind == "f":
            return l.reshape(-1)[0]
    return leaves[0].reshape(-1)[0].astype("float32")


def _alive(tree):
    """Scalar depending on EVERY output leaf — chaining only _leaf0 lets XLA
    dead-code-eliminate all other outputs (and everything feeding only
    them), which silently deletes most of a multi-output stage."""
    import jax
    import jax.numpy as jnp

    leaves = [l for l in jax.tree_util.tree_leaves(tree) if hasattr(l, "dtype")]
    acc = jnp.float32(0.0)
    for l in leaves:
        # FULL reduction per leaf: element-[0] taps can be narrowed through
        # elementwise producers by XLA's slice-sinking. A sum fuses into the
        # producer (no extra HBM pass) but keeps every element live.
        if l.dtype.kind == "b":
            l = l.astype(jnp.int32)
        acc = acc + jnp.sum(l).astype(jnp.float32)
    return acc


def timed_loop(name, fn, *args, k=20, outer=3, results=None):
    """fn(eps, *args) -> pytree. Repeats fn k times inside ONE jit via
    fori_loop (eps chained through a zero-valued scalar) and reports
    per-iteration ms. The k=1 program is also timed to expose the
    single-dispatch total (incl. floor)."""
    import jax
    import jax.numpy as jnp

    def loop(eps, k_static, *a):
        def body(_, carry):
            out = fn(carry, *a)
            return _alive(out) * 0.0

        return jax.lax.fori_loop(0, k_static, body, eps)

    jk = jax.jit(loop, static_argnums=1)
    # compile both variants
    float(jk(np.float32(0.0), k, *args))
    float(jk(np.float32(0.0), 2 * k, *args))

    def run(kk):
        ts = []
        for _ in range(outer):
            t0 = time.perf_counter()
            float(jk(np.float32(0.0), kk, *args))
            ts.append(time.perf_counter() - t0)
        return min(ts)

    # difference of 2k and k runs cancels dispatch + readback overhead
    t_k = run(k)
    t_2k = run(2 * k)
    dt = max(t_2k - t_k, 1e-9) / k
    if results is not None:
        results[name] = round(dt * 1e3, 3)
    print(f"{name:44s} {dt * 1e3:9.3f} ms/iter   (k-dispatch {t_k * 1e3:.1f} ms)", flush=True)
    return dt
