"""Round-2 (cont.) scouting: fused-keys grouping kernel + current stage mix.

cd /root/repo && python benchmarks/profile_r3.py [--stages]
"""

from __future__ import annotations

import sys
import time
import os.path as osp

sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))

import numpy as np

RESULTS = {}


def _leaf0(tree):
    import jax

    leaves = [l for l in jax.tree_util.tree_leaves(tree) if hasattr(l, "dtype")]
    for l in leaves:
        if l.dtype.kind == "f":
            return l.reshape(-1)[0]
    return leaves[0].reshape(-1)[0].astype("float32")


def timed(name, fn, *args, iters=10, warmup=2):
    import jax

    jfn = jax.jit(fn)
    t0 = time.perf_counter()
    out = jfn(np.float32(0.0), *args)
    float(_leaf0(out))
    compile_s = time.perf_counter() - t0

    def chain(n):
        eps = np.float32(0.0)
        for _ in range(n):
            out = jfn(eps, *args)
            eps = _leaf0(out) * 0.0
        return float(_leaf0(out))

    chain(warmup)
    t0 = time.perf_counter()
    chain(iters)
    dt = (time.perf_counter() - t0) / iters
    RESULTS[name] = round(dt * 1e3, 2)
    print(f"{name:46s} {dt * 1e3:9.2f} ms   (compile {compile_s:.1f}s)", flush=True)
    return dt


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/unopose_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

    from unopose_tpu.ops.ball_query import two_scale_group_first_k_fast

    print(f"backend: {jax.default_backend()}", flush=True)
    B, N = 16, 2048
    R1, K1, R2, K2 = 0.1, 64, 0.2, 256
    rng = np.random.default_rng(0)
    v = rng.normal(size=(B, N, 3))
    v /= np.linalg.norm(v, axis=-1, keepdims=True)
    pts = jax.device_put((0.5 * v + rng.normal(size=(B, N, 3)) * 0.01).astype(np.float32))

    def grp_xla(eps, pts):
        return two_scale_group_first_k_fast(R1, K1, R2, K2, pts + eps, fused_keys=False)

    def grp_fused(eps, pts):
        return two_scale_group_first_k_fast(R1, K1, R2, K2, pts + eps, fused_keys=True)

    timed("first_k_fast keys=XLA", grp_xla, pts)
    timed("first_k_fast keys=Pallas", grp_fused, pts)

    # on-chip equality: both paths must produce identical groupings
    a = jax.jit(grp_xla)(np.float32(0.0), pts)
    b = jax.jit(grp_fused)(np.float32(0.0), pts)
    same = True
    for ap, bp in zip((*a[0], *a[1]), (*b[0], *b[1])):
        same = same and bool(jnp.all(ap == bp))
    print(f"fused-keys on-chip equality: {same}", flush=True)
    RESULTS["fused_keys_equal"] = same

    # full PE call at the production config
    from unopose_tpu.models.matching import FinePositionalEncoding

    m = FinePositionalEncoding(out_dim=256, r1=R1, r2=R2, nsample1=K1, nsample2=K2, neighbor_mode="first_k")
    variables = m.init({"params": jax.random.PRNGKey(0)}, pts, train=False)

    def pe(eps, pts):
        return m.apply(variables, pts + eps, train=False)

    timed("PE first_k full (production)", pe, pts)

    import json

    print(json.dumps(RESULTS))


if __name__ == "__main__":
    main()
