"""Point-cloud kernel sweep (BASELINE config 3): FPS / ball-query /
grouping / LRF / WSVD solver throughput at 2048 -> 8192 points per frame.

Run on the TPU:  cd /root/repo && python benchmarks/kernel_sweep.py
Prints one JSON line per (kernel, n_points) with clouds/sec.
"""

from __future__ import annotations

import json
import sys
import time
import os.path as osp

sys.path.insert(0, osp.join(osp.dirname(osp.abspath(__file__)), ".."))

import numpy as np

BATCH = 16
SIZES = (2048, 4096, 8192)
ITERS = 10


def bench(name, fn, *args):
    import jax
    import jax.numpy as jnp

    # reduce outputs to one scalar inside the jit: the axon relay ships
    # large outputs eagerly, so returning full tensors times the tunnel
    def reduced(*a):
        out = fn(*a)
        return sum(jnp.sum(l.astype(jnp.float32)) for l in jax.tree_util.tree_leaves(out))

    g = jax.jit(reduced)
    _ = float(g(*args))
    t0 = time.perf_counter()
    for _i in range(ITERS):
        acc = g(*args)
    _ = float(acc)
    return (time.perf_counter() - t0) / ITERS


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/tmp/unopose_jax_cache")

    from unopose_tpu.ops.ball_query import ball_group_planar
    from unopose_tpu.ops.fps import fps, gather_points
    from unopose_tpu.ops.lrf import batch_lrf_planar, global_lrf
    from unopose_tpu.ops.procrustes import weighted_procrustes
    from unopose_tpu.ops.solver import compute_fine_Rt_overlap

    rng = np.random.default_rng(0)
    print(f"backend: {jax.default_backend()}", file=sys.stderr)
    results = []
    for n in SIZES:
        pts = jnp.asarray(rng.uniform(-1, 1, size=(BATCH, n, 3)).astype(np.float32))
        feats = jnp.asarray(rng.normal(size=(BATCH, n, 64)).astype(np.float32))
        w = jnp.asarray(rng.uniform(size=(BATCH, n)).astype(np.float32))

        rows = {
            "fps_to_quarter": bench("fps", lambda p: fps(p, n // 4), pts),
            "ball_group": bench("bg", lambda p: ball_group_planar(0.2, 256, p), pts),
            "global_lrf": bench("lrf", global_lrf, pts),
            "gather_quarter": bench(
                "gather", lambda f, p: gather_points(f, jnp.argsort(p[..., 0])[:, : n // 4]), feats, pts
            ),
            "wsvd": bench("wsvd", lambda a, b, ww: weighted_procrustes(a, b, ww), pts, pts, w),
        }
        for k, dt in rows.items():
            rec = {"kernel": k, "n_points": n, "batch": BATCH, "clouds_per_sec": round(BATCH / dt, 1)}
            results.append(rec)
            print(json.dumps(rec))

    # fine solver at the model's operating point
    n = 2048
    atten = jnp.asarray(rng.normal(size=(BATCH, n + 1, n + 1)).astype(np.float32))
    score = jnp.ones((BATCH, 2 * n), jnp.float32)
    pts = jnp.asarray(rng.uniform(-1, 1, size=(BATCH, n, 3)).astype(np.float32))
    dt = bench("fine_solver", compute_fine_Rt_overlap, atten, score, pts, pts)
    print(json.dumps({"kernel": "fine_solver", "n_points": n, "batch": BATCH, "clouds_per_sec": round(BATCH / dt, 1)}))


if __name__ == "__main__":
    main()
