"""Dissect the fine matcher's 50+ms: PE (pallas vs XLA), grouping, dense
linear attention, similarity + block outputs — each standalone on the chip.

cd /root/repo && python benchmarks/profile_fine.py
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
    print(f"{name:40s} {dt * 1e3:9.2f} ms   (compile {compile_s:.1f}s)", flush=True)
    return dt


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/unopose_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

    from unopose_tpu.models.attention import LinearTransformerLayer
    from unopose_tpu.models.embedding import GeometricStructureEmbedding
    from unopose_tpu.models.matching import FinePositionalEncoding, _block_outputs
    from unopose_tpu.ops.ball_query import ball_group_planar
    from unopose_tpu.ops.geometry import compute_feature_similarity
    from unopose_tpu.ops.procrustes import weighted_procrustes

    B, P = 16, 2048
    rng = np.random.default_rng(0)
    pts = jnp.asarray(rng.uniform(-1, 1, size=(B, P, 3)).astype(np.float32))
    print(f"backend: {jax.default_backend()}", flush=True)

    # PE variants
    for name, fused in (("pe_xla_bf16", False), ("pe_pallas", True)):
        pe = FinePositionalEncoding(out_dim=256, r1=0.1, r2=0.2, nsample1=64, nsample2=256, fused=fused)
        variables = pe.init(jax.random.PRNGKey(0), pts, train=False)

        def run(eps, v, p):
            return pe.apply(v, p + eps, train=False)

        timed(name, run, variables, pts)

    # grouping alone
    timed("ball_group_2048x256", lambda e, p: ball_group_planar(0.2, 256, p + e)[0][0], pts)

    # dense linear attention layer x6 (3 blocks x 2 sides)
    lt = LinearTransformerLayer(256, 4, 3.0, dtype=jnp.bfloat16)
    xd = jnp.asarray(rng.standard_normal((B, P, 256)).astype(np.float32))
    xs = jnp.asarray(rng.standard_normal((B, 196, 256)).astype(np.float32))
    lt_vars = lt.init(jax.random.PRNGKey(1), xd, xs)

    def run_lt(eps, v, d, s):
        out = d + eps
        for _ in range(6):
            out = lt.apply(v, out, s)
        return out

    timed("linear_attn_x6", run_lt, lt_vars, xd, xs)

    # similarity + block outputs (once, as at inference)
    f1 = jnp.asarray(rng.standard_normal((B, 2049, 256)).astype(np.float32))
    f2 = jnp.asarray(rng.standard_normal((B, 2049, 256)).astype(np.float32))
    sc = jnp.asarray(rng.standard_normal((B, 4098, 1)).astype(np.float32))

    def run_sim(eps, a, b, s):
        atten = compute_feature_similarity(a + eps, b, "cosine", 0.1, True)
        score, sal = _block_outputs(atten, s, 2048)
        return atten, score, sal

    timed("similarity+block_outputs", run_sim, f1, f2, sc)

    # geo embedding variants (poly vs exact)
    pts197 = jnp.asarray(rng.uniform(-1, 1, size=(B, 197, 3)).astype(np.float32))
    for name, table in (("geo_poly", 0), ("geo_table", 4096)):
        ge = GeometricStructureEmbedding(hidden_dim=256, dtype=jnp.bfloat16, table_size=table)
        gvars = ge.init(jax.random.PRNGKey(2), pts197)

        def run_ge(eps, v, p):
            return ge.apply(v, p + eps)

        timed(name, run_ge, gvars, pts197)

    # procrustes 96000 again (still 10.9ms in csolve)
    tri1 = jnp.asarray(rng.uniform(-1, 1, size=(B * 6000, 3, 3)).astype(np.float32))
    tri2 = jnp.asarray(rng.uniform(-1, 1, size=(B * 6000, 3, 3)).astype(np.float32))
    timed("procrustes_96000", lambda e, a, b: weighted_procrustes(a + e, b), tri1, tri2)

    print(RESULTS, flush=True)


if __name__ == "__main__":
    main()
