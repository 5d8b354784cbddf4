"""Round-4: fine-matcher attention internals at the operating point
(B=16 pairs -> 2B=32 stacked rows, 197 sparse / 2048 dense tokens, bf16).

Times each sub-module of one SparseToDenseTransformer block plus the
focused-linear-attention feature map alone, via the in-jit fori harness.

cd /root/repo && python benchmarks/profile_fine_attn.py
"""

from __future__ import annotations

import json
import sys
import os.path as osp

sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))

import numpy as np


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/unopose_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

    from benchmarks._timing import timed_loop
    from unopose_tpu.models.attention import (
        LinearTransformerLayer,
        RPETransformerLayer,
        TransformerLayer,
    )

    B2, NS, ND, D = 32, 197, 2048, 256
    rng = np.random.default_rng(0)
    dt = jnp.bfloat16
    f_sparse = jnp.asarray(rng.standard_normal((B2, NS, D)).astype(np.float32)).astype(dt)
    f_dense = jnp.asarray(rng.standard_normal((B2, ND, D)).astype(np.float32)).astype(dt)
    emb8 = jnp.asarray(rng.integers(-127, 127, size=(B2, NS, NS, D)).astype(np.int8))
    esc = jnp.asarray(np.float32(0.01))

    results = {}

    self_layer = RPETransformerLayer(D, 4, dtype=dt)
    sv = self_layer.init(jax.random.PRNGKey(0), f_sparse, f_sparse, (emb8, esc * jnp.ones((D,), jnp.float32)))

    def run_self(eps, v, x, e):
        out, _ = self_layer.apply(v, x + eps.astype(dt), x + eps.astype(dt), e)
        return out

    timed_loop("fine_self_rpe_2B_197", run_self, sv, f_sparse, (emb8, esc * jnp.ones((D,), jnp.float32)), k=20, results=results)

    cross_layer = TransformerLayer(D, 4, dtype=dt)
    cv = cross_layer.init(jax.random.PRNGKey(0), f_sparse[:16], f_sparse[:16])

    def run_cross(eps, v, a, b):
        o1, _ = cross_layer.apply(v, a + eps.astype(dt), b)
        o2, _ = cross_layer.apply(v, b + eps.astype(dt), o1)
        return o2

    timed_loop("fine_cross_pair_B_197", run_cross, cv, f_sparse[:16], f_sparse[16:], k=20, results=results)

    dense_layer = LinearTransformerLayer(D, 4, focusing_factor=3.0, dtype=dt)
    dv = dense_layer.init(jax.random.PRNGKey(0), f_dense, f_sparse)

    def run_dense(eps, v, x, mem):
        return dense_layer.apply(v, x + eps.astype(dt), mem)

    timed_loop("fine_dense_linear_2B_2048", run_dense, dv, f_dense, f_sparse, k=20, results=results)

    # focused feature map alone (the fp32 island): q-side on dense tokens
    scale = jnp.asarray(np.float32(0.7))

    def focus(eps, x):
        q = (jax.nn.relu(x.astype(jnp.float32) + eps) + 1e-6) / scale
        qn = jnp.linalg.norm(q, axis=-1, keepdims=True)
        q3 = q**3.0
        return q3 / jnp.linalg.norm(q3, axis=-1, keepdims=True) * qn

    timed_loop("focus_map_fp32_2B_2048", focus, f_dense, k=20, results=results)

    # plain bf16 GEMM reference: one (2B*2048, 256) x (256, 512) for scale
    Wr = jnp.asarray(rng.standard_normal((D, 512)).astype(np.float32)).astype(dt)

    def gemm(eps, x, W):
        return (x + eps.astype(dt)).reshape(-1, D) @ W

    timed_loop("ref_gemm_2Bx2048x256x512", gemm, f_dense, Wr, k=20, results=results)

    print(json.dumps(results))
    with open(osp.join(osp.dirname(__file__), "profile_fine_attn.json"), "w") as f:
        json.dump(results, f, indent=1)


if __name__ == "__main__":
    main()
