"""Round-3: split the fine-PE 30.6 ms into grouping vs fused-MLP kernel.

cd /root/repo && python benchmarks/profile_pe_split.py
"""

from __future__ import annotations

import sys
import time
import os.path as osp

sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))

import numpy as np


def _leaf0(tree):
    import jax

    leaves = [l for l in jax.tree_util.tree_leaves(tree) if hasattr(l, "dtype")]
    for l in leaves:
        if l.dtype.kind == "f":
            return l.reshape(-1)[0]
    return leaves[0].reshape(-1)[0].astype("float32")


def timed(name, jfn, *args, iters=10, warmup=2):
    out = jfn(np.float32(0.0), *args)
    float(_leaf0(out))

    def chain(n):
        eps = np.float32(0.0)
        for _ in range(n):
            out = jfn(eps, *args)
            eps = _leaf0(out) * 0.0
        return float(_leaf0(out))

    chain(warmup)
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        chain(iters)
        ts.append((time.perf_counter() - t0) / iters)
    dt = min(ts)
    print(f"{name:44s} {dt * 1e3:9.2f} ms", flush=True)
    return dt


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/unopose_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

    from unopose_tpu.models.matching import (
        FinePositionalEncoding,
        _pe_folded_params,
    )
    from unopose_tpu.ops.ball_query import two_scale_group_first_k_packed
    from unopose_tpu.ops.pe_fused import pe_fused_packed

    B, P = 16, 2048
    rng = np.random.default_rng(0)
    pts_np = rng.uniform(-1, 1, size=(2 * B, P, 3)).astype(np.float32)
    pts_np /= np.linalg.norm(pts_np, axis=-1, keepdims=True).max(axis=1, keepdims=True)
    pts = jnp.asarray(pts_np)
    print(f"backend: {jax.default_backend()}", flush=True)

    pe = FinePositionalEncoding(out_dim=256, r1=0.1, r2=0.2, nsample1=64, nsample2=256)
    pe_vars = pe.init(jax.random.PRNGKey(0), pts, train=False)

    # whole PE (reference number)
    timed(
        "pe_total_packed_2B",
        jax.jit(lambda e, v, p: pe.apply(v, p + e, train=False)),
        pe_vars,
        pts,
    )

    # grouping only
    grp = jax.jit(
        lambda e, p: two_scale_group_first_k_packed(0.1, 64, 0.2, 256, p + e)
    )
    timed("pe_grouping_packed", grp, pts)

    # fused kernel only (on pre-computed grouping)
    g2, w1, w2, total2, overflow = jax.block_until_ready(grp(np.float32(0.0), pts))
    print("overflow:", bool(overflow), flush=True)
    t2 = np.asarray(total2)
    print(f"total2: max {t2.max()}, mean {t2.mean():.1f}, "
          f"blocks<=128: {(t2.reshape(t2.shape[0], -1, 64).max(-1) <= 128).mean():.3f}", flush=True)

    from unopose_tpu.ops.pe_fused import fold_bn

    folded = {}
    for name in ("mlp1", "mlp2"):
        Ws, bs = [], []
        for i in range(3):
            W = pe_vars["params"][f"{name}_fc{i}_kernel"]
            bn_p = pe_vars["params"][f"{name}_bn{i}"]
            bn_s = pe_vars["batch_stats"][f"{name}_bn{i}"]
            Wf, bf = fold_bn(W, bn_p["scale"], bn_p["bias"], bn_s["mean"], bn_s["var"])
            Ws.append(Wf)
            bs.append(bf)
        folded[name] = (Ws, bs)
    center = (pts[..., 0], pts[..., 1], pts[..., 2])

    def kernel_only(e, g2_, w1_, w2_, t2_, c, f):
        c = tuple(q + e for q in c)
        return pe_fused_packed(
            g2_, w1_, w2_, t2_, c, *f["mlp1"], *f["mlp2"], 0.1, 0.2, interpret=False
        )

    timed("pe_fused_packed_kernel", jax.jit(kernel_only), g2, w1, w2, total2, center, folded)

    # v3 split path: XLA channel construction + cols-major chunked MLP/pool
    from unopose_tpu.ops.pe_fused import pe_channels_packed, pe_mlp_pool_packed

    def v3_channels(e, g2_, w1_, w2_, c):
        c = tuple(q + e for q in c)
        return pe_channels_packed(g2_, w1_, w2_, c, 0.1, 0.2)[0]

    timed("pe_v3_channels_xla", jax.jit(v3_channels), g2, w1, w2, center)

    def v3_full(e, g2_, w1_, w2_, t2_, c, f):
        c = tuple(q + e for q in c)
        chunks, _ = pe_channels_packed(g2_, w1_, w2_, c, 0.1, 0.2)
        return pe_mlp_pool_packed(chunks, t2_, *f["mlp1"], *f["mlp2"])

    timed("pe_v3_total", jax.jit(v3_full), g2, w1, w2, total2, center, folded)

    chunks0 = jax.block_until_ready(
        jax.jit(lambda g2_, w1_, w2_, c: pe_channels_packed(g2_, w1_, w2_, c, 0.1, 0.2)[0])(
            g2, w1, w2, center
        )
    )

    def v3_kernel_only(e, ch, t2_, f):
        ch = [c + e.astype(c.dtype) for c in ch]
        return pe_mlp_pool_packed(ch, t2_, *f["mlp1"], *f["mlp2"])

    timed("pe_v3_mlp_pool_kernel", jax.jit(v3_kernel_only), chunks0, total2, folded)

    # final Dense 256->256 projection
    W3 = pe_vars["params"]["mlp3"]["kernel"]
    b3 = pe_vars["params"]["mlp3"]["bias"]
    feat = jnp.asarray(rng.standard_normal((2 * B, P, 256)).astype(np.float32))
    timed(
        "pe_mlp3_dense",
        jax.jit(lambda e, f, W, b: (f + e) @ W + b),
        feat,
        W3,
        b3,
    )


if __name__ == "__main__":
    main()
