"""Round-4: ablate the point-major packed PE kernel's FAST path to locate
the gap between its ~5.6 ms MXU floor and the measured ~11-14 ms.

Variants knock out one pipeline piece each (numerics intentionally wrong —
timing only); the deltas attribute cost to: LRF (VPU), channel
stack+reshape (relayout), MLP matmuls (MXU), masked max-pool (relayout).

cd /root/repo && python benchmarks/profile_pe_ablate.py
"""

from __future__ import annotations

import functools
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
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from benchmarks._timing import timed_loop
    from unopose_tpu.models.matching import FinePositionalEncoding
    from unopose_tpu.ops.ball_query import two_scale_group_first_k_packed
    from unopose_tpu.ops.pe_fused import _masked_lrf_block, fold_bn

    B, P = 16, 2048
    rng = np.random.default_rng(0)
    pts_np = rng.uniform(-1, 1, size=(2 * B, P, 3)).astype(np.float32)
    pts_np /= np.linalg.norm(pts_np, axis=-1, keepdims=True).max(axis=1, keepdims=True)
    pts = jnp.asarray(pts_np)
    print(f"backend: {jax.default_backend()}", flush=True)

    pe = FinePositionalEncoding(out_dim=256, r1=0.1, r2=0.2, nsample1=64, nsample2=256)
    pe_vars = pe.init(jax.random.PRNGKey(0), pts, train=False)
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

    grp = jax.jit(lambda p: two_scale_group_first_k_packed(0.1, 64, 0.2, 256, p))
    g2, w1, w2, total2, overflow = jax.block_until_ready(grp(pts))
    t2 = np.asarray(total2)
    print(
        f"overflow={bool(overflow)} total2 max={t2.max()} "
        f"fast-blocks={(t2.reshape(t2.shape[0], -1, 64).max(-1) <= 128).mean():.3f}",
        flush=True,
    )

    # ---- ablatable fast-path kernel (mirror of _pe_kernel_packed._fast) ----
    def kernel(
        g2x_ref, g2y_ref, g2z_ref, w1m_ref, w2m_ref, cx_ref, cy_ref, cz_ref,
        wx0_ref, wx1_ref, wx2_ref, bx0_ref, bx1_ref, bx2_ref,
        out_ref, *, r1, r2, p_blk, s2, drop,
    ):
        h2 = s2 // 2
        cx = cx_ref[0]
        cy = cy_ref[0]
        cz = cz_ref[0]
        rx = g2x_ref[0, :, :h2] - cx
        ry = g2y_ref[0, :, :h2] - cy
        rz = g2z_ref[0, :, :h2] - cz
        m1 = w1m_ref[0, :, :h2].astype(jnp.float32)
        m2 = w2m_ref[0, :, :h2].astype(jnp.float32)
        if "lrf" in drop:
            l1 = (rx, ry, rz)
            l2 = (rx * 2.0, ry * 2.0, rz * 2.0)
        else:
            l1 = _masked_lrf_block(rx, ry, rz, m1, r1)
            l2 = _masked_lrf_block(rx, ry, rz, m2, r2)
        if "stack" in drop:
            h = (jnp.zeros((12, p_blk * h2), jnp.float32) + rx[0, 0]).astype(jnp.bfloat16)
        else:
            chans = jnp.stack([rx, ry, rz, *l1, rx, ry, rz, *l2], axis=0)
            h = chans.reshape(12, p_blk * h2).astype(jnp.bfloat16)
        if "mlp" in drop:
            h = jnp.broadcast_to(h[:1] * 0.5, (256, p_blk * h2))
        else:
            for W, b in (
                (wx0_ref[...], bx0_ref[...]),
                (wx1_ref[...], bx1_ref[...]),
                (wx2_ref[...], bx2_ref[...]),
            ):
                z = jax.lax.dot_general(
                    W.astype(jnp.bfloat16), h,
                    dimension_numbers=(((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
                h = jnp.maximum(z + b, 0.0).astype(jnp.bfloat16)
        if "pool" in drop:
            out_ref[0] = h[:, :p_blk].astype(jnp.float32).T
        else:
            mb1 = (m1 > 0.0).astype(jnp.bfloat16)
            mb2 = (m2 > 0.0).astype(jnp.bfloat16)
            za = h[:128].reshape(128, p_blk, h2) * mb1[None]
            zb = h[128:].reshape(128, p_blk, h2) * mb2[None]
            f1 = jnp.max(za, axis=2).astype(jnp.float32)
            f2 = jnp.max(zb, axis=2).astype(jnp.float32)
            out_ref[0] = jnp.concatenate([f1, f2], axis=0).T

    p_blk = 64
    S2 = g2[0].shape[-1]
    cx, cy, cz = (pts[..., i].astype(jnp.float32)[..., None] for i in range(3))

    def prep(WA, bA, WB, bB):
        Ws = [
            jnp.concatenate(
                [
                    jnp.concatenate([Wa, jnp.zeros_like(Wb)], axis=1),
                    jnp.concatenate([jnp.zeros_like(Wa), Wb], axis=1),
                ],
                axis=0,
            ).astype(jnp.float32)
            for Wa, Wb in zip(WA, WB)
        ]
        bs = [
            jnp.concatenate([ba.reshape(-1, 1), bb.reshape(-1, 1)], axis=0).astype(jnp.float32)
            for ba, bb in zip(bA, bB)
        ]
        return [*Ws, *bs]

    weights = prep(*folded["mlp1"], *folded["mlp2"])

    interp = jax.default_backend() != "tpu"

    def run_variant(drop):
        blk_s2 = pl.BlockSpec((1, p_blk, S2), lambda b, j: (b, j, 0), memory_space=pltpu.VMEM)
        blk2 = pl.BlockSpec((1, p_blk, 1), lambda b, j: (b, j, 0), memory_space=pltpu.VMEM)
        full = lambda a: pl.BlockSpec(a.shape, lambda b, j: (0,) * a.ndim, memory_space=pltpu.VMEM)
        k = functools.partial(kernel, r1=0.1, r2=0.2, p_blk=p_blk, s2=S2, drop=drop)

        def fn(eps, g2_, w1_, w2_, cx_, cy_, cz_, ws):
            return pl.pallas_call(
                k,
                grid=(2 * B, P // p_blk),
                in_specs=[blk_s2] * 5 + [blk2] * 3 + [full(w) for w in ws],
                out_specs=pl.BlockSpec((1, p_blk, 256), lambda b, j: (b, j, 0), memory_space=pltpu.VMEM),
                out_shape=jax.ShapeDtypeStruct((2 * B, P, 256), jnp.float32),
                interpret=interp,
            )(g2_[0] + eps, g2_[1], g2_[2], w1_, w2_, cx_, cy_, cz_, *ws)

        return fn

    all_drops = [
        (),
        ("lrf",),
        ("stack",),
        ("mlp",),
        ("pool",),
        ("lrf", "stack", "mlp", "pool"),
        ("lrf", "stack", "pool"),
    ]
    only = sys.argv[1] if len(sys.argv) > 1 else None
    results = {}
    for drop in all_drops:
        name = "fast_drop_" + ("+".join(drop) or "none")
        if only is not None and only not in name:
            continue
        if interp:
            out = run_variant(drop)(np.float32(0.0), g2, w1, w2, cx, cy, cz, weights)
            print(name, "ok", np.asarray(out).shape, flush=True)
        else:
            timed_loop(name, run_variant(drop), g2, w1, w2, cx, cy, cz, weights, k=10, results=results)

    print(json.dumps(results))
    with open(osp.join(osp.dirname(__file__), "profile_pe_ablate.json"), "w") as f:
        json.dump(results, f, indent=1)


if __name__ == "__main__":
    main()
