"""Stage scouting at the current production config (B=16 pairs).

Times: fused vs einsum ViT attention (via the full ViT pair forward),
geo embedding, coarse matcher+solver, fine fused solver, FPS+LRF.

cd /root/repo && python benchmarks/profile_r4.py
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

    print(f"backend: {jax.default_backend()}", flush=True)
    B = 16
    rng = np.random.default_rng(0)

    # ---- ViT pair: fused attention kernel vs einsum path
    from unopose_tpu.models.vit import make_vit

    imgs = jax.device_put(rng.normal(size=(2 * B, 224, 224, 3)).astype(np.float32))
    vit0 = make_vit("vit_base_patch14_reg4_dinov2", img_size=224, dtype=jnp.bfloat16, fused_attn=False)
    vvars = jax.jit(lambda im: vit0.init(jax.random.PRNGKey(0), im))(imgs[:1])
    for fused in (False, True):
        vit = make_vit("vit_base_patch14_reg4_dinov2", img_size=224, dtype=jnp.bfloat16, fused_attn=fused)

        def vf(eps, vvars, imgs, vit=vit):
            outs, cls = vit.apply(vvars, imgs + eps)
            return cls

        timed(f"ViT pair 32imgs fused_attn={fused}", vf, vvars, imgs, iters=6)

    # equality check between the two attention paths (bf16 softmax vs fp32:
    # expect ~1e-2 max delta on random init — report, don't assert)
    vit_a = make_vit("vit_base_patch14_reg4_dinov2", img_size=224, dtype=jnp.bfloat16, fused_attn=False)
    outs_a, _ = jax.jit(lambda v, im: vit_a.apply(v, im))(vvars, imgs[:2])
    vit_b = make_vit("vit_base_patch14_reg4_dinov2", img_size=224, dtype=jnp.bfloat16, fused_attn=True)
    outs_b, _ = jax.jit(lambda v, im: vit_b.apply(v, im))(vvars, imgs[:2])
    d = max(float(jnp.max(jnp.abs(a.astype(jnp.float32) - b.astype(jnp.float32)))) for a, b in zip(outs_a, outs_b))
    print(f"ViT fused-vs-einsum max|delta| over taps: {d:.2e}", flush=True)
    RESULTS["vit_fused_max_delta"] = d

    # ---- geo embedding (both clouds, 2B batch as in the model)
    from unopose_tpu.models.embedding import GeometricStructureEmbedding

    v = rng.normal(size=(2 * B, 197, 3))
    v /= np.linalg.norm(v, axis=-1, keepdims=True)
    nodes = jax.device_put((0.55 * v).astype(np.float32))
    geo = GeometricStructureEmbedding(
        hidden_dim=256, sigma_d=0.2, sigma_a=15, angle_k=3, reduction_a="max",
        d_index_max=float(2.1 * np.sqrt(3.0) / 0.2), dtype=jnp.bfloat16,
    )
    gvars = geo.init(jax.random.PRNGKey(0), nodes)
    timed("geo embedding 2B batch (production)", lambda eps, n: geo.apply(gvars, n + eps), nodes)

    # ---- coarse solver
    from unopose_tpu.ops.solver import compute_coarse_Rt_overlap

    N1 = N2 = 196
    atten = jax.device_put(rng.normal(size=(B, N1 + 1, N2 + 1)).astype(np.float32))
    score = jax.device_put(rng.uniform(0.2, 1.0, size=(B, N1 + N2)).astype(np.float32))
    p1 = jax.device_put(rng.normal(size=(B, N1, 3)).astype(np.float32) * 0.4)
    p2 = jax.device_put(rng.normal(size=(B, N2, 3)).astype(np.float32) * 0.4)
    key = jax.random.PRNGKey(1)

    def coarse(eps, atten, score, p1, p2):
        return compute_coarse_Rt_overlap(key, atten + eps, score, p1, p2, None, 6000, 300)

    timed("coarse solver (6000/300)", coarse, atten, score, p1, p2)

    # ---- fine fused assignment solver
    from unopose_tpu.ops.assignment_fused import compute_fine_Rt_overlap_fused

    N = 2048
    f1 = jax.device_put(rng.normal(size=(B, N + 1, 256)).astype(np.float32))
    f2 = jax.device_put(rng.normal(size=(B, N + 1, 256)).astype(np.float32))
    sc = jax.device_put(rng.uniform(0.2, 1.0, size=(B, 2 * N)).astype(np.float32))
    d1 = jax.device_put(rng.normal(size=(B, N, 3)).astype(np.float32) * 0.4)
    d2 = jax.device_put(rng.normal(size=(B, N, 3)).astype(np.float32) * 0.4)

    def fine(eps, f1, f2, sc, d1, d2):
        return compute_fine_Rt_overlap_fused(f1 + eps, f2, sc, d1, d2, None, temp=0.1)

    timed("fine fused-assign solver (2048)", fine, f1, f2, sc, d1, d2)

    # ---- FPS + global LRF on dense clouds
    from unopose_tpu.ops.fps import fps
    from unopose_tpu.ops.lrf import global_lrf

    dp = jax.device_put(rng.normal(size=(B, N, 3)).astype(np.float32) * 0.4)

    def fl(eps, dp):
        i = fps(dp + eps, 196)
        l = global_lrf(dp + eps)
        return i.astype(jnp.float32).sum() + l.sum()

    timed("FPS-196 + global LRF (2048 pts)", fl, dp)

    import json

    print(json.dumps(RESULTS))


if __name__ == "__main__":
    main()
