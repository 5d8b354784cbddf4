"""Round-3 TRUE stage attribution: every stage timed via in-jit fori_loop
repetition (benchmarks/_timing.py), which cancels the ~3.5-4 ms axon
dispatch floor that inflated profile_stages.json (round-2). Sub-5 ms
stages are unmeasurable with single-dispatch chaining.

cd /root/repo && python benchmarks/profile_stages_loop.py
"""

from __future__ import annotations

import json
import sys
import time
import os.path as osp

sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))

import numpy as np

RESULTS = {}


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/unopose_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

    from benchmarks._timing import _leaf0, timed_loop
    from __graft_entry__ import _full_inputs
    from unopose_tpu.configs.main_cfg import get_cfg
    from unopose_tpu.models import UNOPose
    from unopose_tpu.models.matching import FinePositionalEncoding
    from unopose_tpu.ops.ball_query import two_scale_group_first_k_packed
    from unopose_tpu.ops.fps import sample_pts_feats_wlrf
    from unopose_tpu.ops.lrf import global_lrf
    from unopose_tpu.ops.solver import compute_coarse_Rt_overlap, compute_fine_Rt_overlap

    B = 16
    cfg = get_cfg()
    model = UNOPose.from_config(cfg.model, dtype=jnp.bfloat16, backbone_dtype=jnp.bfloat16)
    rng = np.random.default_rng(0)
    inputs = _full_inputs(rng, B=B)

    print(f"backend: {jax.default_backend()}", flush=True)
    t0 = time.perf_counter()
    init_fn = jax.jit(
        lambda inp: model.init(
            {"params": jax.random.PRNGKey(0), "sample": jax.random.PRNGKey(1)}, inp, train=False
        )
    )
    variables = init_fn(inputs)
    float(_leaf0(variables))
    print(f"init: {time.perf_counter() - t0:.1f}s", flush=True)

    key = jax.random.PRNGKey(2)
    T = lambda name, fn, *args, k=12: timed_loop(name, fn, *args, k=k, results=RESULTS)

    # ---- full model ----
    # chain eps through EVERY model input, exactly as bench.py CHAIN_KEYS:
    # a pts-only chain lets XLA hoist both loop-invariant ViT branches out
    # of the fori_loop and under-reports by ~25% (profile_loop_modes.py)
    CHAIN_KEYS = ("pts", "rgb", "tem1_rgb", "tem1_pts")

    def full(eps, variables, ins):
        ins = dict(ins)
        for ck in CHAIN_KEYS:
            ins[ck] = ins[ck] + eps.astype(ins[ck].dtype)
        return model.apply(variables, ins, train=False, rngs={"sample": key}, mutable=False)

    T("full_model_B16", full, variables, inputs, k=6)

    # ---- encoder pair ----
    def enc(eps, variables, ins):
        return model.apply(
            variables,
            ins["rgb"] + eps,
            ins["rgb_choose"],
            ins["tem1_rgb"],
            ins["tem1_choose"],
            method=lambda m, a, b, c, d: m.encoder.encode_pair(a, b, c, d),
        )

    T("encoder_pair", enc, variables, inputs, k=8)

    imgs = jnp.concatenate([inputs["rgb"], inputs["tem1_rgb"]], axis=0)

    def vit(eps, variables, imgs):
        return model.apply(
            variables, imgs + eps, False, method=lambda m, x, up: m.encoder.rgb_net(x, upsample=up)
        )

    T("vit_backbone_32imgs", vit, variables, imgs, k=8)

    # ---- geo embedding ----
    pts197 = jnp.asarray(rng.uniform(-1, 1, size=(B, 197, 3)).astype(np.float32))

    def geo(eps, variables, p):
        return model.apply(variables, p + eps, method=lambda m, x: m.geo_embed(x))

    T("geo_embed", geo, variables, pts197)

    # ---- coarse matcher ----
    f196 = jnp.asarray(rng.standard_normal((B, 196, 256)).astype(np.float32))
    geo197 = jnp.asarray(rng.standard_normal((B, 197, 197, 256)).astype(np.float32))

    def coarse(eps, variables, f, g):
        return model.apply(
            variables,
            f + eps,
            g,
            method=lambda m, f_, g_: m.coarse_matching(f_, g_, f_, g_, all_blocks=False),
        )

    T("coarse_matcher", coarse, variables, f196, geo197)

    # ---- fine matcher ----
    p2048 = jnp.asarray(rng.uniform(-1, 1, size=(B, 2048, 3)).astype(np.float32))
    f2048 = jnp.asarray(rng.standard_normal((B, 2048, 256)).astype(np.float32))
    fps_idx = jnp.asarray(rng.integers(0, 2048, size=(B, 196)).astype(np.int32))
    eyeR = jnp.broadcast_to(jnp.eye(3, dtype=jnp.float32), (B, 3, 3))
    zt = jnp.zeros((B, 3), jnp.float32)

    def fine(eps, variables, p, f, g, idx):
        return model.apply(
            variables,
            p + eps,
            f,
            g,
            idx,
            method=lambda m, p_, f_, g_, i_: m.fine_matching(
                p_, f_, g_, i_, p_, f_, g_, i_, eyeR, zt, train=False
            ),
        )

    T("fine_matcher", fine, variables, p2048, f2048, geo197, fps_idx, k=8)

    # ---- fine PE pieces (2B clouds as the fine stage runs them) ----
    pts2b_np = rng.uniform(-1, 1, size=(2 * B, 2048, 3)).astype(np.float32)
    pts2b_np /= np.linalg.norm(pts2b_np, axis=-1, keepdims=True).max(axis=1, keepdims=True)
    pts2b = jnp.asarray(pts2b_np)
    pe = FinePositionalEncoding(out_dim=256, r1=0.1, r2=0.2, nsample1=64, nsample2=256)
    pe_vars = pe.init(jax.random.PRNGKey(0), pts2b, train=False)
    T("pe_total_2B", lambda e, v, p: pe.apply(v, p + e, train=False), pe_vars, pts2b, k=8)
    T(
        "pe_grouping_2B",
        lambda e, p: two_scale_group_first_k_packed(0.1, 64, 0.2, 256, p + e)[1],
        pts2b,
        k=8,
    )

    # ---- solvers ----
    atten197 = jnp.asarray(rng.standard_normal((B, 197, 197)).astype(np.float32))
    score392 = jnp.asarray(rng.uniform(0, 1, size=(B, 392)).astype(np.float32))
    p196 = jnp.asarray(rng.uniform(-1, 1, size=(B, 196, 3)).astype(np.float32))

    def csolve(eps, a, s, p):
        return compute_coarse_Rt_overlap(key, a + eps, s, p, p, None, 6000, 300)[0]

    T("coarse_solver", csolve, atten197, score392, p196)

    atten2049 = jnp.asarray(rng.standard_normal((B, 2049, 2049)).astype(np.float32))
    score4096 = jnp.asarray(rng.uniform(0, 1, size=(B, 4096)).astype(np.float32))

    def fsolve(eps, a, s, p):
        return compute_fine_Rt_overlap(a + eps, s, p, p, None)[0]

    T("fine_solver", fsolve, atten2049, score4096, p2048, k=8)

    def fpslrf(eps, p, f):
        lrf = global_lrf(p + eps)
        return sample_pts_feats_wlrf(p + eps, lrf, f, 196, return_index=True)[0]

    T("fps_lrf", fpslrf, p2048, f2048)

    total_named = sum(v for k, v in RESULTS.items() if not k.startswith(("full_model", "pe_")))
    print(f"\nsum of stages (excl full/pe pieces): {total_named:.1f} ms", flush=True)
    out = osp.join(osp.dirname(osp.abspath(__file__)), "profile_stages_loop.json")
    with open(out, "w") as f:
        json.dump(RESULTS, f, indent=1)
    print(f"wrote {out}", flush=True)


if __name__ == "__main__":
    main()
