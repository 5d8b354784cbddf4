"""Stage-wise on-chip timing breakdown of the flagship inference path.

Times each major block of the UNOPose forward separately on the real TPU
(encoder pair, geo embedding, coarse matcher, fine matcher, solvers, FPS/LRF)
plus the full model at several instance batch sizes. Prints a table and a
JSON dump so perf rounds have an attribution profile to attack
(VERDICT round-1 item 4).

Timing uses the chained-data-dependency trick from bench.py: the axon relay
backend does not block on block_until_ready, so each iteration folds a
zero-valued scalar from the previous output into one input and a single
final readback fences the whole chain.

Usage: cd /root/repo && python benchmarks/profile_stages.py [--quick]
"""

from __future__ import annotations

import argparse
import json
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


def timed(name, fn, *args, iters=8, warmup=2):
    """fn(eps, *args) -> pytree; eps is a traced f32 scalar the fn must fold
    into at least one input so chained calls serialize on device."""
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
    RESULTS[name] = {"ms": round(dt * 1e3, 2), "compile_s": round(compile_s, 1)}
    print(f"{name:34s} {dt * 1e3:9.2f} ms   (compile {compile_s:.1f}s)", flush=True)
    return dt


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true", help="only the full-model batch sweep")
    ap.add_argument("--no-sweep", action="store_true", help="skip the B32/B64 full-model sweep")
    ap.add_argument("--batch", type=int, default=16)
    args = ap.parse_args()

    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/unopose_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

    from __graft_entry__ import _full_inputs
    from unopose_tpu.configs.main_cfg import get_cfg
    from unopose_tpu.models import UNOPose
    from unopose_tpu.ops.fps import sample_pts_feats_wlrf
    from unopose_tpu.ops.lrf import global_lrf
    from unopose_tpu.ops.solver import compute_coarse_Rt_overlap, compute_fine_Rt_overlap

    B = args.batch
    cfg = get_cfg()
    model = UNOPose.from_config(cfg.model, dtype=jnp.bfloat16, backbone_dtype=jnp.bfloat16)
    rng = np.random.default_rng(0)
    inputs = _full_inputs(rng, B=B)

    print(f"backend: {jax.default_backend()} devices: {jax.devices()}", flush=True)
    t0 = time.perf_counter()
    # jitted init (see bench.py): eager init dispatches thousands of small
    # ops over the axon relay at a ~4.5ms floor each (~9 min)
    init_fn = jax.jit(
        lambda inp: model.init(
            {"params": jax.random.PRNGKey(0), "sample": jax.random.PRNGKey(1)}, inp, train=False
        )
    )
    variables = init_fn(inputs)
    float(_leaf0(variables))
    print(f"init: {time.perf_counter() - t0:.1f}s", flush=True)

    key = jax.random.PRNGKey(2)

    # ---- full model at several batch sizes ----
    def full(eps, variables, ins):
        ins = dict(ins)
        ins["pts"] = ins["pts"] + eps
        return model.apply(variables, ins, train=False, rngs={"sample": key}, mutable=False)

    timed(f"full_model_B{B}", full, variables, inputs)
    if not args.quick and not args.no_sweep:
        for Bs in (32, 64):
            ins = _full_inputs(np.random.default_rng(1), B=Bs)
            dt = timed(f"full_model_B{Bs}", full, variables, ins)
            print(f"  -> {Bs / dt:.1f} pairs/s", flush=True)

    if args.quick:
        _dump()
        return

    # ---- encoder (2xViT pair batch + gathers + FPS template) ----
    def enc(eps, variables, ins):
        return model.apply(
            variables,
            ins["rgb"] + eps,
            ins["rgb_choose"],
            ins["tem1_rgb"],
            ins["tem1_choose"],
            method=lambda m, a, b, c, d: m.encoder.encode_pair(a, b, c, d),
        )

    timed(f"encoder_pair_B{B}", enc, variables, inputs)

    # ---- raw ViT backbone on the 2B image batch ----
    imgs = jnp.concatenate([inputs["rgb"], inputs["tem1_rgb"]], axis=0)

    def vit(eps, variables, imgs):
        return model.apply(
            variables, imgs + eps, False, method=lambda m, x, up: m.encoder.rgb_net(x, upsample=up)
        )

    timed(f"vit_backbone_{2 * B}imgs", vit, variables, imgs)

    # ---- geo embedding on 197 pts ----
    pts197 = jnp.asarray(rng.uniform(-1, 1, size=(B, 197, 3)).astype(np.float32))

    def geo(eps, variables, p):
        return model.apply(variables, p + eps, method=lambda m, x: m.geo_embed(x))

    timed(f"geo_embed_B{B}", geo, variables, pts197)

    # ---- coarse matcher (3 blocks on 197 tokens + RPE) ----
    f196 = jnp.asarray(rng.standard_normal((B, 196, 256)).astype(np.float32))
    geo197 = jnp.asarray(rng.standard_normal((B, 197, 197, 256)).astype(np.float32))

    def coarse(eps, variables, f, g):
        return model.apply(
            variables,
            f + eps,
            g,
            method=lambda m, f_, g_: m.coarse_matching(f_, g_, f_, g_, all_blocks=False),
        )

    timed(f"coarse_matcher_B{B}", coarse, variables, f196, geo197)

    # ---- fine matcher (PE + 3 sparse/dense blocks on 2049 tokens) ----
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

    timed(f"fine_matcher_B{B}", fine, variables, p2048, f2048, geo197, fps_idx)

    # ---- coarse hypothesis solver ----
    atten197 = jnp.asarray(rng.standard_normal((B, 197, 197)).astype(np.float32))
    score392 = jnp.asarray(rng.uniform(0, 1, size=(B, 392)).astype(np.float32))
    p196 = jnp.asarray(rng.uniform(-1, 1, size=(B, 196, 3)).astype(np.float32))

    def csolve(eps, a, s, p):
        return compute_coarse_Rt_overlap(key, a + eps, s, p, p, None, 6000, 300)

    timed(f"coarse_solver_B{B}", csolve, atten197, score392, p196)

    # ---- fine solver (2049^2 dual softmax + WSVD) ----
    atten2049 = jnp.asarray(rng.standard_normal((B, 2049, 2049)).astype(np.float32))
    score4096 = jnp.asarray(rng.uniform(0, 1, size=(B, 4096)).astype(np.float32))

    def fsolve(eps, a, s, p):
        return compute_fine_Rt_overlap(a + eps, s, p, p, None)

    timed(f"fine_solver_B{B}", fsolve, atten2049, score4096, p2048)

    # ---- FPS + LRF preliminaries ----
    def fpslrf(eps, p, f):
        lrf = global_lrf(p + eps)
        return sample_pts_feats_wlrf(p + eps, lrf, f, 196, return_index=True)

    timed(f"fps_lrf_B{B}", fpslrf, p2048, f2048)

    _dump()


def _dump():
    total_named = sum(v["ms"] for k, v in RESULTS.items() if not k.startswith("full_model"))
    print(f"\nsum of stages: {total_named:.1f} ms", flush=True)
    out = osp.join(osp.dirname(osp.abspath(__file__)), "profile_stages.json")
    with open(out, "w") as f:
        json.dump(RESULTS, f, indent=1)
    print(f"wrote {out}", flush=True)


if __name__ == "__main__":
    main()
