"""FULL-MODEL production-path accuracy study (round-2 VERDICT item 2).

Compares the EXACT bench.py production configuration — bf16 matchers +
backbone, fused ViT attention + tanh-gelu, fused Pallas geo-RPE table with
int8 embedding storage, packed first_k PE (half-budget fast path), fused
assignment solver — against a reference-faithful configuration (fp32
everywhere, exact erf GELU, unfused XLA attention, exact sinusoid geo
embedding, materialized exact first_k PE, XLA solvers) through the WHOLE
UNOPose forward, ViT included. This covers every deviation the matcher-only
study (study_subset_vs_firstk.py) could not see: tanh-gelu, fused/int8 geo
tables, int16 select payloads, the packed PE kernel and its fast path.

What this study CAN and CANNOT gate (random-init weights — no trained
checkpoint ships in this environment): the coarse stage recovers REAL poses
on these scenes (init_R lands 15-30 deg from GT through the full
ViT -> geo -> matcher -> 6000-hypothesis solver chain), so ``init_*`` deltas
are a true end-to-end numeric gate for the backbone/geo/coarse deviations.
The FINE stage's dual-softmax attention is architecturally diffuse without
training (measured top1-top2 cosine gap ~0.004; every assignment mass falls
below the reference's 0.001 WSVD weight threshold, giving the
identity-pose fallback in BOTH configs) — its kernels all execute here and
``pscore`` (fg-fraction of the fine assignment) is compared, but fine POSE
deltas are gated by the matcher-level study instead
(study_subset_vs_firstk.py STUDY_SET=packed: peaked correlated features
drive the fine solver through its nominal regime).

Method: identical fp32 parameters (one CPU init, saved to disk) + identical
synthetic scenes on both paths. Scene construction: with a RANDOM-INIT
backbone, features of corresponding pixels in two different views are
uncorrelated (the untrained ViT mixes tokens globally — measured cos 0.003
at ground-truth correspondences), so cross-view scenes make every pose
degenerate. Instead both crops are the SAME camera view (identical images
-> identical feature maps; query points sample the template's own pixels,
so matches are exact-by-construction with realistic projection-collision
outliers) while the query CLOUD is expressed in a rotated+translated
frame — the matchers see strong assignments and the solvers must recover
a real non-identity SE(3) pose, which both configs are then compared on.
parity_gather is held equal across configs (a checkpoint-compat semantic
axis, not a numeric one).

The faithful path runs in a CPU subprocess (true fp32 matmuls — on TPU,
default-precision fp32 matmuls truncate to bf16, and the module's
backend gates would engage the TPU kernels); the production path runs on
the real chip. Reported deltas therefore bound ALL of: kernel vs XLA,
bf16/int8/int16 quantization, and backend differences.

cd /root/repo && python benchmarks/study_production_path.py
(orchestrates the subprocesses; ~15 min. Results -> SUBSET_STUDY.md.)

Reference anchor for the faithful semantics: fp32 defaults,
/root/reference/configs/main_cfg.py:78-88.
"""

from __future__ import annotations

import argparse
import json
import os
import os.path as osp
import subprocess
import sys
import time

import numpy as np

sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))

WORK = os.environ.get("UNOPOSE_STUDY_WORK", "/tmp/unopose_study_prod")
B = 4
REPS = int(os.environ.get("STUDY_REPS", "26"))  # 104 pairs
SEED = 20260819


# ---------------------------------------------------------------- scenes ---
def _surface_cloud(rng, b, n, scale=0.08):
    # corner TRIPOD: three orthogonal tube "fingers" of distinct lengths and
    # radii. The coarse solver scores hypotheses by nearest-model-point
    # distance with a 0.15 (LRF-normalized) inlier band, so any rotational
    # near-symmetry makes the top-300 selection multi-modal and the chosen
    # pose chaotic under ulp-level numeric differences (measured 70-160 deg
    # config deltas on star-shaped and bulged-ellipsoid surfaces — ~180 deg
    # flips score within noise of the true pose there). A tripod admits no
    # nontrivial self-mapping: any flip mismatches a whole finger, far
    # beyond the inlier band.
    lens = np.array([1.0, 0.62, 0.34], np.float32)
    rads = np.array([0.16, 0.12, 0.09], np.float32)
    axis = rng.integers(0, 3, size=(b, n))
    s = rng.uniform(0, 1, size=(b, n)).astype(np.float32) * lens[axis]
    th = rng.uniform(0, 2 * np.pi, size=(b, n)).astype(np.float32)
    rr = rads[axis]
    p = np.zeros((b, n, 3), np.float32)
    for a in range(3):
        m = axis == a
        u = (a + 1) % 3
        w = (a + 2) % 3
        p[..., a][m] = s[m]
        p[..., u][m] = rr[m] * np.cos(th[m])
        p[..., w][m] = rr[m] * np.sin(th[m])
    return (p * scale + rng.normal(size=(b, n, 3)) * 2e-4).astype(np.float32)


def _rand_rot(rng):
    q = rng.normal(size=4)
    q /= np.linalg.norm(q)
    w, x, y, z = q
    return np.array(
        [
            [1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y)],
            [2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x)],
            [2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y)],
        ],
        np.float32,
    )


def _texture(p):
    """Smooth 3-channel band-limited texture of 3D coords, in [-1, 1]."""
    s = 1.0 / 0.08  # feature scale relative to the cloud size
    return np.stack(
        [
            np.sin(3.7 * s * p[..., 0]) * np.cos(2.3 * s * p[..., 1]),
            np.sin(2.9 * s * p[..., 1]) * np.cos(3.1 * s * p[..., 2]),
            np.sin(4.1 * s * p[..., 2]) * np.cos(1.9 * s * p[..., 0]),
        ],
        -1,
    ).astype(np.float32)


def _project(p, img):
    """Orthographic (x, y) -> flat pixel indices, per cloud."""
    lo = p[..., :2].min(axis=1, keepdims=True)
    hi = p[..., :2].max(axis=1, keepdims=True)
    uv = (p[..., :2] - lo) / (hi - lo + 1e-9)
    px = np.clip(np.round(uv[..., 0] * (img - 1)), 0, img - 1)
    py = np.clip(np.round(uv[..., 1] * (img - 1)), 0, img - 1)
    return (py * img + px).astype(np.int32)


def _fps_np(p, m):
    """Batched numpy FPS, start index 0 — same semantics as ops/fps.fps."""
    b, n, _ = p.shape
    idx = np.zeros((b, m), np.int64)
    d = ((p - p[:, :1]) ** 2).sum(-1)  # (b, n)
    for i in range(1, m):
        idx[:, i] = d.argmax(axis=1)
        picked = np.take_along_axis(p, idx[:, i][:, None, None], 1)
        d = np.minimum(d, ((p - picked) ** 2).sum(-1))
    return idx


def scene_batch(rng, b, img=224, nq=2048, nt=5000):
    tem = _surface_cloud(rng, b, nt)
    # query cloud = the template's OWN encoder-FPS subset: FPS is a function
    # of pairwise distances + start index, so the model's FPS-196 node
    # selection is IDENTICAL on both clouds — coarse nodes correspond 1:1
    # and carry equal (same-pixel) features. A random subset instead leaves
    # node features ~uncorrelated under a random-init backbone (its feature
    # map is only ~4-14 px smooth; FPS node spacing is larger).
    sel = _fps_np(tem, nq)
    R_gt = np.stack([_rand_rot(rng) for _ in range(b)])
    t_gt = (rng.normal(size=(b, 3)) * 0.02).astype(np.float32)
    # query cloud = same-view samples of the template surface, expressed in
    # a rotated+translated frame (see module docstring)
    q = (
        np.einsum("bij,bnj->bni", R_gt, np.take_along_axis(tem, sel[..., None], 1))
        + t_gt[:, None]
        + rng.normal(size=(b, nq, 3)).astype(np.float32) * 2e-4
    ).astype(np.float32)

    tem_tex = _texture(tem)
    tem_choose = _project(tem, img)
    # query pixels = the source template points' pixels (same camera view)
    q_choose = np.take_along_axis(tem_choose, sel, axis=1)

    # full-range iid background: high per-patch variance makes the random
    # backbone's feature map pixel-specific (smaller common mode), widening
    # the matched-vs-unmatched cosine gap the dual-softmax needs
    flat = rng.uniform(-1, 1, size=(b, img * img, 3)).astype(np.float32)
    np.put_along_axis(flat, tem_choose[..., None], tem_tex, axis=1)
    crop = flat.reshape(b, img, img, 3)

    inputs = dict(
        rgb=crop,
        rgb_choose=q_choose,
        pts=q,
        tem1_rgb=crop,
        tem1_choose=tem_choose,
        tem1_pts=tem,
    )
    return inputs, R_gt, t_gt


# ---------------------------------------------------------------- models ---
def build_model(config: str):
    import jax.numpy as jnp

    from unopose_tpu.configs.main_cfg import get_cfg
    from unopose_tpu.models import UNOPose

    cfg = get_cfg()
    if config == "production":
        return UNOPose.from_config(cfg.model, dtype=jnp.bfloat16, backbone_dtype=jnp.bfloat16)
    if config == "production_int8":
        cfg.model.feature_extraction.int8_gemm = True
        return UNOPose.from_config(cfg.model, dtype=jnp.bfloat16, backbone_dtype=jnp.bfloat16)
    if config == "faithful":
        cfg.model.geo_embedding.fused_table = 0
        cfg.model.geo_embedding.quant_int8 = False
        cfg.model.fine_point_matching.pe_packed = False
        cfg.model.feature_extraction.fused_attn = False
        cfg.model.fused_assignment = False
        return UNOPose.from_config(cfg.model, dtype=jnp.float32, backbone_dtype=jnp.float32)
    raise ValueError(config)


def role_gen_params():
    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp  # noqa: F401

    model = build_model("faithful")
    rng = np.random.default_rng(SEED)
    inputs, _, _ = scene_batch(rng, 2)
    inputs = {k: jnp.asarray(v) for k, v in inputs.items()}
    variables = jax.jit(
        lambda i: model.init({"params": jax.random.PRNGKey(0), "sample": jax.random.PRNGKey(1)}, i, train=False)
    )(inputs)
    leaves = jax.tree_util.tree_leaves(variables)
    np.savez(osp.join(WORK, "params.npz"), *[np.asarray(l) for l in leaves])
    print(f"saved {len(leaves)} param leaves", flush=True)


def _load_variables(model, inputs):
    import jax

    shapes = jax.eval_shape(
        lambda i: model.init({"params": jax.random.PRNGKey(0), "sample": jax.random.PRNGKey(1)}, i, train=False),
        inputs,
    )
    treedef = jax.tree_util.tree_structure(shapes)
    with np.load(osp.join(WORK, "params.npz")) as z:
        leaves = [z[f"arr_{i}"] for i in range(len(z.files))]
    want = jax.tree_util.tree_leaves(shapes)
    assert len(leaves) == len(want), (len(leaves), len(want))
    for got, exp in zip(leaves, want):
        assert got.shape == exp.shape, (got.shape, exp.shape)
    return jax.tree_util.tree_unflatten(treedef, leaves)


def role_run(config: str, device: str):
    import jax

    if device == "cpu":
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir", "/tmp/unopose_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

    assert jax.default_backend() == ("cpu" if device == "cpu" else "tpu"), jax.default_backend()
    model = build_model(config)
    rng = np.random.default_rng(SEED)
    probe, _, _ = scene_batch(rng, B)
    probe = {k: jnp.asarray(v) for k, v in probe.items()}
    variables = _load_variables(model, probe)

    @jax.jit
    def fwd(v, i, k):
        out = model.apply(
            v, i, train=False, rngs={"sample": k}, mutable=False, return_intermediates=True
        )
        # deterministic tensor-level taps (the pose solvers SAMPLE hypotheses
        # by inverse-CDF over a cumsum, so an ulp-level numeric difference
        # legitimately reshuffles every sampled index — poses are compared
        # distributionally, tensors exactly):
        #   coarse_atten: ViT -> geo embedding -> coarse blocks, end to end
        #   fine_scores:  + PE + fine sparse/dense blocks (available in the
        #                 fused-assignment production path too)
        keep = {
            k_: out[k_]
            for k_ in ("pred_R", "pred_t", "pred_pose_score", "init_R", "init_t", "fine_wsvd_max_w")
        }
        keep["coarse_atten"] = out["coarse_attens"][-1].astype(jnp.float32)
        keep["coarse_scores"] = out["coarse_scores"][-1].astype(jnp.float32)
        keep["fine_scores"] = out["fine_scores"][-1].astype(jnp.float32)
        return keep

    outs = None
    rng = np.random.default_rng(SEED)  # reset: identical scenes in every role
    gts = {"R_gt": [], "t_gt": []}
    t0 = time.perf_counter()
    for rep in range(REPS):
        inputs, R_gt, t_gt = scene_batch(rng, B)
        inputs = {k: jnp.asarray(v) for k, v in inputs.items()}
        out = fwd(variables, inputs, jax.random.PRNGKey(1000 + rep))
        if outs is None:
            outs = {k: [] for k in out}
        for k in outs:
            outs[k].append(np.asarray(out[k], np.float32))
        gts["R_gt"].append(R_gt)
        gts["t_gt"].append(t_gt)
        print(f"[{config}] rep {rep + 1}/{REPS} ({time.perf_counter() - t0:.0f}s)", flush=True)
    np.savez(
        osp.join(WORK, f"out_{config}.npz"),
        **{k: np.concatenate(v) for k, v in outs.items()},
        **{k: np.concatenate(v) for k, v in gts.items()},
    )


def _rot_err_deg(Ra, Rb):
    cos = np.clip((np.einsum("bii->b", np.einsum("bij,bik->bjk", Ra, Rb)) - 1) / 2, -1, 1)
    return np.degrees(np.arccos(cos))


def role_compare(configs):
    ref = np.load(osp.join(WORK, "out_faithful.npz"))
    out = {"n_pairs": int(ref["pred_R"].shape[0]), "configs": {}}

    def stats_of(v):
        v = np.asarray(v)
        return dict(mean=float(v.mean()), median=float(np.median(v)), p95=float(np.percentile(v, 95)), max=float(v.max()))

    # solver outputs are compared DISTRIBUTIONALLY vs GT (see fwd() note)
    out["init_vs_gt"] = {
        "faithful": stats_of(_rot_err_deg(ref["init_R"], ref["R_gt"])),
    }
    for c in configs:
        if c == "faithful" or not osp.exists(osp.join(WORK, f"out_{c}.npz")):
            continue
        got = np.load(osp.join(WORK, f"out_{c}.npz"))
        rel = lambda k: np.abs(got[k] - ref[k]).reshape(got[k].shape[0], -1).max(1) / (
            np.abs(ref[k]).reshape(ref[k].shape[0], -1).max(1) + 1e-9
        )
        out["init_vs_gt"][c] = stats_of(_rot_err_deg(got["init_R"], got["R_gt"]))
        # vacuousness gate (VERDICT r4 weak #3): the fine WSVD ran in its
        # nominal regime only where the max pre-threshold row weight clears
        # the reference's 0.001 cutoff; final-pose deltas restricted to the
        # pairs where BOTH configs ran nominally are a REAL fine-stage gate
        nominal = (got["fine_wsvd_max_w"] > 1e-3) & (ref["fine_wsvd_max_w"] > 1e-3)
        fine_rot = _rot_err_deg(got["pred_R"], ref["pred_R"])
        fine_tr = np.linalg.norm(got["pred_t"] - ref["pred_t"], axis=1)
        out["configs"][c] = {
            "wsvd_nominal_frac": {
                "faithful": float((ref["fine_wsvd_max_w"] > 1e-3).mean()),
                c: float((got["fine_wsvd_max_w"] > 1e-3).mean()),
                "both": float(nominal.mean()),
            },
            "final_rot_delta_deg_nominal": (stats_of(fine_rot[nominal]) if nominal.any() else None),
            "final_trans_delta_nominal": (stats_of(fine_tr[nominal]) if nominal.any() else None),
            # deterministic tensor gates (per-pair max-abs delta, relative
            # to the tensor's own max magnitude)
            "coarse_atten_rel": stats_of(rel("coarse_atten")),
            "coarse_scores_abs": stats_of(np.abs(got["coarse_scores"] - ref["coarse_scores"]).max(1)),
            "fine_scores_abs": stats_of(np.abs(got["fine_scores"] - ref["fine_scores"]).max(1)),
            "pscore": stats_of(np.abs(got["pred_pose_score"] - ref["pred_pose_score"])),
            # sampled-solver outputs: agreement of quality, not of bits
            "init_rot_delta_deg": stats_of(_rot_err_deg(got["init_R"], ref["init_R"])),
            "final_rot_delta_deg": stats_of(_rot_err_deg(got["pred_R"], ref["pred_R"])),
            "final_trans_delta": stats_of(np.linalg.norm(got["pred_t"] - ref["pred_t"], axis=1)),
        }
    print(json.dumps(out, indent=2))
    with open(osp.join(WORK, "summary.json"), "w") as f:
        json.dump(out, f, indent=2)
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--role", default="orchestrate")
    ap.add_argument("--config", default="production")
    ap.add_argument("--device", default="tpu")
    args = ap.parse_args()
    os.makedirs(WORK, exist_ok=True)

    if args.role == "gen-params":
        return role_gen_params()
    if args.role == "run":
        return role_run(args.config, args.device)
    if args.role == "compare":
        return role_compare(["faithful", "production", "production_int8"])

    # orchestrate
    me = osp.abspath(__file__)

    def sub(*extra):
        r = subprocess.run([sys.executable, me, *extra])
        if r.returncode != 0:
            raise RuntimeError(f"subprocess {extra} failed rc={r.returncode}")

    if not osp.exists(osp.join(WORK, "params.npz")):
        sub("--role", "gen-params")
    sub("--role", "run", "--config", "faithful", "--device", "cpu")
    sub("--role", "run", "--config", "production", "--device", "tpu")
    sub("--role", "run", "--config", "production_int8", "--device", "tpu")
    sub("--role", "compare")


if __name__ == "__main__":
    main()
