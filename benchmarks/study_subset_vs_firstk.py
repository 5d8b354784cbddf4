"""Accuracy bridge study: production fast PE config vs reference-faithful
config on converted weights (VERDICT round-1 item 4).

Configurations compared on the SAME converted reference fine-matching
weights (random-init reference module -> convert_fine_matching; no trained
checkpoint ships in this environment, so the weight distribution — not the
trained values — is what the study can use; documented limitation):

  faithful:   pe_neighbor_mode='first_k', parity_gather=True, fp32
              (exact reference semantics, ball_query_gpu.cu:14-49)
  subset:     pe_neighbor_mode='subset', fp32
              (isolates the neighbor-subset choice)
  production: pe_neighbor_mode='subset', bf16 matcher dtype
              (the bench.py configuration)

Per pair: PE(p2) feature delta, final-block atten/score deltas, and the
fine-solver pose delta (deg / normalized trans) + pose-score delta vs the
faithful configuration. Run on CPU fp32/bf16; >= 100 synthetic
depth-surface pairs. Prints one JSON line; numbers go into
benchmarks/SUBSET_STUDY.md.
"""

import json
import os
import os.path as osp
import sys
import time

import numpy as np

sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir", "/tmp/unopose_test_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

import jax.numpy as jnp

HID = 256
NBLOCK = 3
NF = 2048
NC = 196
B = 4
REPS = 26  # 104 pairs


def surface_cloud(rng, b, n, scale=0.5):
    v = rng.normal(size=(b, n, 3))
    v /= np.linalg.norm(v, axis=-1, keepdims=True)
    r = scale * (1.0 + 0.2 * np.sin(3 * v[..., 0:1]) * np.cos(4 * v[..., 1:2]))
    return (r * v + rng.normal(size=(b, n, 3)) * 2e-3).astype(np.float32)


def rand_rot(rng):
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


def main():
    import torch

    sys.path.insert(0, osp.join(osp.dirname(osp.abspath(__file__)), "..", "tests"))
    from ref_stub import import_ref

    from unopose_tpu.models.embedding import GeometricStructureEmbedding
    from unopose_tpu.models.matching import FinePointMatching, FinePositionalEncoding
    from unopose_tpu.ops.solver import compute_fine_Rt_overlap
    from unopose_tpu.utils.config import CN
    from unopose_tpu.utils.ref_convert import convert_fine_matching, convert_fine_pe, convert_geo_embedding

    fine_mod = import_ref("core.unopose.model.oneref_predator_fine_point_matching")
    trans_mod = import_ref("core.unopose.model.transformer")

    match_cfg = CN(
        nblock=NBLOCK, input_dim=HID, hidden_dim=HID, out_dim=HID, temp=0.1,
        sim_type="cosine", normalize_feat=True, pe_radius1=0.1, pe_radius2=0.2,
        nsample1=64, nsample2=256, focusing_factor=3, use_lrf=True, use_xyz=True,
        loss_predator_thres=0.15, loss_dis_thres=0.15,
    )
    torch.manual_seed(3)
    tm = fine_mod.FinePointMatchingOneRef(match_cfg).eval()
    sd = {k: v.detach().numpy() for k, v in tm.state_dict().items()}
    params, stats = convert_fine_matching(sd, prefix="", nblock=NBLOCK)
    pe_params, pe_stats = convert_fine_pe(sd, prefix="PE.")

    geo_t = trans_mod.GeometricStructureEmbedding(
        CN(hidden_dim=HID, sigma_d=0.2, sigma_a=15, angle_k=3, reduction_a="max")
    ).eval()
    geo_params = convert_geo_embedding({k: v.detach().numpy() for k, v in geo_t.state_dict().items()}, prefix="")
    geo_fm = GeometricStructureEmbedding(hidden_dim=HID, sigma_d=0.2, sigma_a=15, angle_k=3, reduction_a="max")

    def make_cfg(mode, dtype, packed=False):
        # parity_gather=True everywhere: the study isolates the neighbor-mode
        # and dtype axes; all configs use the converted-checkpoint gather
        return FinePointMatching(
            nblock=NBLOCK, input_dim=HID, hidden_dim=HID, out_dim=HID, temp=0.1,
            pe_radius1=0.1, pe_radius2=0.2, nsample1=64, nsample2=256, focusing_factor=3,
            parity_gather=True, pe_neighbor_mode=mode, dtype=dtype, pe_packed=packed,
        )

    # STUDY_SET=packed reruns only the first_k axes incl. the packed path
    # (scale-1 as multiset weights on scale 2's slots — the round-2
    # production grouping); the full set reproduces the original study.
    study_set = os.environ.get("STUDY_SET", "full")
    modes = {
        "faithful": make_cfg("first_k", jnp.float32),
        "subset_fp32": make_cfg("subset", jnp.float32),
        "subset_bf16": make_cfg("subset", jnp.bfloat16),
        "first_k_bf16": make_cfg("first_k", jnp.bfloat16),
        "first_k_packed": make_cfg("first_k", jnp.bfloat16, packed=None),
    }
    pe_modes = {
        "faithful": FinePositionalEncoding(out_dim=HID, r1=0.1, r2=0.2, nsample1=64, nsample2=256,
                                           neighbor_mode="first_k", packed=False),
        "subset_fp32": FinePositionalEncoding(out_dim=HID, r1=0.1, r2=0.2, nsample1=64, nsample2=256,
                                              neighbor_mode="subset"),
        "subset_bf16": FinePositionalEncoding(out_dim=HID, r1=0.1, r2=0.2, nsample1=64, nsample2=256,
                                              neighbor_mode="subset", compute_dtype=jnp.bfloat16),
        "first_k_bf16": FinePositionalEncoding(out_dim=HID, r1=0.1, r2=0.2, nsample1=64, nsample2=256,
                                               neighbor_mode="first_k", compute_dtype=jnp.bfloat16, packed=False),
        "first_k_packed": FinePositionalEncoding(out_dim=HID, r1=0.1, r2=0.2, nsample1=64, nsample2=256,
                                                 neighbor_mode="first_k", compute_dtype=jnp.bfloat16),
    }
    if study_set == "packed":
        keep = ("faithful", "first_k_bf16", "first_k_packed")
        modes = {k: v for k, v in modes.items() if k in keep}
        pe_modes = {k: v for k, v in pe_modes.items() if k in keep}

    pe_fns = {
        name: jax.jit(lambda p2, m=m: m.apply({"params": pe_params, "batch_stats": pe_stats}, p2, train=False))
        for name, m in pe_modes.items()
    }

    def fine_fn(m):
        @jax.jit
        def f(p1, f1, geo1, fps1, p2, f2, geo2, fps2, iR, it):
            attens, scores, _, _ = m.apply(
                {"params": params, "batch_stats": stats},
                p1, f1, geo1, fps1, p2, f2, geo2, fps2, iR, it, train=False,
            )
            return attens[-1].astype(jnp.float32), scores[-1].astype(jnp.float32)

        return f

    fine_fns = {name: fine_fn(m) for name, m in modes.items()}
    geo_fn = jax.jit(lambda nodes: geo_fm.apply({"params": geo_params}, nodes))
    solver = jax.jit(compute_fine_Rt_overlap)

    rng = np.random.default_rng(17)
    acc = {name: dict(pe=[], atten=[], score=[], rot=[], trans=[], pscore=[]) for name in modes if name != "faithful"}
    t0 = time.perf_counter()
    for rep in range(REPS):
        iR = np.stack([rand_rot(rng) for _ in range(B)])
        it = (rng.normal(size=(B, 3)) * 0.05).astype(np.float32)
        p2 = surface_cloud(rng, B, NF)
        # p1: transformed partial-overlap view of p2 + noise
        sel = rng.integers(0, NF, size=(B, NF))
        base = np.take_along_axis(p2, sel[..., None], axis=1)
        p1 = (np.einsum("bij,bnj->bni", iR, base + rng.normal(size=(B, NF, 3)).astype(np.float32) * 0.01) + it[:, None]).astype(np.float32)
        # correlated features: f1 ~ f2 at the GT correspondence + noise, so
        # the dual-softmax assignment has real structure and the solver's
        # mutual-argmax weights are populated (uncorrelated features leave
        # zero mutual matches -> a degenerate, input-independent pose)
        f2 = rng.normal(size=(B, NF, HID)).astype(np.float32)
        f1 = (np.take_along_axis(f2, sel[..., None], axis=1) + rng.normal(size=(B, NF, HID)) * 0.3).astype(np.float32)
        fps1 = np.stack([rng.choice(NF, size=NC, replace=False) for _ in range(B)]).astype(np.int32)
        fps2 = np.stack([rng.choice(NF, size=NC, replace=False) for _ in range(B)]).astype(np.int32)
        bg = np.ones((B, 1, 3), np.float32)
        geo1 = geo_fn(jnp.asarray(np.concatenate([bg, np.take_along_axis(p1, fps1[..., None], 1)], 1)))
        geo2 = geo_fn(jnp.asarray(np.concatenate([bg, np.take_along_axis(p2, fps2[..., None], 1)], 1)))

        outs = {}
        for name, f in fine_fns.items():
            atten, score = f(jnp.asarray(p1), jnp.asarray(f1), geo1, jnp.asarray(fps1),
                             jnp.asarray(p2), jnp.asarray(f2), geo2, jnp.asarray(fps2),
                             jnp.asarray(iR), jnp.asarray(it))
            R, t, ps = solver(atten, score, jnp.asarray(p1), jnp.asarray(p2))
            pe = pe_fns[name](jnp.asarray(p2)).astype(jnp.float32)
            outs[name] = (np.asarray(atten), np.asarray(score), np.asarray(R), np.asarray(t),
                          np.asarray(ps), np.asarray(pe))

        ref = outs["faithful"]
        for name in acc:
            a, s, R, t, ps, pe = outs[name]
            ra, rs, rR, rt, rps, rpe = ref
            acc[name]["pe"].extend(
                (np.linalg.norm((pe - rpe).reshape(B, -1), axis=1) / (np.linalg.norm(rpe.reshape(B, -1), axis=1) + 1e-9)).tolist()
            )
            acc[name]["atten"].extend(np.abs(a - ra).max((1, 2)).tolist())
            acc[name]["score"].extend(np.abs(s - rs).max(1).tolist())
            cos = np.clip((np.einsum("bii->b", np.einsum("bij,bik->bjk", rR, R)) - 1) / 2, -1, 1)
            acc[name]["rot"].extend(np.degrees(np.arccos(cos)).tolist())
            acc[name]["trans"].extend(np.linalg.norm(t - rt, axis=1).tolist())
            acc[name]["pscore"].extend(np.abs(ps - rps).tolist())
        print(f"rep {rep + 1}/{REPS} ({time.perf_counter() - t0:.0f}s)", file=sys.stderr)

    def stats_of(v):
        v = np.asarray(v)
        return dict(mean=float(v.mean()), median=float(np.median(v)), p95=float(np.percentile(v, 95)),
                    max=float(v.max()))

    out = {
        "n_pairs": REPS * B,
        "configs": {name: {k: stats_of(v) for k, v in d.items()} for name, d in acc.items()},
    }
    print(json.dumps(out, indent=2))
    return out


if __name__ == "__main__":
    main()
