"""Full-size converted-checkpoint parity (VERDICT round-1 item 3).

Production matcher dims — 256-d hidden, 3 blocks, 196 coarse nodes,
2048 fine points, PE radii 0.1/0.2 with 64/256 samples — through the whole
matcher chain: geo embedding -> coarse matching -> fine matching (first_k +
parity_gather fp32, the reference-faithful configuration) -> fine solver.
Error compounds with depth and scale; the toy-dim tests in
test_ref_parity.py cannot see that.

Slow (several minutes of torch CPU at 2049-token attention); excluded from
the default suite — run with UNOPOSE_RUN_SLOW=1.
Reference drive: oneref_grf_predator_pose_estimation_model.py:25-76.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax
import jax.numpy as jnp

from tests.ref_stub import import_ref
from tests.test_ref_parity import _rand_rot, _sd_np, detied_cloud, surface_cloud
from unopose_tpu.utils.config import CN
from unopose_tpu.utils.ref_convert import (
    convert_coarse_matching,
    convert_fine_matching,
    convert_geo_embedding,
)

pytestmark = pytest.mark.slow

HID = 256
NBLOCK = 3
NC = 196  # coarse nodes
NF = 2048  # fine points
PE_SCALES_PROD = ((0.1, 64), (0.2, 256))
ATOL = 1e-3


@pytest.fixture(scope="module")
def ref_mods():
    return {
        "transformer": import_ref("core.unopose.model.transformer"),
        "coarse": import_ref("core.unopose.model.oneref_predator_coarse_point_matching"),
        "fine": import_ref("core.unopose.model.oneref_predator_fine_point_matching"),
        "model_utils": import_ref("core.unopose.utils.model_utils"),
    }


@pytest.fixture(scope="module")
def full_setup(ref_mods):
    """Shared inputs + torch modules + converted flax params at prod dims."""
    rng = np.random.default_rng(11)
    B = 1

    init_R = np.stack([_rand_rot(rng) for _ in range(B)])
    init_t = (rng.normal(size=(B, 3)) * 0.05).astype(np.float32)
    align = lambda x: ((x - init_t[:, None, :]) @ init_R).astype(np.float32)
    # fine clouds: every PE-scale LRF sign vote decisive (see test_ref_parity)
    p1 = detied_cloud(rng, B, NF, transform=align, scales=PE_SCALES_PROD)
    p2 = detied_cloud(rng, B, NF, scales=PE_SCALES_PROD)
    f1 = rng.normal(size=(B, NF, HID)).astype(np.float32)
    f2 = rng.normal(size=(B, NF, HID)).astype(np.float32)
    fps1 = np.stack([rng.choice(NF, size=NC, replace=False) for _ in range(B)]).astype(np.int32)
    fps2 = np.stack([rng.choice(NF, size=NC, replace=False) for _ in range(B)]).astype(np.int32)
    sp1 = np.take_along_axis(p1, fps1[..., None], axis=1)  # sparse nodes
    sp2 = np.take_along_axis(p2, fps2[..., None], axis=1)
    bg = np.ones((B, 1, 3), np.float32)
    nodes1 = np.concatenate([bg, sp1], axis=1)  # (B, 197, 3)
    nodes2 = np.concatenate([bg, sp2], axis=1)

    geo_cfg = CN(hidden_dim=HID, sigma_d=0.2, sigma_a=15, angle_k=3, reduction_a="max")
    match_cfg = CN(
        nblock=NBLOCK, input_dim=HID, hidden_dim=HID, out_dim=HID, temp=0.1,
        sim_type="cosine", normalize_feat=True, pe_radius1=0.1, pe_radius2=0.2,
        nsample1=64, nsample2=256, focusing_factor=3, use_lrf=True, use_xyz=True,
        loss_predator_thres=0.15, loss_dis_thres=0.15, nproposal1=6000, nproposal2=300,
    )
    torch.manual_seed(0)
    geo_t = ref_mods["transformer"].GeometricStructureEmbedding(geo_cfg).eval()
    coarse_t = ref_mods["coarse"].CoarsePointMatchingOneRef(match_cfg).eval()
    fine_t = ref_mods["fine"].FinePointMatchingOneRef(match_cfg).eval()

    return dict(
        rng=rng, B=B, init_R=init_R, init_t=init_t, p1=p1, p2=p2, f1=f1, f2=f2,
        fps1=fps1, fps2=fps2, nodes1=nodes1, nodes2=nodes2,
        geo_t=geo_t, coarse_t=coarse_t, fine_t=fine_t, match_cfg=match_cfg,
    )


def _torch_geo(geo_t, nodes):
    with torch.no_grad():
        return geo_t(torch.from_numpy(nodes)).numpy()


def _flax_geo(geo_t, nodes):
    from unopose_tpu.models.embedding import GeometricStructureEmbedding

    fm = GeometricStructureEmbedding(hidden_dim=HID, sigma_d=0.2, sigma_a=15, angle_k=3, reduction_a="max")
    params = convert_geo_embedding(_sd_np(geo_t), prefix="")
    return fm.apply({"params": params}, jnp.asarray(nodes))


def _torch_coarse(s, geo1, geo2, sf1, sf2):
    tm, B, n1 = s["coarse_t"], s["B"], NC
    with torch.no_grad():
        tf1 = tm.in_proj(torch.from_numpy(sf1))
        tf1 = torch.cat([tm.bg_token.repeat(B, 1, 1), tf1], dim=1)
        tf2 = tm.in_proj(torch.from_numpy(sf2))
        tf2 = torch.cat([tm.bg_token.repeat(B, 1, 1), tf2], dim=1)
        tg1, tg2 = torch.from_numpy(geo1), torch.from_numpy(geo2)
        for i in range(NBLOCK):
            tf1, tf2 = tm.transformers[i](tf1, tg1, tf2, tg2)
        scores = tm.score_heads[NBLOCK - 1](torch.cat((tf1, tf2), dim=1))
        atten = import_ref("core.unopose.utils.model_utils").compute_feature_similarity(
            tm.out_proj(tf1), tm.out_proj(tf2), "cosine", 0.1, True
        )
        s1, s2 = scores[:, 1 : n1 + 1], scores[:, n1 + 2 :]
        score = torch.sigmoid(torch.cat((s1, s2), 1).squeeze(-1)).clamp(0, 1)
        return atten.numpy(), score.numpy()


def _torch_fine(s, geo1, geo2):
    tm, B, n = s["fine_t"], s["B"], NF
    with torch.no_grad():
        tp1 = (torch.from_numpy(s["p1"]) - torch.from_numpy(s["init_t"]).unsqueeze(1)) @ torch.from_numpy(s["init_R"])
        tf1 = tm.in_proj(torch.from_numpy(s["f1"])) + tm.PE(tp1)
        tf1 = torch.cat([tm.bg_token.repeat(B, 1, 1), tf1], dim=1)
        tf2 = tm.in_proj(torch.from_numpy(s["f2"])) + tm.PE(torch.from_numpy(s["p2"]))
        tf2 = torch.cat([tm.bg_token.repeat(B, 1, 1), tf2], dim=1)
        tg1, tg2 = torch.from_numpy(geo1), torch.from_numpy(geo2)
        ti1, ti2 = torch.from_numpy(s["fps1"]), torch.from_numpy(s["fps2"])
        for i in range(NBLOCK):
            tf1, tf2 = tm.transformers[i](tf1, tg1, ti1, tf2, tg2, ti2)
        scores = tm.score_heads[NBLOCK - 1](torch.cat((tf1, tf2), dim=1))
        atten = import_ref("core.unopose.utils.model_utils").compute_feature_similarity(
            tm.out_proj(tf1), tm.out_proj(tf2), "cosine", 0.1, True
        )
        s1, s2 = scores[:, 1 : n + 1], scores[:, n + 2 :]
        score = torch.sigmoid(torch.cat((s1, s2), 1).squeeze(-1)).clamp(0, 1)
        return atten.numpy(), score.numpy()


def test_geo_embedding_full_size(full_setup):
    s = full_setup
    for nodes in (s["nodes1"], s["nodes2"]):
        want = _torch_geo(s["geo_t"], nodes)
        got = np.asarray(_flax_geo(s["geo_t"], nodes))
        np.testing.assert_allclose(got, want, atol=ATOL, rtol=0)


def test_coarse_stage_full_size(full_setup):
    from unopose_tpu.models.matching import CoarsePointMatching

    s = full_setup
    sf1 = np.take_along_axis(s["f1"], s["fps1"][..., None], axis=1)
    sf2 = np.take_along_axis(s["f2"], s["fps2"][..., None], axis=1)
    geo1 = _torch_geo(s["geo_t"], s["nodes1"])
    geo2 = _torch_geo(s["geo_t"], s["nodes2"])
    want_atten, want_score = _torch_coarse(s, geo1, geo2, sf1, sf2)

    fm = CoarsePointMatching(nblock=NBLOCK, input_dim=HID, hidden_dim=HID, out_dim=HID, temp=0.1)
    params = convert_coarse_matching(_sd_np(s["coarse_t"]), prefix="", nblock=NBLOCK)
    attens, scores_l, _ = fm.apply(
        {"params": params}, jnp.asarray(sf1), jnp.asarray(geo1), jnp.asarray(sf2), jnp.asarray(geo2),
        all_blocks=False,
    )
    np.testing.assert_allclose(np.asarray(attens[-1]), want_atten, atol=ATOL, rtol=0)
    np.testing.assert_allclose(np.asarray(scores_l[-1]), want_score, atol=ATOL, rtol=0)


def test_fine_stage_and_solver_full_size(full_setup):
    """3 fine blocks at 2048 points in first_k + parity_gather fp32, then
    the deterministic fine solver: final-block atten/score <= 1e-3 and the
    recovered pose within 0.1 deg / 1e-3 of the torch pipeline."""
    from unopose_tpu.models.matching import FinePointMatching
    from unopose_tpu.ops.solver import compute_fine_Rt_overlap

    s = full_setup
    geo1 = _torch_geo(s["geo_t"], s["nodes1"])
    geo2 = _torch_geo(s["geo_t"], s["nodes2"])
    want_atten, want_score = _torch_fine(s, geo1, geo2)

    fm = FinePointMatching(
        nblock=NBLOCK, input_dim=HID, hidden_dim=HID, out_dim=HID, temp=0.1,
        pe_radius1=0.1, pe_radius2=0.2, nsample1=64, nsample2=256,
        focusing_factor=3, parity_gather=True, pe_neighbor_mode="first_k",
    )
    params, stats = convert_fine_matching(_sd_np(s["fine_t"]), prefix="", nblock=NBLOCK)
    attens, scores_l, _, _ = fm.apply(
        {"params": params, "batch_stats": stats},
        jnp.asarray(s["p1"]), jnp.asarray(s["f1"]), jnp.asarray(geo1), jnp.asarray(s["fps1"]),
        jnp.asarray(s["p2"]), jnp.asarray(s["f2"]), jnp.asarray(geo2), jnp.asarray(s["fps2"]),
        jnp.asarray(s["init_R"]), jnp.asarray(s["init_t"]), train=False,
    )
    got_atten = np.asarray(attens[-1])
    got_score = np.asarray(scores_l[-1])
    np.testing.assert_allclose(got_atten, want_atten, atol=ATOL, rtol=0)
    np.testing.assert_allclose(got_score, want_score, atol=ATOL, rtol=0)

    # fine solver on each side's own outputs (reference model_utils.py:527-566)
    mu = import_ref("core.unopose.utils.model_utils")
    with torch.no_grad():
        R_t, t_t, score_t = mu.compute_fine_Rt_overlap(
            torch.from_numpy(want_atten), torch.from_numpy(want_score),
            torch.from_numpy(s["p1"]), torch.from_numpy(s["p2"]),
        )
    R_j, t_j, score_j = compute_fine_Rt_overlap(
        jnp.asarray(got_atten), jnp.asarray(got_score), jnp.asarray(s["p1"]), jnp.asarray(s["p2"])
    )
    R_t, t_t = R_t.numpy(), t_t.numpy()
    R_j, t_j = np.asarray(R_j), np.asarray(t_j)
    # rotation delta in degrees
    cos = np.clip((np.trace(R_t[0].T @ R_j[0]) - 1) / 2, -1, 1)
    assert np.degrees(np.arccos(cos)) <= 0.1, np.degrees(np.arccos(cos))
    assert np.abs(t_t - t_j).max() <= 1e-3, np.abs(t_t - t_j).max()
    np.testing.assert_allclose(np.asarray(score_j), score_t.numpy(), atol=1e-3)
