"""Golden numeric parity: reference torch modules vs flax modules with
CONVERTED weights (utils/ref_convert.py).

The reference modules are imported from /root/reference via tests/ref_stub.py
(CPU stubs for the CUDA extension). Each test builds a randomly initialized
torch module, converts its state_dict with the production converter, and
checks flax forward outputs against the torch forward at <= 1e-3.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax
import jax.numpy as jnp

from tests.ref_stub import import_ref
from unopose_tpu.utils.config import CN
from unopose_tpu.utils.ref_convert import (
    convert_coarse_matching,
    convert_fine_matching,
    convert_geo_embedding,
    convert_unopose_state_dict,
)

HID = 64  # 4 heads x 16
ATOL = 1e-3


def _sd_np(module):
    return {k: v.detach().numpy() for k, v in module.state_dict().items()}


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
        dtype=np.float32,
    )


def surface_cloud(rng, B, n, scale=0.5):
    """Sphere shell + jitter: depth-map-like local geometry with a clear
    eigengap (locally planar neighborhoods). On isotropic Gaussian clouds
    the smallest eigenvector is ill-conditioned and torch.svd / the
    closed-form solver legitimately disagree."""
    v = rng.normal(size=(B, n, 3))
    v /= np.linalg.norm(v, axis=-1, keepdims=True)
    return (scale * v + rng.normal(size=(B, n, 3)) * 3e-4).astype(np.float32)


PE_SCALES = ((0.3, 8), (0.6, 16))


def _vote_ties(pts: np.ndarray, scales=PE_SCALES) -> np.ndarray:
    """Points whose LRF sign vote (model_utils.py:791-794: count of neighbor
    projections on the smallest eigenvector beyond +-1e-3, either side) TIES
    at any PE scale. A tied vote leaves the frame's sign at the raw
    eigenvector's — which is arbitrary in torch.svd itself (LAPACK/CUDA
    dependent), so the reference is not reproducible at those points and
    parity tests must avoid them. The tie mask is solver-independent
    (projections differ only ~1e-7 between solvers)."""
    from unopose_tpu.ops.ball_query import two_scale_group_exact_planar

    import jax.numpy as jnp

    (r1, k1), (r2, k2) = scales
    g1, g2 = two_scale_group_exact_planar(r1, k1, r2, k2, jnp.asarray(pts))
    ties = np.zeros(pts.shape[:2], bool)
    for grouped in (g1, g2):
        rel = np.stack([np.asarray(g) for g in grouped], axis=-1) - pts[:, :, None, :]  # (B,P,S,3)
        cov = np.einsum("bpsi,bpsj->bpij", rel, rel) / rel.shape[2]
        w, V = np.linalg.eigh(cov)
        z = V[..., 0]  # smallest eigenvector
        cp = -np.einsum("bpsi,bpi->bps", rel, z)
        vote = (cp > 1e-3).sum(-1) - (cp < -1e-3).sum(-1)
        ties |= vote == 0
    return ties


def detied_cloud(rng, B, n, transform=None, max_rounds=80, scales=PE_SCALES):
    """Sphere cloud where every PE-scale LRF vote is decisive (in the
    ``transform``-ed frame if given): tied points are resampled until the
    mask clears — deterministic under the seeded rng."""
    pts = surface_cloud(rng, B, n)
    for _ in range(max_rounds):
        q = pts if transform is None else transform(pts)
        ties = _vote_ties(q, scales=scales)
        if not ties.any():
            return pts
        fresh = surface_cloud(rng, 1, int(ties.sum()))[0]
        pts = pts.copy()
        pts[ties] = fresh
    raise AssertionError("could not build a tie-free cloud")


@pytest.fixture(scope="module")
def ref_mods():
    return {
        "transformer": import_ref("core.unopose.model.transformer"),
        "coarse": import_ref("core.unopose.model.oneref_predator_coarse_point_matching"),
        "fine": import_ref("core.unopose.model.oneref_predator_fine_point_matching"),
        "model_utils": import_ref("core.unopose.utils.model_utils"),
    }


def test_geo_embedding_parity(ref_mods, rng):
    """Covers the sin/cos interleave->concat permutation of proj_d/proj_a."""
    from unopose_tpu.models.embedding import GeometricStructureEmbedding

    cfg = CN(hidden_dim=HID, sigma_d=0.2, sigma_a=15, angle_k=3, reduction_a="max")
    tm = ref_mods["transformer"].GeometricStructureEmbedding(cfg).eval()
    pts = rng.normal(size=(2, 18, 3)).astype(np.float32)
    with torch.no_grad():
        want = tm(torch.from_numpy(pts)).numpy()

    fm = GeometricStructureEmbedding(hidden_dim=HID, sigma_d=0.2, sigma_a=15, angle_k=3, reduction_a="max")
    params = convert_geo_embedding(_sd_np(tm), prefix="")
    got = np.asarray(fm.apply({"params": params}, jnp.asarray(pts)))
    np.testing.assert_allclose(got, want, atol=ATOL, rtol=0)


def test_geo_embedding_production_path_parity(ref_mods, rng):
    """The PRODUCTION embedding configuration — fused Pallas table path +
    int8 storage, knobs read from configs/main_cfg.py, NOT re-stated here —
    matches the torch reference within the documented table (~2e-4) +
    quantization (half a per-channel int8 step) budget. Guards the round-2
    gap where golden parity ran the exact fp32 path while bench.py ran the
    fused int8 one (VERDICT weak #3)."""
    from unopose_tpu.configs.main_cfg import get_cfg
    from unopose_tpu.models.embedding import GeometricStructureEmbedding

    ge_cfg = get_cfg().model.geo_embedding
    assert ge_cfg.fused_table and ge_cfg.quant_int8  # production = fused int8
    sigma_d = float(ge_cfg.sigma_d)

    cfg = CN(hidden_dim=HID, sigma_d=sigma_d, sigma_a=ge_cfg.sigma_a,
             angle_k=ge_cfg.angle_k, reduction_a=ge_cfg.reduction_a)
    tm = ref_mods["transformer"].GeometricStructureEmbedding(cfg).eval()
    # LRF-normalized geometry as the wrapper feeds it: unit-ball coords with
    # the (1,1,1) bg sentinel — the regime where d_index_max holds exactly
    pts = rng.normal(size=(2, 18, 3)).astype(np.float32)
    pts /= np.maximum(np.linalg.norm(pts, axis=-1, keepdims=True), 1.0)
    pts[:, 0] = 1.0
    with torch.no_grad():
        want = tm(torch.from_numpy(pts)).numpy()

    fm = GeometricStructureEmbedding(
        hidden_dim=HID, sigma_d=sigma_d, sigma_a=float(ge_cfg.sigma_a),
        angle_k=int(ge_cfg.angle_k), reduction_a=str(ge_cfg.reduction_a),
        d_index_max=float(2.1 * np.sqrt(3.0) / sigma_d),
        fused_table=int(ge_cfg.fused_table), quant_int8=bool(ge_cfg.quant_int8),
        fused_interpret=True,  # run the Pallas kernel on the CPU test host
    )
    params = convert_geo_embedding(_sd_np(tm), prefix="")
    e8, esc = fm.apply({"params": params}, jnp.asarray(pts))
    assert e8.dtype == jnp.int8
    got = np.asarray(e8, np.float32) * np.asarray(esc)[None, None, None, :]
    tol = 0.51 * np.asarray(esc)[None, None, None, :] + 5e-4
    err = np.abs(got - want)
    assert (err <= tol).all(), float((err - tol).max())


def test_coarse_matching_parity(ref_mods, rng):
    """Full coarse stage: in_proj/bg -> 2x (RPE-self + cross) -> score heads,
    similarity, saliency. Torch side orchestrated exactly as the reference
    forward (oneref_predator_coarse_point_matching.py:46-76)."""
    from unopose_tpu.models.matching import CoarsePointMatching

    B, n1, n2, nblock = 2, 12, 14, 2
    cfg = CN(
        nblock=nblock, input_dim=48, hidden_dim=HID, out_dim=HID, temp=0.1,
        sim_type="cosine", normalize_feat=True, loss_predator_thres=0.15,
        loss_dis_thres=0.3, nproposal1=20, nproposal2=5,
    )
    tm = ref_mods["coarse"].CoarsePointMatchingOneRef(cfg).eval()

    f1 = rng.normal(size=(B, n1, 48)).astype(np.float32)
    f2 = rng.normal(size=(B, n2, 48)).astype(np.float32)
    geo1 = rng.normal(size=(B, n1 + 1, n1 + 1, HID)).astype(np.float32)
    geo2 = rng.normal(size=(B, n2 + 1, n2 + 1, HID)).astype(np.float32)

    with torch.no_grad():
        tf1 = tm.in_proj(torch.from_numpy(f1))
        tf1 = torch.cat([tm.bg_token.repeat(B, 1, 1), tf1], dim=1)
        tf2 = tm.in_proj(torch.from_numpy(f2))
        tf2 = torch.cat([tm.bg_token.repeat(B, 1, 1), tf2], dim=1)
        tg1, tg2 = torch.from_numpy(geo1), torch.from_numpy(geo2)
        for i in range(nblock):
            tf1, tf2 = tm.transformers[i](tf1, tg1, tf2, tg2)
        scores = tm.score_heads[nblock - 1](torch.cat((tf1, tf2), dim=1))
        atten = ref_mods["model_utils"].compute_feature_similarity(
            tm.out_proj(tf1), tm.out_proj(tf2), "cosine", 0.1, True
        )
        s1, s2 = scores[:, 1 : n1 + 1], scores[:, n1 + 2 :]
        m1 = torch.matmul(torch.softmax(atten[:, 1:, 1:], dim=2), s2)
        m2 = torch.matmul(torch.softmax(atten[:, 1:, 1:].transpose(1, 2), dim=2), s1)
        want_score = torch.sigmoid(torch.cat((s1, s2), 1).squeeze(-1)).clamp(0, 1).numpy()
        want_sal = torch.sigmoid(torch.cat((m1, m2), 1).squeeze(-1)).clamp(0, 1).numpy()
        want_atten = atten.numpy()

    fm = CoarsePointMatching(nblock=nblock, input_dim=48, hidden_dim=HID, out_dim=HID, temp=0.1)
    params = convert_coarse_matching(_sd_np(tm), prefix="", nblock=nblock)
    attens, scores_l, sals = fm.apply(
        {"params": params}, jnp.asarray(f1), jnp.asarray(geo1), jnp.asarray(f2), jnp.asarray(geo2),
        all_blocks=False, with_saliency=True,
    )
    np.testing.assert_allclose(np.asarray(attens[-1]), want_atten, atol=ATOL, rtol=0)
    np.testing.assert_allclose(np.asarray(scores_l[-1]), want_score, atol=ATOL, rtol=0)
    np.testing.assert_allclose(np.asarray(sals[-1]), want_sal, atol=ATOL, rtol=0)


def test_fine_matching_parity(ref_mods, rng):
    """Full fine stage with the two-scale LRF positional encoding, the
    focused linear attention, and the reference's bg-shifted sparse gather
    (parity_gather=True, pe_neighbor_mode='first_k')."""
    from unopose_tpu.models.matching import FinePointMatching

    # n >= 96 keeps every r1-ball at >= 3 distinct neighbors — with fewer the
    # neighborhood covariance goes rank-deficient and torch.svd vs the
    # closed-form eigensolver legitimately disagree on the null-space vector
    B, n, ns, nblock = 2, 128, 6, 2
    cfg = CN(
        nblock=nblock, input_dim=48, hidden_dim=HID, out_dim=HID, temp=0.1,
        sim_type="cosine", normalize_feat=True, pe_radius1=0.3, pe_radius2=0.6,
        nsample1=8, nsample2=16, focusing_factor=3, use_lrf=True, use_xyz=True,
        loss_predator_thres=0.15, loss_dis_thres=0.3,
    )
    tm = ref_mods["fine"].FinePointMatchingOneRef(cfg).eval()

    init_R = np.stack([_rand_rot(rng) for _ in range(B)])
    init_t = (rng.normal(size=(B, 3)) * 0.05).astype(np.float32)
    align = lambda x: ((x - init_t[:, None, :]) @ init_R).astype(np.float32)
    p1 = detied_cloud(rng, B, n, transform=align)  # PE sees the aligned cloud
    p2 = detied_cloud(rng, B, n)
    f1 = rng.normal(size=(B, n, 48)).astype(np.float32)
    f2 = rng.normal(size=(B, n, 48)).astype(np.float32)
    geo1 = rng.normal(size=(B, ns + 1, ns + 1, HID)).astype(np.float32)
    geo2 = rng.normal(size=(B, ns + 1, ns + 1, HID)).astype(np.float32)
    fps1 = rng.choice(n, size=(B, ns), replace=False).astype(np.int32)
    fps2 = rng.choice(n, size=(B, ns), replace=False).astype(np.int32)

    with torch.no_grad():
        tp1 = (torch.from_numpy(p1) - torch.from_numpy(init_t).unsqueeze(1)) @ torch.from_numpy(init_R)
        tf1 = tm.in_proj(torch.from_numpy(f1)) + tm.PE(tp1)
        tf1 = torch.cat([tm.bg_token.repeat(B, 1, 1), tf1], dim=1)
        tf2 = tm.in_proj(torch.from_numpy(f2)) + tm.PE(torch.from_numpy(p2))
        tf2 = torch.cat([tm.bg_token.repeat(B, 1, 1), tf2], dim=1)
        tg1, tg2 = torch.from_numpy(geo1), torch.from_numpy(geo2)
        ti1, ti2 = torch.from_numpy(fps1), torch.from_numpy(fps2)
        for i in range(nblock):
            tf1, tf2 = tm.transformers[i](tf1, tg1, ti1, tf2, tg2, ti2)
        scores = tm.score_heads[nblock - 1](torch.cat((tf1, tf2), dim=1))
        atten = ref_mods["model_utils"].compute_feature_similarity(
            tm.out_proj(tf1), tm.out_proj(tf2), "cosine", 0.1, True
        )
        s1, s2 = scores[:, 1 : n + 1], scores[:, n + 2 :]
        m1 = torch.matmul(torch.softmax(atten[:, 1:, 1:], dim=2), s2)
        m2 = torch.matmul(torch.softmax(atten[:, 1:, 1:].transpose(1, 2), dim=2), s1)
        want_score = torch.sigmoid(torch.cat((s1, s2), 1).squeeze(-1)).clamp(0, 1).numpy()
        want_sal = torch.sigmoid(torch.cat((m1, m2), 1).squeeze(-1)).clamp(0, 1).numpy()
        want_atten = atten.numpy()

    fm = FinePointMatching(
        nblock=nblock, input_dim=48, hidden_dim=HID, out_dim=HID, temp=0.1,
        pe_radius1=0.3, pe_radius2=0.6, nsample1=8, nsample2=16,
        focusing_factor=3, parity_gather=True, pe_neighbor_mode="first_k",
    )
    params, stats = convert_fine_matching(_sd_np(tm), prefix="", nblock=nblock)
    attens, scores_l, sals, _ = fm.apply(
        {"params": params, "batch_stats": stats},
        jnp.asarray(p1), jnp.asarray(f1), jnp.asarray(geo1), jnp.asarray(fps1),
        jnp.asarray(p2), jnp.asarray(f2), jnp.asarray(geo2), jnp.asarray(fps2),
        jnp.asarray(init_R), jnp.asarray(init_t), train=False, with_saliency=True,
    )
    np.testing.assert_allclose(np.asarray(attens[-1]), want_atten, atol=ATOL, rtol=0)
    np.testing.assert_allclose(np.asarray(scores_l[-1]), want_score, atol=ATOL, rtol=0)
    np.testing.assert_allclose(np.asarray(sals[-1]), want_sal, atol=ATOL, rtol=0)


def test_fine_pe_parity(ref_mods, rng):
    """Isolated two-scale LRF positional encoding (QueryAndLRFGroup +
    SharedMLPs + Conv1d) vs FinePositionalEncoding in first_k mode."""
    from unopose_tpu.models.matching import FinePositionalEncoding
    from unopose_tpu.utils.ref_convert import convert_fine_pe

    B, n = 2, 128
    pe_t = ref_mods["fine"].PositionalEncoding(HID, r1=0.3, r2=0.6, nsample1=8, nsample2=16,
                                               use_lrf=True, use_xyz=True).eval()
    pts = detied_cloud(rng, B, n)
    with torch.no_grad():
        want = pe_t(torch.from_numpy(pts)).numpy()

    pe_f = FinePositionalEncoding(out_dim=HID, r1=0.3, r2=0.6, nsample1=8, nsample2=16, neighbor_mode="first_k")
    params, stats = convert_fine_pe(_sd_np(pe_t), prefix="")
    got = np.asarray(pe_f.apply({"params": params, "batch_stats": stats}, jnp.asarray(pts), train=False))
    np.testing.assert_allclose(got, want, atol=ATOL, rtol=0)


def test_global_lrf_parity(ref_mods, rng):
    """Global per-cloud LRF (model_utils.py:766-823) vs ops/lrf.global_lrf
    (closed-form eigensolver instead of torch.svd)."""
    from unopose_tpu.ops.lrf import global_lrf

    LRF = ref_mods["model_utils"].LRF
    # anisotropic shell: full spheres have an isotropic covariance (no
    # eigengap); squash one axis so the global frame is well-conditioned
    pts = surface_cloud(rng, 3, 50) * np.array([1.0, 0.8, 0.3], np.float32)
    t_pts = torch.from_numpy(pts)
    centroid = t_pts.mean(dim=1, keepdim=True)
    r = (t_pts - centroid).norm(dim=-1).max(dim=1).values
    with torch.no_grad():
        # reference call convention: get_batch_lrf (model :78-93) passes
        # (B, 3, 1) centers and (B, 3, N) points
        want = LRF(r)(centroid.transpose(1, 2), t_pts.transpose(1, 2)).transpose(1, 2).numpy()
    got = np.asarray(global_lrf(jnp.asarray(pts)))
    np.testing.assert_allclose(got, want, atol=2e-3, rtol=0)


def test_upscaling_reshape_equivalence(rng):
    """The flax token->4x4-subpatch unpacking (feature_extraction.py) must
    place pixels exactly like the reference permute chain
    (oneref_feature_extraction.py:218-229)."""
    B, side, out = 2, 3, 5
    up = rng.normal(size=(B, side * side, 16 * out)).astype(np.float32)
    # reference: (B, s, s, 4, 4, out) -> permute(0,5,1,3,2,4) -> (B, out, 4s, 4s)
    want = up.reshape(B, side, side, 4, 4, out).transpose(0, 5, 1, 3, 2, 4).reshape(B, out, 4 * side, 4 * side)
    # flax: (B, s, s, 4, 4, out) -> transpose(0,1,3,2,4,5) -> (B, 4s, 4s, out)
    got = up.reshape(B, side, side, 4, 4, out).transpose(0, 1, 3, 2, 4, 5).reshape(B, 4 * side, 4 * side, out)
    np.testing.assert_array_equal(got.transpose(0, 3, 1, 2), want)


def test_full_model_converter_structure(ref_mods, rng):
    """convert_unopose_state_dict output must drop into the flax UNOPose
    variable tree: real torch matcher/geo state_dicts (tiny dims) + a
    synthetic timm-layout ViT, tree-compared leaf by leaf against init."""
    from tests.test_checkpoint import fake_timm_state_dict
    from tests.test_model import IMG, NPTS, NCOARSE, NTEM, tiny_inputs
    from unopose_tpu.configs.main_cfg import get_tiny_cfg
    from unopose_tpu.models import UNOPose

    cfg = get_tiny_cfg(IMG, NPTS, NCOARSE, NTEM)
    fe = cfg.model.feature_extraction
    dim, depth, out_dim = 32, 4, fe.out_dim
    hid = cfg.model.coarse_point_matching.hidden_dim

    sd = {}
    for k, v in fake_timm_state_dict(depth=depth, dim=dim, grid=IMG // 14).items():
        sd[f"feature_extraction.rgb_net.vit.{k}"] = v
    sd["feature_extraction.rgb_net.output_upscaling.weight"] = rng.normal(
        size=(16 * out_dim, 4 * dim)
    ).astype(np.float32)
    sd["feature_extraction.rgb_net.output_upscaling.bias"] = np.zeros(16 * out_dim, np.float32)

    geo_t = ref_mods["transformer"].GeometricStructureEmbedding(
        CN(hidden_dim=hid, sigma_d=0.2, sigma_a=15, angle_k=3, reduction_a="max")
    )
    for k, v in _sd_np(geo_t).items():
        if not k.endswith("div_term"):
            sd[f"geo_embedding.{k}"] = v
    coarse_t = ref_mods["coarse"].CoarsePointMatchingOneRef(cfg.model.coarse_point_matching)
    for k, v in _sd_np(coarse_t).items():
        sd[f"coarse_point_matching.{k}"] = v
    fine_t = ref_mods["fine"].FinePointMatchingOneRef(cfg.model.fine_point_matching)
    for k, v in _sd_np(fine_t).items():
        sd[f"fine_point_matching.{k}"] = v

    variables = convert_unopose_state_dict(sd, depth=depth)

    model = UNOPose.from_config(cfg.model, dtype=jnp.float32, backbone_dtype=jnp.float32)
    batch = tiny_inputs(np.random.default_rng(0), B=2, train=False)
    init_vars = model.init({"params": jax.random.PRNGKey(0), "sample": jax.random.PRNGKey(1)}, batch, train=False)

    got = {jax.tree_util.keystr(k): v.shape for k, v in jax.tree_util.tree_leaves_with_path(variables)}
    want = {jax.tree_util.keystr(k): v.shape for k, v in jax.tree_util.tree_leaves_with_path(
        {"params": init_vars["params"], "batch_stats": init_vars["batch_stats"]}
    )}
    assert got == want, (
        f"missing: {sorted(set(want) - set(got))[:8]}, extra: {sorted(set(got) - set(want))[:8]}"
    )

    out = model.apply(
        {"params": variables["params"], "batch_stats": variables["batch_stats"]},
        batch, train=False, rngs={"sample": jax.random.PRNGKey(2)}, mutable=False,
    )
    assert np.isfinite(np.asarray(out["pred_R"])).all()
