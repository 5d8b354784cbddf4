"""BOP evaluator tests: PLY IO, pose errors, renderer fidelity, and an
end-to-end evaluate_bop run on a synthetic mini BOP dataset."""

import json
import os
import os.path as osp

import numpy as np
import pytest

from unopose_tpu.eval.ply import load_ply
from unopose_tpu.eval.pose_error import (
    add,
    get_symmetry_transformations,
    mspd,
    mssd,
    re,
    te,
    vsd_from_depths,
)
from unopose_tpu.eval.renderer import PointSplatRenderer, rasterize_exact

K = np.array([[572.4, 0, 320], [0, 573.6, 240], [0, 0, 1]], np.float64)
IDENT_SYM = [{"R": np.eye(3), "t": np.zeros(3)}]


def cube_mesh(size=60.0):
    s = size / 2
    pts = np.array(
        [[-s, -s, -s], [s, -s, -s], [s, s, -s], [-s, s, -s], [-s, -s, s], [s, -s, s], [s, s, s], [-s, s, s]]
    )
    faces = np.array(
        [
            [0, 1, 2], [0, 2, 3], [4, 6, 5], [4, 7, 6], [0, 4, 5], [0, 5, 1],
            [3, 2, 6], [3, 6, 7], [0, 3, 7], [0, 7, 4], [1, 5, 6], [1, 6, 2],
        ]
    )
    return pts, faces


def test_ply_ascii_roundtrip(tmp_path):
    pts, faces = cube_mesh()
    p = tmp_path / "cube.ply"
    with open(p, "w") as f:
        f.write("ply\nformat ascii 1.0\n")
        f.write(f"element vertex {len(pts)}\nproperty float x\nproperty float y\nproperty float z\n")
        f.write(f"element face {len(faces)}\nproperty list uchar int vertex_indices\nend_header\n")
        for v in pts:
            f.write(f"{v[0]} {v[1]} {v[2]}\n")
        for fc in faces:
            f.write(f"3 {fc[0]} {fc[1]} {fc[2]}\n")
    mesh = load_ply(str(p))
    np.testing.assert_allclose(mesh["pts"], pts)
    np.testing.assert_array_equal(mesh["faces"], faces)


def test_ply_binary_roundtrip(tmp_path):
    pts, faces = cube_mesh()
    p = tmp_path / "cube_bin.ply"
    with open(p, "wb") as f:
        hdr = (
            "ply\nformat binary_little_endian 1.0\n"
            f"element vertex {len(pts)}\nproperty float x\nproperty float y\nproperty float z\n"
            f"element face {len(faces)}\nproperty list uchar int vertex_indices\nend_header\n"
        )
        f.write(hdr.encode())
        f.write(pts.astype("<f4").tobytes())
        for fc in faces:
            f.write(np.uint8(3).tobytes() + fc.astype("<i4").tobytes())
    mesh = load_ply(str(p))
    np.testing.assert_allclose(mesh["pts"], pts, atol=1e-5)
    np.testing.assert_array_equal(mesh["faces"], faces)


def test_mssd_mspd_identity():
    pts, _ = cube_mesh()
    R = np.eye(3)
    t = np.array([0, 0, 800.0])
    assert mssd(R, t, R, t, pts, IDENT_SYM) == 0.0
    assert mspd(R, t, R, t, K, pts, IDENT_SYM) == 0.0
    t2 = t + [10, 0, 0]
    assert mssd(R, t2, R, t, pts, IDENT_SYM) == pytest.approx(10.0)
    assert add(R, t2, R, t, pts) == pytest.approx(10.0)
    assert te(t2, t) == pytest.approx(10.0)
    assert re(R, R) == pytest.approx(0.0)


def test_mssd_symmetry_aware():
    """A 180-deg-symmetric object rotated 180 deg has zero MSSD."""
    pts, _ = cube_mesh()
    Rz180 = np.diag([-1.0, -1.0, 1.0])
    syms = IDENT_SYM + [{"R": Rz180, "t": np.zeros(3)}]
    t = np.array([0, 0, 800.0])
    assert mssd(Rz180, t, np.eye(3), t, pts, syms) == pytest.approx(0.0, abs=1e-9)
    assert mssd(Rz180, t, np.eye(3), t, pts, IDENT_SYM) > 50.0


def test_symmetry_transformations():
    info = {"diameter": 100.0, "symmetries_continuous": [{"axis": [0, 0, 1], "offset": [0, 0, 0]}]}
    syms = get_symmetry_transformations(info, max_sym_disc_step=0.01)
    assert len(syms) == int(np.ceil(np.pi / 0.01))
    for s in syms[:5]:
        np.testing.assert_allclose(s["R"] @ s["R"].T, np.eye(3), atol=1e-9)


def test_splat_renderer_close_to_exact():
    pts, faces = cube_mesh()
    R = np.eye(3)
    t = np.array([0, 0, 700.0])
    rend = PointSplatRenderer(480, 640)
    rend.add_object(1, pts, faces, 100.0)
    d_splat = rend.render_depth(1, R, t, K)
    d_exact = rasterize_exact(pts, faces, R, t, K, 480, 640)
    both = (d_splat > 0) & (d_exact > 0)
    assert both.sum() > 1000
    # depth agreement where both rendered
    assert np.abs(d_splat[both] - d_exact[both]).mean() < 2.0  # mm
    # silhouette agreement: IoU high and all extra splat pixels confined to a
    # 1-pixel boundary band (point splatting has inherent +-0.5px edges)
    union = (d_splat > 0) | (d_exact > 0)
    assert both.sum() / union.sum() > 0.85
    exact_mask = d_exact > 0
    grown = exact_mask.copy()
    for dy in (-1, 0, 1):
        for dx in (-1, 0, 1):
            grown |= np.roll(np.roll(exact_mask, dy, axis=0), dx, axis=1)
    extra = (d_splat > 0) & ~exact_mask
    assert (extra & ~grown).sum() == 0


def test_vsd_perfect_and_bad():
    pts, faces = cube_mesh()
    R, t = np.eye(3), np.array([0, 0, 700.0])
    rend = PointSplatRenderer(480, 640)
    rend.add_object(1, pts, faces, 104.0)
    d = rend.render_depth(1, R, t, K)
    errs = vsd_from_depths(d, d, d, K, 15.0, [0.05, 0.2, 0.5], True, 104.0)
    assert all(e == 0.0 for e in errs)
    d_far = rend.render_depth(1, R, t + [200, 0, 0], K)
    errs_bad = vsd_from_depths(d_far, d, d, K, 15.0, [0.05], True, 104.0)
    assert errs_bad[0] > 0.9


@pytest.fixture
def mini_bop(tmp_path):
    """Synthetic single-scene BOP dataset: one cube object, 2 images."""
    import imageio.v2 as imageio

    pts, faces = cube_mesh()
    root = tmp_path / "bop" / "cubes"
    models = root / "models_eval"
    os.makedirs(models)
    with open(models / "obj_000001.ply", "w") as f:
        f.write("ply\nformat ascii 1.0\n")
        f.write(f"element vertex {len(pts)}\nproperty float x\nproperty float y\nproperty float z\n")
        f.write(f"element face {len(faces)}\nproperty list uchar int vertex_indices\nend_header\n")
        for v in pts:
            f.write(f"{v[0]} {v[1]} {v[2]}\n")
        for fc in faces:
            f.write(f"3 {fc[0]} {fc[1]} {fc[2]}\n")
    diam = float(np.linalg.norm(pts[0] - pts[6]))
    json.dump({"1": {"diameter": diam}}, open(models / "models_info.json", "w"))

    scene = root / "test" / "000001"
    os.makedirs(scene / "depth")
    rend = PointSplatRenderer(480, 640)
    rend.add_object(1, pts, faces, diam)

    gts, infos, cams, targets = {}, {}, {}, []
    rngR = [np.eye(3), np.diag([1.0, -1.0, -1.0])]
    for im_id in (1, 2):
        R = rngR[im_id - 1]
        t = np.array([0, 0, 650.0 + 50 * im_id])
        depth = rend.render_depth(1, R, t, K)
        imageio.imwrite(scene / "depth" / f"{im_id:06d}.png", np.round(depth).astype(np.uint16))
        gts[str(im_id)] = [dict(obj_id=1, cam_R_m2c=R.reshape(-1).tolist(), cam_t_m2c=t.tolist())]
        infos[str(im_id)] = [dict(visib_fract=1.0)]
        cams[str(im_id)] = dict(cam_K=K.reshape(-1).tolist(), depth_scale=1.0)
        targets.append(dict(scene_id=1, im_id=im_id, obj_id=1, inst_count=1))
    json.dump(gts, open(scene / "scene_gt.json", "w"))
    json.dump(infos, open(scene / "scene_gt_info.json", "w"))
    json.dump(cams, open(scene / "scene_camera.json", "w"))
    json.dump(targets, open(root / "test_targets_bop19.json", "w"))
    return root, rngR


def _write_csv(path, rows):
    with open(path, "w") as f:
        for scene, im, obj, score, R, t in rows:
            f.write(
                f"{scene},{im},{obj},{score},"
                + " ".join(str(v) for v in np.asarray(R).reshape(-1))
                + ","
                + " ".join(str(v) for v in np.asarray(t).reshape(-1))
                + ",1.0\n"
            )


def test_evaluate_bop_perfect(mini_bop, tmp_path):
    from unopose_tpu.eval.bop_eval import evaluate_bop

    root, rngR = mini_bop
    csv = tmp_path / "res.csv"
    _write_csv(
        csv,
        [
            (1, 1, 1, 0.9, rngR[0], [0, 0, 700.0]),
            (1, 2, 1, 0.9, rngR[1], [0, 0, 750.0]),
        ],
    )
    res = evaluate_bop(str(csv), str(root))
    assert res["mssd"]["average"] == pytest.approx(1.0)
    assert res["mspd"]["average"] == pytest.approx(1.0)
    assert res["vsd"]["average"] > 0.95
    assert res["AR"] > 0.98


def test_evaluate_bop_garbage(mini_bop, tmp_path):
    from unopose_tpu.eval.bop_eval import evaluate_bop

    root, rngR = mini_bop
    csv = tmp_path / "res_bad.csv"
    _write_csv(
        csv,
        [
            (1, 1, 1, 0.9, rngR[0], [500, 500, 2000.0]),
            (1, 2, 1, 0.9, rngR[1], [-500, 0, 3000.0]),
        ],
    )
    res = evaluate_bop(str(csv), str(root))
    assert res["AR"] < 0.05


def test_evaluate_bop_partial(mini_bop, tmp_path):
    """One good + one slightly-off estimate -> AR strictly between."""
    from unopose_tpu.eval.bop_eval import evaluate_bop

    root, rngR = mini_bop
    csv = tmp_path / "res_half.csv"
    # 25mm offset on a ~104mm-diameter cube: fails tight thresholds, passes loose
    _write_csv(
        csv,
        [
            (1, 1, 1, 0.9, rngR[0], [0, 0, 700.0]),
            (1, 2, 1, 0.9, rngR[1], [25.0, 0, 750.0]),
        ],
    )
    res = evaluate_bop(str(csv), str(root))
    assert 0.3 < res["mssd"]["average"] < 1.0


def _bumpy_sphere_mesh(n_theta=40, n_phi=80, radius=50.0, seed=0):
    """Irregular closed mesh (~6k faces) with YCB-scale bumpy geometry —
    exercises the rasterizer on dense curved meshes, not just boxes."""
    rng = np.random.default_rng(seed)
    th = np.linspace(1e-3, np.pi - 1e-3, n_theta)
    ph = np.linspace(0, 2 * np.pi, n_phi, endpoint=False)
    T, P = np.meshgrid(th, ph, indexing="ij")
    bump = 1.0 + 0.15 * np.sin(3 * T) * np.cos(4 * P) + 0.05 * rng.standard_normal(T.shape)
    r = radius * bump
    pts = np.stack(
        [r * np.sin(T) * np.cos(P), r * np.sin(T) * np.sin(P), r * np.cos(T)], axis=-1
    ).reshape(-1, 3)
    faces = []
    for i in range(n_theta - 1):
        for j in range(n_phi):
            a = i * n_phi + j
            b = i * n_phi + (j + 1) % n_phi
            c = (i + 1) * n_phi + j
            d = (i + 1) * n_phi + (j + 1) % n_phi
            faces.append([a, b, c])
            faces.append([b, d, c])
    return pts.astype(np.float32), np.asarray(faces, np.int32)


@pytest.mark.parametrize("mesh", ["cube", "bumpy"])
def test_mesh_raster_renderer_matches_oracle(mesh):
    """The default VSD renderer (native C++ triangle z-buffer) reproduces
    the numpy oracle rasterize_exact per-pixel on box and dense curved
    meshes across poses (VERDICT round-1 item 6)."""
    from unopose_tpu.eval.renderer import MeshRasterRenderer

    if mesh == "cube":
        pts, faces = cube_mesh()
        pts = pts.astype(np.float32)
    else:
        pts, faces = _bumpy_sphere_mesh()
    rend = MeshRasterRenderer(480, 640)
    rend.add_object(1, pts, faces, 100.0)
    rng = np.random.default_rng(3)
    for k in range(3):
        axis = rng.standard_normal(3)
        axis /= np.linalg.norm(axis)
        ang = rng.uniform(0, np.pi)
        Kx = np.array([[0, -axis[2], axis[1]], [axis[2], 0, -axis[0]], [-axis[1], axis[0], 0]])
        R = np.eye(3) + np.sin(ang) * Kx + (1 - np.cos(ang)) * Kx @ Kx
        t = np.array([rng.uniform(-30, 30), rng.uniform(-20, 20), 620.0 + 40 * k])
        d_fast = rend.render_depth(1, R, t, K)
        d_ref = rasterize_exact(pts, faces, R, t, K, 480, 640)
        m_fast, m_ref = d_fast > 0, d_ref > 0
        assert m_ref.sum() > 3000
        # identical silhouettes; depths match to float32 vertex rounding
        # (the native path transforms verts in fp32: ~5 micron at 650mm)
        mismatch = (m_fast != m_ref).sum()
        assert mismatch / max(m_ref.sum(), 1) < 1e-3, mismatch
        both = m_fast & m_ref
        assert np.abs(d_fast[both] - d_ref[both]).max() < 0.02


def test_mesh_raster_vsd_matches_oracle_vsd():
    """VSD recalls computed from the native renderer equal the oracle's on
    a mesh+pose sweep — bounds the renderer-induced AR delta at 0."""
    from unopose_tpu.eval.renderer import MeshRasterRenderer

    pts, faces = _bumpy_sphere_mesh(n_theta=24, n_phi=48, seed=1)
    diam = float(np.linalg.norm(pts.max(0) - pts.min(0)))
    rend = MeshRasterRenderer(480, 640)
    rend.add_object(1, pts, faces, diam)
    R, t = np.eye(3), np.array([0, 0, 650.0])
    d_test = rasterize_exact(pts, faces, R, t + [0, 0, 5.0], K, 480, 640)
    taus = [0.05, 0.1, 0.2, 0.5]
    for dt in ([0, 0, 0], [8, 0, 0], [0, 0, 30.0]):
        Rb = R
        d_est_f = rend.render_depth(1, Rb, t + dt, K)
        d_gt_f = rend.render_depth(1, R, t, K)
        e_fast = vsd_from_depths(d_test, d_est_f, d_gt_f, K, 15.0, taus, True, diam)
        d_est_o = rasterize_exact(pts, faces, Rb, t + dt, K, 480, 640)
        d_gt_o = rasterize_exact(pts, faces, R, t, K, 480, 640)
        e_ref = vsd_from_depths(d_test, d_est_o, d_gt_o, K, 15.0, taus, True, diam)
        # boundary pixels can flip from fp32 vertex rounding; the induced
        # VSD-error shift stays <1e-3, i.e. recall flips only for estimates
        # already within 1e-3 of a threshold — AR delta << the 0.3pt budget
        np.testing.assert_allclose(e_fast, e_ref, atol=1e-3)


def test_inference_shard_indices_partition():
    """shard_indices is an exact disjoint cover of the dataset (reference
    InferenceSampler semantics, my_distributed_sampler.py:244-277)."""
    from unopose_tpu.engine.inference import shard_indices

    for n, k in ((10, 3), (7, 7), (5, 8), (100, 4), (0, 2)):
        all_idx = [i for r in range(k) for i in shard_indices(n, k, r)]
        assert all_idx == list(range(n)), (n, k)


def test_merge_csv_shards(tmp_path):
    from unopose_tpu.engine.inference import merge_csv_shards

    p = tmp_path / "result.csv"
    p.write_text("a\nb\n")
    (tmp_path / "result.csv.rank1").write_text("c\n")
    (tmp_path / "result.csv.rank2").write_text("d\n")
    merge_csv_shards(str(p), 3)
    assert p.read_text() == "a\nb\nc\nd\n"
