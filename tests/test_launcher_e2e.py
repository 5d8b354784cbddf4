"""End-to-end launcher test: ``main_unopose.main`` eval-only on an on-disk
BOP fixture — the reference's primary UX (core/unopose/main_unopose.py:102-148:
main -> do_save_results -> CSV -> BOP scores -> per-object tables,
engine/bop_eval_utils.py:340-454). Every piece below is unit-tested
elsewhere; this drives the real glue: CLI arg parsing, config overrides,
dataset construction from cfg, restore_eval_variables (no checkpoint ->
random matcher warning path), run_inference, evaluate_bop, scores JSON and
the `_tab_obj_{row,col}.txt` per-object table dumps."""

import json
import os

import numpy as np
import pytest

from unopose_tpu.data.preprocess import binary_mask_to_rle

# 480x640 with the standard BOP K: evaluate_bop renders VSD at (480, 640)
K = np.array([[572.4, 0, 320.0], [0, 573.6, 240.0], [0, 0, 1.0]])
H, W = 480, 640


@pytest.fixture
def bop_e2e(tmp_path):
    """BOP fixture serving BOTH the test dataset (rgb/depth/detections/ref
    targets) and the evaluator (targets/scene_gt/models_eval)."""
    import imageio.v2 as imageio

    rng = np.random.default_rng(7)
    root = tmp_path / "BOP_DATASETS"
    scene = root / "ycbv" / "test" / "000048"
    for sub in ("depth", "rgb", "mask_visib"):
        os.makedirs(scene / sub)

    depth = np.zeros((H, W), np.uint16)
    mask = np.zeros((H, W), bool)
    depth[180:300, 260:380] = 900
    mask[180:300, 260:380] = True
    gts, infos, cams = {}, {}, {}
    for im_id in (1, 2):
        imageio.imwrite(scene / "depth" / f"{im_id:06d}.png", depth)
        imageio.imwrite(
            scene / "rgb" / f"{im_id:06d}.png",
            rng.integers(0, 255, (H, W, 3)).astype(np.uint8),
        )
        imageio.imwrite(scene / "mask_visib" / f"{im_id:06d}_000000.png", (mask * 255).astype(np.uint8))
        gts[str(im_id)] = [dict(obj_id=5, cam_R_m2c=np.eye(3).reshape(-1).tolist(), cam_t_m2c=[0, 0, 900.0])]
        infos[str(im_id)] = [dict(visib_fract=1.0)]
        cams[str(im_id)] = dict(cam_K=K.reshape(-1).tolist(), depth_scale=1.0)
    json.dump(gts, open(scene / "scene_gt.json", "w"))
    json.dump(infos, open(scene / "scene_gt_info.json", "w"))
    json.dump(cams, open(scene / "scene_camera.json", "w"))

    # dataset side: cross-scene ref map + SAM-style detections
    json.dump(
        [dict(scene_id=48, im_id=1, obj_id=5, ref_scene_id=48, ref_im_id=2)],
        open(root / "ycbv" / "test_ref_targets_crossscene_rot50.json", "w"),
    )
    det_path = root / "dets.json"
    json.dump(
        [
            dict(scene_id=48, image_id=1, category_id=5, bbox=[260, 180, 120, 120], score=0.9,
                 time=0.1, segmentation=binary_mask_to_rle(mask)),
        ],
        open(det_path, "w"),
    )

    # evaluator side: BOP19 targets + a cube mesh for VSD/MSSD/MSPD
    json.dump(
        [dict(scene_id=48, im_id=1, obj_id=5, inst_count=1)],
        open(root / "ycbv" / "test_targets_bop19.json", "w"),
    )
    models = root / "ycbv" / "models_eval"
    os.makedirs(models)
    s = 30.0
    pts = np.array([[x, y, z] for x in (-s, s) for y in (-s, s) for z in (-s, s)])
    faces = np.array(
        [[0, 1, 3], [0, 3, 2], [4, 6, 7], [4, 7, 5], [0, 4, 5], [0, 5, 1],
         [2, 3, 7], [2, 7, 6], [0, 2, 6], [0, 6, 4], [1, 5, 7], [1, 7, 3]]
    )
    with open(models / "obj_000005.ply", "w") as f:
        f.write("ply\nformat ascii 1.0\n")
        f.write(f"element vertex {len(pts)}\nproperty float x\nproperty float y\nproperty float z\n")
        f.write(f"element face {len(faces)}\nproperty list uchar int vertex_indices\nend_header\n")
        for v in pts:
            f.write(f"{v[0]} {v[1]} {v[2]}\n")
        for fc in faces:
            f.write(f"3 {fc[0]} {fc[1]} {fc[2]}\n")
    diam = float(np.linalg.norm(pts[0] - pts[7]))
    json.dump({"5": {"diameter": diam}}, open(models / "models_info.json", "w"))
    return str(root), str(det_path)


def test_launcher_eval_only_end_to_end(bop_e2e, tmp_path):
    from unopose_tpu import main_unopose

    root, det_path = bop_e2e
    out_dir = str(tmp_path / "out")
    main_unopose.main(
        [
            "--eval-only",
            "--config",
            "unopose_tpu.configs.main_cfg:get_tiny_cfg",
            f"misc.output_dir={out_dir!r}",
            "misc.exp_name='e2e'",
            "test.instance_batch_size=2",
            f"dataloader.test.data_dir={root!r}",
            f"dataloader.test.detection_path={det_path!r}",
            "dataloader.test.img_size=28",
            "dataloader.test.n_sample_observed_point=64",
            "dataloader.test.n_sample_template_point=96",
            "dataloader.test.minimum_n_point=8",
        ]
    )

    csv = os.path.join(out_dir, "result_e2e_ycbv-test.csv")
    assert os.path.exists(csv), os.listdir(out_dir)
    rows = [ln for ln in open(csv).read().strip().splitlines() if ln]
    assert len(rows) == 1  # one detection -> one BOP19 row
    cols = rows[0].split(",")
    assert len(cols) == 7  # scene,im,obj,score,R9,t3,time
    assert int(cols[0]) == 48 and int(cols[1]) == 1 and int(cols[2]) == 5
    R = np.fromstring(cols[4], sep=" ")
    t = np.fromstring(cols[5], sep=" ")
    assert R.shape == (9,) and np.isfinite(R).all()
    assert t.shape == (3,) and np.isfinite(t).all()

    scores = json.load(open(csv.replace(".csv", "_scores.json")))
    assert np.isfinite(scores["AR"])
    assert scores["n_images"] == 1
    for et in ("vsd", "mssd", "mspd"):
        assert "5" in scores[et]["per_object"] or 5 in scores[et]["per_object"]

    # per-object table txt dumps parse: header row with the object + Avg,
    # one row per error family + the AR line
    base = csv[:-4]
    for suffix in ("row", "col"):
        path = f"{base}_tab_obj_{suffix}.txt"
        assert os.path.exists(path)
        tab = open(path).read()
        assert "Avg" in tab and "AR" in tab
    by_row = open(f"{base}_tab_obj_row.txt").read().splitlines()
    # objects-in-rows: first column lists the object names
    assert any(ln.split() and ln.split()[0] not in ("objects", "AR", "Avg") for ln in by_row[1:])
