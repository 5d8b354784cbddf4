"""Dataset reader tests against synthetic on-disk fixtures (MegaPose shard
layout for training, BOP layout for test)."""

import json
import os

import numpy as np
import pytest

from unopose_tpu.data.preprocess import binary_mask_to_rle
from unopose_tpu.utils.config import CN

K = np.array([[280.0, 0, 160.0], [0, 280.0, 120.0], [0, 0, 1.0]])
H, W = 240, 320


def _write_sample(head, rng, obj_id=3, z=0.8):
    """One rendered-ish sample: a square object at depth z."""
    import imageio.v2 as imageio

    depth = np.zeros((H, W), np.uint16)
    mask = np.zeros((H, W), bool)
    y0, y1, x0, x1 = 80, 160, 120, 220
    depth[y0:y1, x0:x1] = int(z * 1000)
    mask[y0:y1, x0:x1] = True
    imageio.imwrite(head + ".rgb.jpg", rng.integers(0, 255, (H, W, 3)).astype(np.uint8))
    imageio.imwrite(head + ".depth.png", depth)
    R = np.eye(3)
    json.dump(
        [dict(obj_id=obj_id, cam_R_m2c=R.reshape(-1).tolist(), cam_t_m2c=[0.0, 0.0, z * 1000])],
        open(head + ".gt.json", "w"),
    )
    json.dump([dict(visib_fract=1.0, px_count_visib=int(mask.sum()))], open(head + ".gt_info.json", "w"))
    json.dump(dict(cam_K=K.reshape(-1).tolist(), depth_scale=1.0), open(head + ".camera.json", "w"))
    json.dump({"0": binary_mask_to_rle(mask)}, open(head + ".mask_visib.json", "w"))


@pytest.fixture
def fake_megapose(tmp_path):
    rng = np.random.default_rng(0)
    root = tmp_path / "MegaPose-Training-Data"
    shard = root / "MegaPose-GSO" / "train_pbr_web" / "000000"
    os.makedirs(shard)
    keys = ["000000_000000", "000000_000001"]
    for k in keys:
        _write_sample(str(shard / k), rng)
    json.dump({k: 0 for k in keys}, open(root / "MegaPose-GSO" / "train_pbr_web" / "key_to_shard.json", "w"))
    # ShapeNetCore side absent -> reader skips it
    json.dump(
        {"3": [[0, keys[1], 0]]},
        open(root / "megapose_gso_fixed_obj_id_to_visib0_8_scene_im_inst_ids.json", "w"),
    )
    json.dump({f"000000/{k}": [0] for k in keys}, open(root / "megapose_gso_fixed_valid_inst_ids.json", "w"))
    return str(root)


def test_train_dataset_reads_sample(fake_megapose):
    from unopose_tpu.data.dataset_train import DatasetPoseFreeOneRef

    cfg = CN(
        data_dir=fake_megapose,
        img_size=32,
        n_sample_observed_point=128,
        n_sample_template_point=256,
        shift_range=0.01,
        rgb_mask_flag=True,
        dilate_mask=True,
    )
    ds = DatasetPoseFreeOneRef(cfg, seed=0)
    assert len(ds) == 2
    sample = ds[0]
    assert sample["pts"].shape == (128, 3)
    assert sample["rgb"].shape == (32, 32, 3)
    assert sample["rgb_choose"].shape == (128,)
    assert sample["tem1_pts"].shape == (256, 3)
    assert sample["tem1_rgb"].shape == (32, 32, 3)
    R = sample["rotation_label"]
    np.testing.assert_allclose(R @ R.T, np.eye(3), atol=1e-5)
    assert np.isfinite(sample["translation_label"]).all()
    assert (sample["rgb_choose"] >= 0).all() and (sample["rgb_choose"] < 32 * 32).all()
    # relative-pose consistency: (pts - t) @ R should land near the
    # (rotated) reference cloud
    gt_pts = (sample["pts"] - sample["translation_label"]) @ R
    tem = sample["tem1_pts"]
    d = np.linalg.norm(gt_pts[:, None, :] - tem[None, :, :], axis=-1).min(1)
    assert np.median(d) < 0.05, np.median(d)


def test_train_dataset_batches_via_loader(fake_megapose):
    from unopose_tpu.data.dataset_train import DatasetPoseFreeOneRef
    from unopose_tpu.data.loader import train_loader

    cfg = CN(
        data_dir=fake_megapose,
        img_size=32,
        n_sample_observed_point=64,
        n_sample_template_point=96,
        shift_range=0.01,
        rgb_mask_flag=True,
        dilate_mask=True,
    )
    ds = DatasetPoseFreeOneRef(cfg, seed=1)
    it = train_loader(ds, batch_size=4, num_workers=2, seed=0)
    try:
        batch = next(it)
    finally:
        it.close()  # stop feeder/worker threads (they outlive the fixture)
    assert batch["pts"].shape == (4, 64, 3)
    assert batch["rotation_label"].shape == (4, 3, 3)


@pytest.fixture
def fake_bop(tmp_path):
    import imageio.v2 as imageio

    rng = np.random.default_rng(1)
    root = tmp_path / "BOP_DATASETS"
    scene = root / "ycbv" / "test" / "000048"
    os.makedirs(scene / "depth")
    os.makedirs(scene / "rgb")
    os.makedirs(scene / "mask_visib")

    depth = np.zeros((H, W), np.uint16)
    mask = np.zeros((H, W), bool)
    depth[90:150, 130:210] = 900
    mask[90:150, 130:210] = True
    for im_id in (1, 2):
        imageio.imwrite(scene / "depth" / f"{im_id:06d}.png", depth)
        imageio.imwrite(scene / "rgb" / f"{im_id:06d}.png", rng.integers(0, 255, (H, W, 3)).astype(np.uint8))
        imageio.imwrite(scene / "mask_visib" / f"{im_id:06d}_000000.png", (mask * 255).astype(np.uint8))
    gt = {
        str(i): [dict(obj_id=5, cam_R_m2c=np.eye(3).reshape(-1).tolist(), cam_t_m2c=[0, 0, 900.0])]
        for i in (1, 2)
    }
    json.dump(gt, open(scene / "scene_gt.json", "w"))
    cams = {str(i): dict(cam_K=K.reshape(-1).tolist(), depth_scale=1.0) for i in (1, 2)}
    json.dump(cams, open(scene / "scene_camera.json", "w"))
    json.dump(
        [dict(scene_id=48, im_id=1, obj_id=5, ref_scene_id=48, ref_im_id=2)],
        open(root / "ycbv" / "test_ref_targets_crossscene_rot50.json", "w"),
    )
    dets = [
        dict(scene_id=48, image_id=1, category_id=5, bbox=[130, 90, 80, 60], score=0.9, time=0.1,
             segmentation=binary_mask_to_rle(mask)),
    ]
    det_path = root / "dets.json"
    json.dump(dets, open(det_path, "w"))
    return str(root), str(det_path)


def test_bop_test_dataset(fake_bop):
    from unopose_tpu.data.dataset_test import BOPTestsetPoseFreeOneRef

    root, det_path = fake_bop
    cfg = CN(
        data_dir=root,
        ref_targets_name="test_ref_targets_crossscene_rot50.json",
        img_size=32,
        n_sample_observed_point=128,
        n_sample_template_point=256,
        minimum_n_point=8,
        rgb_mask_flag=True,
        seg_filter_score=0.25,
    )
    ds = BOPTestsetPoseFreeOneRef(cfg, eval_dataset_name="ycbv", detection_path=det_path)
    assert len(ds) == 1
    data = ds[0]
    assert data["pts"].shape == (1, 128, 3)
    assert data["tem1_pts"].shape == (1, 256, 3)
    assert data["tem1_pose"].shape == (1, 4, 4)
    assert int(data["scene_id"][0]) == 48 and int(data["img_id"][0]) == 1
    assert int(data["obj_id"][0, 0]) == 5
    # same object, same pose in both frames -> clouds overlap strongly
    d = np.linalg.norm(data["pts"][0][:, None] - data["tem1_pts"][0][None], axis=-1).min(1)
    assert np.median(d) < 0.02


def test_train_loader_epoch_resample():
    """The loader resamples the dataset's epoch composition before each pass
    (reference engine.py:143-147 + dataset reset(), :169-177) and honors
    num_img_per_epoch via __len__."""
    from unopose_tpu.data.loader import train_loader

    class FakeDataset:
        def __init__(self):
            self.resets = 0
            self.epoch = []

        def __len__(self):
            return 4  # num_img_per_epoch

        def reset(self):
            self.resets += 1

        def __getitem__(self, i):
            return {"x": np.full((2,), i, np.float32)}

    ds = FakeDataset()
    it = train_loader(ds, batch_size=2, num_workers=1, seed=0)
    batches = [next(it) for _ in range(5)]  # 10 samples > 2 epochs of 4
    it.close()
    assert all(b["x"].shape == (2, 2) for b in batches)
    assert ds.resets >= 2
