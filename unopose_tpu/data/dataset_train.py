"""Training dataset: MegaPose GSO + ShapeNetCore ``train_pbr_web`` shards.

Counterpart of reference
core/unopose/provider/pfoneref_training_dataset_v2.py:75-494. Per sample:
pick a random valid instance of a random image key; load gt/camera jsons,
decode the visib mask (50% 4-iter cross dilation), square-crop, backproject
depth, remove outliers beyond 1.2x the reference radius, sample 2048
observed points; pick a random same-object reference frame from the
precomputed visib>0.8 lists, build its 5000-point cloud; color-augment both
crops (p=0.8), mask background, resize to 224, ImageNet-normalize
channels-last; random SO(3) rotation of the reference cloud composed into
the relative-pose label, +-shift_range translation noise and 0.001 gaussian
point jitter.

RNG is an explicit np.random.Generator per reader (seeded per worker +
epoch), replacing the reference's global numpy RNG."""

from __future__ import annotations

import logging
import os.path as osp
from typing import Dict, Optional

import numpy as np

from unopose_tpu.data.color_aug import ColorAugmentor
from unopose_tpu.data.preprocess import (
    backproject_np,
    dilate_mask,
    get_bbox,
    get_resize_rgb_choose,
    io_load_gt,
    io_load_masks,
    load_im,
    load_json,
    normalize_rgb,
    resize_linear,
    sample_choose,
)

logger = logging.getLogger(__name__)


def random_rotation_np(rng: np.random.Generator) -> np.ndarray:
    """Rx(a0) @ Ry(a1) @ Rz(a2), a ~ U[0, 2pi) (reference data_utils.py:286-296)."""
    a = rng.random(3) * 2 * np.pi
    rx = np.array([[1, 0, 0], [0, np.cos(a[0]), -np.sin(a[0])], [0, np.sin(a[0]), np.cos(a[0])]])
    ry = np.array([[np.cos(a[1]), 0, np.sin(a[1])], [0, 1, 0], [-np.sin(a[1]), 0, np.cos(a[1])]])
    rz = np.array([[np.cos(a[2]), -np.sin(a[2]), 0], [np.sin(a[2]), np.cos(a[2]), 0], [0, 0, 1]])
    return (rx @ ry @ rz).astype(np.float32)


class DatasetPoseFreeOneRef:
    def __init__(self, cfg, num_img_per_epoch: int = -1, seed: int = 0):
        self.cfg = cfg
        self.data_dir = cfg.data_dir
        self.num_img_per_epoch = num_img_per_epoch
        self.dilate = cfg.get("dilate_mask", True)
        self.rgb_mask_flag = cfg.get("rgb_mask_flag", True)
        self.shift_range = cfg.get("shift_range", 0.01)
        self.img_size = cfg.get("img_size", 224)
        self.n_sample_observed_point = cfg.get("n_sample_observed_point", 2048)
        self.n_sample_template_point = cfg.get("n_sample_template_point", 5000)
        self.rgb_to_bgr = cfg.get("rgb_to_bgr", False)
        self.rng = np.random.default_rng(seed)

        self.data_paths = [
            osp.join("MegaPose-GSO", "train_pbr_web"),
            osp.join("MegaPose-ShapeNetCore", "train_pbr_web"),
        ]
        self.dataset_paths = []
        for f in self.data_paths:
            key_json = osp.join(self.data_dir, f, "key_to_shard.json")
            if not osp.exists(key_json):
                continue
            key_shards = load_json(key_json)
            for k in key_shards:
                self.dataset_paths.append(osp.join(f, f"{key_shards[k]:06d}", k))
        self.length = len(self.dataset_paths)
        logger.info("Total %d images", self.length)

        def _maybe(path):
            return load_json(path) if osp.exists(path) else {}

        self.templates_infos = {
            "GSO": _maybe(osp.join(self.data_dir, "megapose_gso_fixed_obj_id_to_visib0_8_scene_im_inst_ids.json")),
            "ShapeNetCore": _maybe(
                osp.join(self.data_dir, "megapose_shapenetcore_fixed_obj_id_to_visib0_8_scene_im_inst_ids.json")
            ),
        }
        self.valid_insts = {
            "GSO": _maybe(osp.join(self.data_dir, "megapose_gso_fixed_valid_inst_ids.json")),
            "ShapeNetCore": _maybe(osp.join(self.data_dir, "megapose_shapenetcore_fixed_valid_inst_ids.json")),
        }
        self.color_augmentor = ColorAugmentor()
        self.img_idx: Optional[np.ndarray] = None
        self.reset()

    def __len__(self):
        return self.length if self.num_img_per_epoch == -1 else self.num_img_per_epoch

    def reset(self):
        """Resample this epoch's image index list (reference :169-177)."""
        n_epoch = self.length if self.num_img_per_epoch == -1 else self.num_img_per_epoch
        if self.length == 0:
            self.img_idx = np.zeros(0, np.int64)
        elif self.length <= n_epoch:
            self.img_idx = self.rng.choice(self.length, n_epoch)
        else:
            self.img_idx = self.rng.choice(self.length, n_epoch, replace=False)

    def __getitem__(self, index) -> Dict[str, np.ndarray]:
        while True:
            out = self.read_data(int(self.img_idx[index]))
            if out is not None:
                return out
            index = int(self.rng.integers(0, len(self)))

    def read_data(self, index: int) -> Optional[Dict[str, np.ndarray]]:
        path_head = self.dataset_paths[index]
        dataset_type = path_head.split("/")[0][9:]  # strip "MegaPose-"
        full_head = osp.join(self.data_dir, path_head)
        for suffix in (".camera.json", ".depth.png", ".gt.json", ".mask_visib.json", ".rgb.jpg"):
            if not osp.exists(full_head + suffix):
                return None

        shard_name, key_name = path_head.split("/")[-2:]
        valid_idx = self.valid_insts[dataset_type].get(f"{shard_name}/{key_name}", [])
        if len(valid_idx) == 0:
            return None
        inst = int(valid_idx[self.rng.integers(0, len(valid_idx))])

        gt = io_load_gt(full_head + ".gt.json")[inst]
        obj_id = gt["obj_id"]
        tem_list = self.templates_infos[dataset_type].get(str(obj_id), [])
        if not tem_list:
            return None

        target_R = np.asarray(gt["cam_R_m2c"], np.float32).reshape(3, 3)
        target_t = np.asarray(gt["cam_t_m2c"], np.float32).reshape(3) / 1000.0
        pose_camtgt_obj = np.eye(4, dtype=np.float32)
        pose_camtgt_obj[:3, :3] = target_R
        pose_camtgt_obj[:3, 3] = target_t

        camera = load_json(full_head + ".camera.json")
        K = np.asarray(camera["cam_K"], np.float32).reshape(3, 3)

        tem = self._get_template(dataset_type, tem_list)
        if tem is None:
            return None
        tem1_rgb, tem1_choose, tem1_pts, pose_camtem1_obj = tem

        pose_tgt_tem1 = pose_camtgt_obj @ np.linalg.inv(pose_camtem1_obj)
        tem1_pts_minus_mean = tem1_pts - tem1_pts.mean(0, keepdims=True)

        mask = io_load_masks(full_head + ".mask_visib.json")[inst]
        if mask.sum() == 0:
            return None
        if self.dilate and self.rng.random() < 0.5:
            mask = dilate_mask(mask)
        bbox = get_bbox(mask > 0)
        y1, y2, x1, x2 = bbox
        mask = mask[y1:y2, x1:x2]
        if mask.sum() == 0:
            return None
        choose = mask.astype(np.float32).flatten().nonzero()[0]

        depth = load_im(full_head + ".depth.png").astype(np.float32) * camera["depth_scale"] / 1000.0
        pts = backproject_np(depth, K, bbox).reshape(-1, 3)[choose]

        radius = np.linalg.norm(tem1_pts_minus_mean, axis=1).max()
        flag = np.linalg.norm(pts - pts.mean(0, keepdims=True), axis=1) < 1.2 * radius
        pts, choose = pts[flag], choose[flag]
        if len(choose) < 32:
            return None
        sel = sample_choose(self.rng, len(choose), self.n_sample_observed_point)
        choose, pts = choose[sel], pts[sel]

        rgb = load_im(full_head + ".rgb.jpg").astype(np.uint8)
        if self.rgb_to_bgr:
            rgb = rgb[..., ::-1]
        rgb = rgb[y1:y2, x1:x2, :]
        if self.rng.random() < 0.8:
            rgb = self.color_augmentor(self.rng, rgb)
        if self.rgb_mask_flag:
            rgb = rgb * (mask[:, :, None] > 0).astype(np.uint8)
        rgb = normalize_rgb(resize_linear(rgb, self.img_size))
        rgb_choose = get_resize_rgb_choose(choose, bbox, self.img_size)

        # SO(3) aug on the reference cloud, composed into the label (:345-363)
        rand_pose = np.eye(4, dtype=np.float32)
        rand_pose[:3, :3] = random_rotation_np(self.rng)
        tem1_pts = tem1_pts @ rand_pose[:3, :3]
        target_pose = pose_tgt_tem1 @ rand_pose
        add_t = self.rng.uniform(-self.shift_range, self.shift_range, (1, 3))
        target_t = target_pose[:3, 3] + add_t[0]
        pts = pts + add_t + 0.001 * self.rng.standard_normal((pts.shape[0], 3))

        return dict(
            pts=pts.astype(np.float32),
            rgb=rgb.astype(np.float32),
            rgb_choose=rgb_choose.astype(np.int32),
            translation_label=target_t.astype(np.float32),
            rotation_label=target_pose[:3, :3].astype(np.float32),
            tem1_rgb=tem1_rgb.astype(np.float32),
            tem1_choose=tem1_choose.astype(np.int32),
            tem1_pts=tem1_pts.astype(np.float32),
            K=K,
        )

    def _get_template(self, dataset_type: str, tem_list):
        """Random same-object reference frame (reference :386-478)."""
        shard_idx, key_name, inst_id = tem_list[int(self.rng.integers(0, len(tem_list)))]
        dir_idx = 0 if dataset_type == "GSO" else 1
        head = osp.join(self.data_dir, self.data_paths[dir_idx], f"{shard_idx:06d}/{key_name}")

        try:
            mask = io_load_masks(head + ".mask_visib.json", instance_ids=[inst_id])[0]
        except (FileNotFoundError, KeyError):
            return None
        if mask.sum() == 0:
            return None
        bbox = get_bbox(mask)
        y1, y2, x1, x2 = bbox
        mask = mask[y1:y2, x1:x2]
        if mask.sum() == 0:
            return None

        rgb = load_im(head + ".rgb.jpg").astype(np.uint8)
        if self.rgb_to_bgr:
            rgb = rgb[..., ::-1]
        rgb = rgb[y1:y2, x1:x2, :]
        if self.rng.random() < 0.8:
            rgb = self.color_augmentor(self.rng, rgb)
        if self.rgb_mask_flag:
            rgb = rgb * (mask[:, :, None] > 0).astype(np.uint8)
        rgb = normalize_rgb(resize_linear(rgb, self.img_size))

        choose = mask.astype(np.float32).flatten().nonzero()[0]
        sel = sample_choose(self.rng, len(choose), self.n_sample_template_point)
        choose = choose[sel]

        camera = load_json(head + ".camera.json")
        K = np.asarray(camera["cam_K"], np.float32).reshape(3, 3)
        depth = load_im(head + ".depth.png").astype(np.float32) * camera["depth_scale"] / 1000.0
        xyz = backproject_np(depth, K, bbox).reshape(-1, 3)[choose]
        rgb_choose = get_resize_rgb_choose(choose, bbox, self.img_size)

        gt = io_load_gt(head + ".gt.json", instance_ids=[inst_id])[0]
        tem_pose = np.eye(4, dtype=np.float32)
        tem_pose[:3, :3] = np.asarray(gt["cam_R_m2c"], np.float32).reshape(3, 3)
        tem_pose[:3, 3] = np.asarray(gt["cam_t_m2c"], np.float32).reshape(3) / 1000.0
        return rgb, rgb_choose, xyz.astype(np.float32), tem_pose
