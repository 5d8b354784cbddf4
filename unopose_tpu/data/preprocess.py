"""Host-side (numpy) preprocessing primitives shared by the train and test
dataset readers.

Counterparts of reference core/unopose/utils/data_utils.py: image/json IO,
uncompressed-RLE mask decoding (:168-186), square bbox extraction (:249-283),
depth backprojection (:216-229), crop-resize index remapping (:232-246), and
ImageNet normalization. Everything returns channels-last float32 — the
device-side model consumes (H, W, C)."""

from __future__ import annotations

import json as _json
from pathlib import Path
from typing import Optional, Sequence

import numpy as np

try:
    import cv2
except ImportError:  # pragma: no cover
    cv2 = None

IMAGENET_MEAN = np.array([0.485, 0.456, 0.406], np.float32)
IMAGENET_STD = np.array([0.229, 0.224, 0.225], np.float32)


def load_json(path):
    return _json.loads(Path(path).read_bytes())


def load_im(path) -> np.ndarray:
    import imageio.v2 as imageio

    return np.asarray(imageio.imread(path))


def rle_to_binary_mask(rle: dict) -> np.ndarray:
    """Uncompressed COCO-style RLE {size: (H, W), counts: [...]} -> bool (H, W).

    Fortran (column-major) order, runs alternate background/foreground
    (reference data_utils.py:168-186). Decoded by the native host-ops
    library when available (data/native.py)."""
    from unopose_tpu.data import native

    return native.rle_decode(rle["counts"], rle["size"])


def binary_mask_to_rle(mask: np.ndarray) -> dict:
    """Inverse of rle_to_binary_mask (for writing detection jsons / tests)."""
    flat = np.asarray(mask, bool).reshape(-1, order="F")
    # run-length encode, first run is background
    change = np.nonzero(np.diff(flat))[0] + 1
    runs = np.diff(np.concatenate([[0], change, [flat.size]]))
    counts = runs.tolist()
    if flat.size and flat[0]:
        counts = [0] + counts
    return {"size": list(mask.shape), "counts": counts}


def io_load_gt(gt_file, instance_ids: Optional[Sequence[int]] = None):
    gt = load_json(gt_file)
    if instance_ids is not None:
        gt = [g for n, g in enumerate(gt) if n in instance_ids]
    return gt


def io_load_masks(mask_file, instance_ids: Optional[Sequence[int]] = None):
    rles = {int(k): v for k, v in load_json(mask_file).items()}
    if instance_ids is None:
        instance_ids = sorted(rles.keys())
    return np.stack([rle_to_binary_mask(rles[i]) for i in instance_ids])


def backproject_np(depth: np.ndarray, K: np.ndarray, bbox=None) -> np.ndarray:
    """Depth (H, W) -> organized cloud (H, W, 3); optional bbox crop
    (y1, y2, x1, x2). Reference data_utils.py:216-229."""
    H, W = depth.shape
    X, Y = np.meshgrid(np.arange(W) - K[0, 2], np.arange(H) - K[1, 2])
    cloud = np.stack((X * depth / K[0, 0], Y * depth / K[1, 1], depth), axis=2).astype(np.float32)
    if bbox is not None:
        y1, y2, x1, x2 = bbox
        return cloud[y1:y2, x1:x2]
    return cloud


def get_bbox(label: np.ndarray):
    """Square bbox containing the mask, clipped into the image
    (reference data_utils.py:249-283). Returns [y1, y2, x1, x2]."""
    img_h, img_w = label.shape
    rows = np.any(label, axis=1)
    cols = np.any(label, axis=0)
    rmin, rmax = np.where(rows)[0][[0, -1]]
    cmin, cmax = np.where(cols)[0][[0, -1]]
    rmax += 1
    cmax += 1
    b = min(max(rmax - rmin, cmax - cmin), min(img_h, img_w))
    center = [int((rmin + rmax) / 2), int((cmin + cmax) / 2)]
    rmin, rmax = center[0] - b // 2, center[0] + b // 2
    cmin, cmax = center[1] - b // 2, center[1] + b // 2
    if rmin < 0:
        rmax += -rmin
        rmin = 0
    if cmin < 0:
        cmax += -cmin
        cmin = 0
    if rmax > img_h:
        rmin -= rmax - img_h
        rmax = img_h
    if cmax > img_w:
        cmin -= cmax - img_w
        cmax = img_w
    return [rmin, rmax, cmin, cmax]


def get_resize_rgb_choose(choose: np.ndarray, bbox, img_size: int) -> np.ndarray:
    """Remap flat indices of the crop into the resized (img_size, img_size)
    crop (reference data_utils.py:232-246)."""
    y1, y2, x1, x2 = bbox
    crop_h = y2 - y1
    crop_w = x2 - x1
    row_idx = choose // crop_h
    col_idx = choose % crop_h
    return (np.floor(row_idx * (img_size / crop_w)) * img_size + np.floor(col_idx * (img_size / crop_h))).astype(
        np.int64
    )


def normalize_rgb(rgb_uint8: np.ndarray) -> np.ndarray:
    """uint8 (H, W, 3) -> ImageNet-normalized float32 (H, W, 3), channel-last."""
    return ((rgb_uint8.astype(np.float32) / 255.0) - IMAGENET_MEAN) / IMAGENET_STD


def dilate_mask(mask: np.ndarray, iterations: int = 4) -> np.ndarray:
    """cv2 cross-kernel dilation (reference pfoneref_training_dataset_v2.py:252-256)."""
    m = (mask > 0).astype(np.uint8)
    if cv2 is None:
        return m
    return cv2.dilate(m, cv2.getStructuringElement(cv2.MORPH_CROSS, (3, 3)), iterations=iterations)


def resize_linear(img: np.ndarray, size: int) -> np.ndarray:
    if cv2 is not None:
        return cv2.resize(img, (size, size), interpolation=cv2.INTER_LINEAR)
    from PIL import Image

    return np.asarray(Image.fromarray(img).resize((size, size), Image.BILINEAR))


def sample_choose(rng: np.random.Generator, n_avail: int, n_sample: int) -> np.ndarray:
    """Sample indices with the reference's with/without-replacement rule
    (pfoneref_training_dataset_v2.py:299-303)."""
    if n_avail <= n_sample:
        return rng.choice(np.arange(n_avail), n_sample)
    return rng.choice(np.arange(n_avail), n_sample, replace=False)
