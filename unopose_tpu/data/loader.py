"""Host-side batching + prefetch.

Replaces the reference's torch DataLoader stack (build_data_loader.py:42-177):
an infinite shuffled sampler feeding worker threads (cv2/PIL release the
GIL for the heavy ops), collated into channels-last numpy batches. Multi-host
sharding: each process builds its own loader over its slice of the global
batch (parallel/mesh.local_batch_slice)."""

from __future__ import annotations

import logging
import queue
import threading
from typing import Callable, Dict, Iterator, Optional

import numpy as np

logger = logging.getLogger(__name__)


def collate(samples) -> Dict[str, np.ndarray]:
    return {k: np.stack([s[k] for s in samples]) for k in samples[0]}


def train_loader(
    dataset,
    batch_size: int,
    num_workers: int = 4,
    seed: int = 0,
    prefetch: int = 4,
) -> Iterator[Dict[str, np.ndarray]]:
    """Infinite batched iterator with background worker threads.

    Epoch semantics follow the reference (engine.py:143-147 + dataset
    ``reset()``, pfoneref_training_dataset_v2.py:169-177): before each pass
    over the epoch index list the dataset's ``reset()`` resamples which
    images compose the epoch (``num_img_per_epoch``), so one pass here ==
    one ``max_iter // resample_times`` window there."""
    rng = np.random.default_rng(seed)
    index_q: "queue.Queue[int]" = queue.Queue(maxsize=batch_size * 4)
    sample_q: "queue.Queue" = queue.Queue(maxsize=batch_size * prefetch)
    stop = threading.Event()

    def put_or_stop(q, item) -> bool:
        """Blocking put that stays responsive to ``stop`` — a plain
        ``q.put`` on a full queue never rechecks the event, leaving the
        thread blocked forever after the consumer goes away."""
        while not stop.is_set():
            try:
                q.put(item, timeout=0.5)
                return True
            except queue.Full:
                continue
        return False

    def feeder():
        epoch = 0
        while not stop.is_set():
            if hasattr(dataset, "reset"):
                dataset.reset()
                logger.info("train epoch %d: resampled %d images", epoch, len(dataset))
            epoch += 1
            for idx in rng.permutation(len(dataset)):
                if not put_or_stop(index_q, int(idx)):
                    return

    def worker():
        while not stop.is_set():
            try:
                idx = index_q.get(timeout=0.5)
            except queue.Empty:
                continue
            if not put_or_stop(sample_q, dataset[idx]):
                return

    threads = [threading.Thread(target=feeder, daemon=True)]
    threads += [threading.Thread(target=worker, daemon=True) for _ in range(max(1, num_workers))]
    for t in threads:
        t.start()

    try:
        while True:
            yield collate([sample_q.get() for _ in range(batch_size)])
    finally:
        stop.set()


def synthetic_train_iter(
    batch_size: int,
    img_size: int = 224,
    n_pts: int = 2048,
    n_tem: int = 5000,
    seed: int = 0,
) -> Iterator[Dict[str, np.ndarray]]:
    """Synthetic in-memory batches with geometrically consistent labels:
    the observed cloud is an SE(3) transform of a subset of the reference
    cloud plus noise. Used for smoke training runs, benchmarks, and tests
    when no MegaPose shards are on disk."""
    rng = np.random.default_rng(seed)
    from unopose_tpu.data.dataset_train import random_rotation_np

    while True:
        B = batch_size
        rgb = rng.uniform(-1, 1, size=(B, img_size, img_size, 3)).astype(np.float32)
        tem_rgb = rng.uniform(-1, 1, size=(B, img_size, img_size, 3)).astype(np.float32)
        tem_pts = rng.uniform(-0.08, 0.08, size=(B, n_tem, 3)).astype(np.float32)
        tem_pts[..., 2] += 0.6
        R = np.stack([random_rotation_np(rng) for _ in range(B)])
        t = rng.uniform(-0.02, 0.02, size=(B, 3)).astype(np.float32)
        t[:, 2] += 0.55
        sel = rng.integers(0, n_tem, size=(B, n_pts))
        pts = np.einsum("bij,bnj->bni", R, np.take_along_axis(tem_pts, sel[..., None], axis=1)) + t[:, None]
        pts = (pts + 0.002 * rng.standard_normal((B, n_pts, 3))).astype(np.float32)
        yield dict(
            rgb=rgb,
            rgb_choose=rng.integers(0, img_size * img_size, size=(B, n_pts)).astype(np.int32),
            pts=pts,
            tem1_rgb=tem_rgb,
            tem1_choose=rng.integers(0, img_size * img_size, size=(B, n_tem)).astype(np.int32),
            tem1_pts=tem_pts,
            rotation_label=R.astype(np.float32),
            translation_label=t,
            K=np.tile(np.asarray([[572.4, 0, 320], [0, 573.6, 240], [0, 0, 1]], np.float32), (B, 1, 1)),
        )
