"""Inference pipeline + BOP19 CSV writer.

Counterpart of reference core/unopose/engine/oneref_inference_utils_v1.py:
per test image, chunk the variable number of detected instances into
fixed-size model batches (padding the last chunk to the static batch size so
a single compiled program serves every image), compose the predicted
relative pose with the reference's camera pose into the object frame
(predpose_tgt_obj = predpose_tgt_ref @ pose_camref_obj), and emit BOP19 CSV
rows ``scene_id,im_id,obj_id,score,R(9),t(mm),time`` with per-image
wall-clock (model + segmentation time) — the format the BOP evaluator
consumes."""

from __future__ import annotations

import json
import logging
import time
from pathlib import Path
from typing import Callable, Dict, List, Optional

import numpy as np

logger = logging.getLogger(__name__)


def pad_to(x: np.ndarray, n: int) -> np.ndarray:
    """Pad dim 0 to n by repeating the last row (static-shape batching)."""
    if x.shape[0] == n:
        return x
    reps = np.repeat(x[-1:], n - x.shape[0], axis=0)
    return np.concatenate([x, reps], axis=0)


def shard_indices(n: int, num_shards: int, shard_index: int) -> range:
    """Exact contiguous split of [0, n) across ranks (counterpart of the
    reference InferenceSampler, my_distributed_sampler.py:244-277)."""
    sizes = [n // num_shards + (1 if r < n % num_shards else 0) for r in range(num_shards)]
    start = sum(sizes[:shard_index])
    return range(start, start + sizes[shard_index])


def prefetch_items(dataset, indices=None, depth: int = 2):
    """Background-thread prefetch of ``dataset[i]`` so the per-image host
    preprocessing (RLE decode, crop, backproject — SURVEY hard-part g)
    overlaps device compute instead of serializing with it (the reference
    gets this from DataLoader workers, build_data_loader.py:153-177)."""
    import queue
    import threading

    if indices is None:
        indices = range(len(dataset))
    q: "queue.Queue" = queue.Queue(maxsize=depth)
    SENTINEL = object()

    def worker():
        try:
            for i in indices:
                q.put(dataset[i])
        finally:
            q.put(SENTINEL)

    threading.Thread(target=worker, daemon=True).start()
    while True:
        item = q.get()
        if item is SENTINEL:
            return
        yield item


def run_inference(
    infer_fn: Callable,
    dataset,
    save_path: str,
    instance_batch_size: int = 16,
    rng_seed: int = 0,
    num_shards: Optional[int] = None,
    shard_index: Optional[int] = None,
) -> List[str]:
    """infer_fn(inputs: dict of (B, ...) arrays, key) -> dict with
    pred_R (B,3,3), pred_t (B,3) [m], pred_pose_score (B,).

    ``dataset``: BOPTestsetPoseFreeOneRef. Writes the BOP19 CSV and a json
    dump of the detections augmented with predicted poses.

    Multi-process: by default each jax process handles its exact contiguous
    slice of the test images (replacing the reference InferenceSampler) and
    writes ``save_path`` with a ``.rankN`` suffix on non-zero ranks; merge
    with ``merge_csv_shards`` after all ranks finish.
    """
    import jax

    if num_shards is None:
        num_shards = jax.process_count()
    if shard_index is None:
        shard_index = jax.process_index()
    my_indices = shard_indices(len(dataset), num_shards, shard_index)
    if num_shards > 1 and shard_index > 0:
        save_path = f"{save_path}.rank{shard_index}"

    bs = instance_batch_size
    lines: List[str] = []
    dets_out = {k: [dict(d) for d in v] for k, v in dataset.dets.items()}
    key = jax.random.PRNGKey(rng_seed + shard_index)

    model_keys = ("pts", "rgb", "rgb_choose", "tem1_rgb", "tem1_choose", "tem1_pts")
    for i, data in enumerate(prefetch_items(dataset, my_indices)):
        t0 = time.perf_counter()
        n_instance = data["pts"].shape[0]
        n_chunks = int(np.ceil(n_instance / bs))

        pred_Rs, pred_Ts, pred_scores = [], [], []
        for j in range(n_chunks):
            sl = slice(j * bs, min((j + 1) * bs, n_instance))
            n_valid = sl.stop - sl.start
            inputs = {k: pad_to(data[k][sl], bs) for k in model_keys}
            key, sub = jax.random.split(key)
            out = infer_fn(inputs, sub)
            pred_R = np.asarray(out["pred_R"])[:n_valid]
            pred_t = np.asarray(out["pred_t"])[:n_valid]
            score = np.asarray(out["pred_pose_score"])[:n_valid]

            pose_ref_obj = data["tem1_pose"][sl]  # (n, 4, 4)
            pose_tgt_ref = np.tile(np.eye(4, dtype=np.float32), (n_valid, 1, 1))
            pose_tgt_ref[:, :3, :3] = pred_R
            pose_tgt_ref[:, :3, 3] = pred_t
            pose_tgt_obj = pose_tgt_ref @ pose_ref_obj
            pred_Rs.append(pose_tgt_obj[:, :3, :3])
            pred_Ts.append(pose_tgt_obj[:, :3, 3])
            pred_scores.append(score)

        pred_Rs = np.concatenate(pred_Rs).reshape(-1, 9)
        pred_Ts = np.concatenate(pred_Ts) * 1000.0  # m -> mm
        pred_scores = np.concatenate(pred_scores) * data["score"][:, 0]
        image_time = time.perf_counter() - t0 + float(data["seg_time"][0])

        scene_id = int(data["scene_id"][0])
        img_id = int(data["img_id"][0])
        det_key = f"{scene_id:06d}_{img_id:06d}"
        for k in range(n_instance):
            inst_i = int(data["inst_ids"][k])
            dets_out[det_key][inst_i]["pred_R"] = pred_Rs[k].tolist()
            dets_out[det_key][inst_i]["pred_t"] = pred_Ts[k].tolist()
            lines.append(
                ",".join(
                    (
                        str(scene_id),
                        str(img_id),
                        str(int(data["obj_id"][k, 0])),
                        str(pred_scores[k]),
                        " ".join(str(v) for v in pred_Rs[k]),
                        " ".join(str(v) for v in pred_Ts[k]),
                        f"{image_time}\n",
                    )
                )
            )
        if (i + 1) % 50 == 0:
            logger.info("inference [%d/%d]", i + 1, len(my_indices))

    with open(save_path, "w") as f:
        f.writelines(lines)
    logger.info("saved to %s", save_path)
    Path(save_path.replace(".csv", ".json")).write_text(json.dumps(dets_out))
    return lines


def merge_csv_shards(save_path: str, num_shards: int) -> None:
    """Concatenate rank CSVs (rank 0 = ``save_path`` itself) into
    ``save_path`` once every rank has written its part."""
    parts = [Path(save_path)] + [Path(f"{save_path}.rank{r}") for r in range(1, num_shards)]
    text = "".join(p.read_text() for p in parts if p.exists())
    Path(save_path).write_text(text)


def make_infer_fn(model, variables):
    """Build a jitted padded-batch inference callable for ``run_inference``."""
    import jax

    @jax.jit
    def infer(inputs, key):
        return model.apply(variables, inputs, train=False, rngs={"sample": key}, mutable=False)

    return infer
