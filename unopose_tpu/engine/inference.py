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


class TemplateCache:
    """Host-side LRU of per-reference onboarding outputs keyed by the
    instance's ``ref_key`` (ref_scene_id, ref_im_id, obj_id).

    The reference re-encodes the template crop through the ViT for every
    16-instance chunk and every image sharing the same cross-scene reference
    (oneref_inference_utils_v1.py:48,81 — the rot50 map reuses refs heavily);
    caching ``encode_template``'s outputs removes half the encoder work per
    chunk and all repeated template work across images."""

    def __init__(self, template_fn: Callable, batch_size: int = 16, max_entries: int = 256):
        from collections import OrderedDict

        self.template_fn = template_fn
        self.bs = batch_size
        self.max_entries = max_entries
        self._store: "OrderedDict[tuple, Dict[str, np.ndarray]]" = OrderedDict()

    def ensure(self, data: Dict[str, np.ndarray]) -> None:
        """Compute-and-store entries for every ref in this image's batch."""
        keys = [tuple(int(v) for v in k) for k in data["ref_key"]]
        missing, seen = [], set()
        for j, k in enumerate(keys):
            if k not in self._store and k not in seen:
                missing.append(j)
                seen.add(k)
        for start in range(0, len(missing), self.bs):
            rows = missing[start : start + self.bs]
            tem = {k: pad_to(data[k][rows], self.bs) for k in ("tem1_rgb", "tem1_choose", "tem1_pts")}
            out = {k: np.asarray(v) for k, v in self.template_fn(tem).items()}
            for jj, row in enumerate(rows):
                self._store[keys[row]] = {k: v[jj] for k, v in out.items()}
        while len(self._store) > self.max_entries:
            self._store.popitem(last=False)

    def gather(self, data: Dict[str, np.ndarray], rows: range) -> Dict[str, np.ndarray]:
        entries = [self._store[tuple(int(v) for v in data["ref_key"][j])] for j in rows]
        return {k: np.stack([e[k] for e in entries]) for k in entries[0]}


def run_inference(
    infer_fn: Callable,
    dataset,
    save_path: str,
    instance_batch_size: int = 16,
    rng_seed: int = 0,
    num_shards: Optional[int] = None,
    shard_index: Optional[int] = None,
    template_fn: Optional[Callable] = None,
) -> List[str]:
    """infer_fn(inputs: dict of (B, ...) arrays, key) -> dict with
    pred_R (B,3,3), pred_t (B,3) [m], pred_pose_score (B,).

    ``dataset``: BOPTestsetPoseFreeOneRef. Writes the BOP19 CSV and a json
    dump of the detections augmented with predicted poses.

    ``template_fn``: optional jitted ``encode_template`` callable
    (make_template_fn); when given, per-reference features are computed once
    and reused via a TemplateCache keyed on the dataset's ``ref_key``.

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

    cache = TemplateCache(template_fn, bs) if template_fn is not None else None
    model_keys = ("pts", "rgb", "rgb_choose", "tem1_rgb", "tem1_choose", "tem1_pts")
    if cache is not None:
        model_keys = ("pts", "rgb", "rgb_choose")
    for i, data in enumerate(prefetch_items(dataset, my_indices)):
        t0 = time.perf_counter()
        n_instance = data["pts"].shape[0]
        n_chunks = int(np.ceil(n_instance / bs))
        if cache is not None:
            cache.ensure(data)

        pred_Rs, pred_Ts, pred_scores = [], [], []
        for j in range(n_chunks):
            sl = slice(j * bs, min((j + 1) * bs, n_instance))
            n_valid = sl.stop - sl.start
            inputs = {k: pad_to(data[k][sl], bs) for k in model_keys}
            if cache is not None:
                inputs.update({k: pad_to(v, bs) for k, v in cache.gather(data, range(sl.start, sl.stop)).items()})
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


def merge_csv_shards(save_path: str, num_shards: int, strict: bool = True) -> None:
    """Concatenate rank CSVs (rank 0 = ``save_path`` itself) into
    ``save_path`` once every rank has written its part, and merge the
    per-rank detection JSON dumps into rank 0's ``.json``.

    A missing rank part means that rank died before writing — scoring a
    partial CSV silently would misreport recall, so ``strict`` raises."""
    parts = [Path(save_path)] + [Path(f"{save_path}.rank{r}") for r in range(1, num_shards)]
    missing = [str(p) for p in parts if not p.exists()]
    if missing:
        msg = f"missing {len(missing)}/{num_shards} result shard(s): {missing}"
        if strict:
            raise FileNotFoundError(msg)
        logger.error("%s — merging the rest anyway (strict=False)", msg)
    text = "".join(p.read_text() for p in parts if p.exists())
    Path(save_path).write_text(text)

    # merge detection JSONs: every rank dumps the full det table but fills
    # pred_R/pred_t only for its own image slice — take predictions from
    # whichever rank has them
    json_parts = [Path(str(p).replace(".csv", ".json")) for p in parts]
    if json_parts[0].exists():
        merged = json.loads(json_parts[0].read_text())
        for p in json_parts[1:]:
            if not p.exists():
                continue
            for det_key, dets in json.loads(p.read_text()).items():
                for i, d in enumerate(dets):
                    if "pred_R" in d and "pred_R" not in merged[det_key][i]:
                        merged[det_key][i] = d
        json_parts[0].write_text(json.dumps(merged))


def make_infer_fn(model, variables):
    """Build a jitted padded-batch inference callable for ``run_inference``."""
    import jax

    @jax.jit
    def infer(inputs, key):
        return model.apply(variables, inputs, train=False, rngs={"sample": key}, mutable=False)

    return infer


def make_template_fn(model, variables):
    """Build a jitted template-onboarding callable (model.encode_template)
    for ``run_inference(..., template_fn=...)``."""
    import jax

    @jax.jit
    def encode(tem_inputs):
        return model.apply(
            variables,
            tem_inputs["tem1_rgb"],
            tem_inputs["tem1_choose"],
            tem_inputs["tem1_pts"],
            method=model.encode_template,
            mutable=False,
        )

    return encode
