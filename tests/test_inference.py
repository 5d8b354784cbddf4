"""Engine inference tests: template caching plumbing, shard merging
(strict missing-rank error + per-rank JSON merge)."""

import json

import numpy as np
import pytest

from unopose_tpu.engine.inference import TemplateCache, merge_csv_shards, run_inference


class FakeDataset:
    """Mimics BOPTestsetPoseFreeOneRef's per-image dict contract with refs
    shared across images (the cross-scene reuse pattern)."""

    def __init__(self, n_images=4, n_inst=3, n_pts=16, n_tem=24, img=8, seed=0):
        rng = np.random.default_rng(seed)
        self.items = []
        self.dets = {}
        # 2 unique refs shared across all images
        refs = {
            r: dict(
                tem1_rgb=rng.normal(size=(img, img, 3)).astype(np.float32),
                tem1_choose=rng.integers(0, img * img, size=(n_tem,)).astype(np.int32),
                tem1_pts=rng.normal(size=(n_tem, 3)).astype(np.float32),
                ref_key=np.asarray([50, 100 + r, r + 1], np.int64),
            )
            for r in range(2)
        }
        for i in range(n_images):
            det_key = f"{1:06d}_{i:06d}"
            self.dets[det_key] = [dict(score=0.9) for _ in range(n_inst)]
            inst = []
            for k in range(n_inst):
                ref = refs[(i + k) % 2]
                inst.append(
                    dict(
                        pts=rng.normal(size=(n_pts, 3)).astype(np.float32),
                        rgb=rng.normal(size=(img, img, 3)).astype(np.float32),
                        rgb_choose=rng.integers(0, img * img, size=(n_pts,)).astype(np.int32),
                        obj_id=np.asarray([k + 1], np.int32),
                        score=np.asarray([0.9], np.float32),
                        tem1_pose=np.eye(4, dtype=np.float32),
                        **ref,
                    )
                )
            data = {k: np.stack([d[k] for d in inst]) for k in inst[0]}
            data["scene_id"] = np.asarray([1], np.int32)
            data["img_id"] = np.asarray([i], np.int32)
            data["inst_ids"] = np.arange(n_inst, dtype=np.int32)
            data["seg_time"] = np.asarray([0.0], np.float32)
            self.items.append(data)

    def __len__(self):
        return len(self.items)

    def __getitem__(self, i):
        return self.items[i]


def _fake_template_fn(tem):
    """Deterministic 'onboarding': summarize the template inputs."""
    return dict(
        dense_po=tem["tem1_pts"][:, :4],
        dense_fo=tem["tem1_pts"][:, 4:8] * 2.0,
        tem1_radius=np.linalg.norm(tem["tem1_pts"], axis=-1).max(1),
    )


def _fake_infer_fn(inputs, key):
    """Pose derived from the SAME template summary, via either input set —
    so cached and uncached runs must produce identical CSVs."""
    del key
    if "dense_po" in inputs:
        po, fo, rad = inputs["dense_po"], inputs["dense_fo"], inputs["tem1_radius"]
    else:
        t = _fake_template_fn(inputs)
        po, fo, rad = t["dense_po"], t["dense_fo"], t["tem1_radius"]
    B = po.shape[0]
    return dict(
        pred_R=np.tile(np.eye(3, dtype=np.float32), (B, 1, 1)),
        pred_t=po.mean(1) + fo.mean(1) + inputs["pts"].mean(1) + rad[:, None],
        pred_pose_score=np.abs(po).sum((1, 2)),
    )


def _strip_time(lines):
    return [",".join(ln.split(",")[:-1]) for ln in lines]


def test_run_inference_template_cache_identical(tmp_path):
    ds = FakeDataset()
    p1, p2 = str(tmp_path / "plain.csv"), str(tmp_path / "cached.csv")
    lines_plain = run_inference(_fake_infer_fn, ds, p1, instance_batch_size=2, num_shards=1, shard_index=0)
    lines_cached = run_inference(
        _fake_infer_fn, ds, p2, instance_batch_size=2, num_shards=1, shard_index=0, template_fn=_fake_template_fn
    )
    assert _strip_time(lines_plain) == _strip_time(lines_cached)


def test_template_cache_computes_each_ref_once():
    ds = FakeDataset()
    calls = []

    def counting_template_fn(tem):
        calls.append(tem["tem1_pts"].shape[0])
        return _fake_template_fn(tem)

    cache = TemplateCache(counting_template_fn, batch_size=2)
    for i in range(len(ds)):
        cache.ensure(ds[i])
    # 2 unique refs -> one padded batch on the first image, none after
    assert len(calls) == 1
    assert len(cache._store) == 2


def test_template_cache_lru_eviction():
    cache = TemplateCache(_fake_template_fn, batch_size=4, max_entries=2)
    rng = np.random.default_rng(0)
    data = dict(
        tem1_rgb=rng.normal(size=(3, 4, 4, 3)).astype(np.float32),
        tem1_choose=np.zeros((3, 8), np.int32),
        tem1_pts=rng.normal(size=(3, 8, 3)).astype(np.float32),
        ref_key=np.asarray([[1, 1, 1], [2, 2, 2], [3, 3, 3]], np.int64),
    )
    cache.ensure(data)
    assert len(cache._store) == 2
    assert (1, 1, 1) not in cache._store  # oldest evicted


def test_merge_csv_shards_strict_raises(tmp_path):
    p = tmp_path / "result.csv"
    p.write_text("a\n")
    (tmp_path / "result.csv.rank2").write_text("c\n")
    with pytest.raises(FileNotFoundError, match="rank1"):
        merge_csv_shards(str(p), 3)
    # non-strict merges what exists
    merge_csv_shards(str(p), 3, strict=False)
    assert p.read_text() == "a\nc\n"


def test_merge_json_shards(tmp_path):
    p = tmp_path / "result.csv"
    p.write_text("a\n")
    (tmp_path / "result.csv.rank1").write_text("b\n")
    json.dump(
        {"im0": [{"score": 1, "pred_R": [1]}], "im1": [{"score": 2}]},
        open(tmp_path / "result.json", "w"),
    )
    json.dump(
        {"im0": [{"score": 1}], "im1": [{"score": 2, "pred_R": [9]}]},
        open(tmp_path / "result.json.rank1", "w"),
    )
    merge_csv_shards(str(p), 2)
    merged = json.load(open(tmp_path / "result.json"))
    assert merged["im0"][0]["pred_R"] == [1]
    assert merged["im1"][0]["pred_R"] == [9]
