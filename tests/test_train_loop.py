"""End-to-end train_loop smoke test: synthetic data, mesh, writer, checkpointer."""

import numpy as np
import jax.numpy as jnp

from unopose_tpu.configs.main_cfg import get_tiny_cfg
from unopose_tpu.data.loader import collate, synthetic_train_iter
from unopose_tpu.engine.train import train_loop
from unopose_tpu.models import UNOPose
from unopose_tpu.parallel.mesh import make_mesh
from unopose_tpu.utils.writer import JSONWriter, MultiWriter

from tests.test_model import IMG, NPTS, NCOARSE, NTEM


class RecordingWriter:
    def __init__(self):
        self.records = []
        self.images = []

    def write(self, step, metrics):
        self.records.append((step, dict(metrics)))

    def write_image(self, step, tag, img):
        self.images.append((step, tag, img.shape, img.dtype))


class RecordingCkpt:
    period = 2

    def __init__(self):
        self.saved = []

    def save(self, step, state):
        self.saved.append(step)


def test_train_loop_runs(tmp_path):
    cfg = get_tiny_cfg(IMG, NPTS, NCOARSE, NTEM)
    cfg.train.max_iter = 4
    cfg.train.log_period = 1
    cfg.train.vis_img_tbx = True
    cfg.train.checkpointer.period = 2
    model = UNOPose.from_config(cfg.model, dtype=jnp.float32, backbone_dtype=jnp.float32)
    data_iter = synthetic_train_iter(8, img_size=IMG, n_pts=NPTS, n_tem=NTEM)

    writer = RecordingWriter()
    ckpt = RecordingCkpt()
    json_writer = JSONWriter(str(tmp_path / "metrics.json"))
    multi = MultiWriter(writer, json_writer)

    state = train_loop(model, cfg, data_iter, mesh=make_mesh(8), writer=multi, checkpointer=ckpt)
    assert int(state.step) == 4
    assert [s for s, _ in writer.records] == [0, 1, 2, 3]
    losses = [m["loss"] for _, m in writer.records]
    assert all(np.isfinite(l) for l in losses)
    assert ckpt.saved == [2, 4]
    lines = open(tmp_path / "metrics.json").read().strip().splitlines()
    assert len(lines) == 4
    # vis_img_tbx: one denormalized uint8 HWC crop per logged step
    assert len(writer.images) == 4
    step0, tag, shape, dtype = writer.images[0]
    assert tag == "input_image" and shape == (IMG, IMG, 3) and dtype == np.uint8


def test_tensorboard_image_histogram(tmp_path):
    """TensorBoard image/histogram writers (reference my_writer.py:86-105)
    produce a non-empty event file; MultiWriter dispatches only to writers
    that support the method."""
    from unopose_tpu.utils.writer import TensorboardWriter

    w = TensorboardWriter(str(tmp_path / "tb"))
    w.write(0, {"loss": 1.0})
    w.write_image(1, "img", np.zeros((8, 8, 3), np.uint8))
    w.write_histogram(1, "h", np.arange(10.0))
    w.close()
    files = list((tmp_path / "tb").glob("events*"))
    assert files and files[0].stat().st_size > 0

    multi = MultiWriter(JSONWriter(str(tmp_path / "m.json")), RecordingWriter())
    multi.write_image(0, "img", np.zeros((4, 4, 3), np.uint8))  # no crash
    multi.write_histogram(0, "h", [1.0])
    multi.close()


def test_collate():
    samples = [dict(a=np.ones((2, 3)), b=np.zeros(4)) for _ in range(3)]
    out = collate(samples)
    assert out["a"].shape == (3, 2, 3) and out["b"].shape == (3, 4)


def test_finite_loss_guard(tmp_path):
    """A non-finite loss must halt the run (reference engine.py:169)."""
    import pytest

    cfg = get_tiny_cfg(IMG, NPTS, NCOARSE, NTEM)
    cfg.train.max_iter = 2
    cfg.train.log_period = 1
    model = UNOPose.from_config(cfg.model, dtype=jnp.float32, backbone_dtype=jnp.float32)

    def poisoned():
        for batch in synthetic_train_iter(8, img_size=IMG, n_pts=NPTS, n_tem=NTEM):
            batch["pts"] = batch["pts"] * np.nan
            yield batch

    with pytest.raises(FloatingPointError, match="non-finite loss"):
        train_loop(model, cfg, poisoned(), mesh=make_mesh(8), writer=RecordingWriter())


def test_convergence_smoke():
    """>= 50 optimization steps on geometrically-consistent synthetic data:
    the loss trend must decrease (VERDICT round-1 item 7). Slow-marked."""
    import pytest

    pytest.importorskip("os")
    import os

    if not os.environ.get("UNOPOSE_RUN_SLOW"):
        pytest.skip("slow test: set UNOPOSE_RUN_SLOW=1 to run")

    cfg = get_tiny_cfg(IMG, NPTS, NCOARSE, NTEM)
    cfg.train.max_iter = 60
    cfg.train.log_period = 1
    cfg.lr_multiplier.warmup_iters = 10
    cfg.optimizer.lr = 3e-4
    model = UNOPose.from_config(cfg.model, dtype=jnp.float32, backbone_dtype=jnp.float32)
    data_iter = synthetic_train_iter(8, img_size=IMG, n_pts=NPTS, n_tem=NTEM)

    writer = RecordingWriter()
    train_loop(model, cfg, data_iter, mesh=make_mesh(8), writer=writer)
    losses = np.array([m["loss"] for _, m in writer.records])
    assert np.isfinite(losses).all()
    head, tail = losses[:10].mean(), losses[-10:].mean()
    assert tail < head * 0.9, f"no convergence: first10={head:.4f} last10={tail:.4f}"
