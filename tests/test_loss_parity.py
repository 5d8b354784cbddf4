"""Golden parity: reference torch loss functions (loss_utils.py) vs
unopose_tpu.losses on random inputs (VERDICT round-1 item 6). Training
correctness rests on these being exact."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax.numpy as jnp

from tests.ref_stub import import_ref
from unopose_tpu import losses

ATOL = 1e-5


def _rand_rot(rng):
    q = rng.normal(size=4)
    q /= np.linalg.norm(q)
    w, x, y, z = q
    return np.array(
        [
            [1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y)],
            [2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x)],
            [2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y)],
        ],
        dtype=np.float32,
    )


@pytest.fixture(scope="module")
def ref_loss_utils():
    return import_ref("core.unopose.utils.loss_utils")


def _overlap_inputs(rng, B=3, n1=40, n2=56, nblock=3):
    pts2 = rng.normal(size=(B, n2, 3)).astype(np.float32) * 0.4
    gt_r = np.stack([_rand_rot(rng) for _ in range(B)])
    gt_t = rng.normal(size=(B, 3)).astype(np.float32) * 0.1
    # pts1 built so a good fraction of points overlap after the GT transform
    src_rows = rng.integers(0, n2, size=(B, n1))
    base = np.take_along_axis(pts2, src_rows[..., None], axis=1)
    noise = rng.normal(size=(B, n1, 3)).astype(np.float32) * 0.08
    pts1 = np.einsum("bij,bnj->bni", gt_r, base + noise) + gt_t[:, None]
    attens = [rng.normal(size=(B, n1 + 1, n2 + 1)).astype(np.float32) * 2 for _ in range(nblock)]
    scores = [rng.uniform(0.01, 0.99, size=(B, n1 + n2)).astype(np.float32) for _ in range(nblock)]
    sals = [rng.uniform(0.01, 0.99, size=(B, n1 + n2)).astype(np.float32) for _ in range(nblock)]
    return attens, scores, sals, pts1.astype(np.float32), pts2, gt_r, gt_t


def test_weighted_bce_parity(ref_loss_utils):
    rng = np.random.default_rng(0)
    for _ in range(3):
        pred = rng.uniform(0.01, 0.99, size=(4, 77)).astype(np.float32)
        gt = (rng.uniform(size=(4, 77)) < 0.3).astype(np.float32)
        ref = ref_loss_utils.get_weighted_bce_loss(torch.from_numpy(pred), torch.from_numpy(gt))
        ours = losses.weighted_bce(jnp.asarray(pred), jnp.asarray(gt))
        np.testing.assert_allclose(np.asarray(ours), ref.numpy(), atol=ATOL)


@pytest.mark.parametrize("loss_str", ["coarse_hard", "fine"])
def test_compute_overlap_loss_parity(ref_loss_utils, loss_str):
    rng = np.random.default_rng(1 + len(loss_str))
    attens, scores, sals, pts1, pts2, gt_r, gt_t = _overlap_inputs(rng)

    t = torch.from_numpy
    end_points = ref_loss_utils.compute_overlap_loss(
        {},
        [t(a) for a in attens],
        [t(s) for s in scores],
        [t(s) for s in sals],
        t(pts1),
        t(pts2),
        t(gt_r),
        t(gt_t),
        predator_thres=0.15,
        dis_thres=0.3,
        loss_str=loss_str,
    )
    ours = losses.compute_overlap_loss(
        [jnp.asarray(a) for a in attens],
        [jnp.asarray(s) for s in scores],
        [jnp.asarray(s) for s in sals],
        jnp.asarray(pts1),
        jnp.asarray(pts2),
        jnp.asarray(gt_r),
        jnp.asarray(gt_t),
        predator_thres=0.15,
        dis_thres=0.3,
        loss_str=loss_str,
    )
    assert set(ours.keys()) == set(end_points.keys())
    for k in end_points:
        np.testing.assert_allclose(
            np.asarray(ours[k]), end_points[k].numpy(), atol=1e-4, rtol=1e-5, err_msg=k
        )
    # sanity: the fixture must exercise both fg and bg labels
    assert 0 < float(jnp.mean(ours[f"{loss_str}_acc"])) < 1 or float(jnp.sum(ours[f"{loss_str}_fg_num"])) > 0


def test_process_loss_parity(ref_loss_utils):
    rng = np.random.default_rng(2)
    attens, scores, sals, pts1, pts2, gt_r, gt_t = _overlap_inputs(rng, B=2)
    t = torch.from_numpy
    ref_ep = ref_loss_utils.compute_overlap_loss(
        {}, [t(a) for a in attens], [t(s) for s in scores], [t(s) for s in sals],
        t(pts1), t(pts2), t(gt_r), t(gt_t), loss_str="fine",
    )
    ours_ep = losses.compute_overlap_loss(
        [jnp.asarray(a) for a in attens], [jnp.asarray(s) for s in scores],
        [jnp.asarray(s) for s in sals], jnp.asarray(pts1), jnp.asarray(pts2),
        jnp.asarray(gt_r), jnp.asarray(gt_t), loss_str="fine",
    )
    ref_out = ref_loss_utils.process_loss(ref_ep)
    ours_out = losses.process_loss(ours_ep)
    np.testing.assert_allclose(float(ours_out["loss"]), float(ref_out["loss"]), atol=1e-4)
    for k in ref_out:
        if k != "loss":
            np.testing.assert_allclose(float(ours_out[k]), float(ref_out[k]), atol=1e-4, err_msg=k)


def test_compute_soft_loss_parity(ref_loss_utils):
    """Soft node-overlap CE (disabled in the main config but part of the
    surface): reference consumes (B, n2+1, n1)/(B, n1+1, n2) prob targets,
    ours the transposed layout."""
    rng = np.random.default_rng(3)
    B, n1, n2 = 2, 12, 18
    attens = [rng.normal(size=(B, n1 + 1, n2 + 1)).astype(np.float32) for _ in range(2)]
    row = rng.uniform(size=(B, n1, n2 + 1)).astype(np.float32)
    row /= row.sum(-1, keepdims=True)
    col = rng.uniform(size=(B, n2, n1 + 1)).astype(np.float32)
    col /= col.sum(-1, keepdims=True)

    t = torch.from_numpy
    end_points = {
        "node_corr_norm_row": t(np.swapaxes(row, 1, 2).copy()),
        "node_corr_norm_col": t(np.swapaxes(col, 1, 2).copy()),
    }
    ref = ref_loss_utils.compute_soft_loss(
        end_points, [t(a) for a in attens], None, None, None, None, loss_str="soft"
    )
    ours = losses.compute_soft_loss([jnp.asarray(a) for a in attens], jnp.asarray(row), jnp.asarray(col), loss_str="soft")
    for idx in range(2):
        np.testing.assert_allclose(
            np.asarray(ours[f"soft_loss{idx}"]), ref[f"soft_loss{idx}"].numpy(), atol=1e-5
        )
