"""Import the UPSTREAM reference's torch modules on CPU for golden parity
tests.

The reference (/root/reference, read-only) requires a compiled CUDA
extension (core.unopose.model.pointnet2._ext) and detectron2's logger.
Neither is available here, so this helper pre-registers stub modules in
sys.modules before importing:

  * ``_ext``: pure-torch CPU implementations with the exact CUDA kernel
    semantics (ball_query: first <= nsample in-radius indices in index
    order, padded with the first found, 0 for empty balls —
    _ext_src/src/ball_query_gpu.cu; gather/group: plain gathers; FPS:
    sequential max-min loop starting at index 0 — sampling_gpu.cu:91);
  * ``detectron2.utils.logger``: no-op log_first_n / log_every_n.

Only used by tests — the production package never imports reference code.
"""

from __future__ import annotations

import importlib.machinery
import sys
import types

import torch

REF_ROOT = "/root/reference"


def _stub_module(name: str) -> types.ModuleType:
    """A sys.modules-injectable stub with a real ModuleSpec.

    A bare ModuleType has ``__spec__ = None``, which makes
    ``importlib.util.find_spec(name)`` raise ValueError — transformers
    probes ``find_spec("detectron2")`` at import time, so a spec-less stub
    leaves transformers partially initialized (the round-2 order-dependent
    test_vit_parity ImportError).
    """
    m = types.ModuleType(name)
    m.__spec__ = importlib.machinery.ModuleSpec(name, None)
    return m


def _make_ext_stub() -> types.ModuleType:
    m = _stub_module("core.unopose.model.pointnet2._ext")

    def ball_query(new_xyz, xyz, radius, nsample):
        # (B, P, 3), (B, N, 3) -> (B, P, nsample) int32
        B, P, _ = new_xyz.shape
        N = xyz.shape[1]
        d2 = ((new_xyz[:, :, None, :] - xyz[:, None, :, :]) ** 2).sum(-1)  # (B, P, N)
        mask = d2 < radius * radius
        iota = torch.arange(N).expand(B, P, N)
        keyed = torch.where(mask, iota, torch.full_like(iota, N))
        srt, _ = torch.sort(keyed, dim=-1)
        out = srt[..., :nsample]
        first = out[..., :1]
        out = torch.where(out == N, first, out)
        out = torch.where(out == N, torch.zeros_like(out), out)  # empty balls -> 0
        return out.int()

    def gather_points(features, idx):
        # (B, C, N), (B, P) -> (B, C, P)
        return torch.gather(features, 2, idx.long().unsqueeze(1).expand(-1, features.shape[1], -1))

    def group_points(features, idx):
        # (B, C, N), (B, P, S) -> (B, C, P, S)
        B, C, N = features.shape
        _, P, S = idx.shape
        flat = idx.reshape(B, 1, P * S).long().expand(-1, C, -1)
        return torch.gather(features, 2, flat).reshape(B, C, P, S)

    def furthest_point_sampling(xyz, npoint):
        # (B, N, 3) -> (B, npoint) int32; starts at index 0 (sampling_gpu.cu:91)
        B, N, _ = xyz.shape
        idx = torch.zeros(B, npoint, dtype=torch.int64)
        dist = torch.full((B, N), float("inf"))
        last = torch.zeros(B, dtype=torch.int64)
        for i in range(npoint):
            idx[:, i] = last
            d = ((xyz - xyz[torch.arange(B), last][:, None, :]) ** 2).sum(-1)
            dist = torch.minimum(dist, d)
            last = dist.argmax(-1)
        return idx.int()

    m.ball_query = ball_query
    m.gather_points = gather_points
    m.group_points = group_points
    m.furthest_point_sampling = furthest_point_sampling
    return m


def install_stubs() -> None:
    if "core.unopose.model.pointnet2._ext" not in sys.modules:
        sys.modules["core.unopose.model.pointnet2._ext"] = _make_ext_stub()
    if "detectron2" not in sys.modules:
        try:
            import detectron2  # noqa: F401
        except ImportError:
            d2 = _stub_module("detectron2")
            d2u = _stub_module("detectron2.utils")
            d2l = _stub_module("detectron2.utils.logger")
            d2l.log_first_n = lambda *a, **k: None
            d2l.log_every_n = lambda *a, **k: None
            d2.utils = d2u
            d2u.logger = d2l
            sys.modules["detectron2"] = d2
            sys.modules["detectron2.utils"] = d2u
            sys.modules["detectron2.utils.logger"] = d2l
    if REF_ROOT not in sys.path:
        sys.path.insert(0, REF_ROOT)


def import_ref(module: str):
    """Import a reference module (e.g. 'core.unopose.model.transformer')
    with the stubs installed."""
    import importlib

    install_stubs()
    return importlib.import_module(module)
