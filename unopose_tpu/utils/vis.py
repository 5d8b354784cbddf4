"""Debug visualization helpers (counterpart of reference utils/vis_utils.py
plot_3d + utils/draw_utils.py detection drawing). Matplotlib/cv2 are only
imported inside the functions — headless training never pays for them."""

from __future__ import annotations

import numpy as np


def plot_3d(pts1: np.ndarray, pts2: np.ndarray | None = None, title: str = "", save_path: str | None = None):
    """Scatter one or two clouds (N, 3) in a 3D axes (reference vis_utils.py:1-18)."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig = plt.figure()
    ax = fig.add_subplot(projection="3d")
    p1 = np.asarray(pts1)
    ax.scatter(p1[:, 0], p1[:, 1], p1[:, 2], s=1, c="tab:blue", label="pts1")
    if pts2 is not None:
        p2 = np.asarray(pts2)
        ax.scatter(p2[:, 0], p2[:, 1], p2[:, 2], s=1, c="tab:orange", label="pts2")
    ax.set_title(title)
    ax.legend()
    if save_path:
        fig.savefig(save_path, dpi=120)
        plt.close(fig)
        return save_path
    return fig


def project_bbox3d(bbox_3d: np.ndarray, K: np.ndarray, R: np.ndarray, t: np.ndarray) -> np.ndarray:
    """Project 8 object-frame bbox corners to pixels (draw_utils.py:6-33)."""
    cam = bbox_3d @ np.asarray(R).T + np.asarray(t).reshape(1, 3)
    uv = cam @ np.asarray(K).T
    return uv[:, :2] / uv[:, 2:3]


def draw_projected_box3d(image: np.ndarray, qs: np.ndarray, color=(0, 255, 0), thickness: int = 2) -> np.ndarray:
    """Draw a projected 3D box (8, 2) on an image (draw_utils.py:36-96 layout:
    0-3 front face, 4-7 back face)."""
    import cv2

    img = np.ascontiguousarray(image)
    qs = qs.astype(np.int32)
    for k in range(4):
        i, j = k, (k + 1) % 4
        cv2.line(img, tuple(qs[i]), tuple(qs[j]), color, thickness)
        i, j = k + 4, (k + 1) % 4 + 4
        cv2.line(img, tuple(qs[i]), tuple(qs[j]), color, thickness)
        cv2.line(img, tuple(qs[k]), tuple(qs[k + 4]), color, thickness)
    return img
