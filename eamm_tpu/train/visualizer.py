"""Diagnostic image-grid visualizer.

Reproduces the reference Visualizer's checkpoint-time grid
(ref:logger.py:107-222): source image with keypoint dots, driving frame
with keypoints, deformed source, prediction, occlusion map, and per-keypoint
masked sparse deformations, tiled into one PNG.  Implemented with pure
numpy (the reference needs matplotlib + skimage.draw.circle, the latter
long deprecated — SURVEY.md §2.4).
"""
from __future__ import annotations

import os

import numpy as np


def _colormap(n: int) -> np.ndarray:
    """n distinct RGB colors (gist_rainbow-like hue sweep)."""
    hues = np.linspace(0.0, 0.92, n)
    colors = []
    for h in hues:
        i = int(h * 6) % 6
        f = h * 6 - int(h * 6)
        p, q, t = 0.0, 1 - f, f
        rgb = [(1, t, p), (q, 1, p), (p, 1, t), (p, q, 1), (t, p, 1),
               (1, p, q)][i]
        colors.append(rgb)
    return np.asarray(colors)


def draw_kp(image: np.ndarray, kp_value: np.ndarray, kp_size: int = 5,
            colormap: np.ndarray | None = None) -> np.ndarray:
    """Draw keypoints ([-1,1] coords) as colored dots on [H,W,3] image."""
    img = np.array(image, copy=True)
    H, W = img.shape[:2]
    K = kp_value.shape[0]
    colors = _colormap(K) if colormap is None else colormap
    spots = (kp_value + 1.0) / 2.0 * np.array([W - 1, H - 1])
    yy, xx = np.mgrid[:H, :W]
    for k in range(K):
        cx, cy = spots[k]
        mask = (xx - cx) ** 2 + (yy - cy) ** 2 <= kp_size ** 2
        img[mask] = colors[k]
    return img


def make_grid(rows: list[list[np.ndarray]]) -> np.ndarray:
    """Tile [H,W,3] panels: inner lists side-by-side, rows stacked."""
    return np.concatenate([np.concatenate(row, axis=1) for row in rows],
                          axis=0)


class Visualizer:
    def __init__(self, kp_size: int = 5, draw_border: bool = True,
                 colormap: str = "gist_rainbow"):
        self.kp_size = kp_size
        self.draw_border = draw_border

    def visualize(self, driving: np.ndarray, source: np.ndarray,
                  out: dict) -> np.ndarray:
        """Build the diagnostic grid (all images NHWC float [0,1]; ``out``
        uses the generator output dict contract)."""
        panels = []
        src = np.asarray(source[0])
        panels.append(draw_kp(src, np.asarray(out["kp_source"]["value"][0]),
                              self.kp_size))
        drv = np.asarray(driving[0])
        if "kp_driving" in out:
            drv = draw_kp(drv, np.asarray(out["kp_driving"]["value"][0]),
                          self.kp_size)
        panels.append(drv)
        if "deformed" in out:
            panels.append(np.asarray(out["deformed"][0]))
        panels.append(np.asarray(out["prediction"][0]))
        if "occlusion_map" in out:
            occ = np.asarray(out["occlusion_map"][0])
            occ = np.repeat(occ, 3, axis=-1) if occ.shape[-1] == 1 else occ
            occ = np.kron(occ, np.ones((4, 4, 1)))[:src.shape[0], :src.shape[1]]
            panels.append(occ)
        rows = [panels]
        if "sparse_deformed" in out:
            sparse = np.asarray(out["sparse_deformed"][0])     # [K+1,h,w,3]
            mask = np.asarray(out["mask"][0])                  # [h,w,K+1]
            row = []
            for k in range(sparse.shape[0]):
                panel = sparse[k] * mask[..., k:k + 1]
                panel = np.kron(panel, np.ones((4, 4, 1)))
                panel = panel[:src.shape[0], :src.shape[1]]
                row.append(panel)
                if len(row) * src.shape[1] >= len(panels) * src.shape[1]:
                    rows.append(row)
                    row = []
            if row:
                pad = np.zeros_like(row[0])
                while len(row) < len(rows[-1] if len(rows) > 1 else panels):
                    row.append(pad)
                rows.append(row[:len(panels)])
        width = min(len(r) for r in rows)
        rows = [r[:width] for r in rows]
        return np.clip(make_grid(rows), 0, 1)

    def save(self, path: str, driving, source, out):
        import imageio.v2 as imageio
        grid = self.visualize(driving, source, out)
        os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
        imageio.imwrite(path, (grid * 255).astype(np.uint8))
        return path
