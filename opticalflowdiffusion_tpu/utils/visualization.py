"""Flow/image visualization utilities.

Supplies the equivalents of the reference's missing ``utils`` package
(SURVEY.md C35) and of ``torchvision.utils.flow_to_image``: the Baker et al.
optical-flow color wheel, image grids, and simple video stacking for the
logger facade.

All functions take NHWC numpy/JAX arrays and return numpy uint8 or float
images suitable for PNG dumping.
"""

from __future__ import annotations

import numpy as np

Array = np.ndarray


def _make_colorwheel() -> np.ndarray:
    """55-entry flow color wheel (Baker et al., the same wheel torchvision
    uses for ``flow_to_image``)."""
    RY, YG, GC, CB, BM, MR = 15, 6, 4, 11, 13, 6
    ncols = RY + YG + GC + CB + BM + MR
    wheel = np.zeros((ncols, 3))
    col = 0
    wheel[0:RY, 0] = 255
    wheel[0:RY, 1] = np.floor(255 * np.arange(0, RY) / RY)
    col += RY
    wheel[col : col + YG, 0] = 255 - np.floor(255 * np.arange(0, YG) / YG)
    wheel[col : col + YG, 1] = 255
    col += YG
    wheel[col : col + GC, 1] = 255
    wheel[col : col + GC, 2] = np.floor(255 * np.arange(0, GC) / GC)
    col += GC
    wheel[col : col + CB, 1] = 255 - np.floor(255 * np.arange(CB) / CB)
    wheel[col : col + CB, 2] = 255
    col += CB
    wheel[col : col + BM, 2] = 255
    wheel[col : col + BM, 0] = np.floor(255 * np.arange(0, BM) / BM)
    col += BM
    wheel[col : col + MR, 2] = 255 - np.floor(255 * np.arange(MR) / MR)
    wheel[col : col + MR, 0] = 255
    return wheel


_COLORWHEEL = _make_colorwheel()


def flow_to_image(flow: Array) -> np.ndarray:
    """Render (B, H, W, 2) flow (dx, dy) to (B, H, W, 3) float RGB in [0, 1].

    Matches torchvision.utils.flow_to_image semantics (per-batch max-radius
    normalization) used throughout the reference's validation logging
    (e.g. flow_diffuser.py:288).
    """
    flow = np.asarray(flow, np.float32)
    # non-finite flow (e.g. a diverged model's output) must not crash the
    # visualizer — NaN floors to INT_MIN under astype(int) below
    flow = np.nan_to_num(flow, nan=0.0, posinf=0.0, neginf=0.0)
    if flow.ndim == 3:
        flow = flow[None]
    u, v = flow[..., 0], flow[..., 1]
    rad = np.sqrt(u ** 2 + v ** 2)
    eps = 1e-5
    max_rad = np.maximum(rad.reshape(rad.shape[0], -1).max(axis=1), eps)
    u = u / max_rad[:, None, None]
    v = v / max_rad[:, None, None]
    rad = np.sqrt(u ** 2 + v ** 2)

    ncols = _COLORWHEEL.shape[0]
    a = np.arctan2(-v, -u) / np.pi
    fk = (a + 1) / 2 * (ncols - 1)
    k0 = np.floor(fk).astype(int)
    k1 = (k0 + 1) % ncols
    f = fk - k0

    img = np.zeros(u.shape + (3,), np.float32)
    for c in range(3):
        col0 = _COLORWHEEL[k0, c] / 255.0
        col1 = _COLORWHEEL[k1, c] / 255.0
        col = (1 - f) * col0 + f * col1
        idx = rad <= 1
        col[idx] = 1 - rad[idx] * (1 - col[idx])
        col[~idx] = col[~idx] * 0.75
        img[..., c] = col
    return np.clip(img, 0.0, 1.0)


def make_grid(images: Array, nrow: int = 8, pad: int = 2, pad_value: float = 1.0):
    """Tile (B, H, W, C) into one image grid (like torchvision make_grid)."""
    images = np.asarray(images)
    B, H, W, C = images.shape
    ncol = min(nrow, B)
    nrow_ = (B + ncol - 1) // ncol
    grid = np.full(
        (nrow_ * (H + pad) + pad, ncol * (W + pad) + pad, C), pad_value, np.float32
    )
    for i in range(B):
        r, c = divmod(i, ncol)
        y0 = r * (H + pad) + pad
        x0 = c * (W + pad) + pad
        grid[y0 : y0 + H, x0 : x0 + W] = images[i]
    return grid


def to_uint8(img: Array) -> np.ndarray:
    return (np.clip(np.asarray(img, np.float32), 0.0, 1.0) * 255).astype(np.uint8)


def save_image(img: Array, path) -> None:
    """Save an (H, W, C) or (B, H, W, C) float image to PNG."""
    from PIL import Image

    img = np.asarray(img)
    if img.ndim == 4:
        img = make_grid(img)
    if img.shape[-1] == 1:
        img = np.repeat(img, 3, axis=-1)
    Image.fromarray(to_uint8(img)).save(path)


def stack_video(*frame_sets: Array, border: int = 1):
    """Side-by-side video tensor (T, H', W', C) from per-stream (B,H,W,C)
    frames, the equivalent of the reference's wandb.Video comparisons
    (matrix_flow.py:628-647)."""
    framed = []
    for f in frame_sets:
        f = np.asarray(f)
        B, H, W, C = f.shape
        canvas = np.ones((B, H + 2 * border, W + 2 * border, C), np.float32)
        canvas[:, border : border + H, border : border + W] = f
        framed.append(np.concatenate(list(canvas), axis=1))  # stack batch on H
    return np.stack(framed, axis=0)  # (num_streams=T, H', W', C)


__all__ = ["flow_to_image", "make_grid", "save_image", "to_uint8", "stack_video"]
