"""Optical-flow file IO: Middlebury .flo and KITTI 16-bit PNG.

Equivalents of the reference's inline parsers (sintel.py:62-69 custom .flo
reader; torchvision KittiFlow's PNG decoding used via kitti_single.py).
Flow arrays are (H, W, 2) float32 in (dx, dy).
"""

from __future__ import annotations

import numpy as np

FLO_MAGIC = 202021.25


def read_flo(path) -> np.ndarray:
    with open(path, "rb") as f:
        magic = np.fromfile(f, np.float32, count=1)[0]
        assert abs(float(magic) - FLO_MAGIC) < 1e-3, f"bad .flo magic in {path}"
        w = int(np.fromfile(f, np.int32, count=1)[0])
        h = int(np.fromfile(f, np.int32, count=1)[0])
        data = np.fromfile(f, np.float32, count=h * w * 2)
    return data.reshape(h, w, 2)


def write_flo(path, flow: np.ndarray) -> None:
    flow = np.asarray(flow, np.float32)
    h, w = flow.shape[:2]
    with open(path, "wb") as f:
        np.asarray([FLO_MAGIC], np.float32).tofile(f)
        np.asarray([w, h], np.int32).tofile(f)
        flow.astype(np.float32).tofile(f)


def read_kitti_png(path):
    """KITTI flow PNG: 16-bit RGB (u*64+2^15, v*64+2^15, valid).

    Returns (flow (H,W,2) float32, valid (H,W) bool).
    """
    import cv2

    raw = cv2.imread(str(path), cv2.IMREAD_ANYDEPTH | cv2.IMREAD_COLOR)
    if raw is None:
        raise FileNotFoundError(path)
    raw = raw[..., ::-1].astype(np.float32)  # BGR -> RGB
    flow = (raw[..., :2] - 2 ** 15) / 64.0
    valid = raw[..., 2] > 0
    return flow, valid


__all__ = ["read_flo", "write_flo", "read_kitti_png", "FLO_MAGIC"]
