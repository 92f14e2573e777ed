"""Procedural moving-shapes dataset with exact integer ground-truth flow.

Rebuild of the reference ArtificialDataset (datasets/animation/
artificial.py:10-75): a shape (box/square/pixel/2x1) over a white or
checkerboard background moves by a random flow in {-1,0,1}^2; frames and the
dense GT flow map are generated analytically.  Deterministic given
``cfg.seed``.  Emits NHWC float32 frames in [0,1] and flow (dx, dy)
(the reference's channel order is (dy, dx); see ops/warp.py convention note).
"""

from __future__ import annotations

import numpy as np

from ..config import Config


class ArtificialDataset:
    def __init__(self, cfg: Config, split: str = "training", device=None):
        self.cfg = cfg
        self.image_size = int(cfg.image_size)
        self.size = int(cfg.size)
        seed = cfg.get("seed")
        rng = np.random.default_rng(seed if seed is not None else 14)

        S = self.image_size
        self.initial = (rng.random((self.size, 2)) * S).astype(np.int64)

        shape = cfg.get("shape", "boxes")
        if shape == "boxes":
            self.wh = (rng.random((self.size, 2)) * S).astype(np.int64)
        elif shape == "squares":
            wh = (rng.random((self.size, 1)) * S).astype(np.int64)
            self.wh = np.tile(wh, (1, 2))
        elif shape == "pixel":
            self.wh = np.ones((self.size, 2), np.int64)
        elif shape == "2by1":
            self.wh = np.ones((self.size, 2), np.int64)
            self.wh[:, 0] = 2
        else:
            raise ValueError(f"unknown shape {shape}")

        # max_motion: rebuild extension (default 1 = the reference's
        # {-1,0,1}^2 motions) — larger motions give flow-model pretraining
        # (training/flow_pretrain.py) a stronger supervision signal
        self.max_motion = int(cfg.get("max_motion", 1))
        m = self.max_motion
        self.flows = (rng.random((self.size, 2)) * (2 * m + 1)).astype(
            np.int64
        ) - m

    def _background(self) -> np.ndarray:
        S = self.image_size
        bg = np.ones((S, S, 3), np.float32)
        if self.cfg.get("bg", "white") == "checkers":
            bg[::2, ::2] = 0.2
            bg[::4, ::4] = 0.4
        return bg

    def __len__(self) -> int:
        return self.size

    def __getitem__(self, index: int):
        S = self.image_size
        m = self.max_motion
        # native C++ fast path (identical semantics; see native/ofd_native.cpp)
        from . import native

        if native.available() and m == 1:
            y0, x0 = self.initial[index]
            hh, ww = self.wh[index]
            fy, fx = self.flows[index]
            checkers = int(self.cfg.get("bg", "white") == "checkers")
            out = native.artificial_sample(S, y0, x0, hh, ww, fy, fx, checkers)
            if out is not None:
                return out

        bg = self._background()
        y0, x0 = self.initial[index]          # reference dim0 = rows
        hh, ww = self.wh[index]
        fy, fx = self.flows[index]

        first = np.tile(bg, (2, 2, 1))
        first[y0 : y0 + hh, x0 : x0 + ww] = 0.0

        second = np.ones((2 * S + 2 * m, 2 * S + 2 * m, 3), np.float32)
        second[m:-m, m:-m] = np.tile(bg, (2, 2, 1))
        second[
            y0 + fy + m : y0 + fy + hh + m, x0 + fx + m : x0 + fx + ww + m
        ] = 0.0

        flow = np.zeros((2 * S, 2 * S, 2), np.float32)
        flow[y0 : y0 + hh, x0 : x0 + ww, 0] = fx
        flow[y0 : y0 + hh, x0 : x0 + ww, 1] = fy

        first = first[:S, :S]
        second = second[m : m + S, m : m + S]
        flow = flow[:S, :S]
        return first, second, flow


__all__ = ["ArtificialDataset"]
