"""Procedural constant-velocity video dataset with exact GT flow.

A video extension of :mod:`data/artificial` (reference datasets/animation/
artificial.py:10-75) in the TaiChi batch layout (data/taichi.py, reference
taichi.py:55-77): a black box over a white background moves with a constant
per-sequence integer velocity; items are [target(3), last_frame(3), flow(2)]
channel stacks — train: one (H, W, 8) stack at a random time step,
validation: (val_length, H, W, 8) consecutive stacks.

Purpose: deterministic trained-parity evidence for the animation family
(FrameGenerator's autoregressive rollout and FlowCompleter) — given
(last_frame, flow) conditioning and constant velocity, the next frame is
fully determined, so rollout error against the GT continuation directly
measures whether the generator learned the conditional dynamics
(reference diffusion_animation.py:84-92 val rollout).  TaiChi video data
itself is not redistributable in this environment.
"""

from __future__ import annotations

import numpy as np

from ..config import Config


class ArtificialVideoDataset:
    def __init__(self, cfg: Config, split: str = "training", device=None):
        self.cfg = cfg
        self.image_size = int(cfg.image_size)
        self.size = int(cfg.size)
        self.split = split
        self.val_length = int(cfg.get("val_length", 5))
        seed = cfg.get("seed")
        base = 21 if split == "training" else 1021
        rng = np.random.default_rng((seed if seed is not None else 0) + base)

        S = self.image_size
        m = int(cfg.get("max_motion", 1))
        T = self.val_length + 1
        # box geometry per sequence; start/velocity chosen so the box stays
        # in-frame for all T+1 frames (motion semantics stay exact, no wrap)
        self.wh = rng.integers(3, max(S // 3, 4), size=(self.size, 2))
        self.vel = rng.integers(-m, m + 1, size=(self.size, 2))  # (fy, fx)
        lo = np.maximum(0, -self.vel * T)
        hi = np.maximum(lo + 1, S - self.wh - np.maximum(0, self.vel * T))
        self.p0 = (lo + rng.random((self.size, 2)) * (hi - lo)).astype(np.int64)
        self.t_train = rng.integers(0, T, size=self.size)

    def __len__(self) -> int:
        return self.size

    def _frame(self, i: int, t: int) -> np.ndarray:
        S = self.image_size
        y, x = self.p0[i] + t * self.vel[i]
        h, w = self.wh[i]
        img = np.ones((S, S, 3), np.float32)
        img[y : y + h, x : x + w] = 0.0
        return img

    def _flow(self, i: int, t: int) -> np.ndarray:
        """Forward flow on frame-t pixels (dx, dy), nonzero on the box."""
        S = self.image_size
        y, x = self.p0[i] + t * self.vel[i]
        h, w = self.wh[i]
        fy, fx = self.vel[i]
        flow = np.zeros((S, S, 2), np.float32)
        flow[y : y + h, x : x + w, 0] = fx
        flow[y : y + h, x : x + w, 1] = fy
        return flow

    def _stack(self, i: int, t: int) -> np.ndarray:
        """[target(3), last_frame(3), flow(2)] at transition t -> t+1."""
        return np.concatenate(
            [self._frame(i, t + 1), self._frame(i, t), self._flow(i, t)],
            axis=-1,
        )

    def __getitem__(self, index: int):
        if self.split == "training":
            return (self._stack(index, int(self.t_train[index])),)
        stacks = [self._stack(index, t) for t in range(self.val_length)]
        return (np.stack(stacks, axis=0),)


__all__ = ["ArtificialVideoDataset"]
