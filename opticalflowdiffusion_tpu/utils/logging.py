"""Logger facade: local JSONL scalars + PNG image dumps, wandb-compatible.

Replaces the reference's wandb-only logging (main.py:45-64, per-algorithm
``log_dict``/``log_image`` calls) with a backend-agnostic facade that keeps
the reference's metric key names.  If the ``wandb`` package happens to be
available and enabled in the config it is used as an additional sink;
otherwise everything lands under the run's output directory:

  out_dir/metrics.jsonl      one JSON object per log_dict call
  out_dir/images/<key>/step_<n>.png
"""

from __future__ import annotations

import json
import time
from pathlib import Path
from typing import Dict, Mapping, Optional

import numpy as np

from . import visualization as viz


class RunLogger:
    def __init__(self, out_dir, wandb_cfg: Optional[Mapping] = None, is_main: bool = True):
        self.out_dir = Path(out_dir)
        self.is_main = is_main
        self._wandb = None
        if is_main:
            self.out_dir.mkdir(parents=True, exist_ok=True)
            (self.out_dir / "images").mkdir(exist_ok=True)
            self._metrics_f = open(self.out_dir / "metrics.jsonl", "a")
        else:
            self._metrics_f = None

        if wandb_cfg and wandb_cfg.get("mode", "disabled") != "disabled" and is_main:
            try:
                import wandb  # optional dependency

                self._wandb = wandb.init(
                    entity=wandb_cfg.get("entity"),
                    project=wandb_cfg.get("project"),
                    mode=wandb_cfg.get("mode"),
                    name=wandb_cfg.get("name"),
                    dir=str(self.out_dir),
                    id=wandb_cfg.get("resume"),
                    resume="allow" if wandb_cfg.get("resume") else None,
                )
            except Exception:
                self._wandb = None

    def log_dict(self, metrics: Dict, step: int) -> None:
        if not self.is_main:
            return
        record = {"step": int(step), "time": time.time()}
        for k, v in metrics.items():
            record[k] = float(np.asarray(v))
        self._metrics_f.write(json.dumps(record) + "\n")
        self._metrics_f.flush()
        if self._wandb is not None:
            self._wandb.log({k: v for k, v in record.items() if k != "step"}, step=step)

    def log_image(self, key: str, images, step: int) -> None:
        """images: (B, H, W, C) floats in [0,1] (batch tiled into one grid)."""
        if not self.is_main:
            return
        d = self.out_dir / "images" / key
        d.mkdir(parents=True, exist_ok=True)
        img = np.asarray(images)
        if img.ndim == 3:
            img = img[None]
        viz.save_image(img, d / f"step_{step:08d}.png")
        if self._wandb is not None:
            import wandb

            self._wandb.log({key: [wandb.Image(i) for i in img]}, step=step)

    def log_video(self, key: str, frames, step: int) -> None:
        """frames: (T, H, W, C); dumped as a horizontal filmstrip PNG."""
        if not self.is_main:
            return
        strip = np.concatenate(list(np.asarray(frames)), axis=1)
        self.log_image(key, strip[None], step)

    def close(self) -> None:
        if self._metrics_f is not None:
            self._metrics_f.close()
        if self._wandb is not None:
            self._wandb.finish()


__all__ = ["RunLogger"]
