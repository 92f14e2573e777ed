"""PWCLearner: unsupervised 3-frame PWC-Net training (reference pwc_learner.py:10-121)."""

from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .base import Algorithm
from .losses import total_loss
from ..config import Config
from ..models.pwc_net import PWCNet
from ..parallel.train import TrainState
from ..utils import visualization as viz
from ..utils.grad_stats import tensor_stats

LEVEL_WEIGHTS = (0.005, 0.01, 0.02, 0.08, 0.32)  # pwc_learner.py:37


def _three_frames(batch):
    """Datasets emit (f1, f2, f3, gt_flow); accept (img, tgt, flow) pairs by
    duplicating the first frame as the past frame."""
    if len(batch) == 4:
        return batch
    img, tgt, flow = batch
    return img, img, tgt, flow


class PWCLearner(Algorithm):
    name = "pwc_learner"

    def __init__(self, cfg: Config):
        super().__init__(cfg)
        self.module = PWCNet(dtype=self.dtype)
        # rebuild extension knobs (default = reference-exact losses.py:56-65;
        # see losses.total_loss docstring / PARITY.md)
        self.smoothness_weight = float(cfg.get("smoothness_weight", 1.0))
        self.occ_weight = float(cfg.get("occ_weight", 1.0))

    def init(self, rng, batch, clip=None) -> TrainState:
        f1, f2, f3, _ = _three_frames(batch)
        variables = jax.jit(lambda r, a, b, c: self.module.init(r, a, [b, c]))(rng, f2, f1, f3)
        return TrainState.create(variables["params"], self.make_optimizer(clip))

    def _loss(self, flow_fwd, flow_bwd, occ, warped_imgs, tar_ds):
        loss = 0.0
        for i in range(len(flow_fwd)):
            loss = loss + LEVEL_WEIGHTS[i] * total_loss(
                tar_ds[i], warped_imgs[i][1], warped_imgs[i][0],
                flow_bwd[i], flow_fwd[i], occ[i],
                smoothness_weight=self.smoothness_weight,
                occ_weight=self.occ_weight,
            )
        return loss

    def loss_fn(self, params, batch, rng):
        f1, f2, f3, _ = _three_frames(batch)
        outs = self.module.apply({"params": params}, f2, [f1, f3])
        loss = self._loss(*outs)
        metrics = tensor_stats("train/flow_fwd", outs[0][0])
        return loss, metrics

    def val_step(self, params, batch, rng) -> Tuple[Dict, Dict]:
        f1, f2, f3, gt_flow = _three_frames(batch)
        flow_fwd, flow_bwd, occ, warped_imgs, tar_ds = self.module.apply(
            {"params": params}, f2, [f1, f3]
        )
        loss = self._loss(flow_fwd, flow_bwd, occ, warped_imgs, tar_ds)
        epe = jnp.mean(
            jnp.sqrt(jnp.sum(jnp.square(flow_fwd[0] - gt_flow), axis=-1) + 1e-12)
        )
        metrics = {"val/loss": loss, "val/epe": epe}
        artifacts = {
            "flow_fwd": flow_fwd[0],
            "flow_bwd": flow_bwd[0],
            "occ": occ[0],
            "warped_fwd": warped_imgs[0][0],
            "warped_bwd": warped_imgs[0][1],
            "target": tar_ds[0],
        }
        return metrics, artifacts

    def visualize(self, batch, artifacts) -> Dict[str, np.ndarray]:
        f1, f2, f3, gt_flow = (np.asarray(x) for x in _three_frames(batch))
        fwd = viz.flow_to_image(np.asarray(artifacts["flow_fwd"]))
        bwd = viz.flow_to_image(np.asarray(artifacts["flow_bwd"]))
        gt = viz.flow_to_image(gt_flow)
        occ = np.asarray(artifacts["occ"])
        wf = np.clip(np.asarray(artifacts["warped_fwd"]), 0, 1)
        wb = np.clip(np.asarray(artifacts["warped_bwd"]), 0, 1)
        recon = occ[..., 0:1] * wf + occ[..., 1:2] * wb
        return {
            "combined_frames": np.concatenate([f1, f2, f3], axis=2),
            "fwd_flow": np.concatenate([f2, f3, fwd], axis=2),
            "bwd_flow": np.concatenate([f1, f2, bwd], axis=2),
            "occlusions": occ[..., 0:1],
            "fwd_warped": np.concatenate([f2, f3, wf], axis=2),
            "bwd_warped": np.concatenate([f2, f1, wb], axis=2),
            "target": np.asarray(artifacts["target"]),
            "gt_fwd_flow": np.concatenate([gt, fwd], axis=2),
            "reconstructed_comb": np.concatenate([f2, recon], axis=2),
        }


__all__ = ["PWCLearner"]
