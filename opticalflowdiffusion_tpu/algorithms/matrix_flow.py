"""MatrixFlow: optical flow as per-pixel R x R filter matrices.

Rebuild of the reference MatrixFlow (matrix_flow.py:15-672): a UNet (or
RAFT) maps a frame pair to a per-pixel filter over an R x R neighbourhood;
applying the (softmax/mode/weighted-sum-normalized) filter to frame1 warps it
toward frame2.  Training goals: ``filter_pred`` (photometric + 5
regularizers), ``gt_filter_pred`` (mean-tap-vector supervision) and
``gt_flow_pred`` (direct flow regression).

Packed filter layout here (channels-last): [fil (R^2), colweight (1),
col (3)] — the matrix_flow.py packing (colw at index R^2, matrix_flow.py:99,
246-248), which differs from warp.py's [fil, col, colw].

jit-safety notes: the reference's data-dependent NaN hole-fill branch
(matrix_flow.py:110-113) becomes an unconditional blur + where; the
``flow_in='first'`` staggered-scatter debug warp (matrix_flow.py:150-208,
unused by any training goal) is realized with the deterministic splat.
"""

from __future__ import annotations

import math
from typing import Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from .base import Algorithm, pair_batch
from ..config import Config
from ..models.unet import Unet
from ..ops import filters as fops
from ..ops.warp import bilinear_gather, warp_forward_flow
from ..parallel.train import TrainState
from ..utils import visualization as viz

Array = jnp.ndarray


def _gaussian_blur(img: Array, kernel_size: int, sigma: float) -> Array:
    xs = jnp.arange(kernel_size, dtype=jnp.float32) - (kernel_size - 1) / 2
    k = jnp.exp(-0.5 * (xs / max(sigma, 1e-6)) ** 2)
    k = k / k.sum()
    pad = kernel_size // 2
    out = jnp.pad(img, ((0, 0), (pad, pad), (0, 0), (0, 0)), mode="reflect")
    out = sum(out[:, i : i + img.shape[1]] * k[i] for i in range(kernel_size))
    out = jnp.pad(out, ((0, 0), (0, 0), (pad, pad), (0, 0)), mode="reflect")
    out = sum(out[:, :, i : i + img.shape[2]] * k[i] for i in range(kernel_size))
    return out


class MatrixFlow(Algorithm):
    name = "matrix_flow"

    def __init__(self, cfg: Config):
        super().__init__(cfg)
        imsz = [int(x) for x in str(cfg.image_size).split(",")]
        self.image_w, self.image_h = imsz[0], imsz[-1]
        self.radius = int(cfg.radius)
        assert self.radius % 2 == 1
        self.goal = cfg.goal
        self.eps = float(cfg.get("eps", 1e-15))

        if "cols" in dir(cfg) and cfg.get("cols") is not None:
            self.has = ["cols", "colweights"] if cfg.cols == "any" else ["colweights"]
        else:
            self.has = []

        if cfg.get("architecture", "unet") == "unet":
            out_dim = (
                2
                if self.goal == "gt_flow_pred"
                else self.radius ** 2
                + 1 * ("colweights" in self.has)
                + 3 * ("cols" in self.has)
            )
            self.module = Unet(
                64, channels=6, out_dim=out_dim, time_in=False, dtype=self.dtype
            )
            self.arch = "unet"
        else:
            from ..models.raft import RAFT

            self.module = RAFT(radius=self.radius)
            self.arch = "raft"

        self._mask = fops.bound_mask(
            self.radius, self.image_h, self.image_w
        ).reshape(1, self.image_h, self.image_w, self.radius ** 2)

    # ------------------------------------------------------------- filter ops
    def _split(self, fil: Array):
        """Split [fil, colw?, cols?] channels."""
        R2 = self.radius ** 2
        colw = fil[..., R2 : R2 + 1] if fil.shape[-1] > R2 else None
        cols = fil[..., R2 + 1 :] if fil.shape[-1] > R2 + 1 else None
        return fil[..., :R2], colw, cols

    def apply_filter(self, fil: Array, img: Array, mode: str = "softmax",
                     flow_in: str = "second"):
        """reference matrix_flow.py:68-208."""
        R2 = self.radius ** 2
        if fil.shape[-1] > 2:
            col = None
            if fil.shape[-1] > R2 + 1:
                col = fil[..., -3:]
                fil = fil[..., :-3]
            elif fil.shape[-1] > R2 and self.cfg.get("cols") == "ones":
                col = jnp.ones(fil.shape[:-1] + (3,), fil.dtype)

            mask = self._mask
            if fil.shape[-1] > R2:  # include colweight channel in the mask
                mask = jnp.concatenate(
                    [mask, jnp.ones(mask.shape[:-1] + (1,), mask.dtype)], axis=-1
                )

            if mode == "softmax":
                f = fil - jnp.max(fil, axis=-1, keepdims=True)
                f = (jnp.exp(f) + self.eps) * mask
                fil = f / jnp.sum(f, axis=-1, keepdims=True)
            elif mode == "mode":
                f = jnp.exp(fil) * mask
                f = (f == jnp.max(f, axis=-1, keepdims=True)).astype(fil.dtype)
                fil = f / jnp.sum(f, axis=-1, keepdims=True)
            elif mode == "weighted_sum":
                denom = jnp.sum(fil[..., :R2] * mask[..., :R2], axis=-1, keepdims=True)
                denom = jnp.where(denom > self.eps, denom, jnp.nan)
                fil = fil / denom
            elif mode == "none":
                pass
            orig_fil = fil if col is None else jnp.concatenate([fil, col], axis=-1)

            fil_w, colw = (
                (fil[..., :-1], fil[..., -1:]) if "colweights" in self.has else (fil, None)
            )
            B = img.shape[0]
            fil5 = fil_w.reshape(B, self.image_h, self.image_w, self.radius, self.radius)
            applied = fops.apply_filter(img, fil5)

            # NaN hole fill with blurred background (matrix_flow.py:110-113)
            bg = _gaussian_blur(img, self.radius, self.radius // 2)
            applied = jnp.where(jnp.isnan(applied), bg, applied)

            if "cols" in self.has and col is not None:
                applied = applied + colw * col
            return applied, orig_fil

        if flow_in == "second":
            # backward flow warp with red fill (matrix_flow.py:121-149)
            B, H, W, C = img.shape
            xs = jnp.arange(W, dtype=fil.dtype)[None, None, :]
            ys = jnp.arange(H, dtype=fil.dtype)[None, :, None]
            cx = xs + fil[..., 0]
            cy = ys + fil[..., 1]
            out = bilinear_gather(img, cx, cy)
            inside = (cx >= 0) & (cx <= W - 1) & (cy >= 0) & (cy <= H - 1)
            m = inside[..., None].astype(img.dtype)
            red = jnp.asarray([1.0, 0.0, 0.0], img.dtype)
            return out * m + red * (1 - m), fil
        # flow_in == 'first': forward one-to-one warp (debug path); realized
        # with the deterministic splat + red background.
        warped = warp_forward_flow(img, fil, warp_style="avg", set_nans=True)
        red = jnp.asarray([1.0, 0.0, 0.0], img.dtype)
        warped = jnp.where(jnp.isnan(warped), red, warped)
        return warped, fil

    def invert_filter(self, fil: Array) -> Array:
        """matrix_flow.py:238-279 ([fil, colw, cols] layout; colw negated)."""
        R2 = self.radius ** 2
        f, colw, cols = self._split(fil)
        B = f.shape[0]
        # reuse the shared inversion core via the warp.py packing
        dummy_col = jnp.zeros(f.shape[:-1] + (3,), f.dtype)
        dummy_colw = jnp.zeros(f.shape[:-1] + (1,), f.dtype)
        packed = jnp.concatenate([f, dummy_col, dummy_colw], axis=-1)
        inv = fops.invert_filter(packed)[..., :R2]
        parts = [inv]
        if colw is not None:
            parts.append(-colw)
        if cols is not None:
            parts.append(cols)
        return jnp.concatenate(parts, axis=-1)

    def vector_from_filter(self, fil: Array) -> Array:
        """Mean tap offset (dx, dy) (matrix_flow.py:281-291)."""
        if fil.shape[-1] == 2:
            return fil
        R = self.radius
        f = fil[..., : R * R].reshape(fil.shape[:-1] + (R, R))
        idx = (jnp.arange(R) - R // 2).astype(fil.dtype)
        dy = jnp.einsum("bhwij,i->bhw", f, idx)
        dx = jnp.einsum("bhwij,j->bhw", f, idx)
        return jnp.stack([dx, dy], axis=-1)

    def filter_from_vector(self, vec: Array) -> Array:
        """One-hot filter at the rounded flow, inverted (matrix_flow.py:293-316)."""
        R = self.radius
        v = jnp.round(vec)
        v = jnp.clip(v, -(R // 2), R // 2) + R // 2
        iy = v[..., 1].astype(jnp.int32)  # filter axis i = dy
        ix = v[..., 0].astype(jnp.int32)
        onehot = jax.nn.one_hot(iy * R + ix, R * R, dtype=vec.dtype)
        return self.invert_filter(onehot)

    def mode_to_flow(self, fil: Array) -> Array:
        """Argmax tap -> (dx, dy) (matrix_flow.py:458-462)."""
        R = self.radius
        idx = jnp.argmax(fil[..., : R * R], axis=-1)
        dy = idx // R - R // 2
        dx = idx % R - R // 2
        return jnp.stack([dx, dy], axis=-1).astype(jnp.float32)

    # ------------------------------------------------------------- losses
    def smoothness_loss(self, fil: Array, target: Array) -> Array:
        """Edge-aware smoothness of the mean-tap field (matrix_flow.py:352-360)."""
        vecs = self.vector_from_filter(fil)
        lam = float(self.cfg.get("smoothness_lmbd", 2.0))
        loss = 0.0
        for axis in (1, 2):
            dv = jnp.abs(jnp.diff(vecs, axis=axis)).sum(axis=-1)
            di = jnp.abs(jnp.diff(target, axis=axis)).sum(axis=-1)
            loss = loss + jnp.mean(jnp.exp(-lam * di) * dv)
        return loss / 2

    def copout_loss(self, fil: Array) -> Array:
        R2 = self.radius ** 2
        if fil.shape[-1] > R2:
            return jnp.mean(jnp.square(fil[..., R2]))
        return jnp.asarray(0.0)

    def corrective_loss(self, inp: Array, target: Array) -> Array:
        """Reward (negative loss) for target pixels that went to 0 on
        all-white input samples (matrix_flow.py:372-380).  Dead in the
        reference's ``loss()`` too — kept for class-API parity.  Boolean
        indexing re-expressed as a mask-weighted reduction for jit-safety.
        """
        flat = inp.reshape(inp.shape[0], -1)
        which_white = jnp.equal(jnp.min(flat, axis=1), 1.0)
        missed = jnp.equal(target[..., 0], 0.0).astype(jnp.float32)
        missed = missed * which_white[:, None, None].astype(jnp.float32)
        denom = self.image_h * self.image_w * inp.shape[0]
        return -jnp.sum(missed) / denom

    def identity_loss(self, fil: Array) -> Array:
        R = self.radius
        w = jnp.square(jnp.arange(R, dtype=jnp.float32) - R // 2)
        w = (w[None, :] + w[:, None]).reshape(-1)
        return jnp.mean(fil[..., : R * R] * w)

    def divergence_loss(self, fil: Array) -> Array:
        R = self.radius
        inv = self.invert_filter(fil)
        crop = inv[..., R // 2 : -(R // 2), R // 2 : -(R // 2), : R * R]
        div = jnp.sum(crop, axis=-1)
        se = float(self.cfg.get("small_eps", 0.5))
        div = jnp.clip(div, se, 1.0 / se)
        return jnp.mean(div + 1.0 / div) - 2.0

    def inversion_loss(self, fil: Array, inp: Array, target: Array) -> Array:
        inv = self.invert_filter(fil)
        out, _ = self.apply_filter(inv, target, mode="weighted_sum")
        return jnp.mean(jnp.square(out - inp))

    def loss(self, out: Array, fil: Array, target: Array, inp: Array, flow: Array):
        """reference matrix_flow.py:423-456; returns (loss, photometric)."""
        cfg = self.cfg
        if self.goal == "filter_pred":
            photo = jnp.mean(jnp.square(out - target))
            total = (
                photo
                + cfg.smoothness_weight * self.smoothness_loss(fil, target)
                + cfg.copout_weight * self.copout_loss(fil)
                + cfg.identity_weight * self.identity_loss(fil)
                + cfg.divergence_weight * self.divergence_loss(fil)
                + cfg.inversion_weight * self.inversion_loss(fil, inp, target)
            )
            return total, photo
        if self.goal == "gt_filter_pred":
            vec = self.vector_from_filter(self.invert_filter(fil))
            loss = jnp.mean(jnp.square(vec - flow))
            photo = jnp.mean(jnp.square(out - target))
            return loss, photo
        # gt_flow_pred
        loss = jnp.mean(jnp.square(fil - flow))
        photo = jnp.mean(jnp.square(out - target))
        return loss, photo

    # ------------------------------------------------------------- steps
    def init(self, rng, batch, clip=None) -> TrainState:
        img, tgt, flow = batch = pair_batch(batch)
        x = 2.0 * jnp.concatenate([img, tgt], axis=-1) - 1.0
        variables = jax.jit(lambda r, xx: self.module.init(r, xx, None, None))(rng, x)
        return TrainState.create(variables["params"], self.make_optimizer(clip))

    def _forward(self, params, img, tgt):
        x = 2.0 * jnp.concatenate([img, tgt], axis=-1) - 1.0
        out = self.module.apply({"params": params}, x, None, None)
        return out if self.arch != "raft" else out

    def loss_fn(self, params, batch, rng):
        img, tgt, flow = batch = pair_batch(batch)
        o = self._forward(params, img, tgt)
        outs = o if isinstance(o, (list, tuple)) else [o]
        errs, photo = [], None
        for ot in outs:
            applied, fil = self.apply_filter(ot, img)
            err, photo = self.loss(applied, fil, tgt, img, flow)
            errs.append(err)
        err = sum(errs) / len(errs)

        mean_flow = self.vector_from_filter(fil)
        dist = jnp.mean(jnp.square(mean_flow - flow))
        metrics = {"train/photo": photo, "train/flow_err": dist}
        return err, metrics

    def val_step(self, params, batch, rng) -> Tuple[Dict, Dict]:
        img, tgt, flow = batch = pair_batch(batch)
        o = self._forward(params, img, tgt)
        out = o[-1] if isinstance(o, (list, tuple)) else o
        out_sf, sfs = self.apply_filter(out, img)
        err, photo = self.loss(out_sf, sfs, tgt, img, flow)

        mean_flow = self.vector_from_filter(sfs)
        metrics = {
            "val/loss": err,
            "val/photometric": photo,
            "val/flow_err": jnp.mean(jnp.square(mean_flow - flow)),
        }
        artifacts = {"out_sf": out_sf, "mean_flow": mean_flow}

        if self.goal != "gt_flow_pred":
            out_md, modes = self.apply_filter(out, img, mode="mode")
            err_m, photo_m = self.loss(out_md, modes, tgt, img, flow)
            metrics["val/mode_loss"] = err_m
            metrics["val/mode_photometric"] = photo_m
            artifacts["out_md"] = out_md
            artifacts["mode_flow"] = self.mode_to_flow(modes)
            inv = self.apply_filter(self.invert_filter(sfs), tgt, mode="none")[0]
            artifacts["invert_p"] = inv
            opt_vecs = self.filter_from_vector(flow)
        else:
            opt_vecs = flow
        opt_result, _ = self.apply_filter(opt_vecs, img, mode="weighted_sum")
        opt_loss, opt_photo = self.loss(opt_result, opt_vecs, tgt, img, flow)
        metrics["val/opt_loss"] = opt_loss
        metrics["val/opt_photo"] = opt_photo
        artifacts["opt_p"] = opt_result
        if "colweights" in self.has:
            artifacts["col_weight"] = sfs[..., self.radius ** 2 : self.radius ** 2 + 1]
        if "cols" in self.has:
            artifacts["color"] = sfs[..., -3:]
        return metrics, artifacts

    def visualize(self, batch, artifacts) -> Dict[str, np.ndarray]:
        img, tgt, flow = (np.asarray(x) for x in pair_batch(batch))
        out = {
            "original": img,
            "target": tgt,
            "softmax_p": np.clip(np.asarray(artifacts["out_sf"]), 0, 1),
            "opt_p": np.clip(np.nan_to_num(np.asarray(artifacts["opt_p"])), 0, 1),
            "mean_flow": viz.flow_to_image(np.asarray(artifacts["mean_flow"])),
            "gt_flow": viz.flow_to_image(flow),
        }
        if "out_md" in artifacts:
            out["mode_p"] = np.clip(np.asarray(artifacts["out_md"]), 0, 1)
            out["mode_flow"] = viz.flow_to_image(np.asarray(artifacts["mode_flow"]))
            out["invert_p"] = np.clip(np.asarray(artifacts["invert_p"]), 0, 1)
        for k in ("col_weight", "color"):
            if k in artifacts:
                out[k] = np.clip(np.asarray(artifacts[k]), 0, 1)
        # side-by-side comparison strip (matrix_flow.py:628-647 log_video)
        out["compare"] = np.concatenate(
            [img, tgt, np.clip(np.asarray(artifacts["out_sf"]), 0, 1)], axis=2
        )
        return out

    def filter_to_image(self, filters: np.ndarray) -> np.ndarray:
        """Filter grid visualization (matrix_flow.py:318-325); filters (K, N)."""
        R = self.radius
        f = np.asarray(filters)[: R * R]
        f = f.reshape(R, R, -1).transpose(2, 0, 1)[..., None]
        f = np.tile(f, (1, 1, 1, 3))
        f[:, R // 2, :, 2] = 0.33 * (1 + 2 * f[:, R // 2, :, 2])
        f[:, :, R // 2, 1] = 0.33 * (1 + 2 * f[:, :, R // 2, 1])
        f = np.repeat(np.repeat(f, 3, axis=1), 3, axis=2)
        return viz.make_grid(f, nrow=int(round(math.sqrt(f.shape[0]))))


__all__ = ["MatrixFlow"]
