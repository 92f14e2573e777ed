"""Three-frame PWC-Net, flax/NHWC.

Rebuild of the reference PWCNet (pwc_net.py:34-308): three siamese 6-level
conv feature pyramids (center/future/past), per-level 9x9 local cost volumes
(the CUDA ``spatial_correlation_sampler`` replaced by ops/correlation.py's
MXU patch-conv + einsum) with the reference's fwd/bwd displacement-channel
reorder, coarse-to-fine flow decoders with backward feature warping at each
level, occlusion decoders (channel softmax), and full-res flow/occ
upsampling with the per-level flow scalings (x20 ... x1.25).
"""

from __future__ import annotations

from typing import List, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..ops.correlation import local_correlation, pwc_index_reorder
from ..ops.warp import bilinear_gather, upsample_bilinear

Array = jnp.ndarray


class ConvFeatBlock(nn.Module):
    features: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: Array) -> Array:
        x = nn.Conv(self.features, (3, 3), strides=2, dtype=self.dtype)(x)
        x = nn.leaky_relu(x, 0.2)
        x = nn.Conv(self.features, (3, 3), strides=1, dtype=self.dtype)(x)
        return nn.leaky_relu(x, 0.2)


class ConvDecBlock(nn.Module):
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: Array) -> Array:
        for f in (128, 128, 96, 64, 32):
            x = nn.leaky_relu(nn.Conv(f, (3, 3), dtype=self.dtype)(x), 0.2)
        return nn.Conv(2, (3, 3), dtype=self.dtype)(x)


def backward_warp_border(x: Array, flow: Array) -> Array:
    """Backward warp with border padding, no mask (pwc_net.py:275-308)."""
    B, H, W, C = x.shape
    xs = jnp.arange(W, dtype=flow.dtype)[None, None, :]
    ys = jnp.arange(H, dtype=flow.dtype)[None, :, None]
    return bilinear_gather(x, xs + flow[..., 0], ys + flow[..., 1])


class FeaturePyramid(nn.Module):
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: Array) -> List[Array]:
        feats = []
        for f in (16, 32, 64, 96, 128, 192):
            x = ConvFeatBlock(f, dtype=self.dtype)(x)
            feats.append(x)
        return feats


class PWCNet(nn.Module):
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        self.pyr_a = FeaturePyramid(self.dtype)  # center frame
        self.pyr_b = FeaturePyramid(self.dtype)  # future frame
        self.pyr_c = FeaturePyramid(self.dtype)  # past frame
        self.dec_fwd = [ConvDecBlock(self.dtype) for _ in range(5)]  # levels 6..2
        self.dec_bwd = [ConvDecBlock(self.dtype) for _ in range(5)]
        self.dec_occ = [ConvDecBlock(self.dtype) for _ in range(5)]

    def _corr(self, a: Array, b: Array, direction: str) -> Array:
        c = local_correlation(a, b, patch_size=9)
        return pwc_index_reorder(c, direction)

    def __call__(self, im_tar: Array, im_refs: Sequence[Array]):
        """im_tar: center frame; im_refs: [past, future] (pwc_net.py:112-117).

        Returns (flow_fwd, flow_bwd, occ, warped_imgs, tar_ds) — five
        full-resolution-per-level lists, finest first, exactly like the
        reference forward (pwc_net.py:264-273).
        """
        past, future = im_refs[0], im_refs[1]
        fa = self.pyr_a(im_tar)
        fb = self.pyr_b(future)
        fc = self.pyr_c(past)

        warp_scales = [0.625, 1.25, 2.5, 5.0]  # applied to the upsampled flow
        flows_fwd, flows_bwd, occs = [], [], []

        flow_f_up = flow_b_up = None
        fb_cur, fc_cur = fb[5], fc[5]
        for li, level in enumerate(range(5, 0, -1)):  # levels 6..2 (idx 5..1)
            corr_f = self._corr(fa[level], fb_cur, "fwd")
            corr_b = self._corr(fa[level], fc_cur, "bwd")
            corr = jnp.concatenate([corr_f, corr_b], axis=-1)

            if flow_f_up is None:
                feat_fwd = corr
                feat_bwd = corr
                occ_feat = jnp.concatenate([corr, fa[level]], axis=-1)
            else:
                feat_fwd = jnp.concatenate([corr, fa[level], flow_f_up], axis=-1)
                feat_bwd = jnp.concatenate([corr, fa[level], flow_b_up], axis=-1)
                occ_feat = feat_fwd

            flow_f = self.dec_fwd[li](feat_fwd)
            flow_b = self.dec_bwd[li](feat_bwd)
            occ = jax.nn.softmax(self.dec_occ[li](occ_feat), axis=-1)

            flows_fwd.append(flow_f)
            flows_bwd.append(flow_b)
            occs.append(occ)

            flow_f_up = upsample_bilinear(flow_f, 2)
            flow_b_up = upsample_bilinear(flow_b, 2)
            if level - 1 >= 1:
                s = warp_scales[li] if li < len(warp_scales) else 1.0
                fb_cur = backward_warp_border(fb[level - 1], s * flow_f_up)
                fc_cur = backward_warp_border(fc[level - 1], -s * flow_b_up)

        # full-res rescale (pwc_net.py:224-240); flows list currently coarse->fine
        flows_fwd = list(reversed(flows_fwd))  # now [level2, ..., level6]
        flows_bwd = list(reversed(flows_bwd))
        occs = list(reversed(occs))
        flow_scales = [20.0, 10.0, 5.0, 2.5, 1.25]
        H, W = im_tar.shape[1], im_tar.shape[2]

        def to_fullres(f, sgn, scale):
            up = upsample_bilinear(f, 2)  # matches reference's double upsample
            cur_h = up.shape[1]
            return sgn * scale * jax.image.resize(
                up, (up.shape[0], H, W, up.shape[-1]), method="bilinear"
            )

        flow_fwd = [to_fullres(f, 1.0, s) for f, s in zip(flows_fwd, flow_scales)]
        flow_bwd = [to_fullres(f, -1.0, s) for f, s in zip(flows_bwd, flow_scales)]
        occ = [
            jax.image.resize(o, (o.shape[0], H, W, 2), method="nearest")
            for o in occs
        ]

        # image pyramids + per-level warped refs (pwc_net.py:242-271)
        def img_pyr(img):
            ds = [img]
            for _ in range(4):
                ds.append(
                    jax.image.resize(
                        ds[-1],
                        (img.shape[0], ds[-1].shape[1] // 2, ds[-1].shape[2] // 2, 3),
                        method="bilinear",
                    )
                )
            return ds

        past_ds, fut_ds, tar_ds = img_pyr(past), img_pyr(future), img_pyr(im_tar)
        warped_imgs = []
        for i in range(5):
            sh = tar_ds[i].shape
            ff = jax.image.resize(flow_fwd[i], sh[:3] + (2,), method="bilinear")
            fb_ = jax.image.resize(flow_bwd[i], sh[:3] + (2,), method="bilinear")
            warped_imgs.append(
                [
                    backward_warp_border(fut_ds[i], ff),
                    backward_warp_border(past_ds[i], fb_),
                ]
            )
        # flows/occ are full-res in the reference even for coarse levels; match
        flow_fwd_lv = [
            jax.image.resize(f, tar_ds[i].shape[:3] + (2,), method="bilinear")
            for i, f in enumerate(flow_fwd)
        ]
        flow_bwd_lv = [
            jax.image.resize(f, tar_ds[i].shape[:3] + (2,), method="bilinear")
            for i, f in enumerate(flow_bwd)
        ]
        occ_lv = [
            jax.image.resize(o, tar_ds[i].shape[:3] + (2,), method="nearest")
            for i, o in enumerate(occ)
        ]
        return flow_fwd_lv, flow_bwd_lv, occ_lv, warped_imgs, tar_ds


__all__ = ["PWCNet", "ConvFeatBlock", "ConvDecBlock", "backward_warp_border"]
