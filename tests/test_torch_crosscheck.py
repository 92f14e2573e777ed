"""Cross-framework checks: our jnp loss/op formulas vs direct PyTorch
transcriptions of the reference's torch code (torch-cpu is available in this
environment; the reference's CUDA splat kernels themselves are covered by
tests/oracle_splat.py instead)."""

import numpy as np
import jax.numpy as jnp
import pytest

torch = pytest.importorskip("torch")

from opticalflowdiffusion_tpu.ops import warp as W
from opticalflowdiffusion_tpu.algorithms import losses as L


def _t(x):
    return torch.tensor(np.asarray(x))


def test_nan_mse_vs_torch(rng):
    pred = rng.standard_normal((2, 6, 6, 3)).astype(np.float32)
    target = rng.standard_normal((2, 6, 6, 3)).astype(np.float32)
    pred[0, 0, 0, 0] = np.nan
    target[1, 2, 3, 1] = np.nan

    # reference warp.py:260-269
    p, t = _t(pred).flatten(), _t(target).flatten()
    ok = ~(torch.isnan(t) | torch.isnan(p))
    want = float(torch.nanmean(torch.square(p[ok] - t[ok])))

    got = float(W.nan_mse(jnp.asarray(pred), jnp.asarray(target)))
    assert got == pytest.approx(want, rel=1e-6)


def test_nan_charbonnier_vs_torch(rng):
    pred = rng.standard_normal((2, 5, 5, 3)).astype(np.float32)
    target = rng.standard_normal((2, 5, 5, 3)).astype(np.float32)
    pred[0, 1, 1, 0] = np.nan

    def charb(x, alpha=0.5, eps=1e-3):
        return torch.pow(torch.square(x) + eps ** 2, alpha)

    p, t = _t(pred).flatten(), _t(target).flatten()
    ok = ~(torch.isnan(t) | torch.isnan(p))
    want = float(torch.mean(charb(p[ok] - t[ok])))

    got = float(W.nan_charbonnier(jnp.asarray(pred), jnp.asarray(target)))
    assert got == pytest.approx(want, rel=1e-6)


def test_edgeaware_smoothness_vs_torch(rng):
    """reference warp.py:289-303 (NCHW) vs ours (NHWC)."""
    img = rng.standard_normal((2, 6, 6, 3)).astype(np.float32)
    flow = rng.standard_normal((2, 6, 6, 2)).astype(np.float32)

    ti = _t(img).permute(0, 3, 1, 2)
    tf = _t(flow).permute(0, 3, 1, 2)
    igy = ti[:, :, 1:, :] - ti[:, :, :-1, :]
    igx = ti[:, :, :, 1:] - ti[:, :, :, :-1]
    fgy = tf[:, :, 1:, :] - tf[:, :, :-1, :]
    fgx = tf[:, :, :, 1:] - tf[:, :, :, :-1]
    wy = torch.exp(-30 * torch.mean(igy ** 2, dim=1, keepdim=True))
    wx = torch.exp(-30 * torch.mean(igx ** 2, dim=1, keepdim=True))

    def charb(x):
        return torch.pow(torch.square(x) + 1e-6, 0.5)

    want = float((torch.mean(wx * charb(fgx)) + torch.mean(wy * charb(fgy))) / 2)
    got = float(W.edgeaware_smoothness1(jnp.asarray(img), jnp.asarray(flow)))
    assert got == pytest.approx(want, rel=1e-5)


def test_pwc_total_loss_vs_torch(rng):
    """reference losses.py:3-66 transcribed in torch vs ours."""
    B, H, Wd = 1, 8, 8
    ref = rng.random((B, H, Wd, 3)).astype(np.float32)
    pw = rng.random((B, H, Wd, 3)).astype(np.float32)
    fw = rng.random((B, H, Wd, 3)).astype(np.float32)
    pf = rng.standard_normal((B, H, Wd, 2)).astype(np.float32)
    ff = rng.standard_normal((B, H, Wd, 2)).astype(np.float32)
    occ = rng.random((B, H, Wd, 2)).astype(np.float32)

    def chw(x):
        return _t(x).permute(0, 3, 1, 2)

    def charb(x):
        return torch.pow(torch.square(x) + 1e-6, 0.5)

    tr, tp, tf_, tpf, tff, to = map(chw, (ref, pw, fw, pf, ff, occ))
    photo = torch.sum(to[:, 0, None] * charb(tr - tf_)) + torch.sum(
        to[:, 1, None] * charb(tr - tp)
    )

    def smooth(image, flow, w=20):
        igy = image[:, :, 1:, :] - image[:, :, :-1, :]
        igx = image[:, :, :, 1:] - image[:, :, :, :-1]
        fgy = flow[:, :, 1:, :] - flow[:, :, :-1, :]
        fgx = flow[:, :, :, 1:] - flow[:, :, :, :-1]
        wy = torch.exp(-w * torch.mean(igy ** 2, dim=1, keepdim=True))
        wx = torch.exp(-w * torch.mean(igx ** 2, dim=1, keepdim=True))
        return torch.sum(wx * charb(fgx)) + torch.sum(wy * charb(fgy))

    def occ_smooth(image, occ, w=20):
        igy = image[:, :, 1:, :] - image[:, :, :-1, :]
        igx = image[:, :, :, 1:] - image[:, :, :, :-1]
        ogy = occ[:, :, 1:, :] - occ[:, :, :-1, :]
        ogx = occ[:, :, :, 1:] - occ[:, :, :, :-1]
        wy = torch.exp(-w * torch.mean(igy ** 2, dim=1, keepdim=True))
        wx = torch.exp(-w * torch.mean(igx ** 2, dim=1, keepdim=True))
        return torch.sum(wx * ogx ** 2) + torch.sum(wy * ogy ** 2)

    want = float(
        photo + smooth(tr, tpf) + smooth(tr, tff) + occ_smooth(tr, to)
        + 0.05 * (-torch.sum(to[:, 0] * to[:, 1]))
    )
    got = float(L.total_loss(
        jnp.asarray(ref), jnp.asarray(pw), jnp.asarray(fw),
        jnp.asarray(pf), jnp.asarray(ff), jnp.asarray(occ),
    ))
    assert got == pytest.approx(want, rel=1e-4)


def test_backward_warp_vs_torch_grid_sample(rng):
    """Our bilinear backward warp vs torch grid_sample align_corners=True
    (reference warp.py:95-119 semantics, interior pixels)."""
    import torch.nn.functional as F

    B, H, Wd, C = 1, 8, 8, 3
    img = rng.random((B, H, Wd, C)).astype(np.float32)
    flow = (rng.standard_normal((B, H, Wd, 2)) * 1.5).astype(np.float32)

    out, mask = W.warp_backward_flow(jnp.asarray(img), jnp.asarray(flow))

    timg = _t(img).permute(0, 3, 1, 2)
    xx, yy = np.meshgrid(np.arange(Wd), np.arange(H))
    gx = (xx + flow[0, ..., 0]) * 2 / (Wd - 1) - 1
    gy = (yy + flow[0, ..., 1]) * 2 / (H - 1) - 1
    grid = torch.tensor(np.stack([gx, gy], -1), dtype=torch.float32)[None]
    want = F.grid_sample(timg, grid, align_corners=True)
    want = want.permute(0, 2, 3, 1).numpy()

    m = np.asarray(mask) > 0
    np.testing.assert_allclose(np.asarray(out)[m], want[m], rtol=1e-4, atol=1e-5)
