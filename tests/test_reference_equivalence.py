"""Weight-transplant equivalence vs the actual reference torch modules.

The gold-standard parity check (VERDICT r2 item 1): instantiate the
reference ``Unet`` / ``ConditionalDiffusion``
(reference: algorithms/diffusion_animation/denoising_diffusion.py:272-417,
420-993) under torch-cpu, transplant its weights into the flax stack via
utils/import_torch_ckpt.py, and assert that with identical inputs the two
frameworks compute the same function — UNet forward, schedule buffers,
q_sample, p_losses, and a full DDIM trajectory — to fp32 tolerance.

This converts "parity by construction" (formula transcription) into
"parity by measurement" for the entire model stack at once, and doubles as
the test of the reference-checkpoint importer.

Skipped when the reference repo or torch is unavailable.
"""

from __future__ import annotations

import os
import sys
import types

import numpy as np
import pytest

REF_DIR = "/root/reference/algorithms/diffusion_animation"

torch = pytest.importorskip("torch")

pytestmark = pytest.mark.skipif(
    not os.path.isdir(REF_DIR), reason="reference repo not available"
)

import jax
import jax.numpy as jnp

from opticalflowdiffusion_tpu.models import diffusion as dm
from opticalflowdiffusion_tpu.models.unet import Unet
from opticalflowdiffusion_tpu.utils import import_torch_ckpt as itc


# --------------------------------------------------------------------------
# Reference import machinery: the reference's kernel/trainer deps (cupy,
# ema_pytorch, pytorch_fid) are CUDA-/pip-only; they are touched at import
# time but not by the code paths under test, so stub them in sys.modules.
# --------------------------------------------------------------------------

def _stub_module(name, **attrs):
    mod = types.ModuleType(name)
    for k, v in attrs.items():
        setattr(mod, k, v)
    sys.modules.setdefault(name, mod)
    return sys.modules[name]


@pytest.fixture(scope="module")
def ref():
    cupy = _stub_module("cupy")
    if not hasattr(cupy, "memoize"):
        cupy.memoize = lambda **kw: (lambda f: f)
        cupy.cuda = types.SimpleNamespace()
        cupy.ndarray = type("ndarray", (), {})  # einops backend probe
    _stub_module("ema_pytorch", EMA=object)
    tv = _stub_module("torchvision")
    if not hasattr(tv, "transforms"):
        tv.__path__ = []
        tv.transforms = _stub_module("torchvision.transforms", Compose=object)
        tv.utils = _stub_module(
            "torchvision.utils", save_image=lambda *a, **k: None
        )
    fid = _stub_module("pytorch_fid")
    fid.__path__ = []
    _stub_module("pytorch_fid.inception", InceptionV3=object)
    _stub_module(
        "pytorch_fid.fid_score", calculate_frechet_distance=lambda *a, **k: 0.0
    )

    pkg = types.ModuleType("ofd_reference")
    pkg.__path__ = [REF_DIR]
    sys.modules.setdefault("ofd_reference", pkg)
    import importlib

    return importlib.import_module("ofd_reference.denoising_diffusion")


# --------------------------------------------------------------------------
# Shared small config: dim 16, 2 resolutions, 16x16 images, 3ch + 3ch cond.
# --------------------------------------------------------------------------

DIM, MULTS, IMG, CH = 16, (1, 2), 16, 3


@pytest.fixture(scope="module")
def pair(ref):
    """(torch unet, flax unet, transplanted flax params)."""
    torch.manual_seed(0)
    tnet = ref.Unet(DIM, dim_mults=MULTS, channels=2 * CH, out_dim=CH).eval()
    fnet = Unet(DIM, dim_mults=MULTS, channels=2 * CH, out_dim=CH)
    params = itc.unet_params_from_torch(
        tnet.state_dict(), dim_mults=MULTS, time_in=True
    )
    # tree/shape agreement with a freshly-initialized model
    tmpl = fnet.init(
        jax.random.PRNGKey(0),
        jnp.zeros((1, IMG, IMG, CH)),
        jnp.zeros((1, IMG, IMG, CH)),
        jnp.zeros((1,), jnp.int32),
    )["params"]
    itc.verify_against_template(params, tmpl)
    return tnet, fnet, params


def _nhwc(t):
    return jnp.asarray(t.detach().numpy().transpose(0, 2, 3, 1))


def _nchw(a):
    return torch.from_numpy(np.asarray(a).transpose(0, 3, 1, 2)).float()


def test_unet_forward_equivalence(pair):
    """Same weights + inputs -> same UNet output (<=1e-4)."""
    tnet, fnet, params = pair
    g = torch.Generator().manual_seed(1)
    x_t = torch.randn((2, CH, IMG, IMG), generator=g)
    c_t = torch.randn((2, CH, IMG, IMG), generator=g)
    tt = torch.tensor([3, 17])
    with torch.no_grad():
        want = tnet(x_t, c_t, tt).numpy().transpose(0, 2, 3, 1)
    got = np.asarray(
        fnet.apply({"params": params}, _nhwc(x_t), _nhwc(c_t), jnp.asarray([3, 17]))
    )
    assert np.max(np.abs(got - want)) <= 1e-4, np.max(np.abs(got - want))


@pytest.fixture(scope="module")
def diffusion_pair(ref, pair):
    tnet, fnet, params = pair
    T, S = 20, 10
    tdiff = ref.ConditionalDiffusion(
        tnet, IMG, timesteps=T, sampling_timesteps=S, objective="pred_x0",
        auto_normalize=False, channels=CH, min_snr_loss_weight=True,
    ).eval()
    sched = dm.make_schedule(
        timesteps=T, sampling_timesteps=S, objective="pred_x0",
        min_snr_loss_weight=True,
    )
    def model_fn(x, cond, t, sc=None):
        return fnet.apply({"params": params}, x, cond, t)
    return tdiff, sched, model_fn


def test_schedule_buffers_equal(diffusion_pair):
    tdiff, sched, _ = diffusion_pair
    for name in (
        "betas", "alphas_cumprod", "alphas_cumprod_prev", "sqrt_alphas_cumprod",
        "sqrt_one_minus_alphas_cumprod", "sqrt_recip_alphas_cumprod",
        "sqrt_recipm1_alphas_cumprod", "posterior_variance",
        "posterior_log_variance_clipped", "posterior_mean_coef1",
        "posterior_mean_coef2", "loss_weight",
    ):
        want = getattr(tdiff, name).numpy()
        got = np.asarray(getattr(sched, name))
        # 3e-7 = a couple f32 ULPs: torch vs numpy f64 linspace rounding
        np.testing.assert_allclose(got, want, rtol=3e-7, atol=3e-7, err_msg=name)


def test_q_sample_equivalence(diffusion_pair):
    tdiff, sched, _ = diffusion_pair
    g = torch.Generator().manual_seed(2)
    x0 = torch.randn((2, CH, IMG, IMG), generator=g)
    noise = torch.randn((2, CH, IMG, IMG), generator=g)
    tt = torch.tensor([0, 13])
    want = tdiff.q_sample(x0, tt, noise).numpy().transpose(0, 2, 3, 1)
    got = np.asarray(
        dm.q_sample(sched, _nhwc(x0), jnp.asarray([0, 13]), _nhwc(noise))
    )
    assert np.max(np.abs(got - want)) <= 1e-6


def test_p_losses_equivalence(diffusion_pair):
    """Same x0/t/noise -> same scalar training loss (reference p_losses +
    _loss level-1 path, denoising_diffusion.py:823-891, 893-983)."""
    tdiff, sched, model_fn = diffusion_pair
    g = torch.Generator().manual_seed(3)
    x0 = torch.rand((2, CH, IMG, IMG), generator=g) * 2 - 1
    cond = torch.rand((2, CH, IMG, IMG), generator=g) * 2 - 1
    noise = torch.randn((2, CH, IMG, IMG), generator=g)
    tt = torch.tensor([4, 15])
    with torch.no_grad():
        want = float(tdiff.p_losses(x0, tt, noise=noise, external_cond=cond))
    got = float(
        dm.p_losses(
            sched, model_fn, jax.random.PRNGKey(0), _nhwc(x0),
            jnp.asarray([4, 15]), external_cond=_nhwc(cond), noise=_nhwc(noise),
        )
    )
    assert abs(got - want) <= 1e-5, (got, want)


def test_ddim_trajectory_equivalence(diffusion_pair, monkeypatch):
    """Full 10-step DDIM reverse trajectory through the transplanted model
    agrees frame-by-frame (eta=0 -> deterministic given x_T; the reference's
    initial torch.randn is patched to our x_T)."""
    tdiff, sched, model_fn = diffusion_pair
    g = torch.Generator().manual_seed(4)
    cond_t = torch.rand((2, CH, IMG, IMG), generator=g) * 2 - 1

    rng = jax.random.PRNGKey(7)
    shape = (2, IMG, IMG, CH)
    # replicate ddim_sample's internal x_T derivation (models/diffusion.py)
    _, init_rng = jax.random.split(rng)
    img0 = jax.random.normal(init_rng, shape, jnp.float32)

    real_randn = torch.randn
    state = {"first": True}

    def fake_randn(*args, **kwargs):
        if state["first"] and not kwargs.get("generator"):
            state["first"] = False
            return _nchw(img0)
        return real_randn(*args, **kwargs)

    monkeypatch.setattr(torch, "randn", fake_randn)
    with torch.no_grad():
        want = tdiff.ddim_sample(
            (2, CH, IMG, IMG), return_all_timesteps=True, external_cond=cond_t
        ).numpy()  # (B, S+1, C, H, W)
    monkeypatch.setattr(torch, "randn", real_randn)

    traj, _ = dm.ddim_sample(
        sched, model_fn, rng, shape, external_cond=_nhwc(cond_t), return_every=1
    )
    got = np.asarray(traj)  # (B, S+1, H, W, C)
    assert got.shape[1] == want.shape[1] == 11
    want = want.transpose(0, 1, 3, 4, 2)
    worst = np.max(np.abs(got - want))
    assert worst <= 1e-4, worst


def test_ancestral_step_equivalence(diffusion_pair):
    """One ancestral p_sample step at t=0 (the deterministic step: no noise
    is added) through the transplanted model agrees (reference :676-698)."""
    tdiff, sched, model_fn = diffusion_pair
    g = torch.Generator().manual_seed(5)
    x = torch.randn((2, CH, IMG, IMG), generator=g)
    cond = torch.rand((2, CH, IMG, IMG), generator=g) * 2 - 1
    with torch.no_grad():
        want, want_x0, _ = tdiff.p_sample(x, 0, external_cond=cond)
    bt = jnp.zeros((2,), jnp.int32)
    _, x0, _ = dm.model_predictions(
        sched, model_fn, _nhwc(x), bt, external_cond=_nhwc(cond)
    )
    x0 = jnp.clip(x0, -1.0, 1.0)
    mean, _, _ = dm.q_posterior(sched, x0, _nhwc(x), bt)
    np.testing.assert_allclose(
        np.asarray(x0), want_x0.numpy().transpose(0, 2, 3, 1), atol=1e-4
    )
    np.testing.assert_allclose(
        np.asarray(mean), want.numpy().transpose(0, 2, 3, 1), atol=1e-4
    )


def test_importer_rejects_mismatched_tree(pair):
    tnet, fnet, params = pair
    bad = dict(params)
    bad.pop("Conv_0")
    tmpl = fnet.init(
        jax.random.PRNGKey(0),
        jnp.zeros((1, IMG, IMG, CH)),
        jnp.zeros((1, IMG, IMG, CH)),
        jnp.zeros((1,), jnp.int32),
    )["params"]
    with pytest.raises(ValueError):
        itc.verify_against_template(bad, tmpl)
