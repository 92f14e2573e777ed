"""Import reference (torch / PyTorch-Lightning) checkpoints into flax params.

The reference trains `FlowDiffuser` et al. as LightningModules and stores
plain torch ``state_dict``s inside Lightning ``.ckpt`` files
(reference: main.py:67-76 resume path; flow_diffuser.py:82-94 loads a frozen
AE the same way).  A reference user switching to this framework brings those
checkpoints; this module converts them.

Two layers:

* :func:`unet_params_from_torch` — pure tensor mapping from the reference
  ``Unet`` state_dict (denoising_diffusion.py:272-417) to this framework's
  ``models/unet.py`` flax param tree.  Handles every layout difference:
  NCHW->NHWC conv kernels, (out,in) -> (in,out) dense kernels, the
  pixel-unshuffle channel-order permutation in Downsample (the reference's
  einops ``(c p1 p2)`` vs our ``(p1 p2 c)``), and the fused
  LinearAttentionBlock parameter packing.
* :func:`flow_diffuser_params_from_lightning` — extracts the UNet subtree
  from a FlowDiffuser Lightning state_dict (keys ``unet.*``,
  flow_diffuser.py:106-111) and wraps it for this framework's
  ``UnetWithWarp`` (param tree ``{"model": <unet>}``) or plain-Unet targets.

Weight-level equivalence (same inputs -> same outputs to fp32 tolerance)
is pinned by tests/test_reference_equivalence.py, which instantiates the
actual reference module under torch-cpu and transplants its weights here.

Tensors are accepted as anything ``np.asarray`` understands (torch CPU
tensors included via ``__array__``); torch itself is NOT required by this
module — callers with a ``.ckpt`` file use :func:`load_torch_state_dict`,
which does require torch for unpickling.
"""

from __future__ import annotations

from typing import Dict, Mapping, Optional, Sequence

import numpy as np


Tree = Dict[str, object]


def _np(t) -> np.ndarray:
    arr = np.asarray(getattr(t, "detach", lambda: t)().cpu() if hasattr(t, "detach") else t)
    return arr.astype(np.float32)


def _conv(sd: Mapping, key: str, bias: bool = True) -> Tree:
    """torch Conv2d (O,I,kh,kw) -> flax nn.Conv {(kh,kw,I,O), (O,)}."""
    w = _np(sd[key + ".weight"]).transpose(2, 3, 1, 0)
    out: Tree = {"kernel": w}
    if bias:
        out["bias"] = _np(sd[key + ".bias"])
    return out


def _dense(sd: Mapping, key: str) -> Tree:
    """torch Linear (O,I) -> flax nn.Dense {(I,O), (O,)}."""
    return {"kernel": _np(sd[key + ".weight"]).T, "bias": _np(sd[key + ".bias"])}


def _groupnorm(sd: Mapping, key: str) -> Tree:
    return {"scale": _np(sd[key + ".weight"]), "bias": _np(sd[key + ".bias"])}


def _ln_gain(sd: Mapping, key: str) -> np.ndarray:
    """reference LayerNorm g (1,C,1,1) -> (C,)."""
    return _np(sd[key]).reshape(-1)


def _block(sd: Mapping, key: str) -> Tree:
    """reference Block (proj WSConv + GroupNorm) -> models/unet.py Block."""
    return {
        "WSConv_0": _conv(sd, key + ".proj"),
        "GroupNorm_0": _groupnorm(sd, key + ".norm"),
    }


def _resnet_block(sd: Mapping, key: str, time_in: bool) -> Tree:
    """reference ResnetBlock (denoising_diffusion.py:189-214) -> flax.

    The time MLP is Sequential(SiLU, Linear) -> key ``.mlp.1``; the residual
    1x1 conv exists only when in/out dims differ (else nn.Identity, matching
    our conditional Conv_0).
    """
    out: Tree = {
        "Block_0": _block(sd, key + ".block1"),
        "Block_1": _block(sd, key + ".block2"),
    }
    if time_in:
        out["Dense_0"] = _dense(sd, key + ".mlp.1")
    if key + ".res_conv.weight" in sd:
        out["Conv_0"] = _conv(sd, key + ".res_conv")
    return out


def _linear_attention_block(sd: Mapping, key: str) -> Tree:
    """reference Residual(PreNorm(LinearAttention)) (keys ``<key>.fn.norm``,
    ``<key>.fn.fn.to_qkv/to_out``) -> our fused LinearAttentionBlock params.

    The qkv channel layout matches directly: torch ``chunk(3, dim=1)`` then
    ``(h c)`` head-major == our ``reshape(.., 3, heads, dim)`` 3-major
    (ops/attention_pallas.py::_linear_attention_middle_xla).
    """
    qkv = _np(sd[key + ".fn.fn.to_qkv.weight"])[:, :, 0, 0].T  # (C, 3hd)
    out_w = _np(sd[key + ".fn.fn.to_out.0.weight"])[:, :, 0, 0].T  # (hd, C)
    return {
        "prenorm_g": _ln_gain(sd, key + ".fn.norm.g"),
        "qkv_kernel": qkv,
        "out_kernel": out_w,
        "out_bias": _np(sd[key + ".fn.fn.to_out.0.bias"]),
        "postnorm_g": _ln_gain(sd, key + ".fn.fn.to_out.1.g"),
    }


def _mid_attention(sd: Mapping, key: str) -> Dict[str, Tree]:
    """reference Residual(PreNorm(Attention)) -> our PreNormResidual +
    Attention trees.  The Attention module is constructed inside Unet's
    compact scope (models/unet.py:385), so flax parents its params at the
    Unet level (``Attention_0``), not under ``PreNormResidual_0``."""
    return {
        "PreNormResidual_0": {
            "ChanLayerNorm_0": {"g": _ln_gain(sd, key + ".fn.norm.g")}
        },
        "Attention_0": {
            "Conv_0": _conv(sd, key + ".fn.fn.to_qkv", bias=False),
            "Conv_1": _conv(sd, key + ".fn.fn.to_out"),
        },
    }


def _downsample(sd: Mapping, key: str) -> Tree:
    """reference Downsample = Rearrange('b c (h p1) (w p2) -> b (c p1 p2)')
    + 1x1 conv; our ops order lanes ``(p1 p2 c)`` (models/unet.py:279-290),
    so the conv's input channels are permuted: flax index p1*2C+p2*c maps to
    torch index c*4 + p1*2 + p2."""
    w = _np(sd[key + ".1.weight"]).transpose(2, 3, 1, 0)  # (1,1,4C,O)
    four_c = w.shape[2]
    C = four_c // 4
    perm = np.empty(four_c, np.int64)
    for flax_idx in range(four_c):
        p1 = flax_idx // (2 * C)
        p2 = (flax_idx // C) % 2
        c = flax_idx % C
        perm[flax_idx] = c * 4 + p1 * 2 + p2
    return {
        "Conv_0": {"kernel": w[:, :, perm, :], "bias": _np(sd[key + ".1.bias"])}
    }


def _upsample(sd: Mapping, key: str) -> Tree:
    """reference Upsample = nearest + 3x3 conv (Sequential index 1)."""
    return {"Conv_0": _conv(sd, key + ".1")}


def unet_params_from_torch(
    sd: Mapping,
    prefix: str = "",
    *,
    dim_mults: Sequence[int] = (1, 2, 4, 8),
    time_in: bool = True,
    learned_sinusoidal: bool = False,
) -> Tree:
    """Map a reference ``Unet`` state_dict to our flax Unet param tree.

    ``prefix`` selects the submodule inside a larger state_dict (e.g.
    ``"unet."`` for FlowDiffuser Lightning checkpoints).  ``dim_mults`` and
    the time/embedding flags must match the architecture the checkpoint was
    trained with (they determine flax's auto-numbered module names).
    """
    if prefix:
        sd = {k[len(prefix):]: v for k, v in sd.items() if k.startswith(prefix)}

    R = len(dim_mults)
    params: Tree = {"Conv_0": _conv(sd, "init_conv")}
    if time_in:
        if learned_sinusoidal:
            params["RandomOrLearnedSinusoidalPosEmb_0"] = {
                "weights": _np(sd["time_mlp.0.weights"])
            }
        params["Dense_0"] = _dense(sd, "time_mlp.1")
        params["Dense_1"] = _dense(sd, "time_mlp.3")

    rb = 0   # ResnetBlock counter
    lab = 0  # LinearAttentionBlock counter
    conv = 1  # nn.Conv counter (Conv_0 = init conv)

    for i in range(R):
        params[f"ResnetBlock_{rb}"] = _resnet_block(sd, f"downs.{i}.0", time_in); rb += 1
        params[f"ResnetBlock_{rb}"] = _resnet_block(sd, f"downs.{i}.1", time_in); rb += 1
        params[f"LinearAttentionBlock_{lab}"] = _linear_attention_block(
            sd, f"downs.{i}.2"
        ); lab += 1
        if i < R - 1:
            params[f"Downsample_{i}"] = _downsample(sd, f"downs.{i}.3")
        else:
            params[f"Conv_{conv}"] = _conv(sd, f"downs.{i}.3"); conv += 1

    params[f"ResnetBlock_{rb}"] = _resnet_block(sd, "mid_block1", time_in); rb += 1
    params.update(_mid_attention(sd, "mid_attn"))
    params[f"ResnetBlock_{rb}"] = _resnet_block(sd, "mid_block2", time_in); rb += 1

    for j in range(R):
        params[f"ResnetBlock_{rb}"] = _resnet_block(sd, f"ups.{j}.0", time_in); rb += 1
        params[f"ResnetBlock_{rb}"] = _resnet_block(sd, f"ups.{j}.1", time_in); rb += 1
        params[f"LinearAttentionBlock_{lab}"] = _linear_attention_block(
            sd, f"ups.{j}.2"
        ); lab += 1
        if j < R - 1:
            params[f"Upsample_{j}"] = _upsample(sd, f"ups.{j}.3")
        else:
            params[f"Conv_{conv}"] = _conv(sd, f"ups.{j}.3"); conv += 1

    params[f"ResnetBlock_{rb}"] = _resnet_block(sd, "final_res_block", time_in)
    params[f"Conv_{conv}"] = _conv(sd, "final_conv")
    return params


def flow_diffuser_params_from_lightning(
    state_dict: Mapping,
    *,
    target: str = "joint",
    dim_mults: Sequence[int] = (1, 2, 4, 8),
    time_in: bool = True,
) -> Tree:
    """FlowDiffuser Lightning state_dict -> this framework's param tree.

    The reference registers the UNet as ``self.unet`` (flow_diffuser.py:106)
    so its weights live under ``unet.*`` (aliased again under
    ``model.model.model.*`` through ConditionalDiffusion/UnetWithWarp — we
    read the canonical prefix).  ``target`` decides the wrapper: 'target'
    and 'joint' run UnetWithWarp (tree ``{"model": unet}``), 'flow' runs the
    bare Unet (algorithms/flow_diffuser.py:153-171).
    """
    sd = state_dict.get("state_dict", state_dict)
    prefix = "unet." if any(k.startswith("unet.") for k in sd) else ""
    unet = unet_params_from_torch(
        sd, prefix, dim_mults=dim_mults, time_in=time_in
    )
    if target in ("target", "joint"):
        return {"model": unet}
    return unet


def load_torch_state_dict(path: str) -> Mapping:
    """Unpickle a torch/Lightning ``.ckpt``/``.pt`` on CPU (requires torch)."""
    import torch

    obj = torch.load(path, map_location="cpu", weights_only=False)
    return obj.get("state_dict", obj) if isinstance(obj, dict) else obj


def verify_against_template(params: Tree, template: Tree) -> None:
    """Raise with a readable diff if ``params`` does not match ``template``'s
    tree structure and shapes (template = a freshly-initialized param tree)."""
    import jax

    got = {
        "/".join(str(k.key) for k in path): np.shape(leaf)
        for path, leaf in jax.tree_util.tree_flatten_with_path(params)[0]
    }
    want = {
        "/".join(str(k.key) for k in path): np.shape(leaf)
        for path, leaf in jax.tree_util.tree_flatten_with_path(template)[0]
    }
    missing = sorted(set(want) - set(got))
    extra = sorted(set(got) - set(want))
    bad = sorted(k for k in set(got) & set(want) if got[k] != want[k])
    if missing or extra or bad:
        lines = []
        if missing:
            lines.append("missing: " + ", ".join(missing[:8]))
        if extra:
            lines.append("unexpected: " + ", ".join(extra[:8]))
        if bad:
            lines.append(
                "shape mismatch: "
                + ", ".join(f"{k} {got[k]}!={want[k]}" for k in bad[:8])
            )
        raise ValueError("imported checkpoint does not match model:\n" + "\n".join(lines))


__all__ = [
    "unet_params_from_torch",
    "flow_diffuser_params_from_lightning",
    "load_torch_state_dict",
    "verify_against_template",
]
