"""NumPy oracle of the reference softsplat CUDA kernels.

Direct scalar-loop transcription of the kernel math documented in
SURVEY.md §2 C16a (softsplat_new.py:339-735), used ONLY as a test oracle for
the framework's XLA/Pallas implementation — including the reference's
edge-stretch corrections, frozen flow gradients and its ingrad/flowgrad
transform quirks.

Layout here is NHWC with flow (dx, dy), matching the framework.
"""

import numpy as np


def _stretch(offset, size, scale):
    return (abs(offset - (size % scale))) % scale


def _fwd_x(f, size, scale, offset):
    if f >= size - 1.0 and scale > 1:
        f = f + (f - size + 1.0) * _stretch(offset, size, scale)
        return (f - offset) / scale
    if f - offset < 0.0:
        return f - offset
    return (f - offset) / scale


def _ingrad_x(f, size, scale, offset):
    if f >= size - 1.0:
        f = f + (f - size + 1.0) * _stretch(offset, size, scale)
        f = f + (f - size + 1.0) * offset  # reference quirk (softsplat_new.py:517)
        return (f - offset) / scale
    if f - offset < 0.0:
        return f - offset
    return (f - offset) / scale


def _ingrad_y(f, size, scale, offset):
    if f >= size - 1.0:
        f = f + (f - size + 1.0) * _stretch(offset, size, scale)
        return (f - offset) / scale
    if f - offset < 0.0:
        return f - offset
    return (f - offset) / scale


def _flowgrad_x(f, size, scale, offset):
    if f >= size - 1.0:
        f = f + (f - size + 1.0) * _stretch(offset, size, scale)
        return (f - offset) / scale, 0.0
    if f - offset < 0.0:
        return f - offset, 0.0
    return (f - offset) / scale, 1.0 / scale


def _flowgrad_y(f, size, scale, offset):
    if f >= size - 1.0:
        f = f + (f - size + 1.0) * offset  # reference quirk (softsplat_new.py:640)
        return (f - offset) / scale, 0.0
    if f - offset < 0.0:
        return f - offset, 0.0
    return (f - offset) / scale, 1.0 / scale


def _corners(tx, ty):
    x0, y0 = int(np.floor(tx)), int(np.floor(ty))
    return [
        (x0, y0, (x0 + 1 - tx) * (y0 + 1 - ty)),
        (x0 + 1, y0, (tx - x0) * (y0 + 1 - ty)),
        (x0, y0 + 1, (x0 + 1 - tx) * (ty - y0)),
        (x0 + 1, y0 + 1, (tx - x0) * (ty - y0)),
    ]


def splat_forward(inp, flow, scale=1, offset_x=0, offset_y=0):
    B, H, W, C = inp.shape
    Ho, Wo = H // scale, W // scale
    out = np.zeros((B, Ho, Wo, C), np.float32)
    for b in range(B):
        for y in range(H):
            for x in range(W):
                fx = x + flow[b, y, x, 0]
                fy = y + flow[b, y, x, 1]
                if not (np.isfinite(fx) and np.isfinite(fy)):
                    continue
                tx = _fwd_x(fx, W, scale, offset_x)
                ty = _fwd_x(fy, H, scale, offset_y)
                for cx, cy, w in _corners(tx, ty):
                    if 0 <= cx < Wo and 0 <= cy < Ho:
                        out[b, cy, cx] += inp[b, y, x] * w
    return out


def splat_ingrad(inp, flow, g, scale=1, offset_x=0, offset_y=0):
    B, H, W, C = inp.shape
    Ho, Wo = g.shape[1], g.shape[2]
    din = np.zeros_like(inp, dtype=np.float32)
    for b in range(B):
        for y in range(H):
            for x in range(W):
                fx = x + flow[b, y, x, 0]
                fy = y + flow[b, y, x, 1]
                if not (np.isfinite(fx) and np.isfinite(fy)):
                    continue
                tx = _ingrad_x(fx, W, scale, offset_x)
                ty = _ingrad_y(fy, H, scale, offset_y)
                for cx, cy, w in _corners(tx, ty):
                    if 0 <= cx < Wo and 0 <= cy < Ho:
                        din[b, y, x] += g[b, cy, cx] * w
    return din


def splat_flowgrad(inp, flow, g, scale=1, offset_x=0, offset_y=0):
    B, H, W, C = inp.shape
    Ho, Wo = g.shape[1], g.shape[2]
    dflow = np.zeros_like(flow, dtype=np.float32)
    for b in range(B):
        for y in range(H):
            for x in range(W):
                fx = x + flow[b, y, x, 0]
                fy = y + flow[b, y, x, 1]
                if not (np.isfinite(fx) and np.isfinite(fy)):
                    continue
                tx, dxx = _flowgrad_x(fx, W, scale, offset_x)
                ty, dyy = _flowgrad_y(fy, H, scale, offset_y)
                x0, y0 = int(np.floor(tx)), int(np.floor(ty))
                # d(weight)/dtx and d(weight)/dty per corner
                for cx, cy, dwx, dwy in [
                    (x0, y0, -(y0 + 1 - ty), -(x0 + 1 - tx)),
                    (x0 + 1, y0, +(y0 + 1 - ty), -(tx - x0)),
                    (x0, y0 + 1, -(ty - y0), +(x0 + 1 - tx)),
                    (x0 + 1, y0 + 1, +(ty - y0), +(tx - x0)),
                ]:
                    if 0 <= cx < Wo and 0 <= cy < Ho:
                        acc = float(np.dot(g[b, cy, cx], inp[b, y, x]))
                        # reference quirk: x channel uses dyy, y channel dxx
                        dflow[b, y, x, 0] += acc * dwx * dyy
                        dflow[b, y, x, 1] += acc * dwy * dxx
    return dflow
