"""Quick XLA-vs-Pallas timing for the UNet's hot native-res conv shapes.

Subset of bench_native_convs.py (same measurement rule) sized to run in a
few minutes through the axon tunnel; decides whether ops/conv_pallas.py's
kernel ships as the default TPU lowering.
"""

from __future__ import annotations

import sys
from pathlib import Path

import jax
import jax.numpy as jnp

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from debug.bench_native_convs import timed, conv, report  # noqa: E402
from opticalflowdiffusion_tpu.ops import conv_pallas as cp  # noqa: E402


def main():
    iters = 10
    B, H, W = 2, 448, 1024
    key = jax.random.PRNGKey(0)
    arr = lambda *s, dtype=jnp.bfloat16: jax.random.normal(key, s, dtype)

    x9 = arr(B, H, W, 9)
    x64 = arr(B, H, W, 64)
    x128 = arr(B, H // 2, W // 2, 128)
    k7 = arr(7, 7, 9, 64)
    k3 = arr(3, 3, 64, 64)
    k3u = arr(3, 3, 64, 128)
    k128 = arr(3, 3, 128, 128)

    rows = [
        ("stem 7x7 9->64", x9, k7, 2 * B * H * W * 64 * 7 * 7 * 9),
        ("3x3 64->64 @448x1024", x64, k3, 2 * B * H * W * 64 * 64 * 9),
        ("3x3 64->128 @448x1024", x64, k3u, 2 * B * H * W * 128 * 64 * 9),
        ("3x3 128->128 @224x512", x128, k128,
         2 * B * (H // 2) * (W // 2) * 128 * 128 * 9),
    ]
    for name, x, k, flops in rows:
        dt = timed(lambda a, kk=k: conv(a, kk), x, iters=iters)
        report(f"XLA    {name}", dt, flops)
        dt = timed(lambda a, kk=k: cp._conv_fold(a, kk), x, iters=iters)
        F, t0, t1 = cp._fold_plan(x.shape[3], k.shape[3], x.shape[2],
                                  k.shape[1])
        report(f"FOLD{F}  {name}", dt, flops)


if __name__ == "__main__":
    main()
