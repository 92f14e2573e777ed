"""Conv perf diagnostics: locate the ~3 ms gap between the fold kernel's
measured time and its MXU/HBM stream bound at 448x1024 C=64.

Rows:
  1. HBM bandwidth: y = x + 1 over the conv's input size (is the tunnel
     chip's effective HBM far below the v5e 819 GB/s spec?)
  2. Peak dot rate at the conv's contraction shape: (B*H*W/2, 128)@(128,128)
  3. fold 64->64 with rotations disabled (wrong math, isolates sublane
     rotation cost)
  4. fold 64->128 forced F=2 (cost-model tie broke to F=1; check)
  5. XLA conv with batch folded into H (layout experiment)
"""

from __future__ import annotations

import sys
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from debug.bench_native_convs import timed, conv, report  # noqa: E402
from opticalflowdiffusion_tpu.ops import conv_pallas as cp  # noqa: E402


def main():
    iters = 10
    B, H, W = 2, 448, 1024
    rng = np.random.default_rng(0)
    arr = lambda *s, dtype=jnp.bfloat16: jnp.asarray(
        rng.standard_normal(s), dtype)

    x64 = arr(B, H, W, 64)
    k3 = arr(3, 3, 64, 64)
    k3u = arr(3, 3, 64, 128)

    # 1. HBM bandwidth probe (read+write of the conv's input volume)
    nbytes = x64.size * 2 * 2  # r+w
    dt = timed(lambda x: x + 1, x64, iters=iters)
    print(f"{'copy y=x+1 (64ch input)':50s} {dt*1e3:8.3f} ms   "
          f"{nbytes/dt/1e9:6.0f} GB/s eff HBM")

    # 2. peak dot rate at the fold contraction shape
    xm = arr(B * H * W // 2, 128)
    wm = arr(128, 128)
    flops = 2 * xm.shape[0] * 128 * 128 * 9  # 9 taps' worth
    dt = timed(
        lambda a, w: sum(
            jax.lax.dot_general(a, w, (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32)
            for _ in range(9)
        ).astype(jnp.bfloat16),
        xm, wm, iters=iters)
    report("9x dot (BHW/2,128)@(128,128) f32acc", dt, flops)

    flops = 2 * B * H * W * 64 * 64 * 9
    # 3. rotation cost isolation
    dt = timed(lambda a, kk=k3: cp._conv_fold(a, kk, norot=True), x64,
               iters=iters)
    report("FOLD2 64->64 NOROT (diagnostic)", dt, flops)

    # 4. forced F=2 for 64->128
    flops_u = 2 * B * H * W * 128 * 64 * 9
    dt = timed(lambda a, kk=k3u: cp._conv_fold(a, kk, force_F=2), x64,
               iters=iters)
    report("FOLD2 64->128 (forced)", dt, flops_u)

    # 5. XLA conv with batch folded into H
    xb = x64.reshape(1, B * H, W, 64)
    dt = timed(lambda a, kk=k3: conv(a, kk), xb, iters=iters)
    report("XLA 3x3 64->64 batch-in-H", dt, flops)


if __name__ == "__main__":
    main()
