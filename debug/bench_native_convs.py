"""Isolated timings of the native-res UNet's conv shapes and the splat.

Drives the decision on the round-3 native-res sampling lever: which of the
step's conv/splat components run far from their roofline, and which
reformulations actually win on this chip.  All timings are scanned loops
with one host readback (bench.py measurement rule).

Usage: python debug/bench_native_convs.py [--iters 30]
"""

from __future__ import annotations

import argparse
import functools
import sys
import time
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

PEAK_BF16 = 197e12  # v5e MXU peak FLOPs/s


def timed(fn, x, *rest, iters=30):
    """Chained scanned loop: iteration i's input depends on i-1's output so
    XLA cannot hoist the op out of the loop (loop-invariant code motion DCEs
    naive repeat-timing harnesses)."""

    def body(s, _):
        out = fn(x + s.astype(x.dtype), *rest)
        return jnp.max(out).astype(jnp.float32) * 1e-30, None

    run = jax.jit(
        lambda x0: jax.lax.scan(body, jnp.zeros((), jnp.float32), None,
                                length=iters)[0]
    )
    jax.block_until_ready(run(jnp.zeros(())))
    t0 = time.perf_counter()
    jax.block_until_ready(run(jnp.zeros(())))
    dt = (time.perf_counter() - t0) / iters
    return dt


def conv(x, k, stride=1):
    pad = (k.shape[0] // 2, k.shape[0] // 2)
    return jax.lax.conv_general_dilated(
        x, k, (stride, stride), [pad, pad],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )


def report(name, dt, flops):
    mfu = flops / dt / PEAK_BF16
    print(f"{name:50s} {dt * 1e3:8.3f} ms   {mfu * 100:5.1f}% MXU")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=30)
    ap.add_argument("--b", type=int, default=2)
    args = ap.parse_args()
    B, H, W = args.b, 448, 1024
    rng = np.random.default_rng(0)

    def arr(*s, dtype=jnp.bfloat16):
        return jnp.asarray(rng.standard_normal(s), dtype)

    print(f"batch={B}  {H}x{W}  iters={args.iters}\n")

    # harness overhead baseline: the chained (x + s) add + max reduce over
    # the largest input shape — subtract from the rows below mentally
    x64_base = arr(B, H, W, 64)
    dt = timed(lambda x: x, x64_base, iters=args.iters)
    print(f"{'harness overhead (add+max over 64ch input)':50s} {dt * 1e3:8.3f} ms\n")

    # --- stem 7x7 cin=9 -> 64
    x9 = arr(B, H, W, 9)
    k7 = arr(7, 7, 9, 64)
    dt = timed(conv, x9, k7, iters=args.iters)
    report("stem conv 7x7 9->64", dt, 2 * B * H * W * 64 * 7 * 7 * 9)

    # stem as patches+dot, chunked over H rows
    def stem_patch(x, k):
        km = k.reshape(-1, 64)
        xp = jnp.pad(x, ((0, 0), (3, 3), (3, 3), (0, 0)))
        def row_chunk(carry, h0):
            rows = jax.lax.dynamic_slice_in_dim(xp, h0, 64 + 6, axis=1)
            p = jax.lax.conv_general_dilated_patches(
                rows, (7, 7), (1, 1), [(0, 0), (0, 0)],
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            )
            return carry, p @ km
        _, out = jax.lax.scan(row_chunk, 0, jnp.arange(0, H, 64))
        return out
    dt = timed(stem_patch, x9, k7, iters=args.iters)
    report("stem as chunked patches+dot", dt, 2 * B * H * W * 64 * 7 * 7 * 9)

    # stem with cin padded to 16 / 128
    for cin in (16, 128):
        xp = arr(B, H, W, cin)
        kp = arr(7, 7, cin, 64)
        dt = timed(conv, xp, kp, iters=args.iters)
        report(f"stem conv 7x7 {cin}->64 (padded cin)", dt,
               2 * B * H * W * 64 * 7 * 7 * cin)

    # --- level-0 3x3 convs, 64->64
    x64 = arr(B, H, W, 64)
    k3 = arr(3, 3, 64, 64)
    dt = timed(conv, x64, k3, iters=args.iters)
    report("conv 3x3 64->64 @448x1024", dt, 2 * B * H * W * 64 * 64 * 9)

    k3_128 = arr(3, 3, 64, 128)
    dt = timed(conv, x64, k3_128, iters=args.iters)
    report("conv 3x3 64->128 @448x1024", dt, 2 * B * H * W * 128 * 64 * 9)

    x128 = arr(B, H, W, 128)
    k128 = arr(3, 3, 128, 128)
    dt = timed(conv, x128, k128, iters=args.iters)
    report("conv 3x3 128->128 @448x1024", dt, 2 * B * H * W * 128 * 128 * 9)

    # deeper levels
    x2 = arr(B, H // 2, W // 2, 128)
    k2 = arr(3, 3, 128, 128)
    dt = timed(conv, x2, k2, iters=args.iters)
    report("conv 3x3 128->128 @224x512", dt,
           2 * B * (H // 2) * (W // 2) * 128 * 128 * 9)

    x4 = arr(B, H // 4, W // 4, 256)
    k4 = arr(3, 3, 256, 256)
    dt = timed(conv, x4, k4, iters=args.iters)
    report("conv 3x3 256->256 @112x256", dt,
           2 * B * (H // 4) * (W // 4) * 256 * 256 * 9)

    # 1x1 convs (final + residual projections)
    k1 = arr(1, 1, 64, 128)
    dt = timed(conv, x64, k1, iters=args.iters)
    report("conv 1x1 64->128 @448x1024", dt, 2 * B * H * W * 64 * 128)

    # conv as dot (1x1): layout sanity
    w1 = arr(64, 128)
    dt = timed(lambda x, w: x @ w, x64, w1, iters=args.iters)
    report("dot 64->128 @448x1024 (1x1-equivalent)", dt, 2 * B * H * W * 64 * 128)

    # --- pallas conv kernel vs the XLA rows above
    from opticalflowdiffusion_tpu.ops import conv_pallas as cp

    dt = timed(lambda x: cp._conv_pallas(x, k7), x9, iters=args.iters)
    report("PALLAS stem conv 7x7 9->64", dt, 2 * B * H * W * 64 * 7 * 7 * 9)
    dt = timed(lambda x: cp._conv_pallas(x, k3), x64, iters=args.iters)
    report("PALLAS conv 3x3 64->64 @448x1024", dt, 2 * B * H * W * 64 * 64 * 9)
    dt = timed(lambda x: cp._conv_pallas(x, k3_128), x64, iters=args.iters)
    report("PALLAS conv 3x3 64->128 @448x1024", dt,
           2 * B * H * W * 128 * 64 * 9)
    dt = timed(lambda x: cp._conv_pallas(x, k128), x128, iters=args.iters)
    report("PALLAS conv 3x3 128->128 @448x1024", dt,
           2 * B * H * W * 128 * 128 * 9)
    dt = timed(lambda x: cp._conv_pallas(x, k2), x2, iters=args.iters)
    report("PALLAS conv 3x3 128->128 @224x512", dt,
           2 * B * (H // 2) * (W // 2) * 128 * 128 * 9)

    # --- splat at native res (the UnetWithWarp warp)
    from opticalflowdiffusion_tpu.ops.warp import warp_forward_flow
    img = arr(B, H, W, 3, dtype=jnp.bfloat16)
    flow = jnp.asarray(rng.standard_normal((B, H, W, 2)) * 8, jnp.float32)
    dt = timed(lambda i, f: warp_forward_flow(i, f), img, flow,
               iters=max(3, args.iters // 3))
    print(f"{'splat fwd (bf16 values) @448x1024':50s} {dt * 1e3:8.3f} ms")

    img32 = jnp.asarray(np.asarray(img), jnp.float32)
    dt = timed(lambda i, f: warp_forward_flow(i, f), img32, flow,
               iters=max(3, args.iters // 3))
    print(f"{'splat fwd (f32 values) @448x1024':50s} {dt * 1e3:8.3f} ms")


if __name__ == "__main__":
    main()
