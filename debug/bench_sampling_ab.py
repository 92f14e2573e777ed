"""End-to-end native-res sampling A/B: XLA convs vs the fold kernel, plus a
clean HBM streaming probe (chained y += 1 on a 117 MB array, no reduce).

One background-able script so the tunnel chip runs everything serially.
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

import jax
import jax.numpy as jnp

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import bench  # noqa: E402


def hbm_probe():
    x = jnp.zeros((2, 448, 1024, 64), jnp.bfloat16)

    @jax.jit
    def run(x):
        def body(y, _):
            return y + 1, None
        y, _ = jax.lax.scan(body, x, None, length=10)
        return y[0, 0, 0, 0]

    float(run(x))
    t0 = time.perf_counter()
    float(run(x))
    dt = (time.perf_counter() - t0) / 10
    bw = x.size * 2 * 2 / dt / 1e9
    print(f"streaming r+w: {dt * 1e3:.3f} ms/pass  {bw:.0f} GB/s", flush=True)


def main():
    hbm_probe()
    for backend in ("xla", "auto"):
        os.environ["OFD_CONV_BACKEND"] = backend
        jax.clear_caches()  # backend is read at trace time
        mfu = {}
        t0 = time.perf_counter()
        fps = bench._sintel_ddim_frames_per_sec(
            "bf16", batch=2, ddim_steps=50, H=448, W=1024, mfu_out=mfu)
        print(json.dumps({
            "conv_backend": backend,
            "sintel_native_ddim50_frames_per_sec": round(fps, 4),
            "wall_s": round(time.perf_counter() - t0, 1),
            **mfu,
        }), flush=True)


if __name__ == "__main__":
    main()
