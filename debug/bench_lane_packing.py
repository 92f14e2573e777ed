"""Lane-packing microbench: achieved elementwise bandwidth vs minor-dim size.

Tests the hypothesis that the native-res program's generic fusions run at
~half of stream bandwidth because the UNet's C=64 feature dim only
half-fills the TPU's 128-lane tiles.  Measures chained y+1 passes (the
bench._hbm_stream_gbps methodology: scan of read+write passes, one
readback) over shapes holding total bytes constant while varying the
minor dim, plus batch variants.

Usage: python debug/bench_lane_packing.py
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def stream(shape, dtype, passes=100):
    import jax
    import jax.numpy as jnp

    x = jnp.zeros(shape, dtype)

    @jax.jit
    def run(x):
        def body(y, _):
            return y + 1, None
        y, _ = jax.lax.scan(body, x, None, length=passes)
        return y.reshape(-1)[0].astype(jnp.float32)

    float(run(x))
    best = float("inf")
    for _ in range(2):
        t0 = time.perf_counter()
        float(run(x))
        best = min(best, time.perf_counter() - t0)
    nbytes = x.size * x.dtype.itemsize
    return nbytes * 2 * passes / best / 1e9


def main():
    import jax.numpy as jnp

    from bench import _setup_cache

    _setup_cache()
    cases = [
        # (label, shape, dtype) — first three hold bytes constant
        ("C64  bf16 [2,448,1024,64]", (2, 448, 1024, 64), jnp.bfloat16),
        ("C128 bf16 [2,448,512,128]", (2, 448, 512, 128), jnp.bfloat16),
        ("C256 bf16 [2,448,256,256]", (2, 448, 256, 256), jnp.bfloat16),
        ("flat bf16 [58720256]", (2 * 448 * 1024 * 64,), jnp.bfloat16),
        ("C64  bf16 b8 [8,448,1024,64]", (8, 448, 1024, 64), jnp.bfloat16),
        ("C64  f32  [2,448,1024,64]", (2, 448, 1024, 64), jnp.float32),
        ("C128 f32  [2,448,512,128]", (2, 448, 512, 128), jnp.float32),
    ]
    for label, shape, dt in cases:
        gbps = stream(shape, dt)
        print(json.dumps({"case": label, "gbps": round(gbps, 1)}), flush=True)


if __name__ == "__main__":
    main()
