"""TPU microbench + numerics check: fused Pallas attention backward vs the
XLA-recompute VJP, at the UNet's per-resolution shapes.

Timings use a chained fori_loop inside one jit with a single host readback
(the axon tunnel adds ~0.6 ms per call, so per-call wall timing lies).

Usage:  python debug/bench_attn_bwd.py [--iters 50]
"""

from __future__ import annotations

import argparse
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=50)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from opticalflowdiffusion_tpu.ops import attention_fused as af

    print("platform:", jax.devices()[0].platform)

    # flagship 128^2 train step applies attention at 32^2 and 16^2 (mid);
    # full-res Sintel sampling at 128x64 etc.  C from the UNet dim_mults.
    shapes = [
        (16, 32 * 32, 256),
        (16, 16 * 16, 512),
        (8, 64 * 128, 128),
        (2, 128 * 256, 128),
    ]

    for B, N, C in shapes:
        key = jax.random.PRNGKey(0)
        x = jax.random.normal(key, (B, N, C), jnp.float32)
        hd = 128
        ks = jax.random.split(key, 5)
        p = (
            jnp.ones((C,), jnp.float32),
            jax.random.normal(ks[1], (C, 3 * hd)) / np.sqrt(C),
            jax.random.normal(ks[2], (hd, C)) / np.sqrt(hd),
            jnp.zeros((C,), jnp.float32),
            jnp.ones((C,), jnp.float32),
        )

        def loss(x, *p):
            y = af.fused_linear_attention_block(x, *p, 4, 32)
            return jnp.sum(jnp.square(y))

        grad = jax.grad(loss, argnums=tuple(range(6)))

        def chain(n_iters, g):
            def body(_, carry):
                gx = g(carry, *p)[0]
                return carry + 1e-12 * gx

            return jax.lax.fori_loop(0, n_iters, body, x)

        results = {}
        grads = {}
        for mode in ("1", "0"):
            os.environ["OFD_ATTN_FUSED_BWD"] = mode
            # grads for cross-check (bf16 kernels: loose tolerance)
            grads[mode] = jax.jit(grad)(x, *p)
            run = jax.jit(lambda n: chain(n, grad), static_argnums=0)
            jax.block_until_ready(run(args.iters))  # compile + warm
            t0 = time.perf_counter()
            jax.block_until_ready(run(args.iters))
            dt = (time.perf_counter() - t0) / args.iters * 1e3
            results[mode] = dt
            jax.clear_caches()

        names = ("dx", "dg_pre", "dw_qkv", "dw_out", "db_out", "dg_post")
        worst = 0.0
        for name, a, b in zip(names, grads["1"], grads["0"]):
            a, b = np.asarray(a, np.float64), np.asarray(b, np.float64)
            denom = np.abs(b).max() + 1e-30
            rel = np.abs(a - b).max() / denom
            worst = max(worst, rel)
        print(
            f"B={B:3d} N={N:6d} C={C:4d}  fused={results['1']:8.3f} ms  "
            f"xla={results['0']:8.3f} ms  speedup={results['0']/results['1']:.2f}x"
            f"  max_rel_err={worst:.3e}"
        )


if __name__ == "__main__":
    main()
