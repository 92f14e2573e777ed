"""TPU microbench: fused attention block FORWARD at full-res N vs block_n,
vs the XLA composition.  Chases the LinearAttentionBlock_* share of the
Sintel 256x512 sampling profile.

Usage:  python debug/bench_attn_fullres.py
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp
import numpy as np

from opticalflowdiffusion_tpu.ops import attention_fused as af


def timeit(fn, x, *args, iters=30):
    def chain(n, x, *p):
        def body(_, carry):
            y = fn(carry, *p)
            return carry + carry.dtype.type(1e-3) * y
        return jax.lax.fori_loop(0, n, body, x)
    run = jax.jit(chain, static_argnums=0)
    jax.block_until_ready(run(iters, x, *args))
    t0 = time.perf_counter()
    jax.block_until_ready(run(iters, x, *args))
    return (time.perf_counter() - t0) / iters * 1e3


def main():
    print("platform:", jax.devices()[0].platform)

    B, N, C = 8, 256 * 512, 128
    hd = 128
    key = jax.random.PRNGKey(0)
    ks = jax.random.split(key, 5)
    x = jax.random.normal(key, (B, N, C), jnp.bfloat16)
    p = (
        jnp.ones((C,), jnp.float32),
        jax.random.normal(ks[1], (C, 3 * hd)) / np.sqrt(C),
        jax.random.normal(ks[2], (hd, C)) / np.sqrt(hd),
        jnp.zeros((C,), jnp.float32),
        jnp.ones((C,), jnp.float32),
    )
    t = timeit(lambda x, *p: af._block_xla(x, *p, 4, 32,
                                           compute_dtype=jnp.bfloat16), x, *p)
    print(f"xla composition:      {t:8.3f} ms")

    for bn in (1024, 2048, 4096, 8192):
        try:
            t = timeit(
                lambda x, *p, bn=bn: af._fused_block_pallas(
                    x, *p, 4, 32, block_n=bn
                )[0],
                x, *p,
            )
            print(f"pallas block_n={bn:5d}: {t:8.3f} ms")
        except Exception as e:  # VMEM OOM etc.
            print(f"pallas block_n={bn:5d}: FAILED {type(e).__name__}")
        jax.clear_caches()


if __name__ == "__main__":
    main()
