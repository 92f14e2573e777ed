"""Scanned-loop timing of photometric_pyramid_loss fwd+bwd: phase vs map.

Per-call timings through the axon tunnel are unreliable; this scans K
iterations inside ONE jit program with a single scalar readback (the same
measurement recipe as bench.py).

Usage: python debug/bench_pyramid_levels.py [image_size] [batch] [K]
"""

import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def main(image_size: int, batch: int, K: int, levels=None):
    import jax
    import jax.numpy as jnp
    import numpy as np

    from opticalflowdiffusion_tpu.ops import pyramid as pyr

    rng = np.random.default_rng(0)
    img = jnp.asarray(rng.standard_normal((batch, image_size, image_size, 3)),
                      jnp.float32)
    tgt = jnp.asarray(rng.standard_normal((batch, image_size, image_size, 3)),
                      jnp.float32)
    flow = jnp.asarray(
        4 * rng.standard_normal((batch, image_size, image_size, 2)), jnp.float32)
    w = jnp.asarray(rng.standard_normal((batch, image_size, image_size, 1)),
                    jnp.float32)
    levels = tuple(levels or pyr.DEFAULT_LEVELS)

    for mode in ("phase", "map"):
        if mode == "map":
            os.environ["OFD_PYRAMID"] = "map"
        else:
            os.environ.pop("OFD_PYRAMID", None)

        @jax.jit
        def many(flow, w):
            def body(carry, _):
                f, ww = carry
                def loss(f, ww):
                    return pyr.photometric_pyramid_loss(img, tgt, f, ww, levels)
                gf, gw = jax.grad(loss, argnums=(0, 1))(f, ww)
                # feed grads back so iterations can't be CSE'd or elided
                return (f + 1e-12 * gf, ww + 1e-12 * gw), None
            (f, ww), _ = jax.lax.scan(body, (flow, w), None, length=K)
            return jnp.sum(f) + jnp.sum(ww)

        float(many(flow, w))  # compile + warm
        t0 = time.perf_counter()
        float(many(flow, w))
        dt = (time.perf_counter() - t0) / K * 1e3
        print(f"[{mode}] pyramid loss fwd+bwd {image_size}^2 b{batch} "
              f"levels={levels}: {dt:.2f} ms/iter", flush=True)
    os.environ.pop("OFD_PYRAMID", None)


if __name__ == "__main__":
    image_size = int(sys.argv[1]) if len(sys.argv) > 1 else 128
    batch = int(sys.argv[2]) if len(sys.argv) > 2 else 16
    K = int(sys.argv[3]) if len(sys.argv) > 3 else 20
    lv = [int(x) for x in sys.argv[4].split(",")] if len(sys.argv) > 4 else None
    main(image_size, batch, K, lv)
