"""Benchmark: denoise steps/sec/chip on the flagship FlowDiffuser config.

Measures the reverse-diffusion step (UNet forward + differentiable splat
warp + posterior update — the hot loop of sampling, reference
denoising_diffusion.py:700-729) at the flagship configuration
(flow_diffuser.yaml: 128x128, target=joint) on the default JAX device, and
compares against a single-host CPU baseline (BASELINE.md target:
>=10x CPU denoise steps/sec/chip).

Prints ONE JSON line:
  {"metric": "denoise_steps_per_sec_per_chip", "value": N, "unit": "steps/s",
   "vs_baseline": N / cpu_steps_per_sec}
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np


def _build(image_size: int, batch: int, dtype: str = "float32"):
    import jax
    import jax.numpy as jnp

    from opticalflowdiffusion_tpu.algorithms.flow_diffuser import FlowDiffuser
    from opticalflowdiffusion_tpu.config import compose
    from opticalflowdiffusion_tpu.models import diffusion as dm

    cfg = compose(
        [
            "experiment=matrix_flow",
            "dataset=artificial",
            "algorithm=flow_diffuser",
            f"algorithm.image_size={image_size}",
        ]
    )
    algo = FlowDiffuser(cfg.algorithm)
    rng = jax.random.PRNGKey(0)
    x = jnp.zeros((batch, image_size, image_size, algo.channels), jnp.float32)
    cond = jnp.zeros((batch, image_size, image_size, 3), jnp.float32)
    t = jnp.zeros((batch,), jnp.int32)
    params = jax.jit(algo.module.init)(rng, x, cond, t, None)["params"]

    sched = algo.sched

    def denoise_step(params, img, cond, t, rng):
        """One ancestral reverse step (the sampling hot loop body)."""
        bt = jnp.full((img.shape[0],), t, jnp.int32)
        _, x_start, _ = dm.model_predictions(
            sched, algo._model_fn(params), img, bt, external_cond=cond
        )
        x_start = jnp.clip(x_start, -1.0, 1.0)
        mean, _, log_var = dm.q_posterior(sched, x_start, img, bt)
        noise = jax.random.normal(rng, img.shape, img.dtype)
        return mean + jnp.exp(0.5 * log_var) * noise

    return jax.jit(denoise_step), params, x, cond


def _time_steps(fn, params, img, cond, iters: int) -> float:
    import jax

    rng = jax.random.PRNGKey(1)
    out = fn(params, img, cond, 10, rng)  # compile
    out.block_until_ready()
    t0 = time.perf_counter()
    for i in range(iters):
        out = fn(params, out, cond, 10, rng)
    out.block_until_ready()
    return iters / (time.perf_counter() - t0)


CPU_BASELINE_FILE = os.path.join(os.path.dirname(__file__), "BASELINE_CPU.json")


def _cpu_baseline(image_size: int, batch: int) -> float:
    """CPU denoise steps/sec, cached to BASELINE_CPU.json (a single CPU step
    of the flagship UNet takes minutes on this host — measure once)."""
    key = f"{image_size}x{batch}"
    cache = {}
    if os.path.exists(CPU_BASELINE_FILE):
        cache = json.load(open(CPU_BASELINE_FILE))
        if key in cache:
            return float(cache[key])
    import jax

    cpu = jax.devices("cpu")[0]
    with jax.default_device(cpu):
        fn, params, img, cond = _build(image_size, batch)
        sps = _time_steps(fn, params, img, cond, iters=2)
    cache[key] = sps
    with open(CPU_BASELINE_FILE, "w") as f:
        json.dump(cache, f, indent=1)
    return sps


def main():
    image_size = int(os.environ.get("BENCH_IMAGE_SIZE", "128"))
    batch = int(os.environ.get("BENCH_BATCH", "8"))

    fn, params, img, cond = _build(image_size, batch)
    device_sps = _time_steps(fn, params, img, cond, iters=30)

    try:
        cpu_sps = _cpu_baseline(image_size, batch)
        vs = round(device_sps / max(cpu_sps, 1e-9), 2)
    except Exception:
        vs = None

    print(
        json.dumps(
            {
                "metric": "denoise_steps_per_sec_per_chip",
                "value": round(device_sps, 3),
                "unit": "steps/s",
                "vs_baseline": vs,
            }
        )
    )


if __name__ == "__main__":
    main()
