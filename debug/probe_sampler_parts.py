"""Decompose headline sampler step time: UNet eval vs sampling math vs RNG.

Scans N iterations of (a) model eval only, (b) model eval + per-step
randn, (c) the full p_sample_loop, each as ONE jitted program with a
single host readback.  Used for round-4 headline profiling (VERDICT r3
#1/#3).
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def timed(run, *args, repeats=2):
    float(run(*args))
    best = float("inf")
    for _ in range(repeats):
        t0 = time.perf_counter()
        float(run(*args))
        best = min(best, time.perf_counter() - t0)
    return best


def main():
    import jax
    import jax.numpy as jnp
    from bench import _build_sampler, _setup_cache
    from opticalflowdiffusion_tpu.models import diffusion as dm

    _setup_cache()
    steps = int(os.environ.get("PROBE_STEPS", "250"))
    B, S = 8, 128
    run, params, cond = _build_sampler(S, B, steps, "bf16")
    rng = jax.random.PRNGKey(1)

    t_full = timed(run, params, cond, rng)

    # model-eval-only scan: same UNet work, no posterior math / no randn
    from opticalflowdiffusion_tpu.algorithms.flow_diffuser import FlowDiffuser
    from opticalflowdiffusion_tpu.config import compose

    cfg = compose([
        "experiment=matrix_flow", "dataset=artificial",
        "algorithm=flow_diffuser", f"algorithm.image_size={S}",
        f"algorithm.timesteps={steps}", "+algorithm._precision=bf16",
    ])
    algo = FlowDiffuser(cfg.algorithm)
    model_fn = algo._model_fn(params)
    x0 = jnp.zeros((B, S, S, algo.channels), jnp.float32)

    def _match(out, x):
        C = x.shape[-1]
        if out.shape[-1] > C:
            out = out[..., :C]
        elif out.shape[-1] < C:
            out = jnp.concatenate(
                [out, jnp.zeros(out.shape[:-1] + (C - out.shape[-1],),
                                out.dtype)], -1)
        return out.astype(x.dtype)

    @jax.jit
    def model_only(x, cond):
        def body(carry, t):
            out = model_fn(carry, cond, jnp.full((B,), t, jnp.int32), None)
            return _match(out, carry), None
        y, _ = jax.lax.scan(body, x, jnp.arange(steps))
        return jnp.sum(y.astype(jnp.float32))

    t_model = timed(model_only, x0, cond)

    @jax.jit
    def model_plus_rng(x, cond, key):
        def body(carry, t):
            x, key = carry
            key, sub = jax.random.split(key)
            out = model_fn(x, cond, jnp.full((B,), t, jnp.int32), None)
            noise = jax.random.normal(sub, x.shape, jnp.float32)
            return (_match(out, x) + noise.astype(x.dtype), key), None
        (y, _), _ = jax.lax.scan(body, (x, key), jnp.arange(steps))
        return jnp.sum(y.astype(jnp.float32))

    t_rng = timed(model_plus_rng, x0, cond, rng)

    print(json.dumps({
        "steps": steps,
        "full_ms_per_step": round(t_full / steps * 1e3, 3),
        "model_only_ms_per_step": round(t_model / steps * 1e3, 3),
        "model_plus_rng_ms_per_step": round(t_rng / steps * 1e3, 3),
        "full_steps_per_sec": round(steps / t_full, 1),
        "model_only_steps_per_sec": round(steps / t_model, 1),
    }))


if __name__ == "__main__":
    main()
