"""Native-res (448x1024 b2 DDIM-50) roofline profile — VERDICT r3 #3.

Establishes whether the native-res sampler is at its hardware ceiling by
combining three measurements in one process:

1. the program's post-optimization resource counts from XLA's compiled-
   module cost analysis (``compile().cost_analysis()`` — the compile is a
   persistent-cache hit after any bench/probe run, so this is cheap):
   total flops and HBM bytes accessed of the OPTIMIZED (fused) HLO;
2. the measured step time of the very same program;
3. the measured effective HBM streaming bandwidth of this chip through
   this runtime (bench._hbm_stream_gbps — chained read+write passes in
   one scan, single readback).

Prints one JSON line:
  achieved_gbps / stream_gbps  -> how close the program runs to the
                                  chip's measured streaming ceiling
  mfu                          -> how close it runs to the MXU peak
  ceiling_frames_per_sec       -> frames/s IF the program hit the binding
                                  roofline exactly (min of both bounds)
  frames_per_sec               -> measured

Usage: python debug/native_roofline.py [--ddim-steps 50] [--batch 2]
"""
import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ddim-steps", type=int, default=50)
    ap.add_argument("--batch", type=int, default=2)
    ap.add_argument("--H", type=int, default=448)
    ap.add_argument("--W", type=int, default=1024)
    ap.add_argument("--precision", default="bf16")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from bench import PEAK_FLOPS, _hbm_stream_gbps, _make_algo, _setup_cache
    from opticalflowdiffusion_tpu.models import diffusion as dm

    _setup_cache()
    B, H, W = args.batch, args.H, args.W
    algo = _make_algo(128, 1000, args.precision,
                      sampling_timesteps=args.ddim_steps)
    rng = jax.random.PRNGKey(0)
    x = jnp.zeros((B, H, W, algo.channels), jnp.float32)
    cond = jnp.zeros((B, H, W, 3), jnp.float32)
    t = jnp.zeros((B,), jnp.int32)
    params = jax.jit(algo.module.init)(rng, x, cond, t, None)["params"]

    @jax.jit
    def run(params, cond, rng):
        img, _ = dm.ddim_sample(
            algo.sched, algo._model_fn(params), rng,
            (B, H, W, algo.channels), external_cond=cond,
        )
        return jnp.sum(img.astype(jnp.float32))

    # post-optimization counts: scan body is counted ONCE (measured — see
    # bench._xla_flops), so totals get multiplied by the trip count below
    compiled = run.lower(params, cond, rng).compile()
    ca = compiled.cost_analysis()
    if isinstance(ca, (list, tuple)):
        ca = ca[0]
    flops1 = float(ca.get("flops", 0.0))
    bytes1 = float(ca.get("bytes accessed", 0.0))

    float(run(params, cond, rng))  # warm (compile was cached already)
    best = float("inf")
    for _ in range(2):
        t0 = time.perf_counter()
        float(run(params, cond, rng))
        best = min(best, time.perf_counter() - t0)

    stream_gbps = _hbm_stream_gbps()

    steps = args.ddim_steps
    flops = flops1 * steps
    hbm_bytes = bytes1 * steps
    peak = PEAK_FLOPS.get(jax.devices()[0].platform, 197e12)
    achieved_gbps = hbm_bytes / best / 1e9
    mfu = flops / best / peak
    # time lower bound if the program ran exactly at the binding roofline
    t_mem = hbm_bytes / (stream_gbps * 1e9)
    t_mxu = flops / peak
    t_bound = max(t_mem, t_mxu)
    print(json.dumps({
        "shape": f"{H}x{W} b{B} ddim{steps} {args.precision}",
        "frames_per_sec": round(B / best, 3),
        "step_time_s": round(best, 3),
        "hbm_gb_per_call": round(hbm_bytes / 1e9, 1),
        "flops_per_call_tf": round(flops / 1e12, 2),
        "stream_gbps": round(stream_gbps, 1),
        "achieved_gbps": round(achieved_gbps, 1),
        "frac_of_stream_bw": round(achieved_gbps / stream_gbps, 3),
        "mfu": round(mfu, 4),
        "binding_bound": "memory" if t_mem > t_mxu else "compute",
        "ceiling_frames_per_sec": round(B / t_bound, 3),
        "headroom_x": round(best / t_bound, 2),
    }), flush=True)


if __name__ == "__main__":
    main()
