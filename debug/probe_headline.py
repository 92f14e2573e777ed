"""Quick headline probe: denoise steps/s on the flagship sampler.

Usage: [OFD_CONV_BACKEND=...] python debug/probe_headline.py [--timesteps 250]
Prints one JSON line. Used for round-4 dispatch A/Bs (VERDICT r3 #1).
"""
import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--timesteps", type=int, default=250)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--image-size", type=int, default=128)
    ap.add_argument("--precision", default="bf16")
    args = ap.parse_args()

    import jax
    from bench import _build_sampler, _setup_cache

    _setup_cache()
    t0 = time.perf_counter()
    run, params, cond = _build_sampler(
        args.image_size, args.batch, args.timesteps, args.precision)
    rng = jax.random.PRNGKey(1)
    float(run(params, cond, rng))
    t_compile = time.perf_counter() - t0
    best = float("inf")
    for _ in range(2):
        t0 = time.perf_counter()
        float(run(params, cond, rng))
        best = min(best, time.perf_counter() - t0)
    print(json.dumps({
        "backend": os.environ.get("OFD_CONV_BACKEND", "auto"),
        "steps_per_sec": round(args.timesteps / best, 1),
        "compile_s": round(t_compile, 1),
    }))


if __name__ == "__main__":
    main()
