"""One-process headline A/B over trace-time env knobs.

Builds and times the flagship sampler once per variant inside a single
device client (env knobs are read at trace time, so flipping os.environ
between builds is sufficient), printing one JSON line per variant as it
lands.  One process = one tunnel session: no per-variant client attach /
process startup, and all programs share the persistent compile cache.

Usage: python debug/probe_ab.py [--timesteps 250]
Round-4 dispatch A/Bs (VERDICT r3 #1).
"""
import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

# Knobs are set EXPLICITLY in both directions so the table stays
# reproducible regardless of what the repo default is (round 4 flipped the
# defaults to the classic program; these variants still rebuild the r3
# residue and its two components).
VARIANTS = [
    ("classic", {"OFD_FUSE_GN": "0", "OFD_1X1": "xla"}),
    ("fuse_only", {"OFD_FUSE_GN": "1", "OFD_1X1": "xla"}),
    ("dot_only", {"OFD_FUSE_GN": "0", "OFD_1X1": "dot"}),
    ("r3_residue", {"OFD_FUSE_GN": "1", "OFD_1X1": "dot"}),
]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--timesteps", type=int, default=250)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--image-size", type=int, default=128)
    ap.add_argument("--precision", default="bf16")
    ap.add_argument("--variants", default=",".join(v for v, _ in VARIANTS))
    ap.add_argument("--native", action="store_true",
                    help="time the 448x1024 b2 DDIM-50 row instead")
    args = ap.parse_args()

    import jax
    from bench import (_build_sampler, _setup_cache,
                       _sintel_ddim_frames_per_sec)

    _setup_cache()
    wanted = set(args.variants.split(","))
    for name, env in VARIANTS:
        if name not in wanted:
            continue
        saved = {k: os.environ.get(k) for k in env}
        os.environ.update(env)
        try:
            if args.native:
                t0 = time.perf_counter()
                fps = _sintel_ddim_frames_per_sec(
                    args.precision, batch=2, H=448, W=1024)
                print(json.dumps({
                    "variant": name,
                    "native_frames_per_sec": round(fps, 3),
                    "wall_s": round(time.perf_counter() - t0, 1),
                }), flush=True)
                continue
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
                "variant": name,
                "steps_per_sec": round(args.timesteps / best, 1),
                "compile_s": round(t_compile, 1),
            }), flush=True)
        except Exception as e:
            print(json.dumps({"variant": name, "error": repr(e)[:300]}),
                  flush=True)
        finally:
            for k, v in saved.items():
                if v is None:
                    os.environ.pop(k, None)
                else:
                    os.environ[k] = v


if __name__ == "__main__":
    main()
