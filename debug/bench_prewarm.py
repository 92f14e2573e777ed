"""Pre-warm the bench: persistent compile cache + flops memo for ALL rows.

Through the axon tunnel every XLA compile costs ~1-2+ min regardless of
program size, so a cold full `python bench.py` cannot finish inside the
~590 s driver budget (BENCH_r04: 8 of 12 rows `_skipped`).  This script
builds and runs every program bench.py measures, in the same persistent
compile cache (`~/.cache/ofd_bench_jax`), and lowers each flop-counted
program so `.bench_flops_cache.json` (committed) carries the MFU numbers
into a clean checkout.  After one successful run of this script,
`BENCH_BUDGET_S=520 python bench.py` completes all rows as cache hits.

Usage: python debug/bench_prewarm.py [--only headline,native,...]
"""
import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--only", default="")
    args = ap.parse_args()

    import bench

    bench._setup_cache()
    image_size = int(os.environ.get("BENCH_IMAGE_SIZE", "128"))
    batch = int(os.environ.get("BENCH_BATCH", "8"))
    timesteps = int(os.environ.get("BENCH_TIMESTEPS", "250"))
    precision = os.environ.get("BENCH_PRECISION", "bf16")

    mfu = {}
    jobs = [
        ("headline", lambda: bench._steps_per_sec(
            image_size, batch, timesteps, precision, repeats=1, mfu_out=mfu)),
        ("cpu_baseline", lambda: bench._cpu_baseline(image_size, batch)),
        ("native", lambda: bench._sintel_ddim_frames_per_sec(
            precision, batch=2, H=448, W=1024, mfu_out=mfu)),
        ("native_b8", lambda: bench._sintel_ddim_frames_per_sec(
            precision, batch=8, H=448, W=1024)),
        ("sintel", lambda: bench._sintel_ddim_frames_per_sec(
            precision, batch=2)),
        ("train", lambda: bench._train_samples_per_sec(
            image_size, 16, timesteps, precision, steps=2)),
        ("sintel_b8", lambda: bench._sintel_ddim_frames_per_sec(
            precision, batch=8)),
        ("dpmpp_b8", lambda: bench._sintel_ddim_frames_per_sec(
            precision, batch=8, ddim_steps=20, sampler="dpmpp")),
        ("sintel_train", lambda: bench._train_samples_per_sec(
            image_size, 16, timesteps, precision, steps=2, H=256, W=512)),
        ("native_dpmpp", lambda: bench._sintel_ddim_frames_per_sec(
            precision, batch=2, ddim_steps=20, H=448, W=1024,
            sampler="dpmpp")),
        ("native_train", lambda: bench._train_samples_per_sec(
            image_size, 2, timesteps, precision, steps=2, H=448, W=1024,
            remat=True)),
        ("video256", lambda: bench._video_train_samples_per_sec(
            precision, steps=2)),
        ("flow_learner", lambda: bench._flow_learner_train_samples_per_sec(
            steps=2)),
        ("flow_learner_bf16",
         lambda: bench._flow_learner_train_samples_per_sec(
             precision, steps=2)),
        ("hbm_stream", lambda: bench._hbm_stream_gbps()),
    ]
    only = set(args.only.split(",")) if args.only else None
    for name, thunk in jobs:
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            v = thunk()
            print(json.dumps({
                "warm": name, "value": round(float(v), 3),
                "wall_s": round(time.time() - t0, 1),
            }), flush=True)
        except Exception as e:
            print(json.dumps({
                "warm": name, "error": repr(e)[:300],
                "wall_s": round(time.time() - t0, 1),
            }), flush=True)
    if bench._FLOPS_ERRORS:
        print(json.dumps({"flops_errors": bench._FLOPS_ERRORS}), flush=True)


if __name__ == "__main__":
    main()
