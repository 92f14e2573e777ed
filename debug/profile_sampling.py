"""Op-level TPU profile of the flagship sampling / train step.

Captures a jax.profiler trace of the DDIM sampling program (or the train
step with --train) and prints the op-type time breakdown from the XPlane
via xprof — the tooling behind PERF.md's "attention+norm ~5.7ms of 12.5ms"
style numbers.

Usage:
    python debug/profile_sampling.py [--train] [--h 256 --w 512 --batch 2]
"""

from __future__ import annotations

import argparse
import collections
import glob
import gzip
import json
import tempfile


def capture(h: int, w: int, batch: int, train: bool, precision: str,
            ddim_steps: int = 10):
    import jax
    import jax.numpy as jnp

    import sys
    from pathlib import Path

    sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
    import bench
    from opticalflowdiffusion_tpu.models import diffusion as dm
    from opticalflowdiffusion_tpu.parallel import mesh as meshlib
    from opticalflowdiffusion_tpu.parallel.train import make_train_step

    algo = bench._make_algo(128, 1000, precision,
                            sampling_timesteps=ddim_steps)
    rng = jax.random.PRNGKey(0)
    x = jnp.zeros((batch, h, w, algo.channels), jnp.float32)
    cond = jnp.zeros((batch, h, w, 3), jnp.float32)
    t = jnp.zeros((batch,), jnp.int32)
    params = jax.jit(algo.module.init)(rng, x, cond, t, None)["params"]

    if train:
        mesh = meshlib.make_mesh()
        import numpy as np

        bnp = (
            np.zeros((batch, h, w, 3), np.float32),
            np.zeros((batch, h, w, 3), np.float32),
            np.zeros((batch, h, w, 2), np.float32),
        )
        state = algo.init(rng, bnp, clip=100)
        step = make_train_step(algo.loss_fn, mesh)
        gb = meshlib.shard_batch(mesh, bnp)

        def run():
            nonlocal state
            state, m = step(state, gb, rng)
            jax.block_until_ready(m["train/loss"])
    else:
        @jax.jit
        def prog(params, cond, rng):
            img, _ = dm.ddim_sample(
                algo.sched, algo._model_fn(params), rng,
                (batch, h, w, algo.channels), external_cond=cond,
            )
            return jnp.sum(img.astype(jnp.float32))

        def run():
            jax.block_until_ready(prog(params, cond, rng))

    run()  # compile + warm
    run()
    tdir = tempfile.mkdtemp(prefix="ofd_profile_")
    with jax.profiler.trace(tdir):
        run()
    return tdir


def summarize(tdir: str, top: int = 25):
    """Framework-op time breakdown from the trace's trace_viewer JSON."""
    from xprof.convert import raw_to_tool_data as rtd

    paths = glob.glob(f"{tdir}/**/*.xplane.pb", recursive=True)
    assert paths, f"no xplane under {tdir}"
    data, _ = rtd.xspace_to_tool_data(paths, "trace_viewer", {})
    if isinstance(data, bytes):
        try:
            data = gzip.decompress(data)
        except OSError:
            pass
    trace = json.loads(data)
    events = trace.get("traceEvents", [])
    # keep device-lane complete events; aggregate by op name prefix
    by_op = collections.Counter()
    total = 0.0
    for ev in events:
        if ev.get("ph") != "X" or "dur" not in ev:
            continue
        pid_name = str(ev.get("pid", ""))
        name = ev.get("name", "")
        args = ev.get("args", {}) or {}
        if "kind" in args and args.get("kind") == "host":
            continue
        # XLA op events carry 'long_name' or hlo module info
        if not (args.get("long_name") or args.get("hlo_op")
                or name.startswith(("fusion", "convolution", "copy",
                                    "dynamic", "custom", "dot", "scatter",
                                    "reduce", "all-", "transpose", "rsqrt",
                                    "bitcast", "broadcast", "select",
                                    "concatenate", "slice", "pad", "add",
                                    "multiply", "subtract", "divide",
                                    "exponential", "convert", "iota",
                                    "compare", "maximum", "minimum"))):
            continue
        key = name.split(".")[0].split("_dfs")[0]
        by_op[key] += ev["dur"]
        total += ev["dur"]
    print(f"total device op time: {total / 1e3:.3f} ms")
    for op, dur in by_op.most_common(top):
        print(f"  {op:40s} {dur / 1e3:9.3f} ms  {100 * dur / total:5.1f}%")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--train", action="store_true")
    ap.add_argument("--h", type=int, default=256)
    ap.add_argument("--w", type=int, default=512)
    ap.add_argument("--batch", type=int, default=2)
    ap.add_argument("--precision", default="bf16")
    ap.add_argument("--top", type=int, default=25)
    args = ap.parse_args()
    tdir = capture(args.h, args.w, args.batch, args.train, args.precision)
    print(f"trace: {tdir}")
    summarize(tdir, args.top)


if __name__ == "__main__":
    main()
