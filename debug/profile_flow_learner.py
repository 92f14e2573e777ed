"""Op-level TPU profile of the FlowLearner train step (phase vs map pyramid).

Usage: python debug/profile_flow_learner.py [--batch 4] [--image-size 128]
       [--map] [--top 30]
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def capture(image_size: int, batch: int):
    import tempfile

    import jax
    import numpy as np

    from opticalflowdiffusion_tpu.algorithms.flow_learner import FlowLearner
    from opticalflowdiffusion_tpu.config import compose
    from opticalflowdiffusion_tpu.parallel import mesh as meshlib
    from opticalflowdiffusion_tpu.parallel.train import make_train_step

    cfg = compose([
        "experiment=matrix_flow",
        "dataset=artificial",
        "algorithm=flow_learner",
        f"algorithm.image_size={image_size}",
    ])
    algo = FlowLearner(cfg.algorithm)
    rng = np.random.default_rng(0)
    bnp = tuple(
        rng.standard_normal((batch, image_size, image_size, c)).astype("float32")
        for c in (3, 3, 2)
    )
    mesh = meshlib.make_mesh()
    key = jax.random.PRNGKey(0)
    state = algo.init(key, bnp, clip=100)
    step = make_train_step(algo.loss_fn, mesh)
    gb = meshlib.shard_batch(mesh, bnp)

    def run():
        nonlocal state
        state, m = step(state, gb, key)
        jax.block_until_ready(m["train/loss"])

    run()
    run()
    tdir = tempfile.mkdtemp(prefix="ofd_fl_profile_")
    with jax.profiler.trace(tdir):
        run()
    return tdir


def main():
    import os

    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=4)
    ap.add_argument("--image-size", type=int, default=128)
    ap.add_argument("--map", action="store_true")
    ap.add_argument("--top", type=int, default=30)
    args = ap.parse_args()
    if args.map:
        os.environ["OFD_PYRAMID"] = "map"
    tdir = capture(args.image_size, args.batch)
    print(f"trace: {tdir}")
    from profile_sampling import summarize

    summarize(tdir, args.top)


if __name__ == "__main__":
    main()
