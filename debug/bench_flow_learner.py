"""FlowLearner train-step bench: phase-interleaved pyramid vs lax.map path.

The reference's photometric pyramid launches ~832 CUDA splats per step
(flow_learner.py:168-193); our old TPU path ran the same math as ~832
sequential tiny einsums under ``lax.map``.  The phase-interleaved
decomposition (ops/pyramid.py) does each level's whole offset family as ONE
MXU contraction.  This script measures the full train step (loss + grads +
Adam) both ways on the default device.

Usage: python debug/bench_flow_learner.py [image_size] [batch] [precision]
Env:   OFD_PYRAMID=map to force the old path.
"""

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def run(image_size: int, batch: int, steps: int = 5,
        precision: str = "float32") -> float:
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
        f"+algorithm._precision={precision}",
    ])
    algo = FlowLearner(cfg.algorithm)
    rng = np.random.default_rng(0)
    batch_np = (
        rng.standard_normal((batch, image_size, image_size, 3)).astype("float32"),
        rng.standard_normal((batch, image_size, image_size, 3)).astype("float32"),
        rng.standard_normal((batch, image_size, image_size, 2)).astype("float32"),
    )
    mesh = meshlib.make_mesh()
    key = jax.random.PRNGKey(0)
    state = algo.init(key, batch_np, clip=100)
    step = make_train_step(algo.loss_fn, mesh)
    gbatch = meshlib.shard_batch(mesh, batch_np)
    state, m = step(state, gbatch, key)
    float(m["train/loss"])
    state, m = step(state, gbatch, key)
    float(m["train/loss"])
    # per-step host sync: enqueueing several steps unsynced through the
    # axon tunnel serializes with multi-second queue latency (measured 10x
    # inflation), so a deep async pipeline does not measure device time here
    best = float("inf")
    for _ in range(steps):
        key, sub = jax.random.split(key)
        t0 = time.perf_counter()
        state, m = step(state, gbatch, sub)
        float(m["train/loss"])
        best = min(best, time.perf_counter() - t0)
    return 1.0 / best


if __name__ == "__main__":
    image_size = int(sys.argv[1]) if len(sys.argv) > 1 else 128
    batch = int(sys.argv[2]) if len(sys.argv) > 2 else 16
    precision = sys.argv[3] if len(sys.argv) > 3 else "float32"
    sps = run(image_size, batch, precision=precision)
    import os
    mode = os.environ.get("OFD_PYRAMID", "phase")
    print(f"flow_learner train {image_size}^2 b{batch} {precision} [{mode}]: "
          f"{sps:.2f} steps/s = {sps * batch:.1f} samples/s")
