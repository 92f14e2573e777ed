"""Standalone visual debug harness (reference datasets/animation/gt_flow.py).

Duplicates the MatrixFlow filter math outside the training stack, warps
frames by their ground-truth flow (both the filter application and the
splat), and renders a comparison grid to ``result.png`` for eyeball
verification.  Uses the artificial dataset by default (CPU-runnable,
no external data); pass ``--dataset flying_chairs`` with data present for
the reference's original setup.

Run: python debug/gt_flow.py [--dataset artificial] [--out result.png]
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--dataset", default="artificial")
    ap.add_argument("--out", default="result.png")
    ap.add_argument("--n", type=int, default=4)
    ap.add_argument("--radius", type=int, default=5)
    args = ap.parse_args()

    import jax.numpy as jnp

    from opticalflowdiffusion_tpu.config import Config, compose
    from opticalflowdiffusion_tpu.data import get_dataset
    from opticalflowdiffusion_tpu.ops import filters as fops
    from opticalflowdiffusion_tpu.ops.warp import warp_forward_flow, warp_backward_flow
    from opticalflowdiffusion_tpu.utils import visualization as viz

    cfg = compose([f"dataset={args.dataset}"]).dataset
    if args.dataset == "artificial":
        cfg = Config(dict(name="artificial", image_size=32, size=64,
                          shape="boxes", bg="checkers", seed=0))
    ds = get_dataset(args.dataset)(cfg, split="training")

    rows = []
    R = args.radius
    for i in range(args.n):
        item = ds[i]
        first, second, flow = item[0], item[1], item[-1]
        first = jnp.asarray(first[None])
        second = jnp.asarray(second[None])
        flow = jnp.asarray(flow[None])

        # filter math: one-hot filter at rounded flow, inverted, applied
        v = jnp.clip(jnp.round(flow), -(R // 2), R // 2) + R // 2
        onehot = jnp.zeros(first.shape[:3] + (R * R,))
        idx = (v[..., 1] * R + v[..., 0]).astype(jnp.int32)
        onehot = jnp.take_along_axis(
            jnp.eye(R * R)[None, None, None], idx[..., None, None], axis=-2
        )[..., 0, :]
        packed = jnp.concatenate(
            [onehot, jnp.zeros(first.shape[:3] + (4,))], axis=-1
        )
        filter_warp = fops.warp_forward_filter(first, packed)

        splat_warp = jnp.nan_to_num(warp_forward_flow(first, flow))
        back_warp, _ = warp_backward_flow(second, -flow)

        row = np.concatenate(
            [
                np.asarray(first[0]),
                np.asarray(second[0]),
                np.asarray(jnp.clip(filter_warp[0], 0, 1)),
                np.asarray(jnp.clip(splat_warp[0], 0, 1)),
                np.asarray(jnp.clip(back_warp[0], 0, 1)),
                viz.flow_to_image(np.asarray(flow))[0],
            ],
            axis=1,
        )
        rows.append(row)
    grid = np.concatenate(rows, axis=0)
    viz.save_image(grid, args.out)
    print(f"wrote {args.out} (cols: first | second | filter-warp | splat-warp "
          f"| backward-warp | gt flow)")


if __name__ == "__main__":
    main()
