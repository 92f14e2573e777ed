"""Headline native-res Sintel sampling row (448x1024 DDIM-50, b2), standalone.

Runs bench.py's `_sintel_ddim_frames_per_sec` measurement for the
BASELINE.md "frames/sec (436x1024)" row without the rest of the suite —
for A/B-ing conv lowerings (OFD_CONV_BACKEND=xla|auto) during perf work.

Usage: [OFD_CONV_BACKEND=xla] python debug/bench_native_sampling.py [--b 2]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import bench  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--b", type=int, default=2)
    ap.add_argument("--ddim", type=int, default=50)
    ap.add_argument("--precision", default="bf16")
    args = ap.parse_args()
    mfu = {}
    fps = bench._sintel_ddim_frames_per_sec(
        args.precision, batch=args.b, ddim_steps=args.ddim,
        H=448, W=1024, mfu_out=mfu,
    )
    print(json.dumps({
        "metric": "sintel_native_ddim50_frames_per_sec",
        "value": round(fps, 4),
        "conv_backend": os.environ.get("OFD_CONV_BACKEND", "auto"),
        **mfu,
    }))


if __name__ == "__main__":
    main()
