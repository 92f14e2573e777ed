"""Multi-host TPU launcher (the reference's missing ``submit_job.py``,
README.md:13-14, rebuilt for TPU pods).

The reference launched DDP jobs through MIT Supercloud's LLSUB; the
TPU-native equivalent configures ``jax.distributed`` per host.  On Cloud TPU
pods, JAX auto-initializes from the TPU metadata, so this launcher mainly
covers CPU/GPU multi-process simulation and explicit coordinator setups.

Usage (per host, or via your scheduler's array mechanism):
    python submit_job.py --coordinator host0:1234 --num-processes 4 \
        --process-id $RANK -- experiment=matrix_flow dataset=sintel \
        algorithm=flow_diffuser
"""

from __future__ import annotations

import argparse
import os
import sys


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--coordinator", default=None,
                    help="coordinator address host:port (omit on Cloud TPU pods)")
    ap.add_argument("--num-processes", type=int, default=1)
    ap.add_argument("--process-id", type=int, default=0)
    ap.add_argument("overrides", nargs="*", help="config overrides after --")
    args, extra = ap.parse_known_args()
    overrides = args.overrides + [a for a in extra if a != "--"]

    if args.coordinator:
        os.environ["OFD_COORDINATOR"] = args.coordinator
        os.environ["OFD_NUM_PROCESSES"] = str(args.num_processes)
        os.environ["OFD_PROCESS_ID"] = str(args.process_id)

    from main import run

    run(overrides)


if __name__ == "__main__":
    main()
