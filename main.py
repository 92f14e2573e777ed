"""CLI entry: compose config, set up output dir + logger, run tasks.

TPU-native equivalent of the reference main.py:24-89 with the same override
grammar, e.g.:

    python main.py +wandb.name=example experiment=matrix_flow \
        dataset=artificial algorithm=flow_diffuser

Replaces the Hydra decorator with the built-in composer, wandb
checkpoint-artifact resume with the local artifact store, and TF32 matmul
setup with TPU-native precision config (runtime.precision).
"""

from __future__ import annotations

import sys
from datetime import datetime
from pathlib import Path

from opticalflowdiffusion_tpu.config import compose
from opticalflowdiffusion_tpu.experiments import build_experiment
from opticalflowdiffusion_tpu.utils.ckpt import download_latest_checkpoint
from opticalflowdiffusion_tpu.utils.logging import RunLogger


def run(argv=None) -> None:
    if sys.version_info < (3, 9):
        print("Please use Python 3.9+.")

    cfg = compose(argv if argv is not None else sys.argv[1:])

    # Output directory (hydra-style outputs/<date>/<time>).
    stamp = datetime.now()
    output_dir = Path("outputs") / stamp.strftime("%Y-%m-%d") / stamp.strftime("%H-%M-%S")
    output_dir.mkdir(parents=True, exist_ok=True)
    latest = output_dir.parents[1] / "latest-run"
    try:
        if latest.is_symlink() or latest.exists():
            latest.unlink()
        latest.symlink_to(output_dir.absolute())
    except OSError:
        pass
    print(f"Saving outputs to {output_dir}")
    cfg["output_dir"] = str(output_dir)

    # Resume: resolve a checkpoint from the local artifact store.
    resume_id = cfg.get("wandb", {}).get("resume")
    checkpoint_path = None
    if resume_id:
        checkpoint_path = download_latest_checkpoint(resume_id)

    wandb_cfg = cfg.get("wandb")
    if wandb_cfg is not None and wandb_cfg.get("name") is None:
        wandb_cfg["name"] = f"{output_dir.parent.name}/{output_dir.name}"
    logger = RunLogger(output_dir, wandb_cfg)

    experiment = build_experiment(cfg, logger, checkpoint_path)
    for task in cfg.experiment.tasks:
        experiment.exec_task(task)


if __name__ == "__main__":
    run()
