"""Full experiment-runtime test: main.py entry, training loop, validation
cadence, checkpointing and resume on the tiny artificial config."""

import json
import os
from pathlib import Path

import numpy as np
import pytest


TINY = [
    "experiment=matrix_flow",
    "dataset=artificial",
    "algorithm=flow_diffuser",
    "dataset.image_size=16",
    "dataset.size=32",
    "+dataset.seed=0",
    "algorithm.image_size=16",
    "algorithm.timesteps=4",
    "algorithm.flow_max=2",
    "experiment.training.data.batch_size=8",
    "experiment.validation.data.batch_size=8",
    "experiment.training.max_steps=6",
    "experiment.validation.check_interval=5",
    "experiment.training.checkpointing.every_n_train_steps=3",
    "experiment.epochs=-1",
]


@pytest.mark.slow
def test_main_train_and_resume(tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    import main as main_mod

    main_mod.run(TINY)

    run_dir = Path("outputs/latest-run").resolve()
    metrics_file = run_dir / "metrics.jsonl"
    assert metrics_file.exists()
    records = [json.loads(l) for l in open(metrics_file)]
    # validation fired at step 5
    val = [r for r in records if "val/loss" in r]
    assert val, "validation never ran"
    assert np.isfinite(val[0]["val/loss"])
    # images dumped
    assert any((run_dir / "images").iterdir())
    # checkpoints written (steps 3, 6)
    ckpts = sorted(int(p.name) for p in (run_dir / "checkpoints").iterdir())
    assert 6 in ckpts

    # resume from the written checkpoint into a fresh run
    from opticalflowdiffusion_tpu.config import compose
    from opticalflowdiffusion_tpu.experiments import build_experiment

    cfg = compose(TINY + ["experiment.training.max_steps=8"])
    cfg["output_dir"] = str(tmp_path / "resume_run")
    exp = build_experiment(cfg, ckpt_path=run_dir / "checkpoints")
    exp.train()
    ckpts2 = sorted(
        int(p.name) for p in (tmp_path / "resume_run" / "checkpoints").iterdir()
    )
    assert ckpts2 and max(ckpts2) >= 8  # continued past restored step 6
