"""End-to-end classification experiment through main.py with a synthetic
CIFAR-10 on disk (BASELINE.json config 2)."""

import json
import pickle
from pathlib import Path

import numpy as np


def _fake_cifar(root: Path, rng):
    base = root / "cifar-10-batches-py"
    base.mkdir(parents=True)
    for name, n in [("data_batch_1", 64), ("test_batch", 16)]:
        with open(base / name, "wb") as f:
            pickle.dump(
                {
                    b"data": (rng.random((n, 3072)) * 255).astype(np.uint8),
                    b"labels": list(rng.integers(0, 10, n)),
                },
                f,
            )
    for i in range(2, 6):
        with open(base / f"data_batch_{i}", "wb") as f:
            pickle.dump(
                {b"data": np.zeros((8, 3072), np.uint8), b"labels": [0] * 8}, f
            )


def test_main_classification(tmp_path, monkeypatch, rng):
    _fake_cifar(tmp_path / "data", rng)
    monkeypatch.chdir(tmp_path)

    import main as main_mod

    main_mod.run(
        [
            "experiment=classification",
            "dataset=cifar10",
            "algorithm=classifier",
            f"dataset.root={tmp_path / 'data'}",
            "experiment.training.data.batch_size=16",
            "experiment.validation.data.batch_size=16",
            "experiment.training.max_steps=3",
            "experiment.validation.check_interval=2",
            "runtime.log_every=1",
        ]
    )

    run_dir = Path("outputs/latest-run").resolve()
    records = [json.loads(l) for l in open(run_dir / "metrics.jsonl")]
    train = [r for r in records if "train/loss" in r]
    val = [r for r in records if "validation/loss" in r]
    assert train and np.isfinite(train[0]["train/loss"])
    assert "training/accuracy" in train[0]
    assert val and np.isfinite(val[0]["validation/accuracy"])
