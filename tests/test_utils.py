"""Utils tests: artifact store, logger facade, grad stats."""

import json

import numpy as np
import jax
import jax.numpy as jnp
import pytest


def test_artifact_store_roundtrip(tmp_path, monkeypatch):
    from opticalflowdiffusion_tpu.utils import ckpt as C

    monkeypatch.setattr(C, "ARTIFACT_ROOT", tmp_path / "artifacts")
    src = tmp_path / "run1" / "checkpoints"
    src.mkdir(parents=True)
    C.publish_artifact("abc123", src)
    got = C.download_latest_checkpoint("abc123")
    assert got.resolve() == src.resolve()
    # direct path passthrough
    assert C.download_latest_checkpoint(str(src)) == src
    with pytest.raises(FileNotFoundError):
        C.download_latest_checkpoint("nope")


def test_run_logger(tmp_path):
    from opticalflowdiffusion_tpu.utils.logging import RunLogger

    lg = RunLogger(tmp_path / "run")
    lg.log_dict({"train/loss": jnp.asarray(1.5)}, step=10)
    lg.log_image("samples", np.random.rand(2, 8, 8, 3).astype(np.float32), step=10)
    lg.log_video("vid", np.random.rand(3, 8, 8, 3).astype(np.float32), step=10)
    lg.close()

    recs = [json.loads(l) for l in open(tmp_path / "run" / "metrics.jsonl")]
    assert recs[0]["train/loss"] == 1.5 and recs[0]["step"] == 10
    assert (tmp_path / "run" / "images" / "samples" / "step_00000010.png").exists()
    assert (tmp_path / "run" / "images" / "vid" / "step_00000010.png").exists()

    # non-main process writes nothing
    lg2 = RunLogger(tmp_path / "run2", is_main=False)
    lg2.log_dict({"a": 1.0}, 0)
    lg2.close()
    assert not (tmp_path / "run2" / "metrics.jsonl").exists()


def test_grad_norm_stats_keys():
    from opticalflowdiffusion_tpu.utils.grad_stats import grad_norm_stats

    params = {"a": jnp.ones((3, 3)), "b": jnp.ones((2,)) * 2}
    grads = {"a": jnp.ones((3, 3)) * 0.1, "b": jnp.ones((2,)) * 0.5}
    stats = grad_norm_stats(grads, params)
    for key in ("train/grad_norm/min", "train/grad_norm/max",
                "train/grad_norm/median", "train/gpr/mean"):
        assert key in stats and np.isfinite(float(stats[key]))
