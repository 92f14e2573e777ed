"""Real multi-process jax.distributed training: 2 CPU processes x 2 virtual
devices, coordinated through maybe_init_distributed (the reference's
multi-GPU DDP launch, exp_base.py:197-198 / submit.sh, exercised for real
instead of trusting the sharding unit tests).

Each rank runs the full JaxExperiment train loop for a few steps over the
4-device global mesh; per-host dataset sharding + global-batch assembly
(parallel/mesh.py shard_batch) and the XLA-inserted gradient all-reduce are
all on the tested path.
"""

import os
import socket
import subprocess
import sys
from pathlib import Path

import pytest

REPO = Path(__file__).resolve().parent.parent

RANK_SCRIPT = """
import sys, os, jax
jax.config.update("jax_platforms", "cpu")
sys.path.insert(0, {repo!r})
from opticalflowdiffusion_tpu.config import compose
from opticalflowdiffusion_tpu.experiments import build_experiment

cfg = compose([
    "experiment=matrix_flow",
    "dataset=artificial",
    "algorithm=flow_diffuser",
    "dataset.image_size=16",
    "dataset.size=32",
    "+dataset.seed=0",
    "algorithm.image_size=16",
    "algorithm.timesteps=4",
    "algorithm.flow_max=2",
    "experiment.training.data.batch_size=4",
    "experiment.validation.data.batch_size=4",
    "experiment.training.max_steps=3",
    "experiment.validation.check_interval=100",
    "experiment.training.checkpointing.every_n_train_steps=100",
])
cfg["output_dir"] = {outdir!r} + "/rank" + os.environ["OFD_PROCESS_ID"]
exp = build_experiment(cfg)
assert jax.process_count() == 2, jax.process_count()
assert len(jax.devices()) == 4, jax.devices()
exp.train()
print("RANK_OK", jax.process_index(), flush=True)
"""


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


@pytest.mark.slow
def test_two_process_distributed_train(tmp_path):
    port = _free_port()
    procs = []
    for rank in range(2):
        env = dict(os.environ)
        for var in ("PALLAS_AXON_POOL_IPS", "PALLAS_AXON_TPU_GEN",
                    "PALLAS_AXON_REMOTE_COMPILE"):
            env.pop(var, None)
        flags = [
            f for f in env.get("XLA_FLAGS", "").split()
            if "xla_force_host_platform_device_count" not in f
        ]
        flags.append("--xla_force_host_platform_device_count=2")
        env["XLA_FLAGS"] = " ".join(flags)
        env["JAX_PLATFORMS"] = "cpu"
        env["OFD_COORDINATOR"] = f"127.0.0.1:{port}"
        env["OFD_NUM_PROCESSES"] = "2"
        env["OFD_PROCESS_ID"] = str(rank)
        code = RANK_SCRIPT.format(repo=str(REPO), outdir=str(tmp_path))
        procs.append(
            subprocess.Popen(
                [sys.executable, "-c", code], env=env, cwd=str(REPO),
                stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
            )
        )

    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=900)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outs.append(out)
    for rank, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"rank {rank} failed:\n{out[-4000:]}"
        assert f"RANK_OK {rank}" in out, out[-2000:]
    # final checkpoints written by each rank's manager
    for rank in range(2):
        ckpts = list((tmp_path / f"rank{rank}" / "checkpoints").iterdir())
        assert ckpts, f"rank {rank} wrote no checkpoint"
