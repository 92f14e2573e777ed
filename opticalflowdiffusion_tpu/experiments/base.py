"""Experiment runtime: the TPU-native Lightning-Trainer equivalent.

Mirrors the reference's experiment layer (experiments/exp_base.py:23-244):
``BaseExperiment`` defines the task interface; ``JaxExperiment`` builds the
algorithm from ``compatible_algorithms[cfg.algorithm.name]`` and datasets
from ``compatible_datasets[cfg.dataset.name]``, then runs the training loop
— a jitted DP train step over the device mesh, cadenced validation
(val_check_interval / limit_val_batches semantics of exp_base.py:200-202),
step-cadenced orbax checkpointing (ModelCheckpoint equivalent,
exp_base.py:184-190) and resume.
"""

from __future__ import annotations

import time
from abc import ABC, abstractmethod
from pathlib import Path
from typing import Dict, Optional

import jax
import numpy as np

from ..config import Config
from ..data.loader import DataLoader
from ..parallel import mesh as meshlib
from ..parallel.train import make_eval_step, make_train_step
from ..utils.ckpt import CheckpointManager, publish_artifact
from ..utils.logging import RunLogger


class BaseExperiment(ABC):
    """Abstract experiment (reference exp_base.py:23-67)."""

    def __init__(self, cfg: Config, logger=None, ckpt_path=None):
        self.cfg = cfg
        self.logger = logger
        self.ckpt_path = ckpt_path

    def exec_task(self, task: str) -> None:
        if task == "train":
            self.train()
        elif task == "test":
            self.test()
        else:
            raise ValueError(
                f"Task '{task}' not implemented for {type(self).__name__}."
            )

    @abstractmethod
    def train(self) -> None:
        raise NotImplementedError

    def test(self) -> None:
        raise NotImplementedError  # overridden by JaxExperiment


class JaxExperiment(BaseExperiment):
    """Model+data+mesh training loop (reference BaseLightningExperiment)."""

    compatible_algorithms: Dict = NotImplemented
    compatible_datasets: Dict = NotImplemented

    def __init__(self, cfg: Config, logger: Optional[RunLogger] = None, ckpt_path=None):
        super().__init__(cfg, logger, ckpt_path)
        meshlib.maybe_init_distributed()
        rt = cfg.get("runtime", Config())
        mesh_cfg = rt.get("mesh", Config())
        self.mesh = meshlib.make_mesh(
            data=mesh_cfg.get("data", -1), model=mesh_cfg.get("model", 1)
        )
        self.seed = int(rt.get("seed", 0))
        # runtime.spatial=true: DP x SP — image batches additionally sharded
        # on NHWC height over the 'model' mesh axis (full-res scaling mode,
        # parallel/mesh.py::spatial_sharding)
        self.spatial = bool(rt.get("spatial", False))
        self.algorithm = self._build_algorithm()
        self.out_dir = Path(cfg.get("output_dir", "outputs/run"))

    def _build_algorithm(self):
        algo_cfg = self.cfg.algorithm
        rt = self.cfg.get("runtime", Config())
        if "_precision" not in algo_cfg:
            algo_cfg["_precision"] = rt.get("precision", "float32")
        if "_remat" not in algo_cfg:
            algo_cfg["_remat"] = bool(rt.get("remat", False))
        return self.compatible_algorithms[algo_cfg.name](algo_cfg)

    def _build_dataset(self, split: str):
        if split in ("training", "test", "validation"):
            return self.compatible_datasets[self.cfg.dataset.name](
                self.cfg.dataset, split=split
            )
        raise NotImplementedError(f"split '{split}' is not implemented")

    def _build_loader(self, split: str, data_cfg) -> Optional[DataLoader]:
        ds = self._build_dataset(split)
        if ds is None:
            return None
        import os

        return DataLoader(
            ds,
            batch_size=int(data_cfg.batch_size),
            shuffle=bool(data_cfg.shuffle),
            seed=self.seed,
            num_shards=jax.process_count(),
            shard_index=jax.process_index(),
            # reference exp_base.py:141 caps workers at os.cpu_count()
            num_workers=min(
                os.cpu_count() or 1, int(data_cfg.get("num_workers", 0))
            ),
        )

    # ------------------------------------------------------------------ train
    def train(self) -> None:
        cfg = self.cfg
        exp = cfg.experiment
        is_main = meshlib.is_main_process()

        logger = self.logger or RunLogger(
            self.out_dir, cfg.get("wandb"), is_main=is_main
        )

        train_loader = self._build_loader("training", exp.training.data)
        val_loader = self._build_loader("validation", exp.validation.data)

        rng = jax.random.PRNGKey(self.seed)
        rng, init_rng = jax.random.split(rng)
        init_batch = next(iter(train_loader))
        clip = exp.training.get("clipping")
        state = self.algorithm.init(init_rng, init_batch, clip=clip)

        n_params = sum(
            np.prod(p.shape) for p in jax.tree_util.tree_leaves(state.params)
        )
        if is_main:
            print(f"[ofd-tpu] params: {n_params/1e6:.2f}M  devices: {self.mesh.devices.size}")

        ckpt_cfg = exp.training.get("checkpointing", Config())
        ckpt_mgr = CheckpointManager(
            self.out_dir / "checkpoints",
            every_n_train_steps=int(ckpt_cfg.get("every_n_train_steps", 5000)),
        )
        start_step = 0
        if self.ckpt_path is not None:
            restore_mgr = CheckpointManager(Path(self.ckpt_path))
            state = restore_mgr.restore(state)
            start_step = int(state.step)
            restore_mgr.close()
        elif ckpt_mgr.latest_step() is not None:
            state = ckpt_mgr.restore(state)
            start_step = int(state.step)
        if start_step:
            # restored arrays are committed to one device; replicate over the mesh
            state = jax.device_put(state, meshlib.replicated(self.mesh))
        if cfg.get("wandb") and cfg.wandb.get("resume") is None and is_main:
            publish_artifact(self.out_dir.name, self.out_dir / "checkpoints")

        accumulate = int(exp.training.optim.get("accumulate_grad_batches", 1))
        rt = cfg.get("runtime", Config())
        train_step = make_train_step(
            self.algorithm.loss_fn, self.mesh, accumulate=accumulate,
            with_grad_stats=bool(rt.get("grad_stats", False)),
            spatial=self.spatial,
        )
        val_step = make_eval_step(self.algorithm.val_step, self.mesh)

        check_interval = exp.validation.get("check_interval", 400)
        if isinstance(check_interval, float):
            check_interval = max(1, int(len(train_loader) * check_interval))
        limit_val = int(exp.validation.get("limit_batch", 1))
        max_steps = int(exp.training.get("max_steps", -1))
        max_epochs = int(exp.get("epochs", -1))
        log_every = int(cfg.get("runtime", Config()).get("log_every", 50))

        step = start_step
        epoch = 0
        t_last = time.time()
        while max_epochs < 0 or epoch < max_epochs:
            for batch in train_loader:
                rng, step_rng = jax.random.split(rng)
                gbatch = meshlib.shard_batch(
                    self.mesh, batch, spatial=self.spatial
                )
                state, metrics = train_step(state, gbatch, step_rng)
                step += 1

                if step == int(self.cfg.get("runtime", Config()).get("profile_step", -1)):
                    # one-step profiler trace (jax.profiler), SURVEY.md §5
                    with jax.profiler.trace(str(self.out_dir / "profile")):
                        rng, prng = jax.random.split(rng)
                        state, metrics = train_step(state, gbatch, prng)
                        jax.block_until_ready(metrics)

                if step % log_every == 0 and is_main:
                    now = time.time()
                    metrics = {k: float(v) for k, v in metrics.items()}
                    metrics["train/steps_per_sec"] = log_every / (now - t_last)
                    t_last = now
                    logger.log_dict(metrics, step)

                if val_loader is not None and step % check_interval == 0:
                    self._validate(
                        state, val_loader, val_step, logger, step, limit_val, rng
                    )
                    t_last = time.time()

                # lazy: device_get only on cadence hits (ckpt.py maybe_save)
                ckpt_mgr.maybe_save(step, lambda: jax.device_get(state))
                if 0 < max_steps <= step:
                    ckpt_mgr.maybe_save(step, jax.device_get(state), force=True)
                    ckpt_mgr.wait()
                    ckpt_mgr.close()
                    return
            epoch += 1
        ckpt_mgr.maybe_save(step, jax.device_get(state), force=True)
        ckpt_mgr.wait()
        ckpt_mgr.close()

    # ------------------------------------------------------------------- test
    def test(self) -> None:
        """Evaluate on the test split (reference exp_base.py:216-244)."""
        cfg = self.cfg
        exp = cfg.experiment
        is_main = meshlib.is_main_process()
        logger = self.logger or RunLogger(self.out_dir, cfg.get("wandb"), is_main)
        test_cfg = exp.get("test", exp.validation)
        loader = self._build_loader("test", test_cfg.data)
        rng = jax.random.PRNGKey(self.seed)
        batch = next(iter(loader))
        state = self.algorithm.init(rng, batch)
        ckpt_mgr = CheckpointManager(self.out_dir / "checkpoints")
        if self.ckpt_path is not None:
            mgr = CheckpointManager(Path(self.ckpt_path))
            state = mgr.restore(state)
            mgr.close()
        elif ckpt_mgr.latest_step() is not None:
            state = ckpt_mgr.restore(state)
        val_step = make_eval_step(self.algorithm.val_step, self.mesh)
        totals, count = {}, 0
        for batch in loader:
            rng, vrng = jax.random.split(rng)
            gbatch = meshlib.shard_batch(self.mesh, batch)
            metrics, _ = val_step(state.params, gbatch, vrng)
            for k, v in metrics.items():
                totals[k] = totals.get(k, 0.0) + float(v)
            count += 1
        if is_main and count:
            logger.log_dict(
                {k.replace("val/", "test/").replace("validation/", "test/"):
                 v / count for k, v in totals.items()},
                int(state.step),
            )
        ckpt_mgr.close()

    def _validate(self, state, val_loader, val_step, logger, step, limit, rng):
        is_main = meshlib.is_main_process()
        for i, batch in enumerate(val_loader):
            if i >= limit:
                break
            rng, vrng = jax.random.split(rng)
            gbatch = meshlib.shard_batch(self.mesh, batch)
            metrics, artifacts = val_step(state.params, gbatch, vrng)
            if is_main:
                logger.log_dict(
                    {k: float(v) for k, v in metrics.items()}, step
                )
                images = self.algorithm.visualize(batch, jax.device_get(artifacts))
                for key, img in images.items():
                    logger.log_image(key, img, step)


__all__ = ["BaseExperiment", "JaxExperiment"]
