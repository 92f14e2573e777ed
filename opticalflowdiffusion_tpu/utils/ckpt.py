"""Checkpointing + local artifact store.

Replaces the reference's three checkpoint mechanisms (SURVEY.md §5):
Lightning ModelCheckpoint cadence (exp_base.py:184-190), wandb artifact
download/rewrite on resume (main.py:66-76, utils.wandb_utils — absent from
the reference snapshot), and cross-model frozen-module loading
(flow_diffuser.py:82-94).

Implementation: orbax async checkpointing of the full train-state pytree
under ``<out_dir>/checkpoints/<step>``, plus a process-local "artifact
store" directory keyed by run id so ``download_latest_checkpoint(run_id)``
has a working local equivalent for cross-run dependencies (e.g. the frozen
autoencoder ``cfg.ae``).
"""

from __future__ import annotations

import os
from pathlib import Path
from typing import Any, Optional

import orbax.checkpoint as ocp

ARTIFACT_ROOT = Path(os.environ.get("OFD_ARTIFACT_ROOT", "outputs/artifacts"))


class CheckpointManager:
    """Step-cadenced checkpointing (ModelCheckpoint-equivalent)."""

    def __init__(self, directory, every_n_train_steps: int = 5000, max_to_keep: int = 3):
        self.directory = Path(directory).absolute()
        self.every_n = int(every_n_train_steps)
        self._mgr = ocp.CheckpointManager(
            self.directory,
            options=ocp.CheckpointManagerOptions(
                max_to_keep=max_to_keep, create=True
            ),
        )

    def maybe_save(self, step: int, state: Any, force: bool = False) -> bool:
        """Save if the cadence (or ``force``) says so.

        ``state`` may be a zero-arg callable producing the state: the hot
        training loop passes ``lambda: jax.device_get(state)`` so the full
        parameter/optimizer readback only happens on cadence hits, not
        every step (a per-step device_get serializes the async dispatch
        chain and, through a device tunnel, costs a full state transfer).
        """
        if not force and (self.every_n <= 0 or step == 0 or step % self.every_n != 0):
            return False
        if callable(state):
            state = state()
        self._mgr.save(step, args=ocp.args.StandardSave(state))
        return True

    def latest_step(self) -> Optional[int]:
        return self._mgr.latest_step()

    def restore(self, state_template: Any, step: Optional[int] = None) -> Any:
        step = step if step is not None else self._mgr.latest_step()
        if step is None:
            raise FileNotFoundError(f"no checkpoint under {self.directory}")
        return self._mgr.restore(step, args=ocp.args.StandardRestore(state_template))

    def wait(self) -> None:
        self._mgr.wait_until_finished()

    def close(self) -> None:
        self._mgr.close()


def publish_artifact(run_id: str, src_ckpt_dir) -> Path:
    """Register a run's checkpoint dir in the local artifact store
    (the ``log_model='all'`` stand-in)."""
    dst = ARTIFACT_ROOT / run_id
    dst.parent.mkdir(parents=True, exist_ok=True)
    if dst.is_symlink() or dst.exists():
        return dst
    dst.symlink_to(Path(src_ckpt_dir).absolute())
    return dst


def download_latest_checkpoint(run_id: str) -> Path:
    """Resolve a run id to its checkpoint directory (main.py:67-74 equivalent).

    Accepts either an artifact-store id or a direct filesystem path.
    Search order: direct path, $OFD_ARTIFACT_ROOT (run-local store), then
    the repo-bundled ``artifacts/`` registry (tracked symlinks to published
    checkpoints, e.g. the ``raft-artificial`` flow-precompute weights) — so
    bundled artifacts resolve in a fresh clone without re-training.
    """
    p = Path(run_id)
    if p.exists():
        return p
    p = ARTIFACT_ROOT / run_id
    if p.exists():
        return p
    bundled = Path(__file__).resolve().parents[2] / "artifacts" / run_id
    if bundled.exists():
        return bundled
    raise FileNotFoundError(
        f"checkpoint artifact '{run_id}' not found "
        f"(searched {ARTIFACT_ROOT} and {bundled.parent})"
    )


def load_params_from_run(run_id: str, params_template=None, prefix: Optional[str] = None):
    """Load (a sub-tree of) params from another run's latest checkpoint —
    the frozen-autoencoder dependency path (flow_diffuser.py:82-94).

    Restores WITHOUT a template so it accepts both full-TrainState
    checkpoints written by the experiment loop ({step, params, opt_state})
    and bare {"params": ...} trees; ``params_template`` is kept for
    call-compat and optional structure validation.
    """
    import jax

    ckpt_dir = download_latest_checkpoint(run_id)
    mgr = ocp.CheckpointManager(Path(ckpt_dir).absolute())
    step = mgr.latest_step()
    try:
        restored = mgr.restore(step, args=ocp.args.StandardRestore())
    finally:
        mgr.close()
    params = restored
    if isinstance(params, dict) and "params" in params:
        params = params["params"]
    if prefix:
        params = params[prefix]
    if params_template is not None:
        want = jax.tree_util.tree_structure(params_template)
        got = jax.tree_util.tree_structure(params)
        if want != got:
            raise ValueError(
                f"checkpoint '{run_id}' params tree does not match the "
                f"expected structure (prefix={prefix!r})"
            )
    return params


__all__ = [
    "CheckpointManager", "publish_artifact", "download_latest_checkpoint",
    "load_params_from_run", "ARTIFACT_ROOT",
]
