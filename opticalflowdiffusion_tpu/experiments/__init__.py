"""Experiment registry (reference experiments/__init__.py:11-30)."""

from __future__ import annotations

from typing import Optional, Union
import pathlib

from ..config import Config
from .base import BaseExperiment, JaxExperiment
from .matrix_flow import MatrixFlowExperiment
from .animation import AnimationExperiment
from .classification import ClassificationExperiment

exp_registry = dict(
    classification=ClassificationExperiment,
    animation=AnimationExperiment,
    matrix_flow=MatrixFlowExperiment,
)


def build_experiment(
    cfg: Config,
    logger=None,
    ckpt_path: Optional[Union[str, pathlib.Path]] = None,
) -> BaseExperiment:
    """Build an experiment instance based on the registry."""
    return exp_registry[cfg.experiment.name](cfg, logger, ckpt_path)


__all__ = [
    "build_experiment", "exp_registry", "BaseExperiment", "JaxExperiment",
    "MatrixFlowExperiment", "AnimationExperiment", "ClassificationExperiment",
]
