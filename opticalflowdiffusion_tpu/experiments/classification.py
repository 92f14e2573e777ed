"""CIFAR-10 classification experiment (reference exp_classification.py:13-30)."""

from __future__ import annotations

from .base import JaxExperiment


class ClassificationExperiment(JaxExperiment):
    @property
    def compatible_algorithms(self):
        from ..algorithms.classifier import Classifier

        return dict(classifier=Classifier)

    @property
    def compatible_datasets(self):
        from ..data.cifar10 import CIFAR10Dataset

        return dict(cifar10=CIFAR10Dataset)


__all__ = ["ClassificationExperiment"]
