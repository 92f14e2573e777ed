"""Flow-learning experiment: 5 algorithms x 5 datasets (reference exp_99.py:18-44)."""

from __future__ import annotations

from .base import JaxExperiment


def _algorithms():
    from ..algorithms.flow_diffuser import FlowDiffuser
    from ..algorithms.flow_learner import FlowLearner
    from ..algorithms.flow_pred import FlowPred
    from ..algorithms.matrix_flow import MatrixFlow
    from ..algorithms.pwc_learner import PWCLearner

    return dict(
        matrix_flow=MatrixFlow,
        flow_pred=FlowPred,
        flow_diffuser=FlowDiffuser,
        flow_learner=FlowLearner,
        pwc_learner=PWCLearner,
    )


def _datasets():
    from ..data.artificial import ArtificialDataset
    from ..data.flying_chairs import FlyingChairsDataset
    from ..data.kitti_single import KittiSingleDataset
    from ..data.buck_bunny_video import BuckBunnyVideoDataset
    from ..data.sintel import SintelDataset

    return dict(
        flying_chairs=FlyingChairsDataset,
        artificial=ArtificialDataset,
        kitti_single=KittiSingleDataset,
        buck_bunny_video=BuckBunnyVideoDataset,
        sintel=SintelDataset,
    )


class MatrixFlowExperiment(JaxExperiment):
    """A flow/video-prediction experiment."""

    @property
    def compatible_algorithms(self):
        return _algorithms()

    @property
    def compatible_datasets(self):
        return _datasets()


__all__ = ["MatrixFlowExperiment"]
