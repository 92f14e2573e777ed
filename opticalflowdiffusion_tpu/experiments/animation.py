"""Video-prediction experiment on TaiChi (reference exp_control.py:18-35)."""

from __future__ import annotations

from .base import JaxExperiment


class AnimationExperiment(JaxExperiment):
    @property
    def compatible_algorithms(self):
        from ..algorithms.animation import FrameGenerator, FlowCompleter

        return dict(frame_generator=FrameGenerator, flow_completer=FlowCompleter)

    @property
    def compatible_datasets(self):
        from ..data.artificial_video import ArtificialVideoDataset
        from ..data.taichi import TaiChiDataset

        # artificial_video: rebuild extension — synthetic constant-velocity
        # sequences in the TaiChi layout (exact GT flow; see its module doc)
        return dict(taichi=TaiChiDataset,
                    artificial_video=ArtificialVideoDataset)


__all__ = ["AnimationExperiment"]
