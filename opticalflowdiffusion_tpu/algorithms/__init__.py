"""Algorithm registry (lazy to keep import light)."""


def get_algorithm(name: str):
    if name == "flow_diffuser":
        from .flow_diffuser import FlowDiffuser as A
    elif name == "flow_learner":
        from .flow_learner import FlowLearner as A
    elif name == "flow_pred":
        from .flow_pred import FlowPred as A
    elif name == "matrix_flow":
        from .matrix_flow import MatrixFlow as A
    elif name == "pwc_learner":
        from .pwc_learner import PWCLearner as A
    elif name == "frame_generator":
        from .animation import FrameGenerator as A
    elif name == "flow_completer":
        from .animation import FlowCompleter as A
    elif name == "classifier":
        from .classifier import Classifier as A
    else:
        raise KeyError(f"unknown algorithm {name}")
    return A


__all__ = ["get_algorithm"]
