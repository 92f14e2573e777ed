"""Dataset registry (lazy imports; heavy deps like cv2 load on demand)."""

from .loader import DataLoader  # noqa: F401


def get_dataset(name: str):
    if name == "artificial":
        from .artificial import ArtificialDataset as D
    elif name == "sintel":
        from .sintel import SintelDataset as D
    elif name == "flying_chairs":
        from .flying_chairs import FlyingChairsDataset as D
    elif name == "kitti_single":
        from .kitti_single import KittiSingleDataset as D
    elif name == "taichi":
        from .taichi import TaiChiDataset as D
    elif name == "buck_bunny_video":
        from .buck_bunny_video import BuckBunnyVideoDataset as D
    elif name == "cifar10":
        from .cifar10 import CIFAR10Dataset as D
    elif name == "mnist":
        from .mnist import MNISTDataset as D
    else:
        raise KeyError(f"unknown dataset {name}")
    return D


__all__ = ["DataLoader", "get_dataset"]
