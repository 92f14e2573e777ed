from .standalone import Trainer, ImageFolderDataset  # noqa: F401
