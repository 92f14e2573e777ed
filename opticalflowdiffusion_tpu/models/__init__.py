from . import unet, diffusion  # noqa: F401
