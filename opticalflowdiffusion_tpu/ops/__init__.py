from . import splat, warp, filters, correlation  # noqa: F401
from .splat import softsplat, splat_raw  # noqa: F401
from .warp import warp as warp_fn  # noqa: F401
