"""opticalflowdiffusion_tpu: TPU-native optical-flow diffusion framework.

A ground-up JAX/XLA/Pallas/pjit rebuild of the capabilities of
davidfang00/opticalflowdiffusion (PyTorch/Lightning/CUDA), designed
TPU-first: NHWC layouts, functional models, lax.scan reverse-diffusion,
deterministic scatter splats, and SPMD data parallelism over a device mesh.
"""

__version__ = "0.1.0"

from . import config  # noqa: F401
