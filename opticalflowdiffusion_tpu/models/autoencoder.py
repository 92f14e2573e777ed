"""Flow-equivariant autoencoder (reference flow_pred.py:17-58).

Encoder UNet maps a frame to a clamped latent; the latent is forward-warped
by the flow (splat); the decoder UNet reconstructs the target conditioned on
the original frame.  Used standalone by the FlowPred algorithm and as the
frozen latent codec of the latent FlowDiffuser (flow_diffuser.py:82-96).
"""

from __future__ import annotations

import jax.numpy as jnp
from flax import linen as nn

from .unet import Unet
from ..ops.warp import warp_forward_flow

Array = jnp.ndarray


class Autoencoder(nn.Module):
    latent_dim: int = 16
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        self.model_enc = Unet(
            64, channels=3, out_dim=self.latent_dim, dim_mults=(1, 2, 4),
            time_in=False, dtype=self.dtype,
        )
        self.model_dec = Unet(
            64, channels=self.latent_dim + 3, out_dim=3, dim_mults=(1, 2, 4),
            time_in=False, dtype=self.dtype,
        )

    def encode(self, x: Array) -> Array:
        return jnp.clip(self.model_enc(2 * x - 1.0), -1.0, 1.0)

    def decode(self, latent: Array, x: Array) -> Array:
        out = self.model_dec(jnp.concatenate([latent, 2 * x - 1.0], axis=-1))
        return (jnp.clip(out, -1.0, 1.0) + 1.0) / 2.0

    def __call__(self, x: Array, flow: Array, return_latent: bool = False) -> Array:
        latent = self.encode(x)
        # set_nans=False: the reference's default warp (flow_pred.py:41) marks
        # unsupported pixels NaN, which would poison the decoder and the MSE
        # loss whenever the (noised) flow leaves holes; zero-filled holes are
        # equivalent information (the decoder is conditioned on the original
        # frame and learns to inpaint) without NaN propagation.
        warped = warp_forward_flow(latent, flow, set_nans=False)
        if return_latent:
            return warped
        return self.decode(warped, x)


__all__ = ["Autoencoder"]
