from . import unet, diffusion  # noqa: F401

# heavier model families import lazily where used:
# autoencoder, pwc_net, raft, resnet, mobilenet, filter_codec, common
