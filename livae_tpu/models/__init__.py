from .rvae import RVAE, Decoder, Encoder, RotationSTN
from .vae import VAE, VAEDecoder, VAEEncoder
