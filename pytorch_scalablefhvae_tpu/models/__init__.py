from pytorch_scalablefhvae_tpu.models import layers  # noqa: F401
from pytorch_scalablefhvae_tpu.models.simple_fhvae import SimpleFHVAE  # noqa: F401
from pytorch_scalablefhvae_tpu.models.fhvae import FHVAE  # noqa: F401
from pytorch_scalablefhvae_tpu.models.base import build_model  # noqa: F401
