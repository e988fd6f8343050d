from pytorch_scalablefhvae_tpu.eval.evaluate import evaluate_experiment  # noqa: F401
from pytorch_scalablefhvae_tpu.eval.latents import estimate_mu2, extract_latents  # noqa: F401
