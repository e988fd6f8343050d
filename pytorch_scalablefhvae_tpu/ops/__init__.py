from pytorch_scalablefhvae_tpu.ops.discriminative import (  # noqa: F401
    discriminative_log_qy_pallas,
)
