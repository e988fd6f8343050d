from pytorch_scalablefhvae_tpu.train.step import TrainState, make_train_step, make_eval_step  # noqa: F401
from pytorch_scalablefhvae_tpu.train.checkpoint import (  # noqa: F401
    load_checkpoint,
    save_checkpoint,
)
