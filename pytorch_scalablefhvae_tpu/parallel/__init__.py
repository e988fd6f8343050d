from pytorch_scalablefhvae_tpu.parallel.mesh import (  # noqa: F401
    batch_sharding,
    make_mesh,
    shard_batch,
    shard_state,
    state_shardings,
)
