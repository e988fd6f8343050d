"""Worker process for the REAL 2-process distributed test.

Spawned by tests/test_multihost.py (one process per rank). Exercises, with
``jax.process_count() == 2`` for real (no mocks):

- the CLI init branch ``_maybe_init_multihost`` with explicit coordinator
  env overrides (cli/main.py);
- ``validate_multihost_mesh`` against the live process/device topology;
- one sharded train step over a (data=2, model=2) mesh whose data axis
  spans the process (host) boundary — the gradient all-reduce rides the
  cross-process collective backend (gloo here; DCN on a pod).

Prints ``MH_OK loss=<float>`` on success; the parent asserts both ranks
print the same finite loss (the step is deterministic and replicated).
"""

import argparse
import os
import sys


def main() -> int:
    proc_id = int(sys.argv[1])
    port = sys.argv[2]
    # force the virtual-CPU backend BEFORE any jax import side effects
    os.environ["JAX_PLATFORMS"] = "cpu"
    flags = [f for f in os.environ.get("XLA_FLAGS", "").split()
             if "xla_force_host_platform_device_count" not in f]
    flags.append("--xla_force_host_platform_device_count=2")
    os.environ["XLA_FLAGS"] = " ".join(flags)
    os.environ["SFHVAE_MULTIHOST"] = "1"
    os.environ["SFHVAE_COORDINATOR"] = f"localhost:{port}"
    os.environ["SFHVAE_NUM_PROCESSES"] = "2"
    os.environ["SFHVAE_PROCESS_ID"] = str(proc_id)

    import jax

    jax.config.update("jax_platforms", "cpu")
    import numpy as np

    from pytorch_scalablefhvae_tpu.cli.main import _maybe_init_multihost

    # the REAL init path: jax.distributed.initialize + mesh validation
    assert _maybe_init_multihost(
        argparse.Namespace(multihost=True, mesh="2,2")) is True
    assert jax.process_count() == 2, jax.process_count()
    assert jax.local_device_count() == 2
    assert jax.device_count() == 4

    # host-boundary rule enforced against the LIVE topology: model axis 4
    # would span the 2-device hosts
    from pytorch_scalablefhvae_tpu.parallel.mesh import validate_multihost_mesh

    try:
        validate_multihost_mesh((1, 4))
    except ValueError:
        pass
    else:
        raise AssertionError("model axis spanning hosts must be rejected")

    from pytorch_scalablefhvae_tpu.models import SimpleFHVAE
    from pytorch_scalablefhvae_tpu.parallel.mesh import (
        make_mesh,
        padded_num_seqs,
        shard_batch,
        shard_state,
    )
    from pytorch_scalablefhvae_tpu.parallel.sharded_step import (
        make_sharded_train_step,
    )
    from pytorch_scalablefhvae_tpu.train.step import (
        create_train_state,
        make_optimizer,
    )

    seg_len, n_mels, num_seqs, batch = 20, 16, 9, 8
    mesh = make_mesh((2, 2))
    model = SimpleFHVAE(
        input_size=seg_len * n_mels, num_seqs=num_seqs,
        num_seqs_padded=padded_num_seqs(num_seqs, 2), shard_mesh=mesh,
        z1_hus=(32, 32), z2_hus=(32, 32), x_hus=(32, 32), z1_dim=8, z2_dim=8,
    )
    optimizer = make_optimizer(1e-3, 0.95, 0.999)
    state = shard_state(mesh, create_train_state(model, optimizer, seed=0))

    # every rank builds the same GLOBAL batch; device_put with a mesh-wide
    # sharding ships each rank only its addressable shards
    rng = np.random.default_rng(7)
    feats, seq_idx, nsegs, weight = shard_batch(
        mesh,
        rng.standard_normal((batch, seg_len, n_mels)).astype(np.float32),
        rng.integers(0, num_seqs, batch).astype(np.int32),
        np.full(batch, 5.0, np.float32),
        np.ones(batch, np.float32),
    )
    step = make_sharded_train_step(model, optimizer, alpha=10.0, mesh=mesh,
                                   donate=False)
    new_state, metrics = step(state, feats, seq_idx, nsegs, weight)
    loss = float(np.asarray(jax.device_get(metrics["loss"])))
    assert np.isfinite(loss), loss
    # params moved, and the update is identical across ranks by construction
    before = np.asarray(jax.device_get(state.params["mu2_table"].addressable_data(0)))
    after = np.asarray(jax.device_get(new_state.params["mu2_table"].addressable_data(0)))
    assert not np.array_equal(before, after)
    print(f"MH_OK loss={loss:.10f}", flush=True)
    jax.distributed.shutdown()
    return 0


if __name__ == "__main__":
    sys.exit(main())
