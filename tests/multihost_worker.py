"""Worker process for the REAL 2-process distributed tests.

Spawned by tests/test_multihost.py (one process per rank), twice: a
``save`` phase and a fresh ``restore`` phase. Exercises, with
``jax.process_count() == 2`` for real (no mocks):

- the CLI init branch ``_maybe_init_multihost`` with explicit coordinator
  env overrides (cli/main.py);
- ``validate_multihost_mesh`` against the live process/device topology;
- one sharded train step over a (data=2, model=2) mesh whose data axis
  spans the process (host) boundary — the gradient all-reduce rides the
  cross-process collective backend (gloo here; DCN on a pod);
- a K-BUNDLED sharded dispatch (make_sharded_multi_train_step) under the
  live 2-process topology;
- an orbax checkpoint saved FROM BOTH processes (each writes its
  addressable shards; rank 0 alone writes the sidecar), then — in the
  fresh ``restore`` run — loaded back and stepped: the post-restore loss
  must equal the save phase's post-save loss bit-for-bit.

Prints ``MH_OK loss=…``, ``MH_K losses=…``, ``MH_NEXT loss=…`` lines; the
parent asserts both ranks agree and that save/restore phases match.
"""

import argparse
import os
import sys
from pathlib import Path


def build_world(seed: int = 0):
    import jax
    import numpy as np

    from pytorch_scalablefhvae_tpu.models import SimpleFHVAE
    from pytorch_scalablefhvae_tpu.parallel.mesh import (
        make_mesh,
        padded_num_seqs,
        shard_state,
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
    state = shard_state(mesh, create_train_state(model, optimizer, seed=seed))
    dims = (batch, seg_len, n_mels, num_seqs)
    return jax, np, mesh, model, optimizer, state, dims


def global_batch(np, rng, dims):
    batch, seg_len, n_mels, num_seqs = dims
    return (
        rng.standard_normal((batch, seg_len, n_mels)).astype(np.float32),
        rng.integers(0, num_seqs, batch).astype(np.int32),
        np.full(batch, 5.0, np.float32),
        np.ones(batch, np.float32),
    )


def main() -> int:
    proc_id = int(sys.argv[1])
    port = sys.argv[2]
    phase = sys.argv[3] if len(sys.argv) > 3 else "save"
    ckpt_dir = Path(sys.argv[4]) if len(sys.argv) > 4 else None
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

    import jax as _jax

    _jax.config.update("jax_platforms", "cpu")

    from pytorch_scalablefhvae_tpu.cli.main import _maybe_init_multihost

    # the REAL init path: jax.distributed.initialize + mesh validation
    assert _maybe_init_multihost(
        argparse.Namespace(multihost=True, mesh="2,2")) is True
    assert _jax.process_count() == 2, _jax.process_count()
    assert _jax.local_device_count() == 2
    assert _jax.device_count() == 4

    # host-boundary rule enforced against the LIVE topology: model axis 4
    # would span the 2-device hosts
    from pytorch_scalablefhvae_tpu.parallel.mesh import validate_multihost_mesh

    try:
        validate_multihost_mesh((1, 4))
    except ValueError:
        pass
    else:
        raise AssertionError("model axis spanning hosts must be rejected")

    jax, np, mesh, model, optimizer, state, dims = build_world()

    from pytorch_scalablefhvae_tpu.parallel.mesh import (
        shard_batch,
        shard_stacked_batch,
    )
    from pytorch_scalablefhvae_tpu.parallel.sharded_step import (
        make_sharded_multi_train_step,
        make_sharded_train_step,
    )

    step = make_sharded_train_step(model, optimizer, alpha=10.0, mesh=mesh,
                                   donate=False)

    def run_probe(st):
        # every rank builds the same GLOBAL probe batch; device_put with a
        # mesh-wide sharding ships each rank only its addressable shards
        feats, seq_idx, nsegs, weight = shard_batch(
            mesh, *global_batch(np, np.random.default_rng(11), dims))
        _, metrics = step(st, feats, seq_idx, nsegs, weight)
        return float(np.asarray(jax.device_get(metrics["loss"])))

    ckpt_name = "simple_fhvae_mh_e0.orbax"

    if phase == "save":
        feats, seq_idx, nsegs, weight = shard_batch(
            mesh, *global_batch(np, np.random.default_rng(7), dims))
        new_state, metrics = step(state, feats, seq_idx, nsegs, weight)
        loss = float(np.asarray(jax.device_get(metrics["loss"])))
        assert np.isfinite(loss), loss
        before = np.asarray(jax.device_get(
            state.params["mu2_table"].addressable_data(0)))
        after = np.asarray(jax.device_get(
            new_state.params["mu2_table"].addressable_data(0)))
        assert not np.array_equal(before, after)
        print(f"MH_OK loss={loss:.10f}", flush=True)

        # ---- K-bundled sharded dispatch under the live 2-process topology
        K = 3
        rng = np.random.default_rng(13)
        stacked = [global_batch(np, rng, dims) for _ in range(K)]
        arrs = tuple(np.stack([b[i] for b in stacked]) for i in range(4))
        mstep = make_sharded_multi_train_step(model, optimizer, 10.0, mesh,
                                              donate=False)
        new_state, metrics = mstep(new_state, *shard_stacked_batch(mesh, *arrs))
        k_losses = np.asarray(jax.device_get(metrics["loss"]))
        assert k_losses.shape == (K,) and np.isfinite(k_losses).all()
        print("MH_K losses=" + ",".join(f"{v:.10f}" for v in k_losses),
              flush=True)

        # ---- orbax save from BOTH processes (sharded array write), then a
        # post-save probe step whose loss the restore phase must reproduce
        from pytorch_scalablefhvae_tpu.train.orbax_backend import (
            save_checkpoint_orbax,
            wait_for_saves,
        )

        save_checkpoint_orbax(
            ckpt_dir, new_state, model_type="simple_fhvae", run_info="mh",
            epoch=0, meta={"num_seqs": dims[3], "best_epoch": -1},
        )
        wait_for_saves()
        assert (ckpt_dir / ckpt_name).exists()
        print("MH_SAVED", flush=True)
        print(f"MH_NEXT loss={run_probe(new_state):.10f}", flush=True)
    else:
        # ---- fresh 2-process run: restore the sharded checkpoint and step
        from pytorch_scalablefhvae_tpu.train.orbax_backend import (
            load_checkpoint_orbax,
        )

        restored, meta = load_checkpoint_orbax(ckpt_dir / ckpt_name, state)
        assert meta["start_epoch"] == 1
        print(f"MH_NEXT loss={run_probe(restored):.10f}", flush=True)

    jax.distributed.shutdown()
    return 0


if __name__ == "__main__":
    sys.exit(main())
