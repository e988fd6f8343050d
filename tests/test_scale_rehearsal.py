"""LibriSpeech-960-shape scale rehearsal (BASELINE config 4) on the CPU mesh.

The scale axis of this model family is the mu2 table: LibriSpeech-960 has
281,241 training utterances, so the discriminative softmax runs against a
281k-row sharded table. This rehearses those mechanics end-to-end in bounded
time (tiny z2_dim, few steps):

- sharded train steps against the full 281,241-row table on a (4,2) mesh;
- orbax checkpoint of the row-sharded table + restore onto a DIFFERENT mesh
  shape (row-padding adaptation across model-axis sizes);
- a hierarchical-round table swap (the production configuration at this
  corpus size) composed with the mesh.

The full-loop integration at this corpus size is exercised piecewise: the
loop's mesh/hierarchical/orbax paths have their own tests (test_loop,
test_device_data), and this file pins the only thing that changes at 960h —
the table dimension.
"""

import numpy as np
import pytest

from pytorch_scalablefhvae_tpu.models import SimpleFHVAE
from pytorch_scalablefhvae_tpu.parallel.mesh import (
    make_mesh,
    padded_num_seqs,
    shard_batch,
    shard_state,
)
from pytorch_scalablefhvae_tpu.parallel.sharded_step import make_sharded_train_step
from pytorch_scalablefhvae_tpu.train.step import create_train_state, make_optimizer

pytestmark = pytest.mark.slow  # compile-heavy: 281k-row sharded-table programs

LARGE_N = 281_241  # LibriSpeech-960 train utterance count
B, T, F, Z = 64, 8, 4, 4


def big_model(mesh):
    return SimpleFHVAE(
        input_size=T * F, num_seqs=LARGE_N,
        num_seqs_padded=padded_num_seqs(LARGE_N, mesh.shape["model"]),
        shard_mesh=mesh, z1_hus=(8,), z2_hus=(8,), x_hus=(8,),
        z1_dim=Z, z2_dim=Z, use_pallas="never",  # jnp/GSPMD path on CPU
    )


def make_batch(rng, n=LARGE_N):
    return (
        rng.standard_normal((B, T, F)).astype(np.float32),
        rng.integers(0, n, B).astype(np.int32),
        np.full(B, 5.0, np.float32),
        np.ones(B, np.float32),
    )


@pytest.fixture(scope="module")
def trained():
    """Three sharded steps against the full-size table on a (4,2) mesh."""
    import jax

    rng = np.random.default_rng(0)
    mesh = make_mesh((4, 2))
    model = big_model(mesh)
    opt = make_optimizer(1e-3, 0.95, 0.999)
    state = shard_state(mesh, create_train_state(model, opt, seed=0))
    step = make_sharded_train_step(model, opt, alpha=10.0, mesh=mesh,
                                   donate=False)
    losses = []
    for _ in range(3):
        state, m = step(state, *shard_batch(mesh, *make_batch(rng)))
        losses.append(float(m["loss"]))
    return mesh, model, opt, state, losses


class TestLargeTable:
    def test_steps_finite_and_training(self, trained):
        _, _, _, state, losses = trained
        assert np.isfinite(losses).all()
        assert state.params["mu2_table"].shape[0] == padded_num_seqs(LARGE_N, 2)

    def test_padded_rows_stay_zero_gradient(self, trained):
        """Rows past num_seqs are masked out of the softmax and never
        gathered, so three Adam steps leave them at their init."""
        import jax

        mesh, model, opt, state, _ = trained
        init = shard_state(mesh, create_train_state(model, opt, seed=0))
        a = np.asarray(jax.device_get(state.params["mu2_table"]))[LARGE_N:]
        b = np.asarray(jax.device_get(init.params["mu2_table"]))[LARGE_N:]
        np.testing.assert_array_equal(a, b)

    def test_orbax_roundtrip_across_mesh_shapes(self, trained, tmp_path):
        """Sharded-table orbax save -> restore onto a (2,4) mesh: the row
        padding adapts (281,242 rows for m=2 -> 281,244 for m=4)."""
        import jax

        from pytorch_scalablefhvae_tpu.train.orbax_backend import (
            load_checkpoint_orbax,
            save_checkpoint_orbax,
        )

        mesh, model, opt, state, _ = trained
        save_checkpoint_orbax(
            tmp_path, state, model_type=model.model_type, run_info="scale",
            epoch=0, meta={"best_epoch": 0, "num_seqs": LARGE_N},
        )
        mesh2 = make_mesh((2, 4))
        model2 = big_model(mesh2)
        template = shard_state(
            mesh2, create_train_state(model2, opt, seed=1))
        restored, meta = load_checkpoint_orbax(
            tmp_path / f"{model.model_type}_scale_e0.orbax", template)
        got = np.asarray(jax.device_get(restored.params["mu2_table"]))
        want = np.asarray(jax.device_get(state.params["mu2_table"]))
        assert got.shape[0] == padded_num_seqs(LARGE_N, 4)
        np.testing.assert_array_equal(got[:LARGE_N], want[:LARGE_N])

        # and the restored state steps on the new mesh
        restored = jax.tree_util.tree_map(
            jax.device_put, restored,
            __import__("pytorch_scalablefhvae_tpu.parallel.mesh",
                       fromlist=["state_shardings"]).state_shardings(
                           mesh2, template),
        )
        step2 = make_sharded_train_step(model2, opt, alpha=10.0, mesh=mesh2,
                                        donate=False)
        rng = np.random.default_rng(7)
        _, m = step2(restored, *shard_batch(mesh2, *make_batch(rng)))
        assert np.isfinite(float(m["loss"]))

    def test_round_table_swap_at_scale(self, trained):
        """Hierarchical rounds swap a freshly MAP-initialized table (same
        padded shape) into the state and zero only its moments
        (train/loop.py:_replace_mu2_table) — rehearsed here at the full
        281k-row size, composed with the mesh sharding."""
        import jax
        from jax.sharding import NamedSharding, PartitionSpec as P

        from pytorch_scalablefhvae_tpu.train.loop import _replace_mu2_table

        mesh, model, opt, state, _ = trained
        rows = state.params["mu2_table"].shape[0]
        fresh = jax.device_put(
            np.random.default_rng(3).standard_normal((rows, Z)).astype(
                np.float32),
            NamedSharding(mesh, P("model", None)),
        )
        state2 = _replace_mu2_table(state, fresh)
        # table moments zeroed (matched by pytree path), MLP moments intact
        table_moments = [
            leaf for path, leaf in jax.tree_util.tree_flatten_with_path(
                state2.opt_state)[0]
            if "mu2_table" in "/".join(str(p) for p in path)
            and np.ndim(leaf) == 2
        ]
        assert table_moments
        for leaf in table_moments:
            assert float(np.abs(np.asarray(jax.device_get(leaf))).max()) == 0.0
        step = make_sharded_train_step(model, opt, alpha=10.0, mesh=mesh,
                                       donate=False)
        rng = np.random.default_rng(11)
        _, m = step(state2, *shard_batch(mesh, *make_batch(rng)))
        assert np.isfinite(float(m["loss"]))
