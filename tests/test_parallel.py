"""Mesh/sharding tests on the 8-device virtual CPU backend.

SURVEY.md §4 distributed tier: single-host vs 8-way-sharded numerical
equivalence for the train step, mesh construction, and the graft dry run.
"""

import dataclasses

import jax
import numpy as np
import pytest

from pytorch_scalablefhvae_tpu.models import SimpleFHVAE
from pytorch_scalablefhvae_tpu.parallel.mesh import (
    make_mesh,
    padded_num_seqs,
    shard_batch,
    shard_state,
    state_shardings,
)
from pytorch_scalablefhvae_tpu.parallel.mesh import shard_stacked_batch
from pytorch_scalablefhvae_tpu.parallel.sharded_step import (
    make_sharded_multi_train_step,
    make_sharded_train_step,
)
from pytorch_scalablefhvae_tpu.train.step import (
    create_train_state,
    make_optimizer,
    make_train_step,
)

pytestmark = pytest.mark.slow  # compile-heavy: mesh-compiled step equivalence runs

B, T, F, NUM_SEQS = 16, 20, 8, 8


def small_model():
    return SimpleFHVAE(input_size=T * F, num_seqs=NUM_SEQS,
                       z1_hus=(32, 32), z2_hus=(32, 32), x_hus=(32, 32),
                       z1_dim=8, z2_dim=8)


def make_batch(rng):
    return (
        rng.standard_normal((B, T, F)).astype(np.float32),
        rng.integers(0, NUM_SEQS, B).astype(np.int32),
        np.full(B, 5.0, np.float32),
        np.ones(B, np.float32),
    )


class TestMesh:
    def test_eight_virtual_devices(self):
        assert jax.device_count() == 8

    def test_make_mesh_shapes(self):
        mesh = make_mesh((4, 2))
        assert dict(mesh.shape) == {"data": 4, "model": 2}
        mesh = make_mesh()  # default: all-data
        assert dict(mesh.shape) == {"data": 8, "model": 1}
        with pytest.raises(ValueError):
            make_mesh((3, 2))

    def test_state_shardings_table_rowsharded(self):
        model = small_model()
        opt = make_optimizer(1e-3, 0.95, 0.999)
        state = create_train_state(model, opt, seed=0)
        mesh = make_mesh((4, 2))
        sh = state_shardings(mesh, state)
        table_spec = sh.params["mu2_table"].spec
        assert tuple(table_spec) == ("model", None)
        dense_spec = sh.params["z2_pre"]["layers"][0]["w"].spec
        assert tuple(dense_spec) == ()


class TestShardedEquivalence:
    @pytest.mark.parametrize("shape", [(8, 1), (4, 2), (2, 4)])
    def test_sharded_step_matches_single_device(self, rng, shape):
        model = small_model()
        opt = make_optimizer(1e-3, 0.95, 0.999)
        batch = make_batch(rng)

        # single-device reference
        s_ref = create_train_state(model, opt, seed=0)
        ref_step = make_train_step(model, opt, alpha=10.0, donate=False)
        s_ref, m_ref = ref_step(s_ref, *batch)

        # sharded
        mesh = make_mesh(shape)
        s_sh = shard_state(mesh, create_train_state(model, opt, seed=0))
        sh_step = make_sharded_train_step(model, opt, alpha=10.0, mesh=mesh, donate=False)
        s_sh, m_sh = sh_step(s_sh, *shard_batch(mesh, *batch))

        np.testing.assert_allclose(
            float(m_ref["loss"]), float(m_sh["loss"]), rtol=2e-5
        )
        np.testing.assert_allclose(
            np.asarray(s_ref.params["mu2_table"]),
            np.asarray(jax.device_get(s_sh.params["mu2_table"])),
            rtol=2e-4, atol=2e-5,
        )

    @pytest.mark.parametrize("shape", [(2, 4), (1, 8)])
    @pytest.mark.parametrize("use_pallas", ["never", "always"])
    def test_uneven_corpus_padded_step_matches(self, rng, shape, use_pallas):
        """A corpus size NOT divisible by the model axis (the common case —
        TIMIT has 4620 train sequences) trains identically to the unpadded
        single-device step: padded rows are masked and get zero gradient.
        With use_pallas="always" the discriminative op runs the streaming
        kernel per shard under shard_map (interpret mode on CPU)."""
        from pytorch_scalablefhvae_tpu.train.loop import _replace_mu2_table

        num_seqs = 13  # prime: uneven on every axis
        model = SimpleFHVAE(input_size=T * F, num_seqs=num_seqs,
                            z1_hus=(32, 32), z2_hus=(32, 32), x_hus=(32, 32),
                            z1_dim=8, z2_dim=8)
        opt = make_optimizer(1e-3, 0.95, 0.999)
        batch = (
            rng.standard_normal((B, T, F)).astype(np.float32),
            rng.integers(0, num_seqs, B).astype(np.int32),
            np.full(B, 5.0, np.float32),
            np.ones(B, np.float32),
        )

        # single-device reference (unpadded, jnp path)
        s_ref = create_train_state(model, opt, seed=0)
        ref_step = make_train_step(model, opt, alpha=10.0, donate=False)
        s_ref_out, m_ref = ref_step(s_ref, *batch)

        # padded + sharded
        mesh = make_mesh(shape)
        n_pad = padded_num_seqs(num_seqs, shape[1])
        model_pad = dataclasses.replace(
            model, num_seqs_padded=n_pad, shard_mesh=mesh, use_pallas=use_pallas
        )
        s_pad = create_train_state(model_pad, opt, seed=0)
        # align the table init with the reference (different shape -> the
        # PRNG draws differ); padded rows start at zero
        table = np.pad(np.asarray(s_ref.params["mu2_table"]),
                       ((0, n_pad - num_seqs), (0, 0)))
        s_pad = _replace_mu2_table(s_pad, table)
        s_pad = shard_state(mesh, s_pad)
        sh_step = make_sharded_train_step(model_pad, opt, alpha=10.0, mesh=mesh,
                                          donate=False)
        s_pad_out, m_sh = sh_step(s_pad, *shard_batch(mesh, *batch))

        np.testing.assert_allclose(float(m_ref["loss"]), float(m_sh["loss"]), rtol=2e-5)
        got = np.asarray(jax.device_get(s_pad_out.params["mu2_table"]))
        np.testing.assert_allclose(
            got[:num_seqs], np.asarray(s_ref_out.params["mu2_table"]),
            rtol=2e-4, atol=2e-5,
        )
        # padded rows: zero grad, zero Adam update, still exactly zero
        assert (got[num_seqs:] == 0.0).all()

    def test_multi_step_stays_in_sync(self, rng):
        model = small_model()
        opt = make_optimizer(1e-3, 0.95, 0.999)
        mesh = make_mesh((4, 2))
        s_ref = create_train_state(model, opt, seed=0)
        s_sh = shard_state(mesh, create_train_state(model, opt, seed=0))
        ref_step = make_train_step(model, opt, alpha=10.0, donate=False)
        sh_step = make_sharded_train_step(model, opt, alpha=10.0, mesh=mesh, donate=False)
        for i in range(3):
            batch = make_batch(np.random.default_rng(i))
            s_ref, m_ref = ref_step(s_ref, *batch)
            s_sh, m_sh = sh_step(s_sh, *shard_batch(mesh, *batch))
        np.testing.assert_allclose(float(m_ref["loss"]), float(m_sh["loss"]), rtol=1e-4)


class TestShardedMultiStep:
    def test_bundled_dispatch_matches_per_step(self, rng):
        """K lax.scan-bundled optimizer steps under the mesh == K separate
        sharded dispatches (VERDICT r1 item 6: multi-step bundling no longer
        excluded under mesh training)."""
        K = 3
        model = small_model()
        opt = make_optimizer(1e-3, 0.95, 0.999)
        mesh = make_mesh((4, 2))
        batches = [make_batch(np.random.default_rng(i)) for i in range(K)]

        s_per = shard_state(mesh, create_train_state(model, opt, seed=0))
        per_step = make_sharded_train_step(model, opt, alpha=10.0, mesh=mesh,
                                           donate=False)
        for b in batches:
            s_per, m_per = per_step(s_per, *shard_batch(mesh, *b))

        s_multi = shard_state(mesh, create_train_state(model, opt, seed=0))
        multi = make_sharded_multi_train_step(model, opt, alpha=10.0, mesh=mesh,
                                              donate=False)
        stacked = tuple(np.stack([b[j] for b in batches]) for j in range(4))
        s_multi, m_multi = multi(s_multi, *shard_stacked_batch(mesh, *stacked))

        np.testing.assert_allclose(
            float(np.asarray(m_multi["loss"])[-1]), float(m_per["loss"]), rtol=2e-5
        )
        np.testing.assert_allclose(
            np.asarray(jax.device_get(s_multi.params["mu2_table"])),
            np.asarray(jax.device_get(s_per.params["mu2_table"])),
            rtol=2e-4, atol=2e-5,
        )
        assert int(s_multi.step) == K


class TestGraftEntry:
    def test_entry_compiles(self):
        import __graft_entry__ as ge

        fn, args = ge.entry()
        out = jax.jit(fn)(*args)
        assert np.isfinite(np.asarray(out[0])).all()

    def test_dryrun_multichip(self):
        import __graft_entry__ as ge

        ge.dryrun_multichip(8)


class TestShardedEval:
    @pytest.mark.parametrize("shape", [(4, 2), (8, 1)])
    def test_sharded_eval_matches_unsharded(self, rng, shape):
        """Mesh-compiled eval/encode steps == single-device ones (the dev
        split scores against a replicated MAP table either way)."""
        from pytorch_scalablefhvae_tpu.parallel.sharded_step import (
            make_sharded_encode_step,
            make_sharded_eval_step,
        )
        from pytorch_scalablefhvae_tpu.train.step import (
            make_encode_step,
            make_eval_step,
        )

        model = small_model()
        opt = make_optimizer(1e-3, 0.95, 0.999)
        state = create_train_state(model, opt, seed=0)
        feats, seq_idx, nsegs, weight = make_batch(rng)
        weight[-3:] = 0.0  # padded rows
        table = rng.standard_normal((NUM_SEQS, 8)).astype(np.float32)
        key = jax.random.PRNGKey(3)

        ref_eval = make_eval_step(model, 10.0, with_table_override=True)
        ref = {k: float(v) for k, v in ref_eval(
            state.params, feats, seq_idx, nsegs, weight, key, table).items()}
        ref_z2 = np.asarray(make_encode_step(model)(state.params, feats))

        mesh = make_mesh(shape)
        s_sh = shard_state(mesh, create_train_state(model, opt, seed=0))
        sh_eval = make_sharded_eval_step(model, 10.0, mesh)
        got = {k: float(v) for k, v in sh_eval(
            s_sh.params, feats, seq_idx, nsegs, weight, key, table).items()}
        got_z2 = np.asarray(
            make_sharded_encode_step(model, mesh)(s_sh.params, feats))

        for k in ref:
            np.testing.assert_allclose(got[k], ref[k], rtol=2e-5, atol=1e-6,
                                       err_msg=k)
        np.testing.assert_allclose(got_z2, ref_z2, rtol=2e-5, atol=1e-6)
