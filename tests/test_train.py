"""Training-step / loop / checkpoint tests.

Integration tier of SURVEY.md §4: synthetic corpus -> preprocess -> train N
steps -> loss decreases; checkpoint -> resume bit-identical state.
"""

import json

import jax
import numpy as np
import pytest

from pytorch_scalablefhvae_tpu.config import (
    DataConfig,
    ExperimentConfig,
    ModelConfig,
    TrainConfig,
)
from pytorch_scalablefhvae_tpu.models import SimpleFHVAE
from pytorch_scalablefhvae_tpu.train import checkpoint as ckpt
from pytorch_scalablefhvae_tpu.train.loop import check_best, check_terminate
from pytorch_scalablefhvae_tpu.train.step import (
    create_train_state,
    make_eval_step,
    make_optimizer,
    make_train_step,
)

B, T, F, NUM_SEQS = 16, 20, 8, 6


@pytest.fixture(scope="module")
def setup():
    model = SimpleFHVAE(input_size=T * F, num_seqs=NUM_SEQS,
                        z1_hus=(32, 32), z2_hus=(32, 32), x_hus=(32, 32),
                        z1_dim=8, z2_dim=8)
    optimizer = make_optimizer(1e-3, 0.95, 0.999)
    state = create_train_state(model, optimizer, seed=0)
    return model, optimizer, state


def make_batch(rng, structured=True):
    seq_idx = rng.integers(0, NUM_SEQS, B).astype(np.int32)
    if structured:
        # speaker-dependent offsets + low-rank structure => learnable signal
        base = rng.standard_normal((NUM_SEQS, 1, F)) * 2.0
        x = base[seq_idx] + 0.3 * rng.standard_normal((B, T, F))
    else:
        x = rng.standard_normal((B, T, F))
    return (
        x.astype(np.float32),
        seq_idx,
        np.full(B, 10.0, np.float32),
        np.ones(B, np.float32),
    )


class TestTrainStep:
    def test_loss_decreases(self, setup, rng):
        model, optimizer, state = setup
        step = make_train_step(model, optimizer, alpha=10.0, donate=False)
        losses = []
        for i in range(30):
            feats, seq_idx, nsegs, w = make_batch(rng)
            state, metrics = step(state, feats, seq_idx, nsegs, w)
            losses.append(float(metrics["loss"]))
        assert np.isfinite(losses).all()
        assert np.mean(losses[-5:]) < np.mean(losses[:5])

    def test_step_counter_and_determinism(self, setup, rng):
        model, optimizer, _ = setup
        step = make_train_step(model, optimizer, alpha=10.0, donate=False)
        feats, seq_idx, nsegs, w = make_batch(rng)
        s1 = create_train_state(model, optimizer, seed=0)
        s2 = create_train_state(model, optimizer, seed=0)
        s1, m1 = step(s1, feats, seq_idx, nsegs, w)
        s2, m2 = step(s2, feats, seq_idx, nsegs, w)
        assert int(s1.step) == 1
        assert float(m1["loss"]) == float(m2["loss"])
        for a, b in zip(jax.tree_util.tree_leaves(s1.params), jax.tree_util.tree_leaves(s2.params)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_eval_step_sums(self, setup, rng):
        model, optimizer, state = setup
        estep = make_eval_step(model, alpha=10.0)
        feats, seq_idx, nsegs, w = make_batch(rng)
        w[-4:] = 0.0
        sums = estep(state.params, feats, seq_idx, nsegs, w, jax.random.PRNGKey(0))
        assert float(sums["count"]) == B - 4
        # mean = sum / count must be finite
        assert np.isfinite(float(sums["lower_bound"]) / float(sums["count"]))


class TestCheckpoint:
    def test_roundtrip_bit_identical(self, setup, tmp_path, rng):
        model, optimizer, state = setup
        step = make_train_step(model, optimizer, alpha=10.0, donate=False)
        for _ in range(3):
            feats, seq_idx, nsegs, w = make_batch(rng)
            state, _ = step(state, feats, seq_idx, nsegs, w)

        ckpt.save_checkpoint(
            tmp_path, state,
            model_type=model.model_type, model_params=model.model_params(),
            run_info="test_np_fbank", epoch=2, best_epoch=2, best_val_lb=-12.5,
            values={"train_loss_results": {"2": 1.0}},
            extra_meta={"num_seqs": NUM_SEQS},
        )
        # best copy exists since best_epoch == epoch
        assert list(tmp_path.glob("best_model_*.npz"))

        template = create_train_state(model, optimizer, seed=99)
        restored, meta = ckpt.load_checkpoint(
            tmp_path / f"{model.model_type}_test_np_fbank_e2.npz", template
        )
        assert meta["start_epoch"] == 3  # exactly epoch + 1 (B18)
        assert meta["best_val_lb"] == -12.5
        for a, b in zip(jax.tree_util.tree_leaves(state), jax.tree_util.tree_leaves(restored)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_resume_continues_identically(self, setup, tmp_path, rng):
        """Train 2+2 steps with a save/load in between == 4 straight steps."""
        model, optimizer, _ = setup
        step = make_train_step(model, optimizer, alpha=10.0, donate=False)
        batches = [make_batch(np.random.default_rng(100 + i)) for i in range(4)]

        s = create_train_state(model, optimizer, seed=1)
        for b in batches:
            s, m_straight = step(s, *b)

        s2 = create_train_state(model, optimizer, seed=1)
        for b in batches[:2]:
            s2, _ = step(s2, *b)
        ckpt.save_checkpoint(
            tmp_path, s2, model_type=model.model_type,
            model_params=model.model_params(), run_info="r", epoch=0,
            best_epoch=0, best_val_lb=0.0, values={},
        )
        template = create_train_state(model, optimizer, seed=55)
        s3, _ = ckpt.load_checkpoint(tmp_path / f"{model.model_type}_r_e0.npz", template)
        for b in batches[2:]:
            s3, m_resumed = step(s3, *b)
        np.testing.assert_allclose(
            float(m_straight["loss"]), float(m_resumed["loss"]), rtol=1e-6
        )

    def test_finetune_resets_optimizer(self, setup, tmp_path, rng):
        model, optimizer, state = setup
        step = make_train_step(model, optimizer, alpha=10.0, donate=False)
        feats, seq_idx, nsegs, w = make_batch(rng)
        state, _ = step(state, feats, seq_idx, nsegs, w)
        ckpt.save_checkpoint(
            tmp_path, state, model_type=model.model_type,
            model_params=model.model_params(), run_info="f", epoch=5,
            best_epoch=5, best_val_lb=1.0, values={"x": {}},
        )
        template = create_train_state(model, optimizer, seed=7)
        ft, meta = ckpt.load_checkpoint(
            tmp_path / f"{model.model_type}_f_e5.npz", template, finetune=True
        )
        assert meta["start_epoch"] == 0
        assert int(ft.step) == 0
        # params carried over
        np.testing.assert_array_equal(
            np.asarray(ft.params["mu2_table"]), np.asarray(state.params["mu2_table"])
        )

    def test_mu2_row_padding_adapts_across_mesh_shapes(self, setup, tmp_path):
        """A checkpoint from a mesh-padded run loads into an unpadded model
        (padding sliced off) and vice versa (zero rows padded on) — mu2 row
        count is layout, not architecture."""
        import dataclasses

        model, optimizer, state = setup
        path = ckpt.save_checkpoint(
            tmp_path, state, model_type="simple_fhvae",
            model_params=model.model_params(), run_info="pad", epoch=0,
            best_epoch=0, best_val_lb=-1.0, values={},
        )
        # load into a padded template (e.g. resuming onto a model=4 mesh)
        model_pad = dataclasses.replace(model, num_seqs_padded=8)
        tmpl_pad = create_train_state(model_pad, optimizer, seed=1)
        loaded, _ = ckpt.load_checkpoint(path, tmpl_pad)
        assert loaded.params["mu2_table"].shape == (8, model.z2_dim)
        np.testing.assert_array_equal(
            np.asarray(loaded.params["mu2_table"])[:NUM_SEQS],
            np.asarray(state.params["mu2_table"]),
        )
        assert (np.asarray(loaded.params["mu2_table"])[NUM_SEQS:] == 0).all()

        # save the padded state, load back into the unpadded template
        path2 = ckpt.save_checkpoint(
            tmp_path, loaded, model_type="simple_fhvae",
            model_params=model.model_params(), run_info="pad2", epoch=0,
            best_epoch=0, best_val_lb=-1.0, values={},
        )
        back, _ = ckpt.load_checkpoint(path2, state)
        assert back.params["mu2_table"].shape == (NUM_SEQS, model.z2_dim)
        np.testing.assert_array_equal(
            np.asarray(back.params["mu2_table"]),
            np.asarray(state.params["mu2_table"]),
        )

    def test_architecture_mismatch_rejected(self, setup, tmp_path):
        model, optimizer, state = setup
        ckpt.save_checkpoint(
            tmp_path, state, model_type=model.model_type,
            model_params=model.model_params(), run_info="m", epoch=0,
            best_epoch=0, best_val_lb=0.0, values={},
        )
        other = SimpleFHVAE(input_size=T * F, num_seqs=NUM_SEQS,
                            z1_hus=(16, 16), z2_hus=(16, 16), x_hus=(16, 16),
                            z1_dim=8, z2_dim=8)
        template = create_train_state(other, optimizer, seed=0)
        with pytest.raises(ValueError):
            ckpt.load_checkpoint(tmp_path / f"{model.model_type}_m_e0.npz", template)


class TestLoopHelpers:
    def test_check_best(self):
        assert check_best(-5.0, -np.inf)
        assert check_best(-4.0, -5.0)
        assert not check_best(-6.0, -5.0)

    def test_check_terminate_patience(self):
        # stops after `patience` consecutive non-improving epochs
        assert not check_terminate(epoch=5, best_epoch=0, patience=10, epochs=100)
        assert check_terminate(epoch=10, best_epoch=0, patience=10, epochs=100)
        assert check_terminate(epoch=99, best_epoch=95, patience=10, epochs=100)


class TestCrossCorpusGuard:
    def test_plain_resume_onto_different_corpus_raises(self, setup, tmp_path):
        """The mu2 table is per-sequence state: a non-finetune load whose
        sidecar records a different num_seqs must raise instead of silently
        adapting corpus A's rows onto corpus B's sequences. --finetune is
        the supported cross-corpus path (fresh table, kept weights)."""
        import dataclasses

        model, optimizer, state = setup
        path = ckpt.save_checkpoint(
            tmp_path, state, model_type=model.model_type,
            model_params=model.model_params(), run_info="corp", epoch=0,
            best_epoch=0, best_val_lb=-1.0, values={},
            extra_meta={"num_seqs": NUM_SEQS},
        )
        other = dataclasses.replace(model, num_seqs=NUM_SEQS + 3)
        tmpl = create_train_state(other, optimizer, seed=1)
        with pytest.raises(ValueError, match="per-sequence"):
            ckpt.load_checkpoint(path, tmpl,
                                 expected_num_seqs=other.num_seqs)
        # finetune is allowed (table re-estimated by the new run)
        loaded, meta = ckpt.load_checkpoint(
            path, tmpl, finetune=True, expected_num_seqs=other.num_seqs)
        assert meta["start_epoch"] == 0
        # sidecars without num_seqs skip the check (old checkpoints)
        path2 = ckpt.save_checkpoint(
            tmp_path, state, model_type=model.model_type,
            model_params=model.model_params(), run_info="old", epoch=0,
            best_epoch=0, best_val_lb=-1.0, values={},
        )
        ckpt.load_checkpoint(path2, tmpl, expected_num_seqs=other.num_seqs)

    def test_best_checkpoint_ambiguous_across_runs_raises(self, setup, tmp_path):
        model, optimizer, state = setup
        for run in ("runA", "runB"):
            ckpt.save_checkpoint(
                tmp_path, state, model_type=model.model_type,
                model_params=model.model_params(), run_info=run, epoch=1,
                best_epoch=1, best_val_lb=-1.0, values={},
            )
        with pytest.raises(ValueError, match="different runs"):
            ckpt.find_best_checkpoint(tmp_path)
