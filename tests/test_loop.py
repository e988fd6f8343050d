"""Training-loop integration tests on a synthetic corpus (CPU, small).

SURVEY.md §4 integration tier: preprocess -> train -> loss decreases;
hierarchical sampling; MAP dev evaluation; divergence abort.
"""

import dataclasses

import numpy as np
import pytest

from pytorch_scalablefhvae_tpu.config import (
    DataConfig,
    ExperimentConfig,
    FeatureConfig,
    ModelConfig,
    OptimConfig,
    TrainConfig,
)
from pytorch_scalablefhvae_tpu.features.pipeline import preprocess_data
from pytorch_scalablefhvae_tpu.train.driver import build_loaders, train_from_config
from pytorch_scalablefhvae_tpu.train.loop import estimate_split_mu2


def small_config(tmp_path, **train_kw):
    return ExperimentConfig(
        features=FeatureConfig(),
        data=DataConfig(
            dataset="synthetic",
            mvn_path=str(tmp_path / "mvn.json"),
            training_batch_size=32,
            dev_batch_size=64,
        ),
        model=ModelConfig(
            model_type="simple_fhvae",
            z1_hus=(32, 32), z2_hus=(32, 32), x_hus=(32, 32),
            z1_dim=8, z2_dim=8,
        ),
        optim=OptimConfig(),
        train=TrainConfig(epochs=2, patience=10, seed=0, **train_kw),
    )


@pytest.fixture(scope="module")
def corpus(tmp_path_factory):
    root = tmp_path_factory.mktemp("corpus")
    cfg = ExperimentConfig(data=DataConfig(dataset="synthetic"))
    preprocess_data(cfg, root=root)
    return root


class TestEndToEnd:
    def test_train_improves_and_checkpoints(self, corpus, tmp_path):
        cfg = small_config(tmp_path)
        res = train_from_config(
            cfg, data_root=corpus, exp_root=tmp_path / "exp",
            is_preprocessed=True, verbose=False,
        )
        assert not res.diverged
        assert res.last_epoch == 1
        h = res.history.values
        assert h["val_loss_results"][1] < h["val_loss_results"][0]
        exp_dir = cfg.exp_dir(tmp_path / "exp")
        assert (exp_dir / "config.json").exists()
        assert list(exp_dir.glob("best_model_*.npz"))
        assert (exp_dir / "metrics.jsonl").exists()

    def test_plot_curves_written(self, corpus, tmp_path):
        """--visdom counterpart: curves.svg lands in the experiment dir and
        carries the reference logger's four series (train/plots.py)."""
        cfg = small_config(tmp_path, plot_curves=True)
        train_from_config(cfg, data_root=corpus, exp_root=tmp_path / "exp",
                          is_preprocessed=True, verbose=False)
        svg = cfg.exp_dir(tmp_path / "exp") / "curves.svg"
        assert svg.exists()
        body = svg.read_text()
        for label in ("Training Loss", "Validation Loss", "Lower Bound",
                      "Discriminative Loss"):
            assert label in body

    def test_hierarchical_sampling_runs(self, corpus, tmp_path):
        cfg = small_config(tmp_path, sample_hierarchical=True,
                           num_hierarchical_sequences=3)
        res = train_from_config(
            cfg, data_root=corpus, exp_root=tmp_path / "exp",
            is_preprocessed=True, verbose=False,
        )
        assert not res.diverged
        # table is sized by the sampled subset
        assert res.state.params["mu2_table"].shape[0] == 3

    def test_hierarchical_round_epochs_reuses_subset(self, corpus, tmp_path,
                                                     monkeypatch):
        """--hierarchical-round-epochs N: the subset is sampled (and MAP
        re-initialized) once per N epochs, not every epoch."""
        import pytorch_scalablefhvae_tpu.data.feature_store as FS

        calls = []
        orig = FS.FeatureStore.subset

        def counting(self, keys):
            calls.append(tuple(keys))
            return orig(self, keys)

        monkeypatch.setattr(FS.FeatureStore, "subset", counting)
        cfg = small_config(tmp_path, sample_hierarchical=True,
                           num_hierarchical_sequences=3,
                           hierarchical_round_epochs=2)
        cfg = dataclasses.replace(
            cfg, train=dataclasses.replace(cfg.train, epochs=4))
        res = train_from_config(
            cfg, data_root=corpus, exp_root=tmp_path / "exp_rre",
            is_preprocessed=True, verbose=False,
        )
        assert not res.diverged
        # 4 epochs at cadence 2 -> exactly 2 rounds sampled
        assert len(calls) == 2

    def test_resume_uses_saved_config(self, corpus, tmp_path):
        cfg = small_config(tmp_path)
        res = train_from_config(cfg, data_root=corpus, exp_root=tmp_path / "exp",
                                is_preprocessed=True, verbose=False)
        exp_dir = cfg.exp_dir(tmp_path / "exp")
        ckpts = sorted(p for p in exp_dir.glob("simple_fhvae_*_e1.npz"))
        # resume with a *different* epochs setting: saved config must win
        cfg2 = dataclasses.replace(cfg, train=dataclasses.replace(cfg.train, epochs=50))
        res2 = train_from_config(
            cfg2, data_root=corpus, exp_root=tmp_path / "exp",
            is_preprocessed=True, continue_from=ckpts[0], verbose=False,
        )
        assert res2.last_epoch <= 1  # saved epochs=2 already exhausted


class TestMapEval:
    def test_estimate_split_mu2_shapes(self, corpus, tmp_path):
        cfg = small_config(tmp_path)
        train_loader, dev_loader = build_loaders(cfg, corpus, is_preprocessed=True)
        from pytorch_scalablefhvae_tpu.models.base import build_model
        from pytorch_scalablefhvae_tpu.train.step import (
            create_train_state,
            make_encode_step,
            make_optimizer,
        )

        ds = train_loader.dataset
        model = build_model("simple_fhvae", ds.seg_len * ds.store.dim, cfg.model,
                            ds.num_seqs)
        state = create_train_state(model, make_optimizer(1e-3, 0.95, 0.999), seed=0)
        enc = make_encode_step(model)
        table = estimate_split_mu2(enc, state.params, dev_loader,
                                   dev_loader.dataset.num_seqs, 0.25)
        assert table.shape == (dev_loader.dataset.num_seqs, 8)
        assert np.isfinite(table).all()
        # MAP shrinks toward 0 (prior mean): norms bounded by raw means
        assert np.abs(table).max() < 100


class TestSubset:
    def test_subset_view_consistency(self, corpus, tmp_path):
        cfg = small_config(tmp_path)
        train_loader, _ = build_loaders(cfg, corpus, is_preprocessed=True)
        store = train_loader.dataset.store
        keys = store.seq_keys[::-1][:2]
        sub = store.subset(keys)
        assert sub.seq_keys == keys
        for i, k in enumerate(keys):
            np.testing.assert_array_equal(sub.sequence(i), store.sequence(store.seq2idx[k]))
        seg = sub.gather_segments(np.array([1]), np.array([0]), 5)
        np.testing.assert_array_equal(seg[0], sub.sequence(1)[:5])


class TestHierarchicalMesh:
    def test_hierarchical_on_mesh_with_uneven_subset(self, corpus, tmp_path):
        """Hierarchical rounds under a (2,4) mesh with a subset size that
        does NOT divide the model axis: the per-round MAP table is padded to
        the model's row count before the sharded device_put, and training
        proceeds (the composition VERDICT r1 item 2 requires)."""
        cfg = small_config(tmp_path, sample_hierarchical=True,
                           num_hierarchical_sequences=3,  # 3 % 4 != 0
                           mesh_shape=(2, 4))
        res = train_from_config(
            cfg, data_root=corpus, exp_root=tmp_path / "exp",
            is_preprocessed=True, verbose=False,
        )
        assert not res.diverged
        # table padded to the model axis; padded row stayed zero
        table = np.asarray(res.state.params["mu2_table"])
        assert table.shape[0] == 4
        assert (table[3] == 0.0).all()
        h = res.history.values
        assert np.isfinite(list(h["val_loss_results"].values())).all()

    def test_hierarchical_on_mesh_with_pallas(self, corpus, tmp_path):
        """Same composition with the shard_map'd Pallas discriminative path
        (interpret mode on CPU)."""
        cfg = small_config(tmp_path, sample_hierarchical=True,
                           num_hierarchical_sequences=3,
                           mesh_shape=(2, 4))
        cfg = dataclasses.replace(
            cfg, model=dataclasses.replace(cfg.model, use_pallas="always"))
        res = train_from_config(
            cfg, data_root=corpus, exp_root=tmp_path / "exp2",
            is_preprocessed=True, verbose=False,
        )
        assert not res.diverged
        assert np.isfinite(
            list(res.history.values["val_loss_results"].values())).all()


class TestFinetuneDirectory:
    def test_finetune_gets_its_own_directory(self, corpus, tmp_path):
        """Finetuning from a checkpoint must not clobber the source run:
        since the saved config re-derives the same directory name, the
        finetune run gets a '_finetune' suffix."""
        cfg = small_config(tmp_path)
        train_from_config(cfg, data_root=corpus, exp_root=tmp_path / "exp",
                          is_preprocessed=True, verbose=False)
        exp_dir = cfg.exp_dir(tmp_path / "exp")
        src_ckpts = sorted(exp_dir.glob("simple_fhvae_*_e0.npz"))
        src_bytes = src_ckpts[0].read_bytes()

        res = train_from_config(
            cfg, data_root=corpus, exp_root=tmp_path / "exp",
            is_preprocessed=True, continue_from=src_ckpts[0], finetune=True,
            verbose=False,
        )
        assert not res.diverged
        ft_dir = exp_dir.with_name(exp_dir.name + "_finetune")
        assert ft_dir.exists() and list(ft_dir.glob("*_e0.npz"))
        # source checkpoint untouched
        assert src_ckpts[0].read_bytes() == src_bytes


class TestDivergenceAbort:
    def test_dispatch_check_covers_first_and_last_subloss(self):
        """VERDICT r03 item 7: a NaN injected at sub-step 0 of a K-step
        dispatch is caught by the next dispatch's check even if later
        sub-losses look finite — bounding the donated-state overrun at one
        dispatch (~K steps)."""
        from pytorch_scalablefhvae_tpu.train.loop import dispatch_losses_diverged

        assert not dispatch_losses_diverged(np.array([1.0, 2.0, 3.0]))
        assert dispatch_losses_diverged(np.array([np.nan, 1.0, 2.0]))
        assert dispatch_losses_diverged(np.array([1.0, 2.0, np.inf]))
        assert dispatch_losses_diverged(np.array(np.nan))  # K=1 scalar
        assert not dispatch_losses_diverged(np.array(0.5))

    def test_k_dispatch_nan_aborts_with_exit_2(self, corpus, tmp_path):
        """Divergence in the K-step bundled path aborts with exit code 2
        (train_model.py:464-466 parity)."""
        cfg = small_config(tmp_path, steps_per_dispatch=4)
        cfg = dataclasses.replace(
            cfg, optim=OptimConfig(learning_rate=1e18),
            train=dataclasses.replace(cfg.train, epochs=3))
        with pytest.raises(SystemExit) as e:
            train_from_config(
                cfg, data_root=corpus, exp_root=tmp_path / "exp",
                is_preprocessed=True, verbose=False,
            )
        assert e.value.code == 2


class TestGradHistograms:
    def test_writer_emits_grad_histograms(self, tmp_path):
        """--log-params logs value AND gradient histograms
        (reference logger.py:80-86 parity, VERDICT r03 item 6)."""
        from pytorch_scalablefhvae_tpu.train.metrics import MetricWriter

        class FakeTB:
            def __init__(self):
                self.hist, self.scalars = [], []

            def add_scalar(self, tag, v, step):
                self.scalars.append(tag)

            def add_histogram(self, tag, vals, step):
                self.hist.append(tag)

            def flush(self):
                pass

        w = MetricWriter(tmp_path, "run", tensorboard=False, log_params=True)
        w._tb = FakeTB()
        params = {"enc": {"w": np.ones((3, 3))}}
        grads = {"enc": {"w": np.full((3, 3), 0.1)}}
        w.write_epoch(0, {"train_loss": 1.0}, params=params, grads=grads)
        assert any(t.startswith("grads/") for t in w._tb.hist)
        assert any(not t.startswith("grads/") for t in w._tb.hist)

    def test_end_to_end_with_log_params(self, corpus, tmp_path):
        cfg = small_config(tmp_path, tensorboard=True, log_params=True,
                           tb_log_dir=str(tmp_path / "tb"))
        res = train_from_config(
            cfg, data_root=corpus, exp_root=tmp_path / "exp",
            is_preprocessed=True, verbose=False,
        )
        assert not res.diverged
        assert list((tmp_path / "tb").glob("events.out.tfevents.*"))
