"""Mode-coverage tests: bf16 compute, legacy step-epochs, spec features,
kaldi-format end-to-end, mesh CLI path."""

import dataclasses

import jax
import numpy as np
import pytest

from pytorch_scalablefhvae_tpu.config import (
    DataConfig,
    ExperimentConfig,
    FeatureConfig,
    ModelConfig,
    TrainConfig,
)
from pytorch_scalablefhvae_tpu.features.pipeline import preprocess_data
from pytorch_scalablefhvae_tpu.models import SimpleFHVAE
from pytorch_scalablefhvae_tpu.train.driver import train_from_config
from pytorch_scalablefhvae_tpu.train.step import (
    create_train_state,
    make_optimizer,
    make_train_step,
)

pytestmark = pytest.mark.slow  # compile-heavy: end-to-end runs per mode


def cfg_for(tmp_path, *, features=None, data_extra=None, model_extra=None, train_extra=None):
    return ExperimentConfig(
        features=features or FeatureConfig(),
        data=DataConfig(
            dataset="synthetic",
            mvn_path=str(tmp_path / "mvn.json"),
            training_batch_size=32,
            dev_batch_size=64,
            **(data_extra or {}),
        ),
        model=ModelConfig(
            model_type="simple_fhvae",
            z1_hus=(32, 32), z2_hus=(32, 32), x_hus=(32, 32),
            z1_dim=8, z2_dim=8,
            **(model_extra or {}),
        ),
        train=TrainConfig(**{"epochs": 1, "seed": 0, **(train_extra or {})}),
    )


class TestBf16:
    def test_bf16_step_trains_finite(self, rng):
        model = SimpleFHVAE(input_size=20 * 8, num_seqs=4,
                            z1_hus=(32, 32), z2_hus=(32, 32), x_hus=(32, 32),
                            z1_dim=8, z2_dim=8, compute_dtype="bfloat16")
        opt = make_optimizer(1e-3, 0.95, 0.999)
        state = create_train_state(model, opt, seed=0)
        step = make_train_step(model, opt, 10.0, donate=False)
        losses = []
        for i in range(10):
            r = np.random.default_rng(i)
            feats = r.standard_normal((16, 20, 8)).astype(np.float32)
            seq = r.integers(0, 4, 16).astype(np.int32)
            state, m = step(state, feats, seq, np.full(16, 5.0, np.float32),
                            np.ones(16, np.float32))
            losses.append(float(m["loss"]))
        assert np.isfinite(losses).all()
        assert losses[-1] < losses[0]
        # params stay fp32
        assert state.params["z2_pre"]["layers"][0]["w"].dtype == np.float32


class TestLegacyMode:
    def test_steps_per_epoch_truncates(self, tmp_path):
        corpus = tmp_path / "corpus"
        preprocess_data(ExperimentConfig(data=DataConfig(dataset="synthetic")), root=corpus)
        cfg = cfg_for(tmp_path, train_extra=dict(legacy=True, steps_per_epoch=1,
                                                 log_interval=1, epochs=1))
        res = train_from_config(cfg, data_root=corpus, exp_root=tmp_path / "exp",
                                is_preprocessed=True, verbose=False)
        # exactly one optimizer step despite more batches being available
        assert int(res.state.step) == 1

    def test_legacy_forces_batch_size_one_loaders(self, tmp_path):
        """--legacy emulates the reference's batch-size-1 train/dev loaders
        (train_model.py:379-385) alongside step-based epochs."""
        from pytorch_scalablefhvae_tpu.train.driver import build_loaders

        corpus = tmp_path / "corpus"
        preprocess_data(ExperimentConfig(data=DataConfig(dataset="synthetic")), root=corpus)
        cfg = cfg_for(tmp_path, train_extra=dict(legacy=True))
        tl, dl = build_loaders(cfg, data_root=corpus, is_preprocessed=True)
        assert tl.batch_size == 1 and dl.batch_size == 1
        cfg2 = cfg_for(tmp_path)
        tl2, dl2 = build_loaders(cfg2, data_root=corpus, is_preprocessed=True)
        assert tl2.batch_size == 32 and dl2.batch_size == 64

    def test_legacy_exp_string(self, tmp_path):
        cfg = cfg_for(tmp_path, train_extra=dict(legacy=True, steps_per_epoch=5000))
        assert "_s5000_" in cfg.exp_string()
        assert cfg.exp_string().endswith("_legacy")


class TestSpecFeatures:
    def test_spec_pipeline_trains(self, tmp_path):
        corpus = tmp_path / "corpus"
        cfg = cfg_for(tmp_path, features=FeatureConfig(feat_type="spec"))
        preprocess_data(cfg, root=corpus)
        # spec features are 201-dim; the whole pipeline must follow
        res = train_from_config(cfg, data_root=corpus, exp_root=tmp_path / "exp",
                                is_preprocessed=True, verbose=False)
        assert not res.diverged
        dec_w = res.state.params["dec_gauss"]["mu"]["w"]
        assert dec_w.shape[1] == 20 * 201


class TestKaldiFormatEndToEnd:
    def test_kaldi_format_trains(self, tmp_path):
        corpus = tmp_path / "corpus"
        cfg = cfg_for(tmp_path, features=FeatureConfig(data_format="kaldi"))
        preprocess_data(cfg, root=corpus, fbank_conf="misc/fbank.conf")
        res = train_from_config(cfg, data_root=corpus, exp_root=tmp_path / "exp",
                                is_preprocessed=True, verbose=False)
        assert not res.diverged

    def test_custom_conf_persists_to_encode(self, tmp_path):
        """A custom --fbank-conf's parsed kwargs ride the run's saved
        config, and encode's featurizer uses THEM — not FeatureConfig
        defaults, which would silently drift serving features from
        training features (same shapes, different window)."""
        import json

        corpus = tmp_path / "corpus"
        conf = tmp_path / "fbank.conf"
        conf.write_text("--window-type=povey\n--num-mel-bins=80\n"
                        "--dither=0\n--sample-frequency=16000\n")
        cfg = cfg_for(tmp_path, features=FeatureConfig(data_format="kaldi"))
        preprocess_data(cfg, root=corpus, fbank_conf=str(conf))
        res = train_from_config(cfg, data_root=corpus,
                                exp_root=tmp_path / "exp",
                                is_preprocessed=True, verbose=False,
                                fbank_conf=str(conf))
        assert not res.diverged
        saved = json.loads(
            next((tmp_path / "exp").glob("**/config.json")).read_text())
        assert saved["features"]["fbank_conf_kwargs"]["window_type"] == "povey"

        from pytorch_scalablefhvae_tpu.eval.encode import _featurize
        from pytorch_scalablefhvae_tpu.features.kaldi_fbank import kaldi_fbank

        cfg2 = ExperimentConfig.from_dict(saved)
        rng = np.random.default_rng(0)
        y = rng.normal(size=16000).astype(np.float32)
        got = _featurize(y, 16000, cfg2.features)
        want = kaldi_fbank(y, 16000, window_type="povey", dither=0.0,
                           n_mels=80)
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)
        hamming = kaldi_fbank(y, 16000, window_type="hamming", dither=0.0,
                              n_mels=80)
        assert not np.allclose(got, hamming, atol=1e-3)  # the drift it fixes


class TestMeshTraining:
    def test_loop_runs_on_mesh(self, tmp_path):
        corpus = tmp_path / "corpus"
        preprocess_data(ExperimentConfig(data=DataConfig(dataset="synthetic")), root=corpus)
        cfg = cfg_for(tmp_path, train_extra=dict(mesh_shape=(4, 2)))
        res = train_from_config(cfg, data_root=corpus, exp_root=tmp_path / "exp",
                                is_preprocessed=True, verbose=False)
        assert not res.diverged
        assert np.isfinite(res.history.values["val_loss_results"][0])

    def test_loop_runs_on_mesh_with_bundled_dispatch(self, tmp_path):
        """steps_per_dispatch > 1 composes with mesh training (the K-step
        lax.scan bundle compiled with explicit shardings)."""
        corpus = tmp_path / "corpus"
        preprocess_data(ExperimentConfig(data=DataConfig(dataset="synthetic")), root=corpus)
        cfg = cfg_for(
            tmp_path,
            train_extra=dict(mesh_shape=(4, 2), steps_per_dispatch=2),
        )
        res = train_from_config(cfg, data_root=corpus, exp_root=tmp_path / "exp",
                                is_preprocessed=True, verbose=False)
        assert not res.diverged
        assert np.isfinite(res.history.values["val_loss_results"][0])
