"""CLI-layer tests: flag surface, defaults parity, config mapping."""

import pytest

from pytorch_scalablefhvae_tpu.cli.args import config_from_args
from pytorch_scalablefhvae_tpu.cli.main import build_parser


def parse(argv):
    return build_parser().parse_args(argv)


class TestFlagSurface:
    def test_subcommands_exist(self):
        for cmd in ("preprocess", "train", "eval", "extract", "probe",
                    "prep-timit", "prep-librispeech"):
            with pytest.raises(SystemExit) as e:
                parse([cmd, "--help"])
            assert e.value.code == 0

    def test_train_defaults_match_reference(self):
        """Defaults parity with train_model.py:25-238."""
        args = parse(["train", "--dataset", "timit", "--preprocessed"])
        cfg = config_from_args(args)
        assert cfg.model.model_type == "fhvae"  # reference default (:47)
        assert cfg.optim.alpha_dis == 10.0
        assert cfg.train.epochs == 100
        assert cfg.train.patience == 10
        assert cfg.optim.learning_rate == 0.001
        assert cfg.optim.beta_one == 0.95
        assert cfg.optim.beta_two == 0.999
        assert cfg.features.win_t == 0.025
        assert cfg.features.hop_t == 0.010
        assert cfg.features.n_mels == 80
        assert cfg.data.seg_len == 20
        assert cfg.data.seg_shift == 8
        assert cfg.data.training_batch_size == 256
        assert cfg.data.dev_batch_size == 2048
        assert cfg.model.z1_hus == (128, 128)
        assert cfg.model.z1_dim == 16
        assert cfg.train.steps_per_epoch == 5000
        assert cfg.train.log_interval == 200
        assert cfg.train.num_hierarchical_sequences == 5000

    def test_exp_naming_matches_reference_format(self):
        args = parse(["train", "--dataset", "timit", "--preprocessed",
                      "--model-type", "simple_fhvae", "--epochs", "50",
                      "--patience", "5", "--alpha-dis", "8"])
        cfg = config_from_args(args)
        # utils.py:20-42 format
        assert cfg.base_string() == "timit_np_fbank"
        assert cfg.exp_string() == "simple_fhvae_e50_p5_a8.0"
        assert str(cfg.exp_dir("./experiments")).endswith(
            "experiments/timit_np_fbank/simple_fhvae_e50_p5_a8.0"
        )

    def test_kaldi_format_naming(self):
        args = parse(["train", "--dataset", "timit", "--preprocessed",
                      "--data-format", "kaldi", "--feat-type", "spec"])
        cfg = config_from_args(args)
        # kaldi only computes fbank (utils.py:39-40)
        assert cfg.base_string() == "timit_kd_fbank"

    def test_mesh_flag_parsing(self):
        args = parse(["train", "--dataset", "synthetic", "--preprocessed",
                      "--mesh", "4,2"])
        cfg = config_from_args(args)
        assert cfg.train.mesh_shape == (4, 2)

    def test_legacy_group(self):
        args = parse(["train", "--dataset", "timit", "--preprocessed",
                      "--legacy", "--steps-per-epoch", "100", "--log-interval", "10"])
        cfg = config_from_args(args)
        assert cfg.train.legacy
        assert cfg.train.steps_per_epoch == 100
        assert "_legacy" in cfg.exp_string()

    def test_config_json_roundtrip(self):
        from pytorch_scalablefhvae_tpu.config import ExperimentConfig

        args = parse(["train", "--dataset", "librispeech", "--preprocessed",
                      "--z1-dim", "24", "--hierarchical", "--compute-dtype", "bfloat16"])
        cfg = config_from_args(args)
        cfg2 = ExperimentConfig.from_json(cfg.to_json())
        assert cfg2 == cfg
