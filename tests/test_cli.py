"""CLI-layer tests: flag surface, defaults parity, config mapping."""

import pytest

from pytorch_scalablefhvae_tpu.cli.args import config_from_args
from pytorch_scalablefhvae_tpu.cli.main import build_parser


def parse(argv):
    return build_parser().parse_args(argv)


class TestFlagSurface:
    def test_subcommands_exist(self):
        for cmd in ("preprocess", "train", "eval", "extract", "probe",
                    "encode", "serve", "prep-timit", "prep-librispeech"):
            with pytest.raises(SystemExit) as e:
                parse([cmd, "--help"])
            assert e.value.code == 0

    def test_compile_cache_flag(self, tmp_path, monkeypatch):
        """--compile-cache (or SFHVAE_COMPILE_CACHE) enables the persistent
        XLA compilation cache: process restarts of train/serve reuse
        compiled programs instead of cold-compiling."""
        import jax

        from pytorch_scalablefhvae_tpu.cli.main import main

        cache = tmp_path / "xla_cache"
        prev = jax.config.jax_compilation_cache_dir
        try:
            # route through main() with a subcommand that exits before any
            # heavy work (--help exits 0 after parsing... parse errors exit
            # 2) — use a failing-fast eval on a missing dir instead
            with pytest.raises(Exception):
                main(["--compile-cache", str(cache), "eval",
                      str(tmp_path / "nonexistent_exp")])
            assert jax.config.jax_compilation_cache_dir == str(cache)
            assert cache.is_dir()
        finally:
            jax.config.update("jax_compilation_cache_dir", prev)

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
        # model-aware default: the recurrent fhvae (a stub in the
        # reference, so the default is ours) trains at the TPU-efficient
        # b1024; simple_fhvae keeps the reference's 256 (args.py:
        # _default_batch)
        assert cfg.data.training_batch_size == 1024
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

    def test_old_config_json_loads_with_defaults(self):
        """Configs saved by earlier rounds (missing newer fields) must
        resume cleanly: absent keys fall back to dataclass defaults."""
        import json

        from pytorch_scalablefhvae_tpu.config import ExperimentConfig

        d = json.loads(ExperimentConfig().to_json())
        for sec, keys in [("model", ["lstm_pallas", "scan_unroll"]),
                          ("features", ["fbank_pallas"]),
                          ("train", ["plot_curves"])]:
            for k in keys:
                d[sec].pop(k)
        old = ExperimentConfig.from_json(json.dumps(d))
        assert old.model.lstm_pallas == "auto"
        assert old.model.scan_unroll == 20
        assert old.features.fbank_pallas == "auto"
        assert old.train.plot_curves is False


class TestConfigFlagCompleteness:
    """Every config field is reachable from argv (VERDICT r1: config surface
    and flag surface had drifted) except the documented conf-file-driven set."""

    # settable through the config JSON (honored by the extraction stack) but
    # deliberately without CLI flags: the kaldi-path options come from
    # --fbank-conf (misc/fbank.conf parity), the librosa-path options are
    # reference-fixed defaults most users should not touch
    CONF_DRIVEN = {
        ("features", "window"), ("features", "preemphasis"),
        ("features", "mel_norm"), ("features", "log_floor_spec"),
        ("features", "log_floor_mel"), ("features", "dither"),
        ("features", "remove_dc_offset"), ("features", "use_energy"),
        ("features", "htk_compat"),
        # derived, not a flag: train/driver.py persists the parsed
        # --fbank-conf here so encode/serve rebuild features from the
        # saved config alone
        ("features", "fbank_conf_kwargs"),
    }

    def test_every_config_field_reachable_from_argv(self):
        import dataclasses

        from pytorch_scalablefhvae_tpu.config import ExperimentConfig

        base = config_from_args(parse(["train", "--dataset", "synthetic",
                                       "--preprocessed"]))
        # one argv probe per field, with a value different from the default
        probes = {
            ("features", "feat_type"): (["--feat-type", "spec"], "spec"),
            ("features", "data_format"): (["--data-format", "kaldi"], "kaldi"),
            ("features", "extractor"): (["--extractor", "jax"], "jax"),
            ("features", "fbank_pallas"): (["--fbank-pallas", "never"], "never"),
            ("features", "sample_rate"): (["--sample-rate", "8000"], 8000),
            ("features", "win_t"): (["--win-size", "0.02"], 0.02),
            ("features", "hop_t"): (["--hop-size", "0.005"], 0.005),
            ("features", "n_mels"): (["--mels", "40"], 40),
            ("features", "dither_seed"): (["--dither-seed", "7"], 7),
            ("features", "num_workers"): (["--num-workers", "2"], 2),
            ("data", "dataset"): (["--dataset", "timit"], "timit"),
            ("data", "raw_data_dir"): (["--raw-data-dir", "/x"], "/x"),
            ("data", "min_len"): (["--min-len", "30"], 30),
            ("data", "mvn_path"): (["--mvn-path", "/m.json"], "/m.json"),
            ("data", "seg_len"): (["--seg-len", "10"], 10),
            ("data", "seg_shift"): (["--seg-shift", "4"], 4),
            ("data", "rand_seg"): (["--rand-seg", "true"], True),
            ("data", "training_batch_size"): (["--training-batch-size", "64"], 64),
            ("data", "dev_batch_size"): (["--dev-batch-size", "128"], 128),
            ("data", "pack_cache_dir"): (["--pack-cache-dir", "/pc"], "/pc"),
            ("data", "transfer_dtype"): (["--transfer-dtype", "bfloat16"], "bfloat16"),
            ("data", "data_placement"): (["--data-placement", "device"], "device"),
            ("data", "device_store_max_bytes"): (
                ["--device-store-max-bytes", "1024"], 1024),
            ("data", "stream_chunk_bytes"): (
                ["--stream-chunk-bytes", "4096"], 4096),
            ("data", "shard_device_store"): (["--shard-device-store"], True),
            ("data", "epoch_plan"): (["--epoch-plan", "device"], "device"),
            ("data", "train_list"): (["--train-list", "train-other-500"],
                                     ("train-other-500",)),
            ("data", "dev_list"): (["--dev-list", "dev-clean"], ("dev-clean",)),
            ("data", "test_list"): (["--test-list", "test-clean"], ("test-clean",)),
            ("model", "model_type"): (["--model-type", "simple_fhvae"], "simple_fhvae"),
            ("model", "z1_hus"): (["--z1-hus", "64", "64"], (64, 64)),
            ("model", "z2_hus"): (["--z2-hus", "64", "64"], (64, 64)),
            ("model", "z1_dim"): (["--z1-dim", "8"], 8),
            ("model", "z2_dim"): (["--z2-dim", "8"], 8),
            ("model", "x_hus"): (["--x-hus", "64", "64"], (64, 64)),
            ("model", "pz2_std"): (["--pz2-std", "0.3"], 0.3),
            ("model", "mu2_init_std"): (["--mu2-init-std", "0.5"], 0.5),
            ("model", "compute_dtype"): (["--compute-dtype", "bfloat16"], "bfloat16"),
            ("model", "use_pallas"): (["--use-pallas", "never"], "never"),
            ("optim", "learning_rate"): (["--learning-rate", "0.01"], 0.01),
            ("optim", "beta_one"): (["--beta-one", "0.9"], 0.9),
            ("optim", "beta_two"): (["--beta-two", "0.99"], 0.99),
            ("optim", "alpha_dis"): (["--alpha-dis", "5"], 5.0),
            ("train", "epochs"): (["--epochs", "7"], 7),
            ("train", "patience"): (["--patience", "3"], 3),
            ("train", "seed"): (["--seed", "9"], 9),
            ("train", "legacy"): (["--legacy"], True),
            ("train", "steps_per_epoch"): (["--steps-per-epoch", "11"], 11),
            ("train", "log_interval"): (["--log-interval", "13"], 13),
            ("train", "sample_hierarchical"): (["--hierarchical"], True),
            ("train", "num_hierarchical_sequences"): (
                ["--num-hierarchical-sequences", "99"], 99),
            ("train", "hierarchical_round_epochs"): (
                ["--hierarchical-round-epochs", "3"], 3),
            ("train", "map_init_chunk_skip"): (
                ["--map-init-chunk-skip", "2"], 2),
            ("train", "ckpt_every_steps"): (
                ["--ckpt-every-steps", "50"], 50),
            ("train", "max_steps"): (["--max-steps", "120"], 120),
            ("train", "profile_dir"): (["--profile-dir", "/prof"], "/prof"),
            ("train", "profile_epoch"): (["--profile-epoch", "0"], 0),
            ("train", "tensorboard"): (["--tensorboard"], True),
            ("train", "plot_curves"): (["--visdom"], True),
            ("model", "lstm_pallas"): (["--lstm-pallas", "never"], "never"),
            ("model", "lstm_mm_dtype"): (
                ["--lstm-mm-dtype", "float32"], "float32"),
            ("model", "scan_unroll"): (["--scan-unroll", "4"], 4),
            ("train", "tb_log_dir"): (["--tb-log-dir", "/tb"], "/tb"),
            ("train", "log_params"): (["--log-params"], True),
            ("train", "steps_per_dispatch"): (["--steps-per-dispatch", "4"], 4),
            ("train", "ckpt_backend"): (["--ckpt-backend", "orbax"], "orbax"),
            ("train", "mesh_shape"): (["--mesh", "2,4"], (2, 4)),
            ("train", "donate_state"): (["--donate-state", "false"], False),
            ("data", "synthetic_speakers"): (["--synthetic-speakers", "64"], 64),
            ("data", "synthetic_utts"): (["--synthetic-utts", "5"], 5),
        }
        missing = []
        for section_field in dataclasses.fields(ExperimentConfig):
            section = section_field.name
            for f in dataclasses.fields(getattr(base, section)):
                key = (section, f.name)
                if key in self.CONF_DRIVEN:
                    continue
                if key not in probes:
                    missing.append(key)
                    continue
                argv, expect = probes[key]
                cfg = config_from_args(
                    parse(["train", "--dataset", "synthetic", "--preprocessed"] + argv)
                )
                got = getattr(getattr(cfg, section), f.name)
                assert got == expect, f"{key}: argv {argv} gave {got!r}, want {expect!r}"
        assert not missing, f"Config fields unreachable from argv: {missing}"


class TestResumeOverrides:
    def test_apply_overrides_parsing(self):
        from pytorch_scalablefhvae_tpu.config import ExperimentConfig

        cfg = ExperimentConfig()
        out = cfg.apply_overrides({
            "epochs": "200",              # bare unique field
            "train.patience": "20",       # qualified
            "optim.learning_rate": "5e-4",
            "model.z1_hus": "64,64",
            "train.legacy": "true",
            "data.mvn_path": "none",
        })
        assert out.train.epochs == 200
        assert out.train.patience == 20
        assert out.optim.learning_rate == 5e-4
        assert out.model.z1_hus == (64, 64)
        assert out.train.legacy is True
        assert out.data.mvn_path is None

    def test_apply_overrides_rejects_unknown_and_ambiguous(self):
        from pytorch_scalablefhvae_tpu.config import ExperimentConfig

        cfg = ExperimentConfig()
        with pytest.raises(ValueError, match="Unknown config field"):
            cfg.apply_overrides({"no_such_field": "1"})
        with pytest.raises(ValueError, match="Unknown config section"):
            cfg.apply_overrides({"nowhere.epochs": "1"})

    def test_cli_flag_shape(self):
        args = parse(["train", "--dataset", "synthetic", "--preprocessed",
                      "--resume-override", "epochs=5",
                      "--resume-override", "train.patience=2"])
        assert args.resume_override == ["epochs=5", "train.patience=2"]

    def test_apply_overrides_wraps_single_tuple_values(self):
        from pytorch_scalablefhvae_tpu.config import ExperimentConfig

        cfg = ExperimentConfig()
        out = cfg.apply_overrides({"train_list": "train-other-500",
                                   "train.mesh_shape": "4"})
        assert out.data.train_list == ("train-other-500",)
        assert out.train.mesh_shape == (4,)

    def test_override_without_continue_from_raises(self, tmp_path):
        from pytorch_scalablefhvae_tpu.config import ExperimentConfig
        from pytorch_scalablefhvae_tpu.train.driver import train_from_config

        with pytest.raises(ValueError, match="only applies when resuming"):
            train_from_config(ExperimentConfig(), data_root=tmp_path,
                              is_preprocessed=True,
                              resume_overrides={"epochs": 5}, verbose=False)
