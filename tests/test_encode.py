"""`sfhvae encode` tests: raw audio -> latents through a trained experiment."""

import json
from pathlib import Path

import numpy as np
import pytest

from pytorch_scalablefhvae_tpu.config import (
    DataConfig,
    ExperimentConfig,
    FeatureConfig,
    ModelConfig,
)
from pytorch_scalablefhvae_tpu.eval.encode import _collect_audio, encode_audio
from pytorch_scalablefhvae_tpu.models import SimpleFHVAE
from pytorch_scalablefhvae_tpu.train import checkpoint as ckpt
from pytorch_scalablefhvae_tpu.train.step import create_train_state, make_optimizer
from pytorch_scalablefhvae_tpu.utils.audio_io import write_wav

SR = 16000
N_MELS = 8
SEG_LEN = 20


@pytest.fixture(scope="module")
def exp_dir(tmp_path_factory):
    """A minimal trained-experiment directory: config.json + one checkpoint."""
    root = tmp_path_factory.mktemp("exp")
    cfg = ExperimentConfig(
        features=FeatureConfig(n_mels=N_MELS),
        data=DataConfig(dataset="synthetic", seg_len=SEG_LEN,
                        mvn_path=str(root / "mvn.json")),
        model=ModelConfig(model_type="simple_fhvae", z1_hus=(16, 16),
                          z2_hus=(16, 16), x_hus=(16, 16), z1_dim=4, z2_dim=4),
    )
    cfg.save(root / "config.json")
    # MVN stats the encode path must pick up
    (root / "mvn.json").write_text(json.dumps(
        {"mean": [[0.5] * N_MELS], "std": [[2.0] * N_MELS]}
    ))
    model = SimpleFHVAE(input_size=SEG_LEN * N_MELS, num_seqs=3,
                        z1_hus=(16, 16), z2_hus=(16, 16), x_hus=(16, 16),
                        z1_dim=4, z2_dim=4)
    opt = make_optimizer(1e-3, 0.95, 0.999)
    state = create_train_state(model, opt, seed=0)
    ckpt.save_checkpoint(
        root, state, model_type="simple_fhvae",
        model_params=model.model_params(), run_info="enc", epoch=0,
        best_epoch=0, best_val_lb=-1.0, values={},
        extra_meta={"num_seqs": 3, "feat_dim": N_MELS, "seg_len": SEG_LEN},
    )
    return root


def make_wavs(tmp_path, n=2, seconds=0.4):
    rng = np.random.default_rng(7)
    paths = []
    for i in range(n):
        t = np.arange(int(SR * seconds)) / SR
        y = 0.4 * np.sin(2 * np.pi * (200 + 60 * i) * t) + 0.05 * rng.standard_normal(len(t))
        paths.append(write_wav(tmp_path / "wav" / f"utt{i}.wav",
                               y.astype(np.float32), SR))
    return paths


class TestCollectAudio:
    def test_files_dirs_and_scp(self, tmp_path):
        paths = make_wavs(tmp_path, n=3)
        by_file = _collect_audio([str(paths[0])])
        assert by_file == {"utt0": str(paths[0])}
        by_dir = _collect_audio([str(tmp_path / "wav")])
        assert sorted(by_dir) == ["utt0", "utt1", "utt2"]
        scp = tmp_path / "wav.scp"
        scp.write_text(f"a {paths[1]}\n")
        assert _collect_audio([str(scp)]) == {"a": str(paths[1])}
        with pytest.raises(ValueError, match="Unsupported"):
            _collect_audio([str(tmp_path / "nothing.txt")])


class TestEncodeAudio:
    def test_end_to_end(self, exp_dir, tmp_path):
        paths = make_wavs(tmp_path, n=2)
        out = encode_audio(exp_dir, [str(p) for p in paths],
                           output_dir=tmp_path / "enc", verbose=False)
        assert out["sequences"] == ["utt0", "utt1"]
        # 0.4 s at 10 ms hop -> ~38 frames -> (38-20)//8+1 = 3 segments each
        assert out["z1_mu"].shape[1] == 4
        assert out["z2_mu"].shape[1] == 4
        assert out["mu2_map"].shape == (2, 4)
        assert len(out["seq_idx"]) >= 4
        assert np.isfinite(out["z1_mu"]).all() and np.isfinite(out["mu2_map"]).all()
        with np.load(tmp_path / "enc" / "latents.npz") as z:
            np.testing.assert_array_equal(z["mu2_map"], out["mu2_map"])
        assert json.loads((tmp_path / "enc" / "sequences.json").read_text()) == [
            "utt0", "utt1"]

    def test_short_audio_skipped_and_all_short_raises(self, exp_dir, tmp_path):
        y = np.zeros(800, np.float32)  # 50 ms: ~3 frames < seg_len
        p = write_wav(tmp_path / "short.wav", y, SR)
        with pytest.raises(ValueError, match="shorter than one segment"):
            encode_audio(exp_dir, [str(p)], verbose=False)

    def test_cli_subcommand(self, exp_dir, tmp_path):
        from pytorch_scalablefhvae_tpu.cli.main import main

        paths = make_wavs(tmp_path, n=2)
        rc = main(["encode", str(exp_dir), str(tmp_path / "wav"),
                   "--output-dir", str(tmp_path / "cli_enc")])
        assert rc == 0
        assert (tmp_path / "cli_enc" / "latents.npz").exists()

    def test_jax_extractor_path_matches_numpy(self, tmp_path):
        """extractor='jax' runs batched on-accelerator featurization with the
        same semantics as the host path."""
        import dataclasses

        root = tmp_path / "exp_jax"
        root.mkdir()
        cfg = ExperimentConfig(
            features=FeatureConfig(n_mels=N_MELS, extractor="jax"),
            data=DataConfig(dataset="synthetic", seg_len=SEG_LEN),
            model=ModelConfig(model_type="simple_fhvae", z1_hus=(16, 16),
                              z2_hus=(16, 16), x_hus=(16, 16), z1_dim=4, z2_dim=4),
        )
        cfg.save(root / "config.json")
        model = SimpleFHVAE(input_size=SEG_LEN * N_MELS, num_seqs=3,
                            z1_hus=(16, 16), z2_hus=(16, 16), x_hus=(16, 16),
                            z1_dim=4, z2_dim=4)
        opt = make_optimizer(1e-3, 0.95, 0.999)
        state = create_train_state(model, opt, seed=0)
        ckpt.save_checkpoint(
            root, state, model_type="simple_fhvae",
            model_params=model.model_params(), run_info="j", epoch=0,
            best_epoch=0, best_val_lb=-1.0, values={},
            extra_meta={"num_seqs": 3, "feat_dim": N_MELS, "seg_len": SEG_LEN},
        )
        paths = make_wavs(tmp_path, n=2)
        out_jax = encode_audio(root, [str(p) for p in paths], verbose=False)
        # host-extractor experiment with identical settings
        cfg_np = dataclasses.replace(
            cfg, features=dataclasses.replace(cfg.features, extractor="numpy"))
        cfg_np.save(root / "config.json")
        out_np = encode_audio(root, [str(p) for p in paths], verbose=False)
        assert out_jax["z2_mu"].shape == out_np["z2_mu"].shape
        # fp32 log-domain features diverge slightly between DFT paths; the
        # encoded latents must stay close
        np.testing.assert_allclose(out_jax["z2_mu"], out_np["z2_mu"],
                                   rtol=0.1, atol=0.05)

    def test_stem_collisions_rekeyed_by_parent(self, tmp_path):
        """TIMIT-style layouts (every speaker has sa1.wav) must not silently
        drop utterances on stem collision."""
        rng = np.random.default_rng(3)
        for spk in ("fcjf0", "fdaw0", "mabc0"):
            d = tmp_path / "corpus" / spk
            t = np.arange(int(SR * 0.1)) / SR
            y = 0.3 * np.sin(2 * np.pi * 300 * t) + 0.01 * rng.standard_normal(len(t))
            write_wav(d / "sa1.wav", y.astype(np.float32), SR)
        got = _collect_audio([str(tmp_path / "corpus")])
        assert sorted(got) == ["fcjf0_sa1", "fdaw0_sa1", "mabc0_sa1"]

    def test_missing_mvn_raises(self, tmp_path):
        root = tmp_path / "exp_no_mvn"
        root.mkdir()
        cfg = ExperimentConfig(
            features=FeatureConfig(n_mels=N_MELS),
            data=DataConfig(dataset="synthetic", seg_len=SEG_LEN,
                            mvn_path=str(tmp_path / "nowhere.json")),
            model=ModelConfig(model_type="simple_fhvae", z1_hus=(16, 16),
                              z2_hus=(16, 16), x_hus=(16, 16), z1_dim=4, z2_dim=4),
        )
        cfg.save(root / "config.json")
        model = SimpleFHVAE(input_size=SEG_LEN * N_MELS, num_seqs=3,
                            z1_hus=(16, 16), z2_hus=(16, 16), x_hus=(16, 16),
                            z1_dim=4, z2_dim=4)
        opt = make_optimizer(1e-3, 0.95, 0.999)
        ckpt.save_checkpoint(
            root, create_train_state(model, opt, seed=0),
            model_type="simple_fhvae", model_params=model.model_params(),
            run_info="m", epoch=0, best_epoch=0, best_val_lb=-1.0, values={},
            extra_meta={"num_seqs": 3, "feat_dim": N_MELS, "seg_len": SEG_LEN},
        )
        paths = make_wavs(tmp_path, n=1)
        with pytest.raises(FileNotFoundError, match="MVN"):
            encode_audio(root, [str(paths[0])], verbose=False)


class TestServe:
    def _serve_lines(self, exp_dir, requests):
        import io

        from pytorch_scalablefhvae_tpu.eval.serve import serve

        fin = io.StringIO("".join(json.dumps(r) + "\n" for r in requests))
        fout = io.StringIO()
        rc = serve(exp_dir, stdin=fin, stdout=fout)
        assert rc == 0
        return [json.loads(l) for l in fout.getvalue().splitlines()]

    def test_session_serves_repeated_requests(self, exp_dir, tmp_path):
        """One loaded session answers multiple requests; inline summaries
        match the one-shot encode path; bad requests don't kill the loop."""
        paths = make_wavs(tmp_path, n=2)
        out = self._serve_lines(exp_dir, [
            {"cmd": "ping", "id": "p"},
            {"id": "r1", "inputs": [str(p) for p in paths],
             "output_dir": str(tmp_path / "srv1")},
            {"id": "bad", "inputs": [str(tmp_path / "nope.wav")]},
            {"id": "r2", "inputs": [str(paths[0])]},
            {"cmd": "shutdown", "id": "q"},
        ])
        ready, pong, r1, bad, r2, bye = out
        assert ready["ready"] and ready["model_type"] == "simple_fhvae"
        assert pong["ok"] and pong["id"] == "p"
        assert r1["ok"] and r1["utterances"] == 2
        assert r1["sequences"] == ["utt0", "utt1"]
        ref = encode_audio(exp_dir, [str(p) for p in paths], verbose=False)
        np.testing.assert_allclose(np.asarray(r1["mu2_map"]), ref["mu2_map"],
                                   rtol=1e-6)
        np.testing.assert_allclose(np.asarray(r1["z1_seq_mean"]),
                                   ref["z1_seq_mean"], rtol=1e-6)
        with np.load(tmp_path / "srv1" / "latents.npz") as z:
            np.testing.assert_allclose(z["z2_mu"], ref["z2_mu"], rtol=1e-6)
        assert not bad["ok"] and "error" in bad
        assert r2["ok"] and r2["utterances"] == 1  # loop survived the error
        assert bye["bye"]

    def test_cli_serve_subprocess(self, exp_dir, tmp_path):
        """The real surface: spawn `sfhvae serve`, pipe two requests, and
        confirm the SECOND is served by the same warm process."""
        import subprocess
        import sys as _sys

        paths = make_wavs(tmp_path, n=2)
        reqs = "".join(json.dumps(r) + "\n" for r in [
            {"id": "a", "inputs": [str(paths[0])]},
            {"id": "b", "inputs": [str(paths[1])],
             "output_dir": str(tmp_path / "srv_cli")},
            {"cmd": "shutdown"},
        ])
        proc = subprocess.run(
            [_sys.executable, "-m", "pytorch_scalablefhvae_tpu.cli.main",
             "serve", str(exp_dir)],
            input=reqs, capture_output=True, text=True, timeout=300,
        )
        assert proc.returncode == 0, proc.stderr[-2000:]
        lines = [json.loads(l) for l in proc.stdout.splitlines()]
        assert lines[0]["ready"]
        assert lines[1]["id"] == "a" and lines[1]["ok"]
        assert lines[2]["id"] == "b" and lines[2]["ok"]
        assert (tmp_path / "srv_cli" / "latents.npz").exists()


class TestExplicitIdAfterCollision:
    def test_scp_id_colliding_with_rekeyed_stems_raises(self, tmp_path):
        """An explicit wav.scp id whose stem already collided among
        directory-derived files must error — never be silently renamed to
        <parent>_<stem> (the scp id is authoritative)."""
        rng = np.random.default_rng(4)
        t = np.arange(int(SR * 0.1)) / SR
        y = (0.3 * np.sin(2 * np.pi * 300 * t)).astype(np.float32)
        for spk in ("x", "y"):
            write_wav(tmp_path / "corpus" / spk / "sa1.wav", y, SR)
        extra = write_wav(tmp_path / "other" / "z.wav", y, SR)
        scp = tmp_path / "wav.scp"
        scp.write_text(f"sa1 {extra}\n")
        with pytest.raises(ValueError, match="collides"):
            _collect_audio([str(tmp_path / "corpus"), str(scp)])
