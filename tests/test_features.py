"""DSP golden tests.

Validates the librosa-semantics path against independent scipy/numpy
constructions and the JAX path against the NumPy path (SURVEY.md §4 unit
tier: "DSP kernels vs golden fbank outputs").
"""

import numpy as np
import pytest
import scipy.signal

from pytorch_scalablefhvae_tpu.features import dsp_numpy, kaldi_fbank, mel


SR = 16000


def make_signal(rng, seconds=0.5):
    t = np.arange(int(SR * seconds)) / SR
    y = 0.5 * np.sin(2 * np.pi * 440.0 * t) + 0.1 * rng.standard_normal(t.shape)
    return y.astype(np.float32)


class TestWindows:
    def test_periodic_hamming_matches_scipy(self):
        w = dsp_numpy.periodic_window("hamming", 400)
        ref = scipy.signal.get_window("hamming", 400, fftbins=True)
        np.testing.assert_allclose(w, ref, atol=1e-12)

    def test_symmetric_hamming_matches_scipy(self):
        w = kaldi_fbank.symmetric_window("hamming", 400)
        ref = scipy.signal.get_window("hamming", 400, fftbins=False)
        np.testing.assert_allclose(w, ref, atol=1e-12)


class TestMelFilterbank:
    def test_slaney_scale_roundtrip(self):
        hz = np.array([0.0, 200.0, 999.0, 1000.0, 4000.0, 8000.0])
        np.testing.assert_allclose(mel.mel_to_hz_slaney(mel.hz_to_mel_slaney(hz)), hz, rtol=1e-10)

    def test_htk_scale_roundtrip(self):
        hz = np.array([20.0, 300.0, 1000.0, 7600.0])
        np.testing.assert_allclose(mel.mel_to_hz_htk(mel.hz_to_mel_htk(hz)), hz, rtol=1e-10)

    def test_slaney_filterbank_properties(self):
        fb = mel.mel_filterbank(SR, 400, n_mels=80, dtype=np.float64)
        assert fb.shape == (80, 201)
        assert (fb >= 0).all()
        # Slaney norm: each filter integrates (over Hz) to ~2/width * area = 1-ish;
        # check the documented enorm: peak * width/2 * enorm == 1 approx by
        # verifying area under each triangle in Hz is ~1.
        freqs = np.linspace(0, SR / 2, 201)
        areas = np.trapezoid(fb, freqs, axis=1)
        # interior filters should have unit-ish area (edge discretization aside)
        assert np.all(np.abs(areas[5:-5] - 1.0) < 0.2)

    def test_kaldi_bins_peak_one(self):
        fb = mel.kaldi_mel_bins(SR, 512, n_mels=80)
        assert fb.shape == (80, 257)
        peaks = fb.max(axis=1)
        # narrow low-freq triangles may not hit their apex at a discrete bin
        assert np.all(peaks > 0.2) and np.all(peaks <= 1.0 + 1e-6)
        assert np.all(peaks[40:] > 0.8)


class TestStft:
    def test_frame_count_centered(self, rng):
        y = make_signal(rng)
        spec = dsp_numpy.stft_mag(y, SR, n_fft=400)
        assert spec.shape == (1 + len(y) // 160, 201)

    def test_matches_scipy_stft_no_center(self, rng):
        """Cross-check windowed DFT against scipy.signal.stft on one frame."""
        y = make_signal(rng)
        yp = dsp_numpy.preemphasize(y, 0.97)
        frames = dsp_numpy.frame_signal(yp, 400, 160)
        w = dsp_numpy.periodic_window("hamming", 400)
        ours = np.abs(np.fft.rfft(frames * w, axis=1))
        ref = np.abs(np.fft.rfft(frames * scipy.signal.get_window("hamming", 400, True), axis=1))
        np.testing.assert_allclose(ours, ref, rtol=1e-10)

    def test_pure_tone_peak_bin(self):
        """440 Hz tone must peak at the 440 Hz bin."""
        t = np.arange(SR) / SR
        y = np.sin(2 * np.pi * 440.0 * t).astype(np.float32)
        spec = dsp_numpy.stft_mag(y, SR, n_fft=400, preemphasis=0.0)
        peak_bin = spec[10:-10].mean(axis=0).argmax()
        expected = round(440.0 / (SR / 400))
        assert abs(int(peak_bin) - expected) <= 1

    def test_log_floor_applied(self, rng):
        y = np.zeros(8000, dtype=np.float32)
        spec = dsp_numpy.log_spectrogram(y, SR)
        assert (spec >= -50.0).all() and (spec == -50.0).any()


class TestLogMel:
    def test_shapes_and_floor(self, rng):
        y = make_signal(rng)
        m = dsp_numpy.log_melspec(y, SR, n_fft=400, n_mels=80)
        assert m.shape == (1 + len(y) // 160, 80)
        assert (m >= -20.0).all()
        assert m.dtype == np.float32

    def test_mel_is_filterbank_times_mag(self, rng):
        y = make_signal(rng)
        spec = dsp_numpy.stft_mag(y, SR, n_fft=400)
        fb = mel.mel_filterbank(SR, 400, n_mels=80, dtype=np.float64)
        expected = np.log(np.maximum(spec @ fb.T, 1e-38))
        expected[expected < -20] = -20
        got = dsp_numpy.log_melspec(y, SR, n_fft=400, n_mels=80)
        np.testing.assert_allclose(got, expected.astype(np.float32), atol=1e-5)


class TestKaldiFbank:
    def test_shape_snip_edges(self, rng):
        y = make_signal(rng)
        feats = kaldi_fbank.kaldi_fbank(y, SR, dither=0.0)
        assert feats.shape == ((len(y) - 400) // 160 + 1, 80)

    def test_dither_seeded_deterministic(self, rng):
        y = make_signal(rng)
        a = kaldi_fbank.kaldi_fbank(y, SR, dither=1.0, seed=7)
        b = kaldi_fbank.kaldi_fbank(y, SR, dither=1.0, seed=7)
        c = kaldi_fbank.kaldi_fbank(y, SR, dither=1.0, seed=8)
        np.testing.assert_array_equal(a, b)
        assert not np.array_equal(a, c)

    def test_conf_parsing(self, tmp_path):
        conf = tmp_path / "fbank.conf"
        conf.write_text(
            "--window-type=hamming\n--use-energy=false\n--sample-frequency=16000\n"
            "\n--dither=1\n\n--num-mel-bins=80\n--htk-compat=true\n"
        )
        opts = kaldi_fbank.parse_fbank_conf(str(conf))
        kw = kaldi_fbank.fbank_kwargs_from_conf(opts)
        assert kw == {"window_type": "hamming", "sr": 16000, "dither": 1.0, "n_mels": 80}

    def test_conf_unsupported_option_raises(self, tmp_path):
        """Options this extractor cannot honor (e.g. --snip-edges=false,
        which changes framing geometry) must fail loudly — silently
        dropping them would extract with different semantics than the conf
        on disk claims."""
        conf = tmp_path / "fbank.conf"
        conf.write_text("--num-mel-bins=80\n--snip-edges=false\n")
        opts = kaldi_fbank.parse_fbank_conf(str(conf))
        with pytest.raises(NotImplementedError, match="snip_edges"):
            kaldi_fbank.fbank_kwargs_from_conf(opts)

    def test_tone_energy_concentrated(self):
        t = np.arange(SR) / SR
        y = 0.5 * np.sin(2 * np.pi * 1000.0 * t)
        feats = kaldi_fbank.kaldi_fbank(y, SR, dither=0.0)
        mean = feats.mean(axis=0)
        # 1 kHz lands in the lower third of the 80 HTK-mel bins
        assert mean.argmax() < 40


class TestJaxPath:
    @pytest.mark.parametrize("use_fft", [False, True])
    def test_matches_numpy_path(self, rng, use_fft):
        from pytorch_scalablefhvae_tpu.features.dsp_jax import batched_features

        sigs = [make_signal(rng, 0.3), make_signal(rng, 0.22)]
        T = max(len(s) for s in sigs)
        batch = np.zeros((2, T), np.float32)
        for i, s in enumerate(sigs):
            batch[i, : len(s)] = s
        lengths = np.array([len(s) for s in sigs], np.int32)

        feats, n_frames = batched_features(
            batch, lengths, sr=SR, n_fft=400, n_mels=80, use_fft=use_fft
        )
        feats, n_frames = np.asarray(feats), np.asarray(n_frames)
        for i, s in enumerate(sigs):
            ref = dsp_numpy.log_melspec(s, SR, n_fft=400, n_mels=80)
            assert n_frames[i] == ref.shape[0]
            got = feats[i, : n_frames[i]]
            # fp32 log-domain comparison: near-silent bins amplify rounding,
            # so compare where the reference carries energy
            mask = ref > -15.0
            assert mask.mean() > 0.5
            np.testing.assert_allclose(got[mask], ref[mask], atol=2e-2, rtol=2e-2)

    def test_short_signal_matches_numpy_zero_pad(self, rng):
        """Signals shorter than n_fft//2 need MULTIPLE reflections; the
        host path zero-pads them instead (dsp_numpy.stft_complex), and the
        jax path must match — its old single-fold-then-clip index math
        silently edge-replicated, so the two extractors wrote different
        features for sub-200-sample utterances."""
        from pytorch_scalablefhvae_tpu.features.dsp_jax import batched_features

        short = make_signal(rng, 0.01)  # 160 samples < pad=200 at n_fft 400
        longer = make_signal(rng, 0.05)
        T = len(longer)
        batch = np.zeros((2, T), np.float32)
        batch[0, : len(short)] = short
        batch[1] = longer
        lengths = np.array([len(short), T], np.int32)
        feats, n_frames = batched_features(
            batch, lengths, sr=SR, n_fft=400, n_mels=80)
        feats, n_frames = np.asarray(feats), np.asarray(n_frames)
        for i, s in enumerate((short, longer)):
            ref = dsp_numpy.log_melspec(s, SR, n_fft=400, n_mels=80)
            assert n_frames[i] == ref.shape[0]
            got = feats[i, : n_frames[i]]
            mask = ref > -15.0
            np.testing.assert_allclose(got[mask], ref[mask],
                                       atol=2e-2, rtol=2e-2)

    def test_spec_feat_type(self, rng):
        from pytorch_scalablefhvae_tpu.features.dsp_jax import batched_features

        s = make_signal(rng, 0.2)
        feats, n = batched_features(
            s[None, :], np.array([len(s)], np.int32),
            sr=SR, n_fft=400, feat_type="spec", log_floor=-50.0,
        )
        ref = dsp_numpy.log_spectrogram(s, SR, n_fft=400)
        got = np.asarray(feats)[0, : int(n[0])]
        mask = ref > -20.0
        assert mask.mean() > 0.5
        np.testing.assert_allclose(got[mask], ref[mask], atol=3e-2, rtol=3e-2)


class TestVad:
    def test_silence_vs_speechlike(self, rng):
        y = np.concatenate([
            np.zeros(8000, np.float32),
            0.5 * rng.standard_normal(8000).astype(np.float32),
        ])
        vad = dsp_numpy.energy_vad(y, SR)
        n = len(vad)
        assert vad[: n // 3].mean() < 0.1
        assert vad[2 * n // 3 :].mean() > 0.9


class TestPrepareJaxStreaming:
    def test_bounded_buffer_matches_unbounded(self, tmp_path, rng):
        """prepare_jax with a tiny audio buffer (forcing many macro-chunk
        flushes) produces identical features and manifests to a single-chunk
        run — streaming is a memory bound, not a semantics change."""
        from pytorch_scalablefhvae_tpu.features.extract import prepare_jax
        from pytorch_scalablefhvae_tpu.utils.audio_io import write_wav
        from pytorch_scalablefhvae_tpu.utils.manifest import read_scp, write_scp

        utts = {}
        for i, dur in enumerate((0.31, 0.18, 0.42, 0.25, 0.37)):
            y = make_signal(rng, dur)
            p = write_wav(tmp_path / "wav" / f"u{i}.wav", y, SR)
            utts[f"u{i}"] = str(p)
        for name in ("big", "small"):
            (tmp_path / name / "train").mkdir(parents=True)
            write_scp(tmp_path / name / "train" / "wav.scp", utts)

        prepare_jax("synthetic", "train", tmp_path / "big", verbose=False)
        prepare_jax("synthetic", "train", tmp_path / "small", verbose=False,
                    buffer_samples=4000)  # << one utterance: flush per utt

        lens_big = read_scp(tmp_path / "big" / "train" / "len.scp", dtype=int)
        lens_small = read_scp(tmp_path / "small" / "train" / "len.scp", dtype=int)
        assert lens_big == lens_small
        for k in utts:
            a = np.load(tmp_path / "big" / "train" / f"{k}.npy")
            b = np.load(tmp_path / "small" / "train" / f"{k}.npy")
            np.testing.assert_array_equal(a, b)


class TestFeatureConfigHonored:
    """FeatureConfig's window/floor/norm fields flow through every
    extraction path (they were previously parsed but ignored)."""

    def test_generate_feat_honors_config_fields(self, rng):
        from pytorch_scalablefhvae_tpu.features.extract import generate_feat

        y = make_signal(rng, 0.2)
        base = generate_feat("fbank", y, SR)
        floored = generate_feat("fbank", y, SR, log_floor_mel=-5.0)
        assert floored.min() >= -5.0
        assert base.min() < -5.0  # the default floor admits smaller values
        hann = generate_feat("fbank", y, SR, window="hann")
        assert np.abs(hann - base).max() > 1e-3  # window actually changes

    def test_featurize_signals_matches_generate_feat(self, rng):
        from pytorch_scalablefhvae_tpu.features.dsp_jax import featurize_signals
        from pytorch_scalablefhvae_tpu.features.extract import generate_feat

        y = make_signal(rng, 0.2)
        got = featurize_signals({"a": y}, SR, n_mels=40, log_floor_mel=-10.0)["a"]
        ref = generate_feat("fbank", y, SR, n_mels=40, log_floor_mel=-10.0)
        assert got.shape == ref.shape
        mask = ref > -8.0
        np.testing.assert_allclose(got[mask], ref[mask], atol=3e-2, rtol=3e-2)

    def test_featurize_signals_sink_streams(self, rng):
        from pytorch_scalablefhvae_tpu.features.dsp_jax import featurize_signals

        sigs = {f"u{i}": make_signal(rng, 0.15 + 0.02 * i) for i in range(3)}
        collected = {}
        ret = featurize_signals(sigs, SR, sink=lambda k, f: collected.__setitem__(k, f))
        assert ret == {}
        assert sorted(collected) == ["u0", "u1", "u2"]
        plain = featurize_signals(sigs, SR)
        for k in sigs:
            np.testing.assert_array_equal(collected[k], plain[k])


class TestOddNfftParity:
    def test_jax_frame_count_matches_numpy_odd_nfft(self, rng):
        """Odd n_fft (e.g. sr=22050 at 25 ms -> 551): the centered pad is
        2*(n_fft//2) = n_fft - 1 samples, so the frame count is
        1 + (L - 1) // hop, NOT 1 + L // hop — the jax and numpy extractors
        must emit identical len.scp counts for every n_fft parity."""
        from pytorch_scalablefhvae_tpu.features.dsp_jax import batched_features

        sigs = [make_signal(rng, 0.3), make_signal(rng, 0.2215)]
        T = max(len(s) for s in sigs)
        batch = np.zeros((2, T), np.float32)
        for i, s in enumerate(sigs):
            batch[i, : len(s)] = s
        lengths = np.array([len(s) for s in sigs], np.int32)
        feats, n_frames = batched_features(
            batch, lengths, sr=SR, n_fft=401, n_mels=40
        )
        feats, n_frames = np.asarray(feats), np.asarray(n_frames)
        for i, s in enumerate(sigs):
            ref = dsp_numpy.log_melspec(s, SR, n_fft=401, n_mels=40)
            assert n_frames[i] == ref.shape[0], (
                f"sig {i}: jax {n_frames[i]} vs numpy {ref.shape[0]} frames")
            got = feats[i, : n_frames[i]]
            mask = ref > -15.0
            np.testing.assert_allclose(got[mask], ref[mask], atol=2e-2,
                                       rtol=2e-2)


class TestWindowAliases:
    def test_hann_hanning_accepted_everywhere(self):
        """One config field feeds both the numpy/jax and Kaldi pipelines,
        so both spellings must work in both window constructors (and the
        native code table)."""
        from pytorch_scalablefhvae_tpu.features.dsp_numpy import periodic_window
        from pytorch_scalablefhvae_tpu.features.kaldi_fbank import symmetric_window
        from pytorch_scalablefhvae_tpu.native.binding import _WINDOW_CODES

        np.testing.assert_array_equal(periodic_window("hann", 64),
                                      periodic_window("hanning", 64))
        np.testing.assert_array_equal(symmetric_window("hann", 64),
                                      symmetric_window("hanning", 64))
        assert _WINDOW_CODES["hann"] == _WINDOW_CODES["hanning"]
