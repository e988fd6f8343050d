"""Golden feature-parity tests (SURVEY.md §7 hard-part 2; VERDICT r1 item 8).

Neither Kaldi nor librosa is installed here, so parity with the canonical
extractors is pinned two ways, both independent of the library code under
test:

1. **Spec-derived references**: this file reimplements both pipelines from
   the published formulas with explicit per-frame loops and a naive O(n^2)
   DFT — no shared code, no np.fft — and requires the vectorized/FFT library
   paths to match. This catches framing/window/mel-geometry bugs that
   self-consistency tests (C++ == python mirror == JAX) cannot.
2. **Frozen golden vectors**: literal expected outputs for a deterministic
   signal, so any refactor that shifts numerics fails loudly.

Semantics pinned:
- Kaldi path (misc/fbank.conf): int16 scaling, snip-edges framing, per-frame
  DC removal -> in-frame pre-emphasis -> symmetric hamming -> pow2 FFT ->
  power spectrum -> HTK-mel triangles (peak 1, low 20 Hz) -> log(max(., eps)).
- librosa path (reference utils.py:225-272): full-signal pre-emphasis,
  center/reflect padding, periodic hamming padded to n_fft, magnitude
  spectrum, Slaney-mel (area-normalized), log with -20 floor (-50 for spec).
"""

import numpy as np
import pytest

from pytorch_scalablefhvae_tpu.features.dsp_numpy import log_melspec, log_spectrogram
from pytorch_scalablefhvae_tpu.features.kaldi_fbank import kaldi_fbank

SR = 8000


def golden_signal(n=400):
    t = np.arange(n) / SR
    rng = np.random.default_rng(42)
    return (
        0.6 * np.sin(2 * np.pi * 1000 * t)
        + 0.3 * np.sin(2 * np.pi * 3137 * t + 0.5)
        + 0.1 * rng.standard_normal(n)
    ).astype(np.float64)


def naive_rdft_mag2(frame, n_fft):
    """O(n^2) real DFT power spectrum, written from the definition."""
    x = np.zeros(n_fft)
    x[: len(frame)] = frame
    k = np.arange(n_fft // 2 + 1)
    out = np.empty(n_fft // 2 + 1)
    for i in k:
        ang = -2.0 * np.pi * i * np.arange(n_fft) / n_fft
        re = float(np.sum(x * np.cos(ang)))
        im = float(np.sum(x * np.sin(ang)))
        out[i] = re * re + im * im
    return out


def htk_mel(f):
    return 1127.0 * np.log(1.0 + np.asarray(f, dtype=np.float64) / 700.0)


class TestKaldiSemanticsFromSpec:
    """kaldi_fbank == the compute-fbank-feats recipe written out by hand."""

    def test_matches_naive_pipeline(self):
        y = golden_signal()
        n_mels, win, hop, n_fft = 8, 200, 80, 256

        got = kaldi_fbank(y, SR, n_mels=n_mels, dither=0.0)

        # hand-written pipeline, one frame at a time
        sig = y * 32768.0  # Kaldi int16 units
        # symmetric hamming (feature-window.cc: denominator M-1)
        nn = np.arange(win)
        window = 0.54 - 0.46 * np.cos(2.0 * np.pi * nn / (win - 1))
        # HTK-scale triangular bins on FFT-bin centers, peak 1, 20 Hz..Nyquist
        mel_low, mel_high = htk_mel(20.0), htk_mel(SR / 2.0)
        delta = (mel_high - mel_low) / (n_mels + 1)
        bin_mels = htk_mel(np.arange(n_fft // 2 + 1) * SR / n_fft)

        expected = []
        for f in range((len(sig) - win) // hop + 1):
            frame = sig[f * hop : f * hop + win].copy()
            frame -= frame.mean()  # remove_dc_offset
            pre = frame.copy()  # in-frame pre-emphasis, first sample vs itself
            pre[1:] = frame[1:] - 0.97 * frame[:-1]
            pre[0] = frame[0] - 0.97 * frame[0]
            power = naive_rdft_mag2(pre * window, n_fft)
            row = []
            for m in range(n_mels):
                left, center, right = (mel_low + (m + d) * delta for d in (0, 1, 2))
                w = np.minimum((bin_mels - left) / (center - left),
                               (right - bin_mels) / (right - center))
                w = np.clip(w, 0.0, None)
                row.append(np.log(max(np.sum(w * power),
                                      float(np.finfo(np.float32).eps))))
            expected.append(row)
        np.testing.assert_allclose(got, np.array(expected, np.float32),
                                   rtol=2e-5, atol=2e-5)

    def test_frozen_golden_vector(self):
        got = kaldi_fbank(golden_signal(), SR, n_mels=8, dither=0.0)
        golden = np.array([
            [17.46202, 20.525852, 22.029963, 27.648884, 25.688513, 23.112188,
             23.924988, 28.215517],
            [18.604609, 20.229939, 21.684353, 27.681166, 25.843552, 24.098236,
             24.254206, 28.112558],
            [19.296942, 20.337494, 21.315468, 27.667524, 25.743542, 24.527851,
             24.79556, 28.124958],
        ], dtype=np.float32)
        np.testing.assert_allclose(got, golden, rtol=1e-5, atol=1e-5)


class TestLibrosaSemanticsFromSpec:
    """log_melspec/log_spectrogram == the librosa recipe written out by hand
    (reference AudioUtils.to_melspec / rstft, utils.py:185-272)."""

    def _naive_mag_frames(self, y, n_fft, hop):
        # full-signal pre-emphasis, reflect-pad n_fft//2, periodic hamming
        pre = y - 0.97 * np.concatenate([[0.0], y[:-1]])
        padded = np.pad(pre, (n_fft // 2, n_fft // 2), mode="reflect")
        nn = np.arange(n_fft)
        window = 0.54 - 0.46 * np.cos(2.0 * np.pi * nn / n_fft)  # periodic
        mags = []
        for f in range(1 + (len(padded) - n_fft) // hop):
            frame = padded[f * hop : f * hop + n_fft] * window
            mags.append(np.sqrt(naive_rdft_mag2(frame, n_fft)))
        return np.array(mags)

    def _slaney_mel_fb(self, n_fft, n_mels):
        # Slaney auditory-toolbox scale: linear below 1 kHz, log above
        f_sp, min_log_hz, logstep = 200.0 / 3.0, 1000.0, np.log(6.4) / 27.0

        def to_mel(f):
            return (f / f_sp if f < min_log_hz
                    else min_log_hz / f_sp + np.log(f / min_log_hz) / logstep)

        def to_hz(m):
            return (m * f_sp if m < min_log_hz / f_sp
                    else min_log_hz * np.exp(logstep * (m - min_log_hz / f_sp)))

        mel_pts = np.linspace(to_mel(0.0), to_mel(SR / 2.0), n_mels + 2)
        hz = np.array([to_hz(m) for m in mel_pts])
        freqs = np.linspace(0.0, SR / 2.0, 1 + n_fft // 2)
        fb = np.zeros((n_mels, len(freqs)))
        for m in range(n_mels):
            up = (freqs - hz[m]) / (hz[m + 1] - hz[m])
            down = (hz[m + 2] - freqs) / (hz[m + 2] - hz[m + 1])
            fb[m] = np.clip(np.minimum(up, down), 0.0, None)
            fb[m] *= 2.0 / (hz[m + 2] - hz[m])  # slaney area norm
        return fb

    def test_melspec_matches_naive_pipeline(self):
        y = golden_signal()
        n_fft = hop = None
        n_fft, hop, n_mels = 128, 64, 6
        got = log_melspec(y, SR, n_fft=n_fft, win_t=n_fft / SR, hop_t=hop / SR,
                          n_mels=n_mels)
        mags = self._naive_mag_frames(y, n_fft, hop)
        mel = mags @ self._slaney_mel_fb(n_fft, n_mels).T
        expected = np.log(mel)
        expected[expected < -20.0] = -20.0
        np.testing.assert_allclose(got, expected.astype(np.float32),
                                   rtol=2e-4, atol=2e-4)

    def test_spectrogram_matches_naive_pipeline(self):
        y = golden_signal()
        n_fft, hop = 128, 64
        got = log_spectrogram(y, SR, n_fft=n_fft, win_t=n_fft / SR, hop_t=hop / SR)
        with np.errstate(divide="ignore"):
            expected = np.log(self._naive_mag_frames(y, n_fft, hop))
        expected[expected < -50.0] = -50.0
        np.testing.assert_allclose(got, expected.astype(np.float32),
                                   rtol=2e-4, atol=2e-4)

    def test_frozen_golden_vectors(self):
        y = golden_signal()
        lm = log_melspec(y, SR, n_fft=128, win_t=128 / SR, hop_t=64 / SR, n_mels=6)
        golden_mel = np.array([
            [-5.7973695, -4.1415544, -2.5680463, -4.063169, -3.8449755, -3.0412338],
            [-6.065781, -4.5571275, -2.5816038, -4.504945, -4.796014, -3.2628348],
            [-5.7402606, -4.3980265, -2.5348067, -4.3236747, -4.4891667, -3.2593074],
        ], dtype=np.float32)
        np.testing.assert_allclose(lm[:3], golden_mel, rtol=1e-5, atol=1e-5)
        ls = log_spectrogram(y, SR, n_fft=128, win_t=128 / SR, hop_t=64 / SR)
        golden_spec = np.array(
            [-4.589082, -4.7318892, -2.778485, -2.9023044, -3.743091,
             -2.4210413, -1.4234782, -0.8429717], dtype=np.float32)
        np.testing.assert_allclose(ls[2, :8], golden_spec, rtol=1e-5, atol=1e-5)


class TestCanonicalTools:
    """Diff both extractors against REAL canonical-tool output.

    Neither librosa nor Kaldi exists on this box (zero egress), so the
    constants are generated offline by ``misc/gen_golden_canonical.py`` and
    committed as ``tests/golden_canonical.json``. Until that file lands,
    these tests skip — parity is then pinned only by the spec-derived
    pipelines above, which is the documented residual gap (VERDICT r2 §1).
    """

    @pytest.fixture(scope="class")
    def canonical(self):
        import json
        from pathlib import Path

        path = Path(__file__).parent / "golden_canonical.json"
        if not path.exists():
            return {}
        return json.loads(path.read_text())

    def test_librosa_canonical_melspec(self, canonical):
        if "librosa" not in canonical:
            pytest.skip(
                "no librosa constants — run misc/gen_golden_canonical.py on "
                "a machine with librosa and commit golden_canonical.json")
        got = log_melspec(golden_signal(), SR, n_fft=128, win_t=128 / SR,
                          hop_t=64 / SR, n_mels=6)
        want = np.array(canonical["librosa"]["log_melspec_first3"], np.float32)
        np.testing.assert_allclose(got[:3], want, rtol=2e-4, atol=2e-4)

    def test_librosa_canonical_spectrogram(self, canonical):
        got = log_spectrogram(golden_signal(), SR, n_fft=128, win_t=128 / SR,
                              hop_t=64 / SR)
        if "librosa" in canonical:
            want = np.array(canonical["librosa"]["log_spec_row2_first8"],
                            np.float32)
            np.testing.assert_allclose(got[2, :8], want, rtol=2e-4, atol=2e-4)
        else:
            # no librosa on this box: scipy.signal.stft is the independent
            # canonical-grade STFT standing in (reflect boundary + periodic
            # hamming reproduce librosa's centered rstft exactly; see
            # TestScipyIndependentSTFT for the full-matrix version)
            from scipy.signal import get_window, stft

            y = golden_signal()
            pre = y - 0.97 * np.concatenate([[0.0], y[:-1]])
            win = get_window("hamming", 128, fftbins=True)
            _, _, Z = stft(pre, fs=SR, window=win, nperseg=128, noverlap=64,
                           boundary="even", padded=False, detrend=False,
                           return_onesided=True, scaling="spectrum")
            mag = np.abs(Z).T * win.sum()
            want = np.log(np.maximum(mag, np.finfo(np.float64).tiny))
            want[want < -50.0] = -50.0
            np.testing.assert_allclose(got[2, :8], want[2, :8].astype(np.float32),
                                       rtol=2e-5, atol=2e-5)

    def test_kaldi_canonical_fbank(self, canonical):
        if "kaldi" not in canonical:
            pytest.skip(
                "no kaldi constants — run misc/gen_golden_canonical.py on a "
                "machine with Kaldi and commit golden_canonical.json")
        # compute-fbank-feats read the int16-quantized signal; feed the
        # dequantized equivalent so both pipelines see identical samples
        y = golden_signal()
        q = np.clip(np.round(y * 32768.0), -32768, 32767) / 32768.0
        got = kaldi_fbank(q, SR, n_mels=8, dither=0.0)
        want = np.array(canonical["kaldi"]["fbank_first3"], np.float32)
        np.testing.assert_allclose(got[:3], want, rtol=2e-4, atol=2e-3)


class TestGoldenCrossPaths:
    """The C++ extractor and the JAX batched path reproduce the same goldens
    (when built/available), so parity extends to every backend."""

    def test_native_matches_golden(self):
        from pytorch_scalablefhvae_tpu.native.binding import native_fbank

        try:
            got = native_fbank(golden_signal(), SR, n_mels=8, dither=0.0)
        except Exception as e:  # toolchain unavailable
            pytest.skip(f"native extractor unavailable: {e}")
        ref = kaldi_fbank(golden_signal(), SR, n_mels=8, dither=0.0)
        np.testing.assert_allclose(got, ref, rtol=2e-4, atol=2e-4)

    def test_jax_path_matches_golden(self):
        from pytorch_scalablefhvae_tpu.features.dsp_jax import batched_features

        y = golden_signal()
        feats, n = batched_features(
            y[None, :].astype(np.float32), np.array([len(y)], np.int32),
            sr=SR, n_fft=128, win_t=128 / SR, hop_t=64 / SR, n_mels=6,
            feat_type="fbank", log_floor=-20.0,
        )
        ref = log_melspec(y, SR, n_fft=128, win_t=128 / SR, hop_t=64 / SR, n_mels=6)
        got = np.asarray(feats)[0, : int(np.asarray(n)[0])]
        mask = ref > -15.0
        np.testing.assert_allclose(got[mask], ref[mask], rtol=2e-2, atol=2e-2)


class TestCommittedGoldenRegression:
    """FULL feature matrices pinned against the committed artifact
    ``tests/golden/regression_features.npz`` (misc/gen_golden_regression.py,
    VERDICT r03 item 5): parity is bits on disk, not a run-time
    self-comparison. Covers both extractor families at the test configs AND
    the reference's production defaults (23-mel fbank.conf, 80-mel librosa)."""

    @pytest.fixture(scope="class")
    def goldens(self):
        from pathlib import Path

        return np.load(Path(__file__).parent / "golden" / "regression_features.npz")

    def golden_signal_16k(self):
        t = np.arange(1600) / 16000
        rng = np.random.default_rng(42)
        return (
            0.6 * np.sin(2 * np.pi * 1000 * t)
            + 0.3 * np.sin(2 * np.pi * 3137 * t + 0.5)
            + 0.1 * rng.standard_normal(1600)
        ).astype(np.float64)

    def test_kaldi_family(self, goldens):
        np.testing.assert_allclose(
            kaldi_fbank(golden_signal(), SR, n_mels=8, dither=0.0),
            goldens["kaldi_fbank_8mel_sr8k"], rtol=1e-5, atol=1e-5)
        np.testing.assert_allclose(
            kaldi_fbank(self.golden_signal_16k(), 16000, n_mels=23, dither=0.0),
            goldens["kaldi_fbank_23mel_sr16k"], rtol=1e-5, atol=1e-5)

    def test_librosa_family(self, goldens):
        y = golden_signal()
        np.testing.assert_allclose(
            log_melspec(y, SR, n_fft=128, win_t=128 / SR, hop_t=64 / SR, n_mels=6),
            goldens["librosa_melspec_6mel_sr8k"], rtol=1e-5, atol=1e-5)
        np.testing.assert_allclose(
            log_spectrogram(y, SR, n_fft=128, win_t=128 / SR, hop_t=64 / SR),
            goldens["librosa_spec_sr8k"], rtol=1e-5, atol=1e-5)
        y16 = self.golden_signal_16k()
        np.testing.assert_allclose(
            log_melspec(y16, 16000, n_fft=400, win_t=0.025, hop_t=0.010, n_mels=80),
            goldens["librosa_melspec_80mel_sr16k"], rtol=1e-5, atol=1e-5)
        np.testing.assert_allclose(
            log_spectrogram(y16, 16000, n_fft=400, win_t=0.025, hop_t=0.010),
            goldens["librosa_spec_sr16k"], rtol=1e-5, atol=1e-5)

    def test_native_matches_committed_goldens(self, goldens):
        from pytorch_scalablefhvae_tpu.native.binding import native_fbank

        try:
            got = native_fbank(golden_signal(), SR, n_mels=8, dither=0.0)
        except Exception as e:  # toolchain unavailable
            pytest.skip(f"native extractor unavailable: {e}")
        np.testing.assert_allclose(got, goldens["kaldi_fbank_8mel_sr8k"],
                                   rtol=2e-4, atol=2e-4)


class TestScipyIndependentSTFT:
    """The librosa-recipe spectrogram validated against scipy.signal.stft —
    a genuinely independent, widely-validated STFT implementation (not our
    code, not our naive pipeline): reflect ('even') boundary + periodic
    hamming + magnitude reproduce librosa's centered rstft exactly."""

    def test_spectrogram_matches_scipy(self):
        from scipy.signal import get_window, stft

        y = golden_signal()
        n_fft, hop = 128, 64
        got = log_spectrogram(y, SR, n_fft=n_fft, win_t=n_fft / SR,
                              hop_t=hop / SR)
        pre = y - 0.97 * np.concatenate([[0.0], y[:-1]])
        win = get_window("hamming", n_fft, fftbins=True)
        _, _, Z = stft(pre, fs=SR, window=win, nperseg=n_fft,
                       noverlap=n_fft - hop, boundary="even", padded=False,
                       detrend=False, return_onesided=True,
                       scaling="spectrum")
        mag = np.abs(Z).T * win.sum()  # undo scipy's 1/sum(win) scaling
        expected = np.log(np.maximum(mag, np.finfo(np.float64).tiny))
        expected[expected < -50.0] = -50.0
        np.testing.assert_allclose(got, expected[: got.shape[0]].astype(np.float32),
                                   rtol=2e-5, atol=2e-5)
