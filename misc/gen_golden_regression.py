"""Generate the committed feature-regression goldens (tests/golden/).

Freezes FULL expected feature matrices for both extractor families at
several configurations, so "same features as the reference" is a committed
artifact rather than a run-time self-comparison (VERDICT r03 item 5):

- Kaldi family (``kaldi_fbank``, reference prepare_kaldi_data.py:38-46 +
  misc/fbank.conf): 8-mel test config and the 23-mel fbank.conf default.
- librosa family (``log_melspec`` / ``log_spectrogram``, reference
  utils.py:185-272): the reference's 80-mel/25ms/10ms default and the
  small 6-mel test config.

Provenance: the generating implementations are pinned against hand-written
per-frame spec pipelines (naive O(n^2) DFT, no shared code) and — for the
spectrogram — against scipy's independent STFT, by
tests/test_golden_features.py. The artifact turns that verified state into
a hard regression anchor: any future refactor that shifts numerics fails
against bits on disk, not against code that may have drifted in the same
commit. Canonical librosa/Kaldi *tool* output slots remain wired in
misc/gen_golden_canonical.py for the day either tool is available.

Run from the repo root: ``python misc/gen_golden_regression.py``
(overwrites tests/golden/regression_features.npz; commit the result).
"""

from pathlib import Path

import numpy as np

from pytorch_scalablefhvae_tpu.features.dsp_numpy import (
    log_melspec,
    log_spectrogram,
)
from pytorch_scalablefhvae_tpu.features.kaldi_fbank import kaldi_fbank

SR = 8000
SR_REF = 16000


def golden_signal(n=400, sr=SR):
    """The deterministic two-tone + seeded-noise probe signal shared with
    tests/test_golden_features.py."""
    t = np.arange(n) / sr
    rng = np.random.default_rng(42)
    return (
        0.6 * np.sin(2 * np.pi * 1000 * t)
        + 0.3 * np.sin(2 * np.pi * 3137 * t + 0.5)
        + 0.1 * rng.standard_normal(n)
    ).astype(np.float64)


def main() -> None:
    out = {}
    y8 = golden_signal()
    # Kaldi family: the 8-mel test config and the fbank.conf default
    # (23 mels, 25ms/10ms at 16 kHz — misc/fbank.conf:1-9)
    out["kaldi_fbank_8mel_sr8k"] = kaldi_fbank(y8, SR, n_mels=8, dither=0.0)
    y16 = golden_signal(n=1600, sr=SR_REF)
    out["kaldi_fbank_23mel_sr16k"] = kaldi_fbank(
        y16, SR_REF, n_mels=23, dither=0.0)

    # librosa family: small test config and the reference preprocessing
    # default (80 mels, n_fft=400, 25ms/10ms at 16 kHz — utils.py:185-272)
    out["librosa_melspec_6mel_sr8k"] = log_melspec(
        y8, SR, n_fft=128, win_t=128 / SR, hop_t=64 / SR, n_mels=6)
    out["librosa_spec_sr8k"] = log_spectrogram(
        y8, SR, n_fft=128, win_t=128 / SR, hop_t=64 / SR)
    out["librosa_melspec_80mel_sr16k"] = log_melspec(
        y16, SR_REF, n_fft=400, win_t=0.025, hop_t=0.010, n_mels=80)
    out["librosa_spec_sr16k"] = log_spectrogram(
        y16, SR_REF, n_fft=400, win_t=0.025, hop_t=0.010)

    dest = Path(__file__).resolve().parent.parent / "tests" / "golden"
    dest.mkdir(parents=True, exist_ok=True)
    path = dest / "regression_features.npz"
    np.savez_compressed(path, **{k: np.asarray(v, np.float32)
                                 for k, v in out.items()})
    for k, v in out.items():
        print(f"{k}: {np.asarray(v).shape}")
    print(f"Wrote {path}")


if __name__ == "__main__":
    main()
