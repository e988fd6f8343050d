#!/usr/bin/env python
"""Generate CANONICAL-TOOL golden feature constants (run OFFLINE).

This box has neither librosa nor Kaldi installed (zero egress), so the
in-repo golden tests (tests/test_golden_features.py) pin parity against
spec-derived reimplementations + frozen vectors. This script closes the last
gap: run it on any machine that HAS the canonical tools, commit the emitted
``tests/golden_canonical.json``, and ``TestCanonicalTools`` (same file) will
diff both extractors against the real tools' output instead of skipping.

What it computes, for the SAME frozen golden signal the tests use:

- **librosa path** (reference prepare_numpy_data.py:14-50 + utils.py:185-272):
  ``AudioUtils.to_melspec`` semantics — full-signal pre-emphasis 0.97,
  librosa.stft(center=True, window='hamming'), Slaney-norm mel, log floor
  −20 — and ``rstft`` log-magnitude with floor −50.
- **Kaldi path** (reference prepare_kaldi_data.py:38-46): the output of
  ``compute-fbank-feats`` with dither=0 on the int16-quantized signal
  (requires ``compute-fbank-feats`` on PATH; skipped otherwise).

Usage (offline):
    pip install librosa==0.8.0        # the reference's pinned version
    python misc/gen_golden_canonical.py [--kaldi-bin compute-fbank-feats]
    git add tests/golden_canonical.json
"""

from __future__ import annotations

import argparse
import json
import subprocess
import sys
import tempfile
from pathlib import Path

import numpy as np

SR = 8000
N_FFT, HOP, N_MELS_LIBROSA = 128, 64, 6
KALDI_WIN_T, KALDI_HOP_T, N_MELS_KALDI = 0.025, 0.010, 8


def golden_signal(n=400):
    """MUST stay identical to tests/test_golden_features.py:golden_signal."""
    t = np.arange(n) / SR
    rng = np.random.default_rng(42)
    return (
        0.6 * np.sin(2 * np.pi * 1000 * t)
        + 0.3 * np.sin(2 * np.pi * 3137 * t + 0.5)
        + 0.1 * rng.standard_normal(n)
    ).astype(np.float64)


def librosa_constants(y):
    import librosa

    # reference AudioUtils.to_melspec (utils.py:225-272); pre-emphasis per
    # utils.py:182 — y[t] - 0.97*y[t-1] with the FIRST sample unscaled
    # (y - p*concat([[0], y[:-1]])), matching features/dsp_numpy.preemphasize
    pre = y - 0.97 * np.concatenate([[0.0], y[:-1]])
    spec = np.abs(librosa.stft(pre, n_fft=N_FFT, hop_length=HOP,
                               win_length=N_FFT, window="hamming"))
    mel_fb = librosa.filters.mel(sr=SR, n_fft=N_FFT, n_mels=N_MELS_LIBROSA,
                                 norm="slaney", htk=False)
    melspec = np.log(np.maximum(mel_fb @ spec, 1e-40)).T
    melspec[melspec < -20.0] = -20.0
    logspec = np.log(np.maximum(spec, 1e-40)).T
    logspec[logspec < -50.0] = -50.0
    return {
        "librosa_version": librosa.__version__,
        "log_melspec_first3": melspec[:3].astype(np.float32).tolist(),
        "log_spec_row2_first8": logspec[2, :8].astype(np.float32).tolist(),
    }


def kaldi_constants(y, kaldi_bin):
    """compute-fbank-feats on the int16-quantized golden signal."""
    import struct
    import wave

    q = np.clip(np.round(y * 32768.0), -32768, 32767).astype(np.int16)
    with tempfile.TemporaryDirectory() as td:
        td = Path(td)
        wav = td / "golden.wav"
        with wave.open(str(wav), "wb") as w:
            w.setnchannels(1)
            w.setsampwidth(2)
            w.setframerate(SR)
            w.writeframes(q.tobytes())
        (td / "wav.scp").write_text(f"golden {wav}\n")
        conf = td / "fbank.conf"
        conf.write_text(
            f"--sample-frequency={SR}\n--num-mel-bins={N_MELS_KALDI}\n"
            "--dither=0.0\n--window-type=hamming\n--use-energy=false\n"
        )
        subprocess.run(
            [kaldi_bin, f"--config={conf}", f"scp:{td}/wav.scp",
             f"ark,t:{td}/feats.txt"],
            check=True,
        )
        rows = []
        for line in (td / "feats.txt").read_text().splitlines():
            line = line.strip()
            if line.endswith("["):
                continue
            vals = line.rstrip("]").split()
            if vals:
                rows.append([float(v) for v in vals])
        feats = np.array(rows, dtype=np.float32)
    return {"fbank_first3": feats[:3].tolist(), "fbank_shape": list(feats.shape)}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--kaldi-bin", default="compute-fbank-feats")
    ap.add_argument("--out", default=str(
        Path(__file__).resolve().parent.parent / "tests" / "golden_canonical.json"))
    args = ap.parse_args()

    y = golden_signal()
    out = {"sr": SR, "signal_spec": "tests/test_golden_features.py:golden_signal"}
    try:
        out["librosa"] = librosa_constants(y)
        print("librosa constants generated")
    except ImportError as e:
        print(f"librosa unavailable ({e}); skipping", file=sys.stderr)
    try:
        out["kaldi"] = kaldi_constants(y, args.kaldi_bin)
        print("kaldi constants generated")
    except (FileNotFoundError, subprocess.CalledProcessError) as e:
        print(f"compute-fbank-feats unavailable ({e}); skipping", file=sys.stderr)

    Path(args.out).write_text(json.dumps(out, indent=2))
    print(f"Wrote {args.out}")


if __name__ == "__main__":
    main()
