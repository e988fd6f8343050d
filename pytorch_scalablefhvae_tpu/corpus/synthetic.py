"""Synthetic test corpus generator.

Generates a tiny deterministic WAV corpus (per-"speaker" harmonic tones +
noise) with train/dev/test ``wav.scp`` manifests, used by the integration
tests and the benchmark when no real corpus is mounted (SURVEY.md §4:
"integration: tiny synthetic corpus → preprocess → train").
"""

from __future__ import annotations

from pathlib import Path

import numpy as np

from pytorch_scalablefhvae_tpu.utils.audio_io import write_wav
from pytorch_scalablefhvae_tpu.utils.manifest import write_scp


def make_synthetic_corpus(
    output_dir: str | Path,
    num_speakers: int = 4,
    utts_per_speaker: int = 3,
    sr: int = 16000,
    min_seconds: float = 0.4,
    max_seconds: float = 0.9,
    seed: int = 0,
) -> dict[str, Path]:
    """Create WAVs + manifests; returns per-split wav.scp paths."""
    output_dir = Path(output_dir)
    rng = np.random.default_rng(seed)
    wav_dir = output_dir / "wav"
    wav_dir.mkdir(parents=True, exist_ok=True)

    entries: dict[str, dict[str, str]] = {"train": {}, "dev": {}, "test": {}}
    for s in range(num_speakers):
        f0 = 100.0 + 40.0 * s  # speaker-dependent fundamental
        for u in range(utts_per_speaker):
            dur = rng.uniform(min_seconds, max_seconds)
            t = np.arange(int(sr * dur)) / sr
            y = np.zeros_like(t)
            for h in range(1, 4):
                y += (0.3 / h) * np.sin(2 * np.pi * f0 * h * t + rng.uniform(0, np.pi))
            y += 0.02 * rng.standard_normal(t.shape)
            y = (0.8 * y / np.max(np.abs(y))).astype(np.float32)
            uttid = f"spk{s}_utt{u}"
            path = wav_dir / f"{uttid}.wav"
            write_wav(path, y, sr)
            split = "train" if u < utts_per_speaker - 2 else ("dev" if u == utts_per_speaker - 2 else "test")
            if utts_per_speaker < 3:
                split = "train"
            entries[split][uttid] = str(path)

    scps = {}
    for split, d in entries.items():
        scps[split] = write_scp(output_dir / split / "wav.scp", d)
    return scps
