"""Encode raw audio with a trained experiment: wav in, latents out.

A serving-style surface beyond the reference's capability set (its
``eval_model.py`` could only score preprocessed splits): given an experiment
directory and audio files, this runs the full inference path in one call —
decode audio -> extract features with the run's exact feature config ->
apply the run's MVN statistics -> segment -> batched encoder passes ->
per-segment z1/z2 posteriors, per-utterance mu2 MAP estimates (the papers'
test-time procedure for unseen sequences) and mean z1.

Feature extraction matches the training pipeline: librosa-semantics
log-mel/log-spec for numpy-format runs (features/dsp_numpy.py), Kaldi
semantics for kaldi-format runs (features/kaldi_fbank.py; dither disabled —
inference is deterministic).
"""

from __future__ import annotations

import json
from pathlib import Path

import numpy as np

from pytorch_scalablefhvae_tpu.data.feature_store import FeatureStore
from pytorch_scalablefhvae_tpu.data.loader import SegmentLoader
from pytorch_scalablefhvae_tpu.data.segments import SegmentDataset
from pytorch_scalablefhvae_tpu.eval.latents import (
    estimate_mu2,
    extract_latents,
    sequence_mean_z1,
)
from pytorch_scalablefhvae_tpu.utils.audio_io import read_audio
from pytorch_scalablefhvae_tpu.utils.manifest import read_scp

AUDIO_EXTS = (".wav", ".flac", ".sph")


def _collect_audio(inputs) -> dict[str, str]:
    """Resolve CLI inputs (files, directories, or a wav.scp) to
    ``{utt_id: path}``."""
    out: dict[str, str] = {}
    for item in inputs:
        p = Path(item)
        if p.is_dir():
            for f in sorted(p.rglob("*")):
                if f.suffix.lower() in AUDIO_EXTS:
                    out[f.stem] = str(f)
        elif p.name.endswith(".scp"):
            out.update(read_scp(p))
        elif p.suffix.lower() in AUDIO_EXTS:
            out[p.stem] = str(p)
        else:
            raise ValueError(f"Unsupported encode input {item!r} "
                             f"(expected audio file, directory, or .scp)")
    if not out:
        raise ValueError(f"No audio found in {list(inputs)!r}")
    return out


def _featurize(y: np.ndarray, sr: int, fcfg) -> np.ndarray:
    """One utterance -> [T, dim] features per the run's feature config."""
    if fcfg.data_format == "kaldi":
        from pytorch_scalablefhvae_tpu.features.kaldi_fbank import kaldi_fbank

        return kaldi_fbank(
            y, sr,
            frame_length_ms=fcfg.win_t * 1000.0,
            frame_shift_ms=fcfg.hop_t * 1000.0,
            n_mels=fcfg.n_mels,
            window_type=fcfg.window,
            dither=0.0,  # deterministic inference
            preemphasis=fcfg.preemphasis,
            remove_dc_offset=fcfg.remove_dc_offset,
        )
    from pytorch_scalablefhvae_tpu.features.dsp_numpy import (
        log_melspec,
        log_spectrogram,
    )

    n_fft = int(sr * fcfg.win_t)
    if fcfg.feat_type == "spec":
        return log_spectrogram(y, sr, n_fft=n_fft, hop_t=fcfg.hop_t,
                               win_t=fcfg.win_t, window=fcfg.window,
                               preemphasis=fcfg.preemphasis,
                               log_floor=fcfg.log_floor_spec)
    return log_melspec(y, sr, n_fft=n_fft, hop_t=fcfg.hop_t, win_t=fcfg.win_t,
                       window=fcfg.window, preemphasis=fcfg.preemphasis,
                       n_mels=fcfg.n_mels, norm_mel=fcfg.mel_norm,
                       log_floor=fcfg.log_floor_mel)


def _featurize_jax_batched(
    signals: dict[str, np.ndarray], sr: int, fcfg, batch_size: int = 32
) -> dict[str, np.ndarray]:
    """Batched on-accelerator featurization (features/dsp_jax.py): utterances
    are length-sorted and padded into pow2 buckets so XLA compiles a handful
    of programs; mirrors extract.prepare_jax without the file round-trip."""
    import jax

    from pytorch_scalablefhvae_tpu.features.dsp_jax import batched_features

    order = sorted(signals, key=lambda k: len(signals[k]))
    out: dict[str, np.ndarray] = {}
    i = 0
    while i < len(order):
        keys = order[i : i + batch_size]
        i += batch_size
        T = 16384
        while T < max(len(signals[k]) for k in keys):
            T *= 2
        batch = np.zeros((len(keys), T), np.float32)
        lengths = np.zeros(len(keys), np.int32)
        for j, k in enumerate(keys):
            batch[j, : len(signals[k])] = signals[k]
            lengths[j] = len(signals[k])
        f, n = batched_features(
            batch, lengths, sr=sr, n_fft=int(sr * fcfg.win_t),
            hop_t=fcfg.hop_t, win_t=fcfg.win_t, n_mels=fcfg.n_mels,
            feat_type=fcfg.feat_type,
            log_floor=fcfg.log_floor_mel if fcfg.feat_type == "fbank"
            else fcfg.log_floor_spec,
        )
        f = np.asarray(jax.device_get(f))
        n = np.asarray(n)
        for j, k in enumerate(keys):
            out[k] = f[j, : n[j]].astype(np.float32)
    return out


def encode_audio(
    exp_dir: str | Path,
    inputs,
    step: int = -1,
    output_dir: str | Path | None = None,
    batch_size: int = 2048,
    verbose: bool = True,
) -> dict:
    """Encode raw audio files with a trained experiment's model.

    Returns (and writes, unless ``output_dir`` is False-y and defaulted off)
    per-segment latents, per-utterance mu2 MAP / mean-z1, and the utterance
    key list.
    """
    from pytorch_scalablefhvae_tpu.eval.evaluate import load_experiment

    exp_dir = Path(exp_dir)
    config, model, params, meta = load_experiment(exp_dir, step=step)
    fcfg = config.features

    audio = _collect_audio(inputs if isinstance(inputs, (list, tuple)) else [inputs])
    min_len = config.data.min_len if config.data.min_len is not None else config.data.seg_len
    locked_sr = fcfg.sample_rate
    signals: dict[str, np.ndarray] = {}
    for key, path in audio.items():
        y, sr = read_audio(path, fcfg.sample_rate)
        if locked_sr is None:
            locked_sr = sr
        elif locked_sr != sr:
            raise ValueError(
                f"Inconsistent sample rate for {key}: {sr} vs {locked_sr} "
                f"(pass --sample-rate to resample)"
            )
        signals[key] = y

    if fcfg.extractor == "jax" and fcfg.data_format != "kaldi":
        # bulk serving path: batched on-accelerator STFT+mel (one fused MXU
        # program per length bucket), same semantics as the host path
        raw = _featurize_jax_batched(signals, locked_sr, fcfg)
    else:
        raw = {k: _featurize(y, locked_sr, fcfg) for k, y in signals.items()}

    feats: dict[str, np.ndarray] = {}
    skipped = []
    for key, f in raw.items():
        if len(f) < min_len:
            skipped.append(key)
            continue
        feats[key] = np.asarray(f, np.float32)
    if skipped and verbose:
        print(f"Skipped {len(skipped)} utterances shorter than {min_len} frames: "
              f"{skipped[:5]}{'...' if len(skipped) > 5 else ''}")
    if not feats:
        raise ValueError("All inputs were shorter than one segment")

    mvn_params = None
    if config.data.mvn_path and Path(config.data.mvn_path).exists():
        mvn_params = json.loads(Path(config.data.mvn_path).read_text())
    elif verbose and config.data.mvn_path:
        print(f"Warning: MVN file {config.data.mvn_path} not found; "
              f"encoding un-normalized features")
    store = FeatureStore.from_arrays(feats, mvn_params=mvn_params,
                                     apply_mvn=mvn_params is not None)
    ds = SegmentDataset(store, seg_len=config.data.seg_len,
                        seg_shift=config.data.seg_shift)
    loader = SegmentLoader(ds, batch_size, shuffle=False, seed=0)

    lat = extract_latents(model, params, loader)
    mu2_hat = estimate_mu2(lat["z2_mu"], lat["seq_idx"], store.num_seqs,
                           pz2_var=config.model.pz2_std**2, pmu2_var=1.0)
    z1_seq = sequence_mean_z1(lat["z1_mu"], lat["seq_idx"], store.num_seqs)

    result = {
        "z1_mu": lat["z1_mu"], "z2_mu": lat["z2_mu"],
        "seq_idx": lat["seq_idx"], "mu2_map": mu2_hat,
        "z1_seq_mean": z1_seq, "sequences": store.seq_keys,
    }
    if output_dir is not None:
        out = Path(output_dir)
        out.mkdir(parents=True, exist_ok=True)
        np.savez(out / "latents.npz",
                 **{k: v for k, v in result.items() if k != "sequences"})
        (out / "sequences.json").write_text(json.dumps(store.seq_keys))
        if verbose:
            print(f"Encoded {store.num_seqs} utterances "
                  f"({len(lat['seq_idx'])} segments) -> {out}")
    return result
