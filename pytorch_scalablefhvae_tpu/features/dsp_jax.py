"""On-TPU DSP path: fused, batched STFT + mel projection in JAX.

Numerically equivalent to :mod:`dsp_numpy` (the librosa-semantics path of
reference utils.py:155-272), but designed for XLA/TPU:

- static shapes only — callers pad signals to a fixed length and pass the true
  length so frame masking stays inside jit;
- framing expressed as a strided gather; the mel projection and (optionally)
  the DFT itself as matmuls so the heavy lifting lands on the MXU;
- batched over utterances: ``[B, T]`` -> ``[B, F, n_mels]``.

For the small FFT sizes used here (n_fft = 400 or 512) a real-DFT-by-matmul
(``frames @ C`` and ``frames @ S``) is MXU-friendly and is used by default;
``use_fft=True`` selects ``jnp.fft.rfft`` instead.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from pytorch_scalablefhvae_tpu.features.dsp_numpy import periodic_window
from pytorch_scalablefhvae_tpu.features.mel import mel_filterbank


def _rdft_matrices(n_fft: int, dtype=jnp.float32) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Real-DFT cos/sin matrices of shape (n_fft, n_fft // 2 + 1)."""
    k = np.arange(n_fft // 2 + 1)
    n = np.arange(n_fft)
    ang = 2.0 * np.pi * np.outer(n, k) / n_fft
    return jnp.asarray(np.cos(ang), dtype), jnp.asarray(-np.sin(ang), dtype)


@functools.lru_cache(maxsize=32)
def _spectral_consts(sr: int, n_fft: int, win: int, window: str,
                     n_mels: int, norm_mel: str | None, need_mel: bool):
    """Device-resident window / DFT-basis / mel-filterbank constants.

    Hoisted OUT of the jitted compute and passed as arguments: embedding
    multi-hundred-KB weight matrices as jit constants makes XLA re-stage
    them into the Pallas custom_call on every invocation (measured 23x
    slower than operand-passing on v5e); as cached arguments they are
    uploaded once per configuration and reused.
    """
    w = periodic_window(window, win)
    if win < n_fft:
        lpad = (n_fft - win) // 2
        w = np.pad(w, (lpad, n_fft - win - lpad))
    C, S = _rdft_matrices(n_fft)
    if need_mel:
        fb = jnp.asarray(
            mel_filterbank(sr, n_fft, n_mels=n_mels, htk=False, norm=norm_mel),
            jnp.float32,
        )
    else:  # spec path: placeholder keeps the jitted signature uniform
        fb = jnp.zeros((0, n_fft // 2 + 1), jnp.float32)
    return jnp.asarray(w, jnp.float32), C, S, fb


def batched_features(
    y: jnp.ndarray,
    lengths: jnp.ndarray,
    *,
    sr: int,
    n_fft: int = 400,
    hop_t: float = 0.010,
    win_t: float = 0.025,
    window: str = "hamming",
    preemphasis: float = 0.97,
    n_mels: int = 80,
    log: bool = True,
    norm_mel: str | None = "slaney",
    log_floor: float = -20.0,
    feat_type: str = "fbank",
    use_fft: bool = False,
    use_pallas: str = "auto",
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Compute fbank/spec features for a padded batch of signals.

    Args:
        y: ``[B, T_max]`` float32 padded signals.
        lengths: ``[B]`` int32 true signal lengths.

    Returns:
        feats: ``[B, F_max, n_bins]`` (frames beyond a signal's frame count
            are zero), and ``n_frames``: ``[B]`` int32 per-signal frame counts
            (librosa centered convention: ``1 + length // hop``).

    ``use_pallas``: "never" | "always" | "auto" — whether the fused Pallas
    log-mel kernel (ops/fbank_pallas.py) replaces the jnp DFT+mel chain.
    It applies to the fbank+log non-FFT configuration only. Unlike the
    discriminative-softmax gate (models.base), "auto" here resolves to the
    jnp chain on every backend: on the kernel's own device plane the fused
    kernel is 1.33x faster (105 vs 79 Mframes/s), but XLA already keeps
    the whole chain inside one fusion family and the end-to-end WALL rate
    is within measurement noise either way (0.91x-1.04x across bench
    days; committed capture: misc/fbank_xplane_evidence.json) — feature
    extraction is < 1% of preprocess wall time, so the jnp path is the
    safe default. "always" opts in explicitly (interpret mode off-TPU,
    for tests).
    """
    win = int(sr * win_t)
    fused = bool(
        feat_type == "fbank" and log and not use_fft and use_pallas == "always"
    )
    if fused and jax.default_backend() != "tpu":
        import warnings

        warnings.warn(
            "--fbank-pallas=always on a non-TPU backend runs the log-mel "
            "kernel in Pallas INTERPRET mode (orders of magnitude slower "
            "than the jnp path); use 'never' (or the default 'auto', which "
            "selects the jnp chain on every backend) outside kernel tests.",
            RuntimeWarning, stacklevel=2)
    w, C, S, fb = _spectral_consts(
        sr, n_fft, win, window, n_mels, norm_mel,
        need_mel=feat_type == "fbank",
    )
    return _batched_features_jit(
        y, lengths, w, C, S, fb,
        sr=sr, n_fft=n_fft, hop_t=hop_t, preemphasis=preemphasis,
        log=log, log_floor=log_floor, feat_type=feat_type, use_fft=use_fft,
        fused=fused,
    )


@functools.partial(
    jax.jit,
    static_argnames=(
        "sr", "n_fft", "hop_t", "preemphasis",
        "log", "log_floor", "feat_type", "use_fft", "fused",
    ),
)
def _batched_features_jit(
    y: jnp.ndarray,
    lengths: jnp.ndarray,
    w: jnp.ndarray,
    C: jnp.ndarray,
    S: jnp.ndarray,
    fb: jnp.ndarray,
    *,
    sr: int,
    n_fft: int,
    hop_t: float,
    preemphasis: float,
    log: bool,
    log_floor: float,
    feat_type: str,
    use_fft: bool,
    fused: bool,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    B, T = y.shape
    hop = int(sr * hop_t)
    pad = n_fft // 2

    y = y.astype(jnp.float32)
    # pre-emphasis (reference utils.py:181-182)
    if preemphasis > 1e-12:
        y = y - preemphasis * jnp.pad(y[:, :-1], ((0, 0), (1, 0)))
    # zero out beyond true length UNCONDITIONALLY: the reflect gather and
    # the short-row constant extension below both read the [len, T) tail
    # and must see zeros, not whatever the batch assembly padded with
    mask = jnp.arange(T)[None, :] < lengths[:, None]
    y = jnp.where(mask, y, 0.0)

    # centered reflect pad + framing. The reflection around each signal's
    # *true* end is a per-row gather over the [B, T+2*pad] extended signal
    # (~T elements/row); the framing itself is hop-strided SLICES of that
    # extended signal, not a gather — a [B, F, n_fft] frame gather moves
    # n_fft/hop x more elements through the (slow, general) gather path and
    # measured ~30x slower on v5e for the whole extraction.
    # librosa centered frame count: 1 + (L + 2*(n_fft//2) - n_fft) // hop.
    # For even n_fft this is 1 + L // hop; for odd n_fft the pad is one
    # sample short of n_fft, giving 1 + (L - 1) // hop — the host
    # (dsp_numpy reflect) path computes exactly this, and the two
    # extractors must emit identical len.scp counts
    extra = 2 * pad - n_fft  # 0 (even n_fft) or -1 (odd)
    n_frames_max = 1 + (T + extra) // hop
    n_frames = 1 + (lengths + extra) // hop

    Tp = T + 2 * pad
    i = jnp.arange(Tp)[None, :] - pad  # signal coords
    i = jnp.abs(i)  # left reflection
    L = lengths[:, None]
    i = jnp.where(i > L - 1, 2 * (L - 1) - i, i)  # right reflection
    i = jnp.clip(i, 0, T - 1)
    y_ext = jnp.take_along_axis(y, i, axis=1)  # [B, Tp]
    # rows shorter than the pad need MULTIPLE reflections, which the
    # single-fold-then-clip above turns into edge replication; the host
    # path (dsp_numpy.stft_complex) zero-pads such degenerate signals
    # instead, and the two extractors must emit identical features. y is
    # already zero-masked beyond each row's length, so the constant
    # extension is a plain pad — no second gather.
    y_ext = jnp.where(L <= pad, jnp.pad(y, ((0, 0), (pad, pad))), y_ext)

    # frame f = y_ext[f*hop : f*hop + n_fft]: stack ceil(n_fft/hop) shifted
    # hop-chunk views and slice to n_fft columns
    k = -(-n_fft // hop)  # chunks per frame
    n_chunks = n_frames_max + k  # enough for the last frame's k chunks
    if n_chunks * hop > Tp:
        y_ext = jnp.pad(y_ext, ((0, 0), (0, n_chunks * hop - Tp)))
    chunks = y_ext[:, : n_chunks * hop].reshape(B, n_chunks, hop)
    frames = jnp.concatenate(
        [chunks[:, j : j + n_frames_max] for j in range(k)], axis=-1
    )[:, :, :n_fft]

    # fused Pallas path: window + DFT + magnitude + mel + log in one VMEM-
    # resident kernel (ops/fbank_pallas.py); see batched_features for gating.
    if fused:
        from pytorch_scalablefhvae_tpu.ops.fbank_pallas import fused_logmel_frames

        out = fused_logmel_frames(
            frames.reshape(B * n_frames_max, n_fft), w, C, S, fb.T,
            log_floor=log_floor,
            interpret=jax.default_backend() != "tpu",
        ).reshape(B, n_frames_max, fb.shape[0])
        frame_mask = jnp.arange(n_frames_max)[None, :] < n_frames[:, None]
        out = jnp.where(frame_mask[:, :, None], out, 0.0)
        return out, n_frames

    frames = frames * w[None, None, :]

    if use_fft:
        spec = jnp.abs(jnp.fft.rfft(frames, n=n_fft, axis=-1))
    else:
        re = jnp.einsum("bfn,nk->bfk", frames, C, preferred_element_type=jnp.float32)
        im = jnp.einsum("bfn,nk->bfk", frames, S, preferred_element_type=jnp.float32)
        spec = jnp.sqrt(re * re + im * im + 1e-30)

    if feat_type == "fbank":
        out = jnp.einsum("bfk,mk->bfm", spec, fb, preferred_element_type=jnp.float32)
    elif feat_type == "spec":
        out = spec
    else:
        raise ValueError(f"Unknown feat_type {feat_type!r}")

    if log:
        out = jnp.maximum(jnp.log(jnp.maximum(out, 1e-38)), log_floor)

    frame_mask = jnp.arange(n_frames_max)[None, :] < n_frames[:, None]
    out = jnp.where(frame_mask[:, :, None], out, 0.0)
    return out, n_frames


def featurize_signals(
    signals: dict[str, "np.ndarray"],
    sr: int,
    *,
    ftype: str = "fbank",
    win_t: float = 0.025,
    hop_t: float = 0.010,
    n_mels: int = 80,
    batch_size: int = 32,
    window: str = "hamming",
    preemphasis: float = 0.97,
    mel_norm: str | None = "slaney",
    log_floor_mel: float = -20.0,
    log_floor_spec: float = -50.0,
    use_pallas: str = "auto",
    sink=None,
) -> dict[str, "np.ndarray"]:
    """Batched featurization of in-memory signals -> ``{key: [T, dim]}``.

    The single shared implementation of the bucketing/padding loop used by
    both preprocessing (extract.prepare_jax) and serving (eval/encode), with
    the same defaults as the host path (generate_feat), so train-time and
    serve-time features cannot drift. Utterances are length-sorted and
    padded into pow2 buckets so XLA compiles a handful of fused STFT+mel
    programs.

    ``sink``: optional ``(key, feat) -> None`` callback; when given, each
    result is handed off as its batch completes and nothing accumulates
    (the streaming-extraction path: peak memory is one batch of features,
    not the chunk). Returns ``{}`` in that mode.
    """
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
        feats, n_frames = batched_features(
            batch, lengths, sr=sr, n_fft=int(sr * win_t),
            hop_t=hop_t, win_t=win_t, n_mels=n_mels, feat_type=ftype,
            window=window, preemphasis=preemphasis, norm_mel=mel_norm,
            log_floor=log_floor_mel if ftype == "fbank" else log_floor_spec,
            use_pallas=use_pallas,
        )
        feats = np.asarray(jax.device_get(feats))
        n_frames = np.asarray(n_frames)
        for j, k in enumerate(keys):
            feat = feats[j, : n_frames[j]].astype(np.float32)
            if sink is not None:
                sink(k, feat)
            else:
                out[k] = feat
    return out
