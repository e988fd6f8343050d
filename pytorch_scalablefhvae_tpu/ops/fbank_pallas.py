"""Fused STFT+mel filterbank Pallas kernel.

The jnp path in :mod:`features.dsp_jax` expresses the DFT as two matmuls and
lets XLA fuse what it can, but the intermediates still round-trip HBM: the
windowed frames, the real/imag spectra, and the magnitude each materialize
between fusion boundaries, so every frame moves roughly ``n_fft + 3K + M``
floats of HBM traffic (K = n_fft//2 + 1 bins, M mel bands).

This kernel fuses the whole per-frame chain — Hamming window, real-DFT (two
MXU matmuls against cos/sin bases), magnitude, mel projection (third MXU
matmul), and floored log — over a VMEM-resident tile of frames, writing only
the ``[tile, M]`` log-mel output. HBM traffic per frame drops to
``n_fft + M`` floats; the DFT bases and mel weights stay resident across the
whole grid.

This is the "fused JAX STFT+mel-filterbank Pallas kernel" the TPU port
targets for the reference front-end (reference utils.py:185-268 `_melspec`,
prepare_numpy_data.py): numerics match features/dsp_jax.py (librosa
semantics) to float32 round-off, asserted by tests/test_fbank_pallas.py.

Inference-only: feature extraction is never differentiated, so no backward
kernel is implemented; differentiating through this op raises (rather than
silently returning zero gradients only on the Pallas-gated path).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# frames per grid step: 2 MXU sublane tiles of 128; keeps the three matmul
# operands + double-buffered frame tiles well under the ~16 MB VMEM budget
_TILE = 256


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _kernel(frames_ref, win_ref, c_ref, s_ref, fb_ref, out_ref, *, log_floor):
    f = frames_ref[:] * win_ref[:]  # [T, n_fft] * [1, n_fft]
    re = jnp.dot(f, c_ref[:], preferred_element_type=jnp.float32)
    im = jnp.dot(f, s_ref[:], preferred_element_type=jnp.float32)
    # magnitude spectrum (power=1, librosa melspectrogram default here);
    # +1e-30 guards the sqrt gradient-free corner at exactly 0
    mag = jnp.sqrt(re * re + im * im + 1e-30)
    mel = jnp.dot(mag, fb_ref[:], preferred_element_type=jnp.float32)
    out_ref[:] = jnp.maximum(jnp.log(jnp.maximum(mel, 1e-38)), log_floor)


def _fused_logmel_impl(
    frames: jnp.ndarray,
    window: jnp.ndarray,
    cos_basis: jnp.ndarray,
    sin_basis: jnp.ndarray,
    mel_fb_t: jnp.ndarray,
    log_floor: float,
    interpret: bool,
) -> jnp.ndarray:
    """``[N, n_fft]`` raw frames -> ``[N, n_mels]`` floored log-mel.

    Args:
        frames: un-windowed frames (framing/reflect-gather stays in XLA — a
            dynamic gather is not MXU work and XLA handles it well).
        window: ``[n_fft]`` analysis window (already centre-padded to n_fft).
        cos_basis/sin_basis: ``[n_fft, K]`` real-DFT bases
            (dsp_jax._rdft_matrices).
        mel_fb_t: ``[K, n_mels]`` mel filterbank, transposed.
        log_floor: floor applied after log (dsp_jax semantics).

    K is zero-padded to a lane multiple of 128 internally; the padded DFT
    columns produce ~0 magnitude and hit zero mel-filterbank rows, so the
    result is exact.
    """
    N, n_fft = frames.shape
    K = cos_basis.shape[1]
    M = mel_fb_t.shape[1]
    k_pad = _round_up(K, 128)
    if k_pad != K:
        cos_basis = jnp.pad(cos_basis, ((0, 0), (0, k_pad - K)))
        sin_basis = jnp.pad(sin_basis, ((0, 0), (0, k_pad - K)))
        mel_fb_t = jnp.pad(mel_fb_t, ((0, k_pad - K), (0, 0)))

    n_pad = _round_up(max(N, 1), _TILE)
    if n_pad != N:
        frames = jnp.pad(frames, ((0, n_pad - N), (0, 0)))

    const = lambda i: (0, 0)  # noqa: E731 — weights replicated over the grid
    out = pl.pallas_call(
        functools.partial(_kernel, log_floor=float(log_floor)),
        out_shape=jax.ShapeDtypeStruct((n_pad, M), jnp.float32),
        grid=(n_pad // _TILE,),
        in_specs=[
            pl.BlockSpec((_TILE, n_fft), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n_fft), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((n_fft, k_pad), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((n_fft, k_pad), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((k_pad, M), const, memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((_TILE, M), lambda i: (i, 0), memory_space=pltpu.VMEM),
        cost_estimate=pl.CostEstimate(
            flops=2 * n_pad * n_fft * k_pad * 2 + 2 * n_pad * k_pad * M,
            bytes_accessed=4 * (n_pad * (n_fft + M) + 2 * n_fft * k_pad + k_pad * M),
            transcendentals=n_pad * (k_pad + M),  # sqrt + log per element
        ),
        interpret=interpret,
    )(
        frames.astype(jnp.float32),
        window.astype(jnp.float32).reshape(1, n_fft),
        cos_basis.astype(jnp.float32),
        sin_basis.astype(jnp.float32),
        mel_fb_t.astype(jnp.float32),
    )
    return out[:N]


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6))
def _fused_logmel(frames, window, cos_basis, sin_basis, mel_fb_t,
                  log_floor, interpret):
    return _fused_logmel_impl(frames, window, cos_basis, sin_basis, mel_fb_t,
                              log_floor, interpret)


def _fused_fwd(frames, window, cos_basis, sin_basis, mel_fb_t,
               log_floor, interpret):
    out = _fused_logmel_impl(frames, window, cos_basis, sin_basis, mel_fb_t,
                             log_floor, interpret)
    return out, (frames, window, cos_basis, sin_basis, mel_fb_t)


def _fused_bwd(log_floor, interpret, res, g):
    # inference-only op: no backward kernel is implemented, and silently
    # returning zeros would make a differentiated feature chain train
    # correctly on the jnp path but not on the Pallas path — fail loudly
    # at trace time instead (use use_pallas="never" to differentiate)
    raise NotImplementedError(
        "fused_logmel_frames is inference-only: it has no backward kernel. "
        "Differentiating through feature extraction requires the jnp chain "
        "(use_pallas='never')."
    )


_fused_logmel.defvjp(_fused_fwd, _fused_bwd)


@functools.partial(jax.jit, static_argnames=("log_floor", "interpret"))
def fused_logmel_frames(
    frames: jnp.ndarray,
    window: jnp.ndarray,
    cos_basis: jnp.ndarray,
    sin_basis: jnp.ndarray,
    mel_fb_t: jnp.ndarray,
    *,
    log_floor: float = -20.0,
    interpret: bool = False,
) -> jnp.ndarray:
    return _fused_logmel(frames, window, cos_basis, sin_basis, mel_fb_t,
                         float(log_floor), bool(interpret))


def logmel_frames_reference(frames, window, cos_basis, sin_basis, mel_fb_t,
                            log_floor: float = -20.0) -> jnp.ndarray:
    """Pure-jnp mirror of the kernel, for equivalence tests."""
    f = frames.astype(jnp.float32) * window[None, :]
    re = jnp.dot(f, cos_basis, preferred_element_type=jnp.float32)
    im = jnp.dot(f, sin_basis, preferred_element_type=jnp.float32)
    mag = jnp.sqrt(re * re + im * im + 1e-30)
    mel = jnp.dot(mag, mel_fb_t, preferred_element_type=jnp.float32)
    return jnp.maximum(jnp.log(jnp.maximum(mel, 1e-38)), np.float32(log_floor))
