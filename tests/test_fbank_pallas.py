"""Fused STFT+mel Pallas kernel (ops/fbank_pallas.py) equivalence tests.

On the CPU test backend the kernel runs in Pallas interpret mode; the claim
under test is numerics, not speed: kernel output == the jnp reference chain
== the existing dsp_jax path, including the ragged-N tile padding and the
K=201 lane padding (n_fft=400 -> 201 rfft bins, padded to 256 lanes).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pytorch_scalablefhvae_tpu.features.dsp_jax import (
    _rdft_matrices,
    batched_features,
)
from pytorch_scalablefhvae_tpu.features.dsp_numpy import periodic_window
from pytorch_scalablefhvae_tpu.features.mel import mel_filterbank
from pytorch_scalablefhvae_tpu.ops.fbank_pallas import (
    fused_logmel_frames,
    logmel_frames_reference,
)


def _setup(n_fft=400, n_mels=80, sr=16000):
    w = jnp.asarray(periodic_window("hamming", n_fft), jnp.float32)
    C, S = _rdft_matrices(n_fft)
    fb_t = jnp.asarray(
        mel_filterbank(sr, n_fft, n_mels=n_mels, htk=False, norm="slaney"),
        jnp.float32,
    ).T
    return w, C, S, fb_t


@pytest.mark.parametrize("n", [1, 37, 256, 300])
def test_kernel_matches_reference(rng, n):
    """Kernel == jnp mirror at ragged and tile-aligned frame counts."""
    w, C, S, fb_t = _setup()
    frames = jnp.asarray(rng.standard_normal((n, 400)), jnp.float32)
    got = fused_logmel_frames(frames, w, C, S, fb_t, interpret=True)
    want = logmel_frames_reference(frames, w, C, S, fb_t)
    assert got.shape == (n, 80)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-4, rtol=2e-4)


def test_kernel_log_floor(rng):
    """Silent frames clamp to the floor, matching dsp_jax semantics."""
    w, C, S, fb_t = _setup()
    frames = jnp.zeros((8, 400), jnp.float32)
    got = fused_logmel_frames(frames, w, C, S, fb_t, log_floor=-20.0, interpret=True)
    np.testing.assert_allclose(np.asarray(got), -20.0)


def test_batched_features_pallas_matches_jnp(rng):
    """End-to-end: use_pallas='always' == 'never' through batched_features."""
    B, T = 3, 4000
    y = rng.standard_normal((B, T)).astype(np.float32) * 0.1
    lengths = np.array([4000, 3210, 1777], np.int32)
    kw = dict(sr=16000, n_fft=400, n_mels=40, feat_type="fbank")
    ref, nf_ref = batched_features(jnp.asarray(y), jnp.asarray(lengths),
                                   use_pallas="never", **kw)
    got, nf = batched_features(jnp.asarray(y), jnp.asarray(lengths),
                               use_pallas="always", **kw)
    np.testing.assert_array_equal(np.asarray(nf), np.asarray(nf_ref))
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=3e-4, rtol=3e-4)
    # masked frames beyond each signal's true frame count stay zero
    for b in range(B):
        assert np.all(np.asarray(got)[b, int(nf[b]):] == 0.0)


def test_gradients_raise(rng):
    """Extraction is inference-only: differentiation fails loudly (a silent
    zero-grad VJP would train correctly on the jnp path but not here)."""
    w, C, S, fb_t = _setup()
    frames = jnp.asarray(rng.standard_normal((8, 400)), jnp.float32)

    def loss(fr):
        return jnp.sum(fused_logmel_frames(fr, w, C, S, fb_t, interpret=True))

    with pytest.raises(NotImplementedError, match="inference-only"):
        jax.grad(loss)(frames)
