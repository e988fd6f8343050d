"""Reference-API compatibility shims.

Thin aliases so code written against the reference's Python surface
(SURVEY.md §9) ports mechanically:

- ``NumpyDataset`` / ``KaldiDataset`` (reference datasets.py:188-274):
  constructor-compatible dataset classes; ``ds[i]`` returns
  ``(seq_idx, [seg_len, dim] features, nsegs)``. Both are the same
  implementation here — the backing store dispatches on the manifest
  contents (``.npy`` paths vs ``ark:offset`` rxspecifiers).
- ``AudioUtils`` (reference utils.py:155-300): static DSP methods.
- ``loss_function`` (reference train_model.py:243-251): with the
  discriminative sign corrected (B9).
- ``check_best`` / ``check_terminate`` / ``estimate_mu2_dict``
  (reference utils.py:14-17, train_model.py:254-261, utils.py:45-60).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from pytorch_scalablefhvae_tpu.data.feature_store import FeatureStore
from pytorch_scalablefhvae_tpu.data.segments import SegmentDataset
from pytorch_scalablefhvae_tpu.features import dsp_numpy
from pytorch_scalablefhvae_tpu.train.loop import check_best, check_terminate  # noqa: F401


class _ScpDataset(SegmentDataset):
    """Reference-signature dataset (datasets.py:188-211)."""

    def __init__(
        self,
        feat_scp,
        len_scp,
        min_len: int = 1,
        mvn_path=None,
        seg_len: int = 20,
        seg_shift: int = 8,
        rand_seg: bool = False,
        sequence_list=None,
    ):
        store = FeatureStore(
            feat_scp, len_scp, min_len=min_len, mvn_path=mvn_path,
            sequence_list=sequence_list, verbose=True,
        )
        super().__init__(store, seg_len=seg_len, seg_shift=seg_shift, rand_seg=rand_seg)

    @property
    def seqlist(self):
        return self.store.seq_keys

    def apply_mvn(self, feats):
        return self.store.apply_mvn(feats)

    def undo_mvn(self, feats):
        return self.store.undo_mvn(feats)


# Both formats read through the same store; the names exist for call-site
# compatibility with the reference's two classes.
NumpyDataset = _ScpDataset
KaldiDataset = _ScpDataset


class AudioUtils:
    """Static-method DSP surface (reference utils.py:155-300).

    Note the reference's (bins, frames) output orientation is preserved by
    transposing the framework's native (frames, bins) layout.
    """

    @staticmethod
    def stft(y, sr, n_fft=400, hop_t=0.010, win_t=0.025, window="hamming",
             preemphasis=0.97):
        # complex STFT, like the reference (utils.py:185-187 returns
        # librosa.core.stft output) — phase is preserved
        return dsp_numpy.stft_complex(
            np.asarray(y), sr, n_fft, hop_t, win_t, window, preemphasis
        ).T

    @staticmethod
    def rstft(y, sr, n_fft=400, hop_t=0.010, win_t=0.025, window="hamming",
              preemphasis=0.97, log=True, log_floor=-50):
        return dsp_numpy.log_spectrogram(
            np.asarray(y), sr, n_fft, hop_t, win_t, window, preemphasis,
            log=log, log_floor=log_floor,
        ).T

    @staticmethod
    def to_melspec(y, sr, n_fft=400, hop_t=0.010, win_t=0.025, window="hamming",
                   preemphasis=0.97, n_mels=80, log=True, norm_mel="slaney",
                   log_floor=-20):
        return dsp_numpy.log_melspec(
            np.asarray(y), sr, n_fft, hop_t, win_t, window, preemphasis,
            n_mels=n_mels, log=log, norm_mel=norm_mel, log_floor=log_floor,
        ).T

    @staticmethod
    def energy_vad(y, sr, hop_t=0.010, win_t=0.025, th_ratio=1.04 / 2):
        return dsp_numpy.energy_vad(np.asarray(y), sr, hop_t, win_t, th_ratio)


def loss_function(lower_bound, log_qy, alpha=10.0):
    """Discriminative segment variational lower bound loss
    (train_model.py:243-251; log_qy enters with its correct sign, B9)."""
    return -1.0 * jnp.mean(lower_bound + alpha * log_qy)


def estimate_mu2_dict(model, params, loader, pz2_var=None, pmu2_var=1.0):
    """Estimate mu2 per sequence from encoder means (utils.py:45-60 intent).

    Signature differs from the reference (``estimate_mu2_dict(model, loader,
    num_seqs)``): JAX models are stateless, so the params pytree is an
    explicit argument, and the sequence count comes from the loader.
    Matching the reference's contract, the dict is keyed by *sequence index*
    and only contains sequences that contributed at least one segment.
    """
    from pytorch_scalablefhvae_tpu.eval.latents import estimate_mu2, extract_latents

    lat = extract_latents(model, params, loader)
    if pz2_var is None:
        pz2_var = float(np.exp(model.pz2_logvar))
    table = estimate_mu2(lat["z2_mu"], lat["seq_idx"], loader.dataset.num_seqs,
                         pz2_var=pz2_var, pmu2_var=pmu2_var)
    seen = set(int(i) for i in lat["seq_idx"])
    return {i: table[i] for i in sorted(seen)}
