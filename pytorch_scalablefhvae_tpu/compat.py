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


# ---------------------------------------------------------------------------
# Reference .tar checkpoint import (on-disk interop, SURVEY.md §9)
# ---------------------------------------------------------------------------

# reference module attribute -> our params key (simple_fhvae.py:31-36)
_MLP_MAP = {
    "z2_pre_encoder": "z2_pre",
    "z1_pre_encoder": "z1_pre",
    "pre_decoder": "dec_pre",
}
_GAUSS_MAP = {
    "z2_gauss_layer": "z2_gauss",
    "z1_gauss_layer": "z1_gauss",
    "dec_gauss_layer": "dec_gauss",
}


def _map_reference_key(key: str):
    """Reference state_dict key -> (path tuple into our params, transpose?).

    Reference naming (simple_fhvae.py:127-244): MLPs are
    ``<module>.fc<N>.linear.{weight,bias}``; Gaussian heads are
    ``<module>.{mulayer,logvar_layer}.{weight,bias}``. torch Linear weights
    are [out, in]; ours are [in, out].
    """
    parts = key.split(".")
    mod = parts[0]
    if mod in _MLP_MAP and parts[1].startswith("fc"):
        layer = int(parts[1][2:]) - 1
        leaf = "w" if parts[-1] == "weight" else "b"
        return (_MLP_MAP[mod], "layers", layer, leaf), parts[-1] == "weight"
    if mod in _GAUSS_MAP and parts[1] in ("mulayer", "logvar_layer"):
        head = "mu" if parts[1] == "mulayer" else "logvar"
        leaf = "w" if parts[-1] == "weight" else "b"
        return (_GAUSS_MAP[mod], head, leaf), parts[-1] == "weight"
    return None, False


def load_reference_checkpoint(checkpoint_file, num_seqs: int,
                              mu2_init_std: float = 0.0, seed: int = 0):
    """Import a reference ``.tar`` checkpoint (utils.py:116-152 schema) into
    this framework's params pytree.

    Returns ``(model, params, meta)`` where ``meta`` carries the reference's
    epoch/best/history fields. The reference never persisted a mu2 table
    (defect B7 — it regenerated noise each forward), so the imported table is
    fresh (``mu2_init_std`` * N(0,1); 0 -> zeros) sized for ``num_seqs`` —
    resume semantics are therefore finetune-like: MLP weights transfer, the
    table re-estimates. Optimizer moments are not imported for the same
    reason (the reference's Adam state covers a param set without the table).

    Only ``simple_fhvae`` checkpoints exist in the wild (the reference's
    FHVAE is an unimplemented stub, fhvae.py:14).
    """
    import torch

    from pytorch_scalablefhvae_tpu.models.base import init_mu2_table
    from pytorch_scalablefhvae_tpu.models.simple_fhvae import SimpleFHVAE

    ckpt = torch.load(checkpoint_file, map_location="cpu", weights_only=False)
    model_type = ckpt.get("model_type", "simple_fhvae")
    if model_type != "simple_fhvae":
        raise ValueError(
            f"Cannot import model_type {model_type!r}: the reference only "
            "implements simple_fhvae (its FHVAE is a stub, fhvae.py:14)"
        )
    state_dict = ckpt["state_dict"]
    # saved model_params are (z1_hus, z2_hus, z1_dim, z2_dim, x_hus) —
    # WITHOUT input_size (utils.py:134-141); infer it from the z2 encoder's
    # first layer, [h0, input_size] in torch orientation
    z1_hus, z2_hus, z1_dim, z2_dim, x_hus = ckpt["model_params"]
    input_size = int(state_dict["z2_pre_encoder.fc1.linear.weight"].shape[1])

    model = SimpleFHVAE(
        input_size=input_size, z1_hus=tuple(z1_hus), z2_hus=tuple(z2_hus),
        z1_dim=int(z1_dim), z2_dim=int(z2_dim), x_hus=tuple(x_hus),
        num_seqs=num_seqs,
    )
    import jax

    params = model.init(jax.random.PRNGKey(seed))
    params = jax.tree_util.tree_map(np.asarray, params)

    unmapped = []
    for key, tensor in state_dict.items():
        path, transpose = _map_reference_key(key)
        if path is None:
            unmapped.append(key)
            continue
        arr = np.asarray(tensor.detach().cpu().numpy(), dtype=np.float32)
        if transpose:
            arr = arr.T
        node = params
        for p in path[:-1]:
            node = node[p]
        if node[path[-1]].shape != arr.shape:
            raise ValueError(
                f"{key}: reference shape {arr.shape} does not fit "
                f"{'.'.join(map(str, path))} {node[path[-1]].shape}"
            )
        node[path[-1]] = arr
    if unmapped:
        raise ValueError(f"Unrecognized reference state_dict keys: {unmapped}")

    params["mu2_table"] = np.asarray(
        init_mu2_table(jax.random.PRNGKey(seed), num_seqs, int(z2_dim),
                       float(mu2_init_std))
    )
    meta = {
        "model_type": model_type,
        "epoch": int(ckpt.get("epoch", 0)),
        "best_epoch": int(ckpt.get("best_epoch", 0)),
        "best_val_lb": float(ckpt.get("best_val_lb", -np.inf)),
        "values": ckpt.get("values") or {},
    }
    return model, params, meta


def _convert_reference_values(values) -> dict:
    """Reference metric history -> MetricHistory's epoch-keyed schema.

    The reference's ``values`` structure is inconsistent (tensors shadowed
    by dicts of lists — its own defect B11); persisting it verbatim made a
    plain (non-finetune) resume crash inside ``MetricHistory(values)``.
    Lists become {epoch: value}; mappings are kept where their entries are
    numeric; anything unconvertible is dropped (the history is advisory —
    losing it must not block the resume)."""
    out: dict = {}
    if not isinstance(values, dict):
        return out
    def per_entry(items) -> dict:
        # convert entry-by-entry: one corrupt point must not drop the
        # whole series — partially-corrupt histories keep their valid points
        conv = {}
        for ep, x in items:
            try:
                conv[int(ep)] = float(x)
            except (TypeError, ValueError):
                continue
        return conv

    for k, v in values.items():
        if isinstance(v, dict):
            out[k] = per_entry(v.items())
        elif isinstance(v, (list, tuple)):
            out[k] = per_entry(enumerate(v))
    return out


def import_reference_checkpoint(checkpoint_file, out_dir, num_seqs: int,
                                mu2_init_std: float = 0.0, seed: int = 0):
    """Convert a reference ``.tar`` into this framework's npz format, ready
    for ``--continue-from <out> --finetune``. Returns the npz path."""
    from pytorch_scalablefhvae_tpu.train import checkpoint as ckpt_mod
    from pytorch_scalablefhvae_tpu.train.step import (
        create_train_state,
        make_optimizer,
    )

    model, params, meta = load_reference_checkpoint(
        checkpoint_file, num_seqs, mu2_init_std, seed)
    optimizer = make_optimizer(1e-3, 0.95, 0.999)
    state = create_train_state(model, optimizer, seed=seed)
    state = state._replace(params=params, opt_state=optimizer.init(params))
    return ckpt_mod.save_checkpoint(
        out_dir, state, model_type=model.model_type,
        model_params=model.model_params(), run_info="imported",
        epoch=meta["epoch"], best_epoch=meta["best_epoch"],
        best_val_lb=meta["best_val_lb"],
        values=_convert_reference_values(meta.get("values")),
        extra_meta={"imported_from": str(checkpoint_file),
                    "num_seqs": num_seqs},
    )


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
