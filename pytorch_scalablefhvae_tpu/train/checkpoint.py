"""Checkpoint save/load.

Capability parity with the reference's most-developed subsystem
(utils.py:63-152): per-epoch checkpoints carrying the full schema
{model_type, model_params, parameters, optimizer state, epoch, best_epoch,
best_val_lb, metric history}, a ``best_model_*`` copy for the best epoch, and
``--finetune`` semantics (weights only, fresh schedule; utils.py:86-93).

Format: one ``.npz`` of pytree leaves (params + optimizer + RNG key + step)
plus a JSON sidecar — portable, introspectable, no pickle (fixes B14). The
pytree structure is reconstructed from the model/optimizer definitions at
load time; leaf count and shapes are validated. Sharded arrays are gathered
to host on save and re-placed by the caller's shardings on load.
"""

from __future__ import annotations

import json
import shutil
from pathlib import Path
import jax
import numpy as np

from pytorch_scalablefhvae_tpu.train.step import TrainState

_SCHEMA_VERSION = 1


def _flatten(state: TrainState) -> list[np.ndarray]:
    leaves = jax.tree_util.tree_leaves(state)
    return [np.asarray(jax.device_get(leaf)) for leaf in leaves]


def save_checkpoint(
    checkpoint_dir: str | Path,
    state: TrainState,
    *,
    model_type: str,
    model_params: tuple,
    run_info: str,
    epoch: int,
    best_epoch: int,
    best_val_lb: float,
    values: dict,
    summary_vals: dict | None = None,
    extra_meta: dict | None = None,
    suffix: str = "",
) -> Path:
    """Write ``<model>_<run_info>_e<epoch>.npz`` (+ ``best_model_`` copy).

    Naming parity with reference utils.py:148-152. ``suffix`` distinguishes
    mid-epoch step-cadence checkpoints (``_e<epoch>s<batches>``); those never
    produce a best-model copy (the best decision is an epoch-level one).
    """
    checkpoint_dir = Path(checkpoint_dir)
    checkpoint_dir.mkdir(parents=True, exist_ok=True)
    f_str = f"{model_type}_{run_info}_e{epoch}{suffix}"
    npz_path = checkpoint_dir / f"{f_str}.npz"
    meta_path = checkpoint_dir / f"{f_str}.json"

    leaves = _flatten(state)
    # atomic commit (tmp + rename, like the orbax backend): np.savez
    # straight to the final name would leave a truncated .npz on a
    # mid-save kill, which checkpoint discovery then returns as the
    # latest checkpoint and the next resume dies inside zipfile
    import os

    tmp_path = checkpoint_dir / f".{f_str}.npz.{os.getpid()}.tmp"
    try:
        with open(tmp_path, "wb") as fh:
            np.savez(fh, **{f"leaf_{i}": leaf
                            for i, leaf in enumerate(leaves)})
        os.replace(tmp_path, npz_path)
    finally:
        tmp_path.unlink(missing_ok=True)
    meta = {
        "schema_version": _SCHEMA_VERSION,
        "model_type": model_type,
        "model_params": list(model_params),
        "epoch": epoch,
        "best_epoch": best_epoch,
        "best_val_lb": float(best_val_lb),
        "values": values,
        "summary_vals": summary_vals or {},
        "num_leaves": len(leaves),
    }
    if extra_meta:
        meta.update(extra_meta)
    meta_tmp = checkpoint_dir / f".{f_str}.json.{os.getpid()}.tmp"
    meta_tmp.write_text(json.dumps(meta, indent=2))
    os.replace(meta_tmp, meta_path)

    if best_epoch == epoch and not suffix:
        shutil.copyfile(npz_path, checkpoint_dir / f"best_model_{f_str}.npz")
        shutil.copyfile(meta_path, checkpoint_dir / f"best_model_{f_str}.json")
    return npz_path


def cleanup_mid_epoch(checkpoint_dir: str | Path, model_type: str,
                      run_info: str, upto_epoch: int) -> None:
    """Delete this run's mid-epoch step-cadence checkpoints for epochs
    ``<= upto_epoch`` — once the epoch checkpoint is committed they are
    redundant. Handles both backends (``.npz``+``.json`` files and
    ``.orbax`` directories). Callers flush async saves first."""
    import re

    checkpoint_dir = Path(checkpoint_dir)
    pat = re.compile(
        re.escape(f"{model_type}_{run_info}_e") + r"(\d+)s\d+\.(npz|json|orbax)$")
    for p in checkpoint_dir.glob(f"{model_type}_{run_info}_e*s*"):
        m = pat.match(p.name)
        if m and int(m.group(1)) <= upto_epoch:
            if p.is_dir():
                shutil.rmtree(p, ignore_errors=True)
            else:
                p.unlink(missing_ok=True)


def _adapt_rows(arr: np.ndarray, rows: int) -> np.ndarray:
    """Slice or zero-pad dim 0 to ``rows`` (mu2 mesh-padding adaptation)."""
    if arr.shape[0] > rows:
        return arr[:rows]
    return np.pad(arr, ((0, rows - arr.shape[0]), (0, 0)))


def read_checkpoint_meta(checkpoint_file: str | Path) -> dict:
    meta_path = Path(checkpoint_file).with_suffix(".json")
    return json.loads(meta_path.read_text())


def load_any_checkpoint(
    checkpoint_file: str | Path, template_state: TrainState,
    finetune: bool = False, expected_num_seqs: int | None = None,
    expected_fingerprint: str | None = None,
) -> tuple[TrainState, dict]:
    """Backend-dispatching load: .orbax directories or .npz files."""
    if str(checkpoint_file).endswith(".orbax"):
        from pytorch_scalablefhvae_tpu.train.orbax_backend import load_checkpoint_orbax

        return load_checkpoint_orbax(checkpoint_file, template_state,
                                     finetune=finetune,
                                     expected_num_seqs=expected_num_seqs,
                                     expected_fingerprint=expected_fingerprint)
    return load_checkpoint(checkpoint_file, template_state, finetune=finetune,
                           expected_num_seqs=expected_num_seqs,
                           expected_fingerprint=expected_fingerprint)


def corpus_fingerprint(seq_keys) -> str:
    """Cheap order-sensitive fingerprint of a corpus's sequence-key list.

    The mu2 table pairs row i with sequence i BY POSITION, so two corpora
    with the same sequence count but different (or reordered) keys must not
    resume into each other — the count-only check cannot see that. Persisted
    in the sidecar and compared by :func:`check_same_corpus` (skip-if-absent
    for old checkpoints)."""
    import hashlib

    h = hashlib.blake2b(digest_size=16)
    for k in seq_keys:
        h.update(str(k).encode())
        h.update(b"\n")
    return h.hexdigest()


def finalize_load_meta(meta: dict, finetune: bool) -> dict:
    """Shared resume-meta resolution for BOTH checkpoint backends.

    finetune: parameters only — optimizer state, step counter, epoch and
    history are discarded (reference utils.py:86-93). Otherwise resume at
    ``epoch + 1`` exactly (fixes B18's double increment)."""
    if finetune:
        return dict(meta, start_epoch=0, values={}, best_val_lb=-np.inf,
                    best_epoch=0)
    return dict(meta, start_epoch=meta["epoch"] + 1)


def mu2_rows_adaptable(path_str: str, saved_shape, t_shape) -> bool:
    """Whether a leaf shape mismatch is the mu2 table's LAYOUT difference
    (row padding to a mesh's model axis) rather than architecture drift —
    the ONE mismatch both backends may adapt instead of raising."""
    return (
        "mu2_table" in path_str
        and len(saved_shape) == 2
        and len(t_shape) == 2
        and saved_shape[1] == t_shape[1]
    )


def check_same_corpus(meta: dict, expected_num_seqs: int | None,
                      finetune: bool, checkpoint_file,
                      expected_fingerprint: str | None = None) -> None:
    """Refuse resuming (non-finetune) onto a different corpus.

    The mu2 table is per-sequence state: row i holds sequence i's posterior
    mean, so loading corpus A's table for corpus B silently pairs every
    sequence with an unrelated row (and the row adaptation would zero-pad
    the difference, bypassing the configured random init). ``--finetune``
    is the supported cross-corpus path — it keeps encoder/decoder weights
    and the table is re-estimated. Old sidecars without a ``num_seqs`` key
    skip the check."""
    saved = meta.get("num_seqs")
    if (not finetune and saved is not None and expected_num_seqs is not None
            and int(saved) != int(expected_num_seqs)):
        raise ValueError(
            f"Checkpoint {checkpoint_file} was trained on a corpus of "
            f"{saved} sequences but this run has {expected_num_seqs}: the "
            f"mu2 table is per-sequence state and cannot transfer. Use "
            f"--finetune to reuse the encoder/decoder weights with a fresh "
            f"table."
        )
    saved_fp = meta.get("corpus_fingerprint")
    if (not finetune and saved_fp is not None
            and expected_fingerprint is not None
            and saved_fp != expected_fingerprint):
        raise ValueError(
            f"Checkpoint {checkpoint_file} was trained on a corpus whose "
            f"ordered sequence-key list differs from this run's (same count "
            f"does not mean same corpus): the mu2 table pairs rows with "
            f"sequences by position. Use --finetune to reuse the "
            f"encoder/decoder weights with a fresh table."
        )


def load_checkpoint(
    checkpoint_file: str | Path,
    template_state: TrainState,
    finetune: bool = False,
    expected_num_seqs: int | None = None,
    expected_fingerprint: str | None = None,
) -> tuple[TrainState, dict]:
    """Restore a TrainState from ``<name>.npz`` (+ sidecar JSON).

    Args:
        template_state: freshly-initialized state providing the pytree
            structure (model/optimizer must match the checkpoint).
        finetune: load parameters only; optimizer state, step counter, epoch
            and history are discarded (reference utils.py:86-93).
        expected_num_seqs: the run's REAL sequence count; a non-finetune
            load whose sidecar records a different corpus raises
            (:func:`check_same_corpus`) instead of silently adapting the
            per-sequence mu2 table across corpora.

    Returns:
        (state, meta). ``meta["start_epoch"]`` is ``epoch + 1`` exactly
        (fixes B18's double increment); for finetune it is 0.
    """
    checkpoint_file = Path(checkpoint_file)
    meta = read_checkpoint_meta(checkpoint_file)
    check_same_corpus(meta, expected_num_seqs, finetune, checkpoint_file,
                      expected_fingerprint)
    with np.load(checkpoint_file) as z:
        leaves = [z[f"leaf_{i}"] for i in range(meta["num_leaves"])]

    with_path, treedef = jax.tree_util.tree_flatten_with_path(template_state)
    if len(leaves) != len(with_path):
        raise ValueError(
            f"Checkpoint has {len(leaves)} leaves; current model/optimizer "
            f"defines {len(with_path)} — architecture mismatch."
        )
    adapted = []
    for i, ((path, tmpl), saved) in enumerate(zip(with_path, leaves)):
        t_shape = tuple(np.shape(tmpl))
        if tuple(saved.shape) != t_shape:
            path_str = "/".join(str(p) for p in path)
            # mu2 row-count mismatches are layout, not architecture: the
            # table (and its optimizer moments) may be padded to a multiple
            # of a mesh's model axis. Slice padding off / pad zero rows on
            # so checkpoints are interchangeable across mesh shapes.
            if mu2_rows_adaptable(path_str, saved.shape, t_shape):
                saved = _adapt_rows(saved, t_shape[0])
            else:
                raise ValueError(
                    f"Leaf {i} ({path_str}) shape mismatch: checkpoint "
                    f"{saved.shape} vs model {t_shape}"
                )
        adapted.append(saved)
    # PRNG keys need their original dtype semantics. Template dtypes come
    # from the ATTRIBUTE (np.asarray on a template leaf would fetch it to
    # host — and fail outright on multi-host sharded leaves)
    cast = [
        np.asarray(s, dtype=(t.dtype if hasattr(t, "dtype")
                             else np.asarray(t).dtype))
        for s, (_, t) in zip(adapted, with_path)
    ]
    state = jax.tree_util.tree_unflatten(treedef, cast)

    if finetune:
        state = TrainState(
            params=state.params,
            opt_state=template_state.opt_state,
            step=template_state.step,
            rng=template_state.rng,
        )
    return state, finalize_load_meta(meta, finetune)


def _epoch_of(path: Path) -> int:
    """Parse the epoch number from ``<...>_e<N>.<ext>``. Mid-epoch cadence
    checkpoints (``_e<N>s<B>``) and unparseable names return -1 — epoch
    listings must not surface partial-epoch state as an epoch."""
    stem = path.name
    for suffix in (".npz", ".orbax"):
        if stem.endswith(suffix):
            stem = stem[: -len(suffix)]
    try:
        return int(stem.rsplit("_e", 1)[1])
    except (IndexError, ValueError):
        return -1


def find_best_checkpoint(exp_dir: str | Path) -> Path:
    """Locate the best-model checkpoint (eval_model.py:50-53 parity).

    Handles both backends: the npz copy ``best_model_*.npz`` (latest by
    epoch *number* — lexicographic order misranks e9 vs e12) or the orbax
    ``best_model_pointer.json`` pointer.
    """
    exp_dir = Path(exp_dir)
    matches = sorted(exp_dir.glob("best_model_*.npz"), key=_epoch_of)
    if matches:
        # several runs may share a directory (filenames embed the run);
        # "the best" is ambiguous across runs and silently returning the
        # highest-epoch one could evaluate the wrong model
        prefixes = {m.name.rsplit("_e", 1)[0] for m in matches}
        if len(prefixes) > 1:
            raise ValueError(
                f"{exp_dir} holds best-model checkpoints from "
                f"{len(prefixes)} different runs ({sorted(prefixes)}); "
                f"pass the checkpoint path explicitly"
            )
        return matches[-1]
    pointer = exp_dir / "best_model_pointer.json"
    if pointer.exists():
        target = Path(json.loads(pointer.read_text())["path"])
        if target.exists():
            return target
        # the pointer sidecar is written when the async orbax save is
        # *staged*; a crash before the commit can leave it dangling. Self-heal
        # by falling back to the latest committed epoch checkpoint OF THE
        # SAME RUN — several runs may share a directory, and another run's
        # params must never be silently resumed.
        run_prefix = target.name.rsplit("_e", 1)[0]
        # mid-epoch cadence dirs (_e<N>s<B>.orbax, _epoch_of == -1) are
        # excluded: they are never best-model candidates, and with several
        # on disk the -1 tie would make glob order pick one arbitrarily
        committed = sorted(
            (p for p in exp_dir.glob(f"{run_prefix}_e*.orbax")
             if _epoch_of(p) >= 0),
            key=_epoch_of)
        if committed:
            import warnings

            # the latest committed SIDECAR records which epoch was best at
            # that point — fall back to THAT checkpoint when it committed,
            # not blindly to the newest one (the newest epoch may be a
            # known-worse model; only the dangling new-best never landed)
            pick = committed[-1]
            sidecar = pick.with_suffix(".json")
            if sidecar.exists():
                try:
                    best_e = int(json.loads(
                        sidecar.read_text()).get("best_epoch", -1))
                except (ValueError, json.JSONDecodeError):
                    best_e = -1
                by_epoch = {_epoch_of(p): p for p in committed}
                if best_e in by_epoch:
                    pick = by_epoch[best_e]
            warnings.warn(
                f"best_model_pointer.json points at {target} which never "
                f"committed (interrupted async save); falling back to the "
                f"best committed checkpoint {pick}"
            )
            return pick
    raise FileNotFoundError(f"No best-model checkpoint under {exp_dir}")


def find_epoch_checkpoint(exp_dir: str | Path, step: int) -> Path:
    """The ``step``-th epoch checkpoint in epoch-number order (negative
    indices count from the end, python-style).

    Like :func:`find_best_checkpoint`, refuses a directory holding
    several runs' checkpoints: epoch-number order interleaves them (equal
    epochs tie on glob order), silently returning an arbitrary run's
    model."""
    exp_dir = Path(exp_dir)
    matches = sorted(
        (p for p in exp_dir.glob("*_e*.npz")
         if not p.name.startswith("best_model_") and _epoch_of(p) >= 0),
        key=_epoch_of,
    )
    if not matches:
        matches = sorted((p for p in exp_dir.glob("*_e*.orbax")
                          if _epoch_of(p) >= 0), key=_epoch_of)
    if not matches:
        raise FileNotFoundError(f"No epoch checkpoints under {exp_dir}")
    prefixes = {m.name.rsplit("_e", 1)[0] for m in matches}
    if len(prefixes) > 1:
        raise ValueError(
            f"{exp_dir} holds epoch checkpoints from {len(prefixes)} "
            f"different runs ({sorted(prefixes)}); pass the checkpoint "
            f"path explicitly")
    return matches[step]
