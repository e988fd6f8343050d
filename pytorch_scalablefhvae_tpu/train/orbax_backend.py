"""Orbax checkpoint backend (optional).

The default checkpoint format is the self-contained npz+JSON of
``train/checkpoint.py``. For production TPU runs this backend offers
orbax-checkpoint's async, per-shard save path (device-to-storage without
gathering to one host) — select with ``TrainConfig.ckpt_backend = "orbax"``.
The sidecar JSON metadata (epoch/best/history) is shared with the npz
backend so tooling reads either.

Saves are genuinely asynchronous: one long-lived checkpointer stages the
arrays and returns; the training loop keeps stepping while the write
completes in the background (orbax serializes overlapping saves itself).
Call :func:`wait_for_saves` to flush — the training loop does so once at
loop end, and loads flush implicitly.

Like the npz backend, a mu2 table whose row count was padded for a mesh's
model axis is adapted on load (sliced/zero-padded to the template's rows),
so checkpoints are interchangeable across mesh shapes; the saved row count
travels in the sidecar (``table_rows``).
"""

from __future__ import annotations

import json
from pathlib import Path

import jax
import numpy as np

from pytorch_scalablefhvae_tpu.train.checkpoint import _adapt_rows
from pytorch_scalablefhvae_tpu.train.step import TrainState

_SCHEMA_VERSION = 1
_CHECKPOINTER = None


def _checkpointer():
    """One long-lived checkpointer: keeps async saves alive across calls and
    lets orbax serialize overlapping saves."""
    global _CHECKPOINTER
    if _CHECKPOINTER is None:
        import orbax.checkpoint as ocp

        _CHECKPOINTER = ocp.StandardCheckpointer()
    return _CHECKPOINTER


def wait_for_saves() -> None:
    """Block until every in-flight async save has committed to disk."""
    if _CHECKPOINTER is not None:
        _CHECKPOINTER.wait_until_finished()


def save_checkpoint_orbax(
    checkpoint_dir: str | Path,
    state: TrainState,
    *,
    model_type: str,
    run_info: str,
    epoch: int,
    meta: dict,
    suffix: str = "",
) -> Path:
    """``suffix`` marks mid-epoch step-cadence checkpoints
    (``_e<epoch>s<batches>``); those never update the best pointer."""
    checkpoint_dir = Path(checkpoint_dir)
    checkpoint_dir.mkdir(parents=True, exist_ok=True)
    name = f"{model_type}_{run_info}_e{epoch}{suffix}"
    path = (checkpoint_dir / f"{name}.orbax").resolve()
    ckptr = _checkpointer()
    ckptr.save(path, state, force=True)  # async: returns once staged
    if jax.process_index() != 0:
        # multihost: every process participates in the array save above
        # (each writes its addressable shards), but the JSON sidecar and
        # best pointer are host files — exactly one writer
        return path
    meta_out = dict(meta, schema_version=_SCHEMA_VERSION, backend="orbax", epoch=epoch)
    table = state.params.get("mu2_table") if isinstance(state.params, dict) else None
    if table is not None:
        meta_out["table_rows"] = int(np.shape(table)[0])
    (checkpoint_dir / f"{name}.json").write_text(json.dumps(meta_out, indent=2))
    if meta.get("best_epoch") == epoch and not suffix:
        # pointer instead of the npz backend's file copy (orbax checkpoints
        # are directories); find_best_checkpoint resolves it
        (checkpoint_dir / "best_model_pointer.json").write_text(
            json.dumps({"path": str(path), "epoch": epoch})
        )
    return path


def _saved_mu2_rows(ckptr, path) -> int | None:
    """Read the mu2 table's saved row count from orbax's array metadata."""
    try:
        md = ckptr.metadata(path).item_metadata
        for p, leaf in jax.tree_util.tree_flatten_with_path(md)[0]:
            path_str = "/".join(str(x) for x in p)
            if "mu2_table" in path_str:
                shape = getattr(leaf, "shape", None)
                if shape is not None and len(shape) == 2:
                    return int(shape[0])
    except Exception as e:  # orbax metadata API drift / IO failure
        import warnings

        warnings.warn(
            f"Could not read orbax array metadata for {path} ({e}); "
            f"falling back to sidecar table_rows/num_seqs hints"
        )
    return None


def load_checkpoint_orbax(
    checkpoint_path: str | Path,
    template_state: TrainState,
    finetune: bool = False,
    expected_num_seqs: int | None = None,
    expected_fingerprint: str | None = None,
) -> tuple[TrainState, dict]:
    wait_for_saves()  # the checkpoint may still be committing
    checkpoint_path = Path(checkpoint_path).resolve()
    if not checkpoint_path.exists():
        # orbax commits atomically (tmp dir + rename), so a sidecar without
        # its .orbax directory means the process died mid-save. Self-heal:
        # fall back to the latest committed epoch checkpoint in the same
        # experiment directory instead of making the human pick one
        # (ADVICE r02 / VERDICT r03 item 8).
        # only consider checkpoints from the SAME run: filenames are
        # {model_type}_{run_info}_e{epoch}.orbax, and several runs may
        # share one directory — falling back to another run's params
        # would silently resume the wrong model
        run_prefix = checkpoint_path.name.rsplit("_e", 1)[0]

        def _ckpt_order(p: Path):
            # rank by training progress: (epoch, batches). A mid-epoch
            # cadence checkpoint e5s300 is NEWER than epoch e4 but older
            # than the committed e5 (whose own commit supersedes its
            # mids, hence the +inf batches key). Keying raw _epoch_of
            # would tie every mid at -1 and let glob order pick one.
            import re

            m = re.search(r"_e(\d+)(?:s(\d+))?\.orbax$", p.name)
            if not m:
                return (-1, -1)
            return (int(m.group(1)),
                    int(m.group(2)) if m.group(2) else 1 << 62)

        committed = sorted(
            (p for p in checkpoint_path.parent.glob(f"{run_prefix}_e*.orbax")
             if p.exists() and p != checkpoint_path
             and _ckpt_order(p) >= (0, 0)),
            key=_ckpt_order,
        )
        if not committed:
            raise FileNotFoundError(
                f"Checkpoint {checkpoint_path} has no committed orbax "
                f"directory — the save was likely interrupted "
                f"(crash/preemption before the async commit finished) — "
                f"and no earlier committed checkpoint of the same run "
                f"exists to fall back to."
            )
        import warnings

        warnings.warn(
            f"Checkpoint {checkpoint_path} never committed (interrupted "
            f"async save); falling back to the latest committed "
            f"checkpoint {committed[-1]}"
        )
        checkpoint_path = committed[-1]
    meta = json.loads(
        checkpoint_path.with_suffix(".json").read_text()
    )
    from pytorch_scalablefhvae_tpu.train.checkpoint import check_same_corpus

    check_same_corpus(meta, expected_num_seqs, finetune, checkpoint_path,
                      expected_fingerprint)
    ckptr = _checkpointer()
    # the saved (possibly mesh-padded) mu2 row count: orbax's own array
    # metadata is authoritative and works for any sidecar vintage; the
    # sidecar's table_rows/num_seqs keys are the fallback
    saved_rows = _saved_mu2_rows(ckptr, checkpoint_path)
    if saved_rows is None:
        saved_rows = meta.get("table_rows", meta.get("num_seqs"))

    def abstract_leaf(path, x):
        shape = tuple(np.shape(x))
        path_str = "/".join(str(p) for p in path)
        if (
            saved_rows is not None
            and "mu2_table" in path_str
            and len(shape) == 2
            and shape[0] != saved_rows
        ):
            shape = (saved_rows, shape[1])
        # read the dtype ATTRIBUTE, never np.asarray(x): that fetches the
        # whole leaf to host — a full-model D2H transfer for dtypes alone,
        # and a hard RuntimeError on multi-host sharded leaves (the mu2
        # table spans non-addressable devices there)
        dtype = x.dtype if hasattr(x, "dtype") else np.asarray(x).dtype
        return jax.ShapeDtypeStruct(shape, dtype)

    abstract = jax.tree_util.tree_map_with_path(abstract_leaf, template_state)
    state = ckptr.restore(checkpoint_path, abstract)

    from pytorch_scalablefhvae_tpu.train.checkpoint import (
        finalize_load_meta,
        mu2_rows_adaptable,
    )

    def adapt(path, saved, tmpl):
        t_shape = tuple(np.shape(tmpl))
        if tuple(np.shape(saved)) != t_shape:
            path_str = "/".join(str(p) for p in path)
            # ONLY mu2 row-count mismatches are layout, not architecture
            # (mesh-axis padding); any other shape drift is a real mismatch
            # and must raise rather than silently slice/pad (the shared
            # checkpoint.mu2_rows_adaptable guard, same as the npz loader)
            if mu2_rows_adaptable(path_str, tuple(np.shape(saved)), t_shape):
                return _adapt_rows(np.asarray(saved), t_shape[0])
            raise ValueError(
                f"Leaf {path_str} shape mismatch: checkpoint "
                f"{tuple(np.shape(saved))} vs model {t_shape}"
            )
        return saved

    state = jax.tree_util.tree_map_with_path(adapt, state, template_state)
    if finetune:
        state = TrainState(
            params=state.params,
            opt_state=template_state.opt_state,
            step=template_state.step,
            rng=template_state.rng,
        )
    return state, finalize_load_meta(meta, finetune)
