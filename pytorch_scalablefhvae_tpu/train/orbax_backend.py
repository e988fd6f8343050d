"""Orbax checkpoint backend (optional).

The default checkpoint format is the self-contained npz+JSON of
``train/checkpoint.py``. For production TPU runs this backend offers
orbax-checkpoint's async, per-shard save path (device-to-storage without
gathering to one host) — select with ``TrainConfig.ckpt_backend = "orbax"``.
The sidecar JSON metadata (epoch/best/history) is shared with the npz
backend so tooling reads either.
"""

from __future__ import annotations

import json
from pathlib import Path

import jax
import numpy as np

from pytorch_scalablefhvae_tpu.train.step import TrainState

_SCHEMA_VERSION = 1


def _checkpointer():
    import orbax.checkpoint as ocp

    return ocp.StandardCheckpointer()


def save_checkpoint_orbax(
    checkpoint_dir: str | Path,
    state: TrainState,
    *,
    model_type: str,
    run_info: str,
    epoch: int,
    meta: dict,
) -> Path:
    checkpoint_dir = Path(checkpoint_dir)
    checkpoint_dir.mkdir(parents=True, exist_ok=True)
    name = f"{model_type}_{run_info}_e{epoch}"
    path = (checkpoint_dir / f"{name}.orbax").resolve()
    ckptr = _checkpointer()
    ckptr.save(path, state, force=True)
    ckptr.wait_until_finished()
    meta_out = dict(meta, schema_version=_SCHEMA_VERSION, backend="orbax", epoch=epoch)
    (checkpoint_dir / f"{name}.json").write_text(json.dumps(meta_out, indent=2))
    if meta.get("best_epoch") == epoch:
        # pointer instead of the npz backend's file copy (orbax checkpoints
        # are directories); find_best_checkpoint resolves it
        (checkpoint_dir / "best_model_pointer.json").write_text(
            json.dumps({"path": str(path), "epoch": epoch})
        )
    return path


def load_checkpoint_orbax(
    checkpoint_path: str | Path,
    template_state: TrainState,
    finetune: bool = False,
) -> tuple[TrainState, dict]:
    checkpoint_path = Path(checkpoint_path).resolve()
    meta = json.loads(
        checkpoint_path.with_suffix(".json").read_text()
    )
    ckptr = _checkpointer()
    abstract = jax.tree_util.tree_map(
        lambda x: jax.ShapeDtypeStruct(np.shape(x), np.asarray(x).dtype), template_state
    )
    state = ckptr.restore(checkpoint_path, abstract)
    if finetune:
        state = TrainState(
            params=state.params,
            opt_state=template_state.opt_state,
            step=template_state.step,
            rng=template_state.rng,
        )
        meta = dict(meta, start_epoch=0, values={}, best_val_lb=-np.inf, best_epoch=0)
    else:
        meta = dict(meta, start_epoch=meta["epoch"] + 1)
    return state, meta
