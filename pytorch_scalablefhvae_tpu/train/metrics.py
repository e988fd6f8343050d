"""Metric recording: JSONL history + optional TensorBoard.

Observability parity with the reference's logger layer (logger.py:13-101 —
Visdom/TensorBoard plots of train loss, val loss, lower bound, discriminative
loss, with history replay on resume) plus the per-term ELBO summaries the
reference collected but never reported (defect B12). Visdom itself is
obsolete; the structured JSONL stream plus TensorBoard covers both consumers.
"""

from __future__ import annotations

import json
from pathlib import Path
from typing import Mapping

# metric-history keys, reference train_model.py:505-510 parity
HISTORY_KEYS = (
    "train_loss_results",
    "val_loss_results",
    "lower_bound_results",
    "discrim_loss_results",
)


class MetricHistory:
    """Per-epoch metric history (the reference's ``values`` dict, B11 fixed:
    one consistent structure, JSON-serializable, epoch-keyed)."""

    def __init__(self, values: Mapping[str, Mapping] | None = None):
        self.values: dict[str, dict[int, float]] = {k: {} for k in HISTORY_KEYS}
        if values:
            for k in HISTORY_KEYS:
                for ep, v in values.get(k, {}).items():
                    self.values[k][int(ep)] = float(v)

    def record(self, epoch: int, train_loss: float, val_loss: float,
               lower_bound: float, discrim_loss: float) -> None:
        self.values["train_loss_results"][epoch] = float(train_loss)
        self.values["val_loss_results"][epoch] = float(val_loss)
        self.values["lower_bound_results"][epoch] = float(lower_bound)
        self.values["discrim_loss_results"][epoch] = float(discrim_loss)

    def to_json_dict(self) -> dict:
        return {k: {str(ep): v for ep, v in d.items()} for k, d in self.values.items()}


class MetricWriter:
    """Writes one JSONL record per epoch (and optional TensorBoard scalars)."""

    def __init__(
        self,
        exp_dir: str | Path,
        run_id: str,
        tensorboard: bool = False,
        tb_log_dir: str | Path = "./visualize/tensorboard",
        log_params: bool = False,
    ):
        self.exp_dir = Path(exp_dir)
        self.exp_dir.mkdir(parents=True, exist_ok=True)
        self.jsonl_path = self.exp_dir / "metrics.jsonl"
        self.run_id = run_id
        self.log_params = log_params
        self._tb = None
        if tensorboard:
            try:
                from torch.utils.tensorboard import SummaryWriter

                Path(tb_log_dir).mkdir(parents=True, exist_ok=True)
                self._tb = SummaryWriter(str(tb_log_dir))
            except Exception as e:  # pragma: no cover - optional dependency
                print(f"TensorBoard unavailable ({e}); falling back to JSONL only")

    def write_epoch(self, epoch: int, scalars: Mapping[str, float], params=None,
                    grads=None) -> None:
        import math

        rec = {"epoch": epoch, "run_id": self.run_id}
        # non-finite values serialize as null: json.dumps' default NaN
        # token is invalid JSON for strict consumers (jq, JSON.parse)
        rec.update({k: (float(v) if math.isfinite(float(v)) else None)
                    for k, v in scalars.items()})
        with open(self.jsonl_path, "a") as f:
            f.write(json.dumps(rec) + "\n")
        if self._tb is not None:
            for k, v in scalars.items():
                self._tb.add_scalar(f"{self.run_id}/{k}", float(v), epoch + 1)
            if self.log_params and params is not None:
                self._write_histograms("", params, epoch)
            if self.log_params and grads is not None:
                # per-parameter GRADIENT histograms (logger.py:80-86 parity)
                self._write_histograms("grads/", grads, epoch)
            self._tb.flush()

    def _write_histograms(self, prefix: str, tree, epoch: int) -> None:
        import jax
        import numpy as np

        for path, leaf in jax.tree_util.tree_flatten_with_path(tree)[0]:
            tag = prefix + "/".join(str(p) for p in path).replace("'", "")
            self._tb.add_histogram(tag, np.asarray(leaf).ravel(), epoch + 1)

    # history key -> the live per-epoch scalar tag it corresponds to, so
    # resumed curves continue the same TensorBoard series
    _HISTORY_TO_SCALAR = {
        "train_loss_results": "train_loss",
        "val_loss_results": "val_loss",
        "lower_bound_results": "val_lower_bound",
        "discrim_loss_results": "val_log_qy",
    }

    def replay_history(self, history: MetricHistory, up_to_epoch: int) -> None:
        """Re-emit prior epochs to TensorBoard on resume
        (logger.py:52-54,88-101 parity)."""
        if self._tb is None:
            return
        for ep in range(up_to_epoch):
            for key, tag in self._HISTORY_TO_SCALAR.items():
                if ep in history.values[key]:
                    self._tb.add_scalar(
                        f"{self.run_id}/{tag}", float(history.values[key][ep]), ep + 1
                    )
        self._tb.flush()

    def close(self) -> None:
        if self._tb is not None:
            self._tb.close()
