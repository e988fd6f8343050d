"""Device-resident training data: the packed store staged in HBM.

The host-loader path (data/loader.py) re-ships every ``[B, seg_len, dim]``
batch over the host->device link each epoch — on a link-latency-bound rig
that caps end-to-end throughput ~2-3 orders of magnitude below the compiled
step rate, and even on a healthy PCIe host it is wasted traffic: the packed
:class:`FeatureStore` for a TIMIT-scale corpus (~0.4 GB) fits in a single
chip's HBM outright. This module stages the packed ``[total_frames, dim]``
array on device ONCE per run; each training step then gathers its segments
*inside* the compiled program (``jnp.take`` on the staged store), so per-epoch
host->device traffic drops to one tiny index-plan upload.

Capability mapping: this is a TPU-native replacement for the reference's
``DataLoader(num_workers=4)`` hot path (train_model.py:379-395,443-444) when
the corpus fits device memory; the host loader remains the fallback (and the
only path for legacy per-step epoch emulation).

Placement modes (``DataConfig.data_placement``):

- ``host``: always the host loader;
- ``device``: force the staged store (raises if it cannot be staged);
- ``auto``: staged store iff the packed bytes fit ``device_store_max_bytes``
  (x model-axis size when the store is row-sharded over the mesh).

On a mesh the store is either replicated (default; every device gathers
locally) or row-sharded over the "model" axis (``shard_store=True``): each
shard gathers the rows it owns and a ``psum`` over "model" rebuilds full
segments, still sharded over "data" — O(B/d * seg_len * dim) ICI traffic per
step in exchange for m-fold store capacity (LibriSpeech-960 packed is
~110 GB; 8 x 16 GB HBM holds it).
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

from pytorch_scalablefhvae_tpu.data.segments import SegmentDataset

# zero rows appended to every staged pack: the chunked-DMA window gather
# (ops/window_gather_pallas.py) reads whole ``(spb-1)*shift + seg_len``
# regions whose tail may extend past the last sequence's frames; the slack
# keeps those region DMAs in-bounds (the overhanging windows carry weight 0
# and are never consumed). 256 rows cover spb=16 at any seg_len <= 136.
STORE_TAIL_SLACK = 256


@dataclass
class EpochPlan:
    """Host-side segment schedule for one epoch (uploaded once per epoch).

    ``seq_idx``/``abs_starts`` are padded to a whole number of batches; rows
    at positions >= ``n_real`` are padding (sequence 0, frame 0) and receive
    weight 0 inside the compiled step.
    """

    seq_idx: np.ndarray  # [Npad] int32 — mu2-table row per segment
    abs_starts: np.ndarray  # [Npad] int32 — absolute frame offset in the pack
    n_real: int
    batch_size: int

    @property
    def n_batches(self) -> int:
        return len(self.seq_idx) // self.batch_size

    def batch_real_counts(self) -> list[int]:
        """Per-batch real-row counts (for seg/s accounting)."""
        counts = []
        for b in range(self.n_batches):
            lo = b * self.batch_size
            counts.append(int(np.clip(self.n_real - lo, 0, self.batch_size)))
        return counts


def build_epoch_plan(
    dataset: SegmentDataset, order: np.ndarray, batch_size: int
) -> EpochPlan:
    """Materialize the epoch's segment schedule from a permutation.

    ``order`` must be the SAME permutation the host loader would use
    (``SegmentLoader._order()``), so the device-resident path trains on an
    identical batch sequence — the equivalence tests rely on it.
    """
    seq_idx = dataset.seq_idx[order].astype(np.int32)
    starts = dataset.starts[order].astype(np.int64)
    abs_starts = (dataset.store.seq_starts[seq_idx] + starts).astype(np.int32)
    n_real = len(order)
    pad = (-n_real) % batch_size
    if pad:
        seq_idx = np.concatenate([seq_idx, np.zeros(pad, np.int32)])
        abs_starts = np.concatenate([abs_starts, np.zeros(pad, np.int32)])
    return EpochPlan(seq_idx=seq_idx, abs_starts=abs_starts, n_real=n_real,
                     batch_size=batch_size)


class DeviceDataSource:
    """The packed store staged on device, plus per-epoch plan uploads.

    One instance per training run. Hierarchical sampling composes for free:
    round subsets share the full pack's buffer (FeatureStore.subset is a
    zero-copy view), so their plans' absolute offsets index the SAME staged
    array — only the tiny nsegs table and plan change per round.
    """

    def __init__(self, store, mesh=None, shard_store: bool = False,
                 store_dtype: str = "float32"):
        import jax

        self.mesh = mesh
        self.shard_store = bool(shard_store and mesh is not None
                                and mesh.shape["model"] > 1)
        data = store.data
        if store_dtype == "bfloat16":
            import ml_dtypes

            data = np.asarray(data, dtype=ml_dtypes.bfloat16)
        # tail slack for chunked region DMAs (see STORE_TAIL_SLACK)
        data = np.concatenate(
            [data, np.zeros((STORE_TAIL_SLACK, data.shape[1]), data.dtype)]
        )
        if self.shard_store:
            from jax.sharding import NamedSharding, PartitionSpec as P

            m = mesh.shape["model"]
            pad = (-data.shape[0]) % m
            if pad:
                # zero frames are never addressed by real plan rows
                data = np.concatenate(
                    [data, np.zeros((pad, data.shape[1]), data.dtype)]
                )
            sharding = NamedSharding(mesh, P("model", None))
        elif mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P

            sharding = NamedSharding(mesh, P())
        else:
            sharding = None
        self.data = (jax.device_put(data, sharding) if sharding is not None
                     else jax.device_put(np.asarray(data)))
        self._plan_sharding = None
        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P

            self._plan_sharding = NamedSharding(mesh, P())

    def _put(self, arr):
        import jax

        if self._plan_sharding is not None:
            return jax.device_put(arr, self._plan_sharding)
        return jax.device_put(arr)

    def stage_epoch(self, dataset: SegmentDataset, order: np.ndarray,
                    batch_size: int):
        """Upload one epoch's plan; returns (plan, device arrays).

        Device arrays: ``(seq_idx [Npad], abs_starts [Npad], nsegs_tab [S])``
        — a few bytes per segment, the only recurring host->device traffic.
        """
        plan = build_epoch_plan(dataset, order, batch_size)
        dev = (
            self._put(plan.seq_idx),
            self._put(plan.abs_starts),
            self._put(dataset.nsegs.astype(np.float32)),
        )
        return plan, dev


def resolve_data_placement(
    placement: str,
    store,
    mesh=None,
    shard_store: bool = False,
    max_bytes: int = 4 << 30,
    legacy: bool = False,
    store_dtype: str = "float32",
) -> bool:
    """Decide whether training data lives on device this run.

    ``auto`` stages the store iff its packed bytes fit the budget (scaled by
    the model-axis size when row-sharded). Legacy per-step epoch emulation
    always uses the host loader (its log/break semantics are per-batch).
    """
    if legacy:
        if placement == "device":
            raise ValueError("data_placement=device is incompatible with "
                             "legacy per-step epochs; use host")
        return False
    if placement == "host":
        return False
    itemsize = 2 if store_dtype == "bfloat16" else 4
    nbytes = store.data.shape[0] * store.dim * itemsize
    budget = max_bytes
    if mesh is not None and shard_store:
        budget = max_bytes * mesh.shape["model"]
    if placement == "device":
        return True
    if placement == "auto":
        return nbytes <= budget
    raise ValueError(f"Unknown data_placement {placement!r}")
