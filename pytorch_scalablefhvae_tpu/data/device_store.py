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

# zero rows appended to single-device staged packs: the chunked-DMA window
# gather (ops/window_gather_pallas.py) reads whole ``(spb-1)*shift +
# seg_len`` regions whose tail may extend past the last sequence's frames;
# the slack keeps those region DMAs in-bounds (the overhanging windows
# carry weight 0 and are never consumed). 256 rows cover any
# ``(spb-1)*seg_shift + seg_len <= 256`` — e.g. spb=16 at the default
# shift 8 up to seg_len 136; make_device_map_pass_chunked raises when a
# configuration would exceed it. Mesh-staged packs skip the slack: the
# chunked pass is single-device only (the rows/array-plan passes gather
# per window, never past a sequence's span).
STORE_TAIL_SLACK = 256


def staging_itemsize(store_dtype: str) -> int:
    """Bytes per element a staged store ships/holds for ``store_dtype``
    ("float32" | "bfloat16" | "int8"). The ONE definition every budget
    computation uses (placement resolution, stream chunking, round
    ceilings, verbose MB prints, bench) — drifted copies mis-budget HBM
    and silently pick the wrong data tier."""
    return {"bfloat16": 2, "int8": 1}.get(store_dtype, 4)


@dataclass
class EpochPlan:
    """Host-side segment schedule for one epoch (uploaded once per epoch).

    ``seq_idx``/``abs_starts`` are padded to a whole number of batches; rows
    at positions >= ``n_real`` are padding (sequence 0, frame 0) and receive
    weight 0 inside the compiled step.

    With device-side planning (:func:`make_device_epoch_plan`) the index
    arrays never exist on the host; :meth:`meta` carries only the
    bookkeeping (``n_real``/``n_rows``/``batch_size``) the loop needs.
    """

    seq_idx: np.ndarray | None  # [Npad] int32 — mu2-table row per segment
    abs_starts: np.ndarray | None  # [Npad] int32 — abs frame offset in pack
    n_real: int
    batch_size: int
    n_rows: int | None = None  # defaults to len(seq_idx)

    @property
    def n_batches(self) -> int:
        rows = self.n_rows if self.n_rows is not None else len(self.seq_idx)
        return rows // self.batch_size

    @classmethod
    def meta(cls, n_real: int, batch_size: int) -> "EpochPlan":
        """Bookkeeping-only plan for device-side planning: the loop
        dispatches ``ceil(n_real / batch_size)`` batches; rows past
        ``n_real`` (always at the tail — the in-graph shuffle keeps padding
        keys strictly above every real key) carry weight 0."""
        rows = n_real + (-n_real) % batch_size
        return cls(seq_idx=None, abs_starts=None, n_real=n_real,
                   batch_size=batch_size, n_rows=rows)

    def batch_real_counts(self) -> list[int]:
        """Per-batch real-row counts (for seg/s accounting)."""
        counts = []
        for b in range(self.n_batches):
            lo = b * self.batch_size
            counts.append(int(np.clip(self.n_real - lo, 0, self.batch_size)))
        return counts


def build_epoch_plan(
    dataset: SegmentDataset, order: np.ndarray, batch_size: int,
    pad_rows: int | None = None,
) -> EpochPlan:
    """Materialize the epoch's segment schedule from a permutation.

    ``order`` must be the SAME permutation the host loader would use
    (``SegmentLoader._order()``), so the device-resident path trains on an
    identical batch sequence — the equivalence tests rely on it.

    ``pad_rows``: pad the index ARRAYS to this fixed length (a per-run
    ceiling) while ``n_batches`` still covers only ``ceil(n_real / B)``
    batches. Hierarchical rounds have varying subset sizes; without the
    ceiling every new plan length re-specializes the compiled device step.
    """
    seq_idx = dataset.seq_idx[order].astype(np.int32)
    starts = dataset.starts[order].astype(np.int64)
    abs_starts = (dataset.store.seq_starts[seq_idx] + starts).astype(np.int32)
    n_real = len(order)
    rows = n_real + (-n_real) % batch_size
    target = pad_rows if pad_rows is not None else rows
    if target < rows:
        # the index arrays must cover every row the n_batches slices read:
        # shorter arrays make dynamic_slice clamp its start, silently
        # training some segments twice and skipping others
        raise ValueError(
            f"pad_rows={pad_rows} < batch-rounded row count {rows} "
            f"(n_real={n_real}, batch_size={batch_size})")
    pad = target - n_real
    if pad:
        seq_idx = np.concatenate([seq_idx, np.zeros(pad, np.int32)])
        abs_starts = np.concatenate([abs_starts, np.zeros(pad, np.int32)])
    return EpochPlan(seq_idx=seq_idx, abs_starts=abs_starts, n_real=n_real,
                     batch_size=batch_size, n_rows=rows)


def make_device_epoch_plan(n_seqs: int, n_rows: int, seg_shift: int,
                           mesh=None, shuffle: bool = True):
    """In-graph epoch planner: derive the shuffled segment schedule on device.

    The host-side :func:`build_epoch_plan` uploads O(segments) of int32
    indices every epoch (and every hierarchical round). For deterministic
    windowing the whole schedule is a pure function of per-sequence metadata
    — ``abs_start(seq s, window k) = seq_starts[s] + k * seg_shift`` — so
    this planner computes it inside one compiled program from two ``[S]``
    vectors plus a PRNG key: the recurring host->device traffic for a
    device-resident epoch drops to one key (the per-sequence vectors are
    round-invariant, and under hierarchical sampling they are the SAME two
    vectors the MAP pass already uploads). TPU-native replacement for the
    host ``DataLoader`` shuffle (train_model.py:379-395 semantics: any
    uniform permutation is a valid epoch order).

    Returns a jitted ``plan_fn(key, seq_starts, nsegs, n_real) ->
    (seq_idx [n_rows] i32, abs_starts [n_rows] i32)`` with:

    - ``seq_starts``/``nsegs``: ``[n_seqs]`` int32 per-sequence metadata
      (absolute first-frame offset in the staged pack; window count);
    - ``n_real`` (traced int32): total real segments, ``sum(nsegs)`` —
      positions ``>= n_real`` are padding (sequence 0, frame 0), and the
      shuffle keeps them at the tail: real rows draw 64-bit sort keys
      (major word clamped below ``0xffffffff``), padding rows the
      strictly-larger ``(0xffffffff, ...)``, so no real segment can land
      in the weight-0 tail region. Two key words because a single 32-bit
      key has ~2e5 expected collisions at 43M rows, and a stable argsort
      would resolve every tie to sequence-major order — a systematic bias
      toward same-sequence adjacency; at 64 bits collisions are ~1e-4
      per epoch and resolve arbitrarily;
    - ``n_rows`` (static): the padded plan length — a per-run ceiling, so
      hierarchical rounds of varying subset size reuse ONE compiled plan.

    Only deterministic windowing is supported (``rand_seg`` draws starts on
    the host); callers gate on ``dataset.rand_seg``.
    """
    import jax
    import jax.numpy as jnp

    def plan_fn(key, seq_starts, nsegs, n_real):
        g = jnp.arange(n_rows, dtype=jnp.int32)
        # segment g -> its sequence: repeat pads with the LAST value past
        # sum(nsegs), so padding rows are masked to (0, 0) below
        seq_of = jnp.repeat(jnp.arange(n_seqs, dtype=jnp.int32), nsegs,
                            total_repeat_length=n_rows)
        offs = jnp.cumsum(nsegs) - nsegs  # exclusive prefix
        win = g - offs[seq_of]
        abs_starts = seq_starts[seq_of] + win * jnp.int32(seg_shift)
        real = g < n_real
        seq_of = jnp.where(real, seq_of, 0)
        abs_starts = jnp.where(real, abs_starts, 0)
        if shuffle:
            hi = jax.random.bits(key, (n_rows,), jnp.uint32)
            hi = jnp.where(real, jnp.minimum(hi, jnp.uint32(0xFFFFFFFE)),
                           jnp.uint32(0xFFFFFFFF))
            lo = jax.random.bits(jax.random.fold_in(key, 1), (n_rows,),
                                 jnp.uint32)
            # one lexicographic sort by (hi, lo) carrying the plan as
            # payload — no separate argsort + takes
            _, _, seq_of, abs_starts = jax.lax.sort(
                (hi, lo, seq_of, abs_starts), num_keys=2)
        return seq_of, abs_starts

    if mesh is None:
        return jax.jit(plan_fn)
    from jax.sharding import NamedSharding, PartitionSpec as P

    repl = NamedSharding(mesh, P())
    return jax.jit(plan_fn, out_shardings=(repl, repl))


class DeviceDataSource:
    """The packed store staged on device, plus per-epoch plan uploads.

    One instance per training run. Hierarchical sampling composes for free:
    round subsets share the full pack's buffer (FeatureStore.subset is a
    zero-copy view), so their plans' absolute offsets index the SAME staged
    array — only the tiny nsegs table and plan change per round.
    """

    def __init__(self, store, mesh=None, shard_store: bool = False,
                 store_dtype: str = "float32", pad_to_rows: int | None = None):
        """``pad_to_rows``: minimum row count of the staged buffer. Per-round
        subset staging (hierarchical rounds on packs larger than HBM) stages
        a DIFFERENT sub-pack every round; padding them all to one fixed
        ceiling keeps the compiled train/MAP programs' store shape static
        across rounds. Raises if the store needs more rows than the ceiling.
        """
        import jax

        self.mesh = mesh
        self.shard_store = bool(shard_store and mesh is not None
                                and mesh.shape["model"] > 1)
        data = store.data
        if store_dtype == "bfloat16":
            import ml_dtypes

            dtype = np.dtype(ml_dtypes.bfloat16)
        elif store_dtype == "int8":
            # per-column affine uint8 (data/quantize.py — Kaldi
            # CompressedMatrix semantics): 4x staging capacity vs float32;
            # the train step dequantizes in-graph after the gather
            dtype = np.dtype(np.uint8)
        else:
            dtype = data.dtype
        # tail slack for chunked region DMAs (single-device only: the
        # chunked pass does not run under a mesh, see STORE_TAIL_SLACK)
        slack = STORE_TAIL_SLACK if mesh is None else 0
        total = data.shape[0] + slack
        if pad_to_rows is not None:
            if total > pad_to_rows:
                raise ValueError(
                    f"staged store needs {total} rows (incl. slack) but "
                    f"pad_to_rows={pad_to_rows}; raise the ceiling")
            total = pad_to_rows
        if self.shard_store:
            m = mesh.shape["model"]
            total += (-total) % m
        # ONE allocation + ONE copy for slack/row padding and the optional
        # dtype cast — chained np.concatenate would transiently hold two
        # full pack copies (at LibriSpeech-960 scale the pack is ~110 GB)
        quant = None
        if store_dtype == "int8":
            from pytorch_scalablefhvae_tpu.data.quantize import (
                quantize_columns,
            )

            q, scale, offset = quantize_columns(data)
            buf = np.zeros((total, data.shape[1]), dtype)
            buf[: data.shape[0]] = q  # pad rows: byte 0 = column minimum;
            data = buf                # never addressed by real plan rows
            quant = (scale, offset)
        elif total != data.shape[0] or dtype != data.dtype:
            buf = np.zeros((total, data.shape[1]), dtype)
            buf[: data.shape[0]] = data  # pad rows stay zero: never
            data = buf                   # addressed by real plan rows
        repl = None
        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P

            repl = NamedSharding(mesh, P())

        def put(arr, sharding=None):
            return (jax.device_put(arr, sharding) if sharding is not None
                    else jax.device_put(np.asarray(arr)))

        if self.shard_store:
            rows_dev = put(data, NamedSharding(mesh, P("model", None)))
        else:
            rows_dev = put(data, repl)
        if quant is not None:
            # the tiny (scale, offset) legs replicate across the mesh
            self.data = (rows_dev, put(quant[0], repl), put(quant[1], repl))
        else:
            self.data = rows_dev
        self._plan_sharding = repl

    def _put(self, arr):
        import jax

        if self._plan_sharding is not None:
            return jax.device_put(arr, self._plan_sharding)
        return jax.device_put(arr)

    def stage_epoch(self, dataset: SegmentDataset, order: np.ndarray,
                    batch_size: int, pad_rows: int | None = None,
                    pad_seqs: int | None = None):
        """Upload one epoch's plan; returns (plan, device arrays).

        Device arrays: ``(seq_idx [Npad], abs_starts [Npad], nsegs_tab [S])``
        — a few bytes per segment, the only recurring host->device traffic.
        ``pad_seqs`` zero-pads the nsegs table (per-round subset staging:
        one static table shape across trimmed rounds).
        """
        plan = build_epoch_plan(dataset, order, batch_size, pad_rows=pad_rows)
        nsegs = dataset.nsegs.astype(np.float32)
        if pad_seqs is not None and pad_seqs > len(nsegs):
            nsegs = np.concatenate(
                [nsegs, np.zeros(pad_seqs - len(nsegs), np.float32)])
        dev = (
            self._put(plan.seq_idx),
            self._put(plan.abs_starts),
            self._put(nsegs),
        )
        return plan, dev

    def stage_meta(self, dataset: SegmentDataset, pad_seqs: int | None = None):
        """Upload the O(S) per-sequence metadata device-side planning needs:
        ``(seq_starts i32, nsegs i32, nsegs f32)``. Round-invariant — one
        upload per (sub)dataset, shared by every epoch's plan derivation
        (and by the hierarchical MAP pass, which takes the same vectors).

        ``pad_seqs``: zero-pad the vectors to this length — per-round subset
        staging trims oversized draws, and the compiled planner/MAP programs
        need ONE static sequence-count across rounds (nsegs-0 padding rows
        contribute no segments and accumulate nothing)."""
        starts = dataset.store.seq_starts.astype(np.int32)
        nsegs = np.asarray(dataset.nsegs)
        if pad_seqs is not None and pad_seqs > len(nsegs):
            pad = pad_seqs - len(nsegs)
            starts = np.concatenate([starts, np.zeros(pad, np.int32)])
            nsegs = np.concatenate([nsegs, np.zeros(pad, nsegs.dtype)])
        return (
            self._put(starts),
            self._put(nsegs.astype(np.int32)),
            self._put(nsegs.astype(np.float32)),
        )


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
    itemsize = staging_itemsize(store_dtype)
    nbytes = store.data.shape[0] * store.dim * itemsize
    budget = max_bytes
    if mesh is not None and shard_store:
        budget = max_bytes * mesh.shape["model"]
    if placement == "device":
        if nbytes > budget:
            # fail here with a configuration error instead of an opaque
            # device-OOM later inside jax.device_put
            raise ValueError(
                f"data_placement=device but the packed store is "
                f"{nbytes / 2**30:.2f} GiB, over the "
                f"{budget / 2**30:.2f} GiB device-store budget — raise "
                f"--device-store-max-bytes (or shard the store over a "
                f"model axis / use --transfer-dtype bfloat16 staging), "
                f"or use data_placement=auto/host")
        return True
    if placement == "auto":
        return nbytes <= budget
    raise ValueError(f"Unknown data_placement {placement!r}")
