"""Streaming device-data tier: chunked double-buffered staging through HBM.

The device-resident path (data/device_store.py) stages the whole packed
store in HBM — the fastest tier, but only when the corpus fits the budget.
BASELINE config 4 (LibriSpeech-960, ~110 GB packed fp32) does not, and the
host-loader fallback re-ships every overlapping ``[B, seg_len, dim]`` window
over the host->device link: at seg_len 20 / shift 8 that is 2.5x the
corpus's unique bytes per epoch, and on a link-bound rig it caps end-to-end
throughput 2-3 orders of magnitude below the compiled step rate
(BENCH_r04: 5,789 seg/s host-fed vs 832,409 device-plan).

This tier splits the difference: the packed store is partitioned into
sequence-aligned CHUNKS small enough that two fit the HBM budget at once.
While the train step consumes chunk c's segments (gathered in-graph from the
staged chunk, exactly like the device-resident path), chunk c+1 stages in
the background — ``jax.device_put`` runs on the host thread against the
device's DMA path while the compute stream drains the previously-enqueued
dispatches. Per epoch the link carries each frame ONCE (plus the chunk
padding), not the 2.5x overlapping windows: the windowing happens on device.

Schedule semantics: chunk visit order is shuffled per epoch and segments are
shuffled WITHIN each chunk — a two-level shuffle rather than the host
loader's global permutation. Any uniform within-chunk permutation is a valid
SGD order for this model family (segments are i.i.d. given the corpus; the
chunk granularity only bounds how far apart two same-sequence segments can
land), and the chunk layout itself is corpus order, not curriculum order.
The trajectory-equivalence test (tests/test_stream_data.py) pins that a
host-fed replay of the SAME schedule produces the identical parameter
trajectory — the tier changes WHERE windows materialize, never the math.

Capability mapping: the reference's scaling intent for corpora beyond memory
is its hierarchical sampling + per-utterance file reads
(/root/reference/datasets.py:155-185, train_model.py:424-436); this tier is
the TPU-native answer for the full-corpus (non-hierarchical) regime, and
composes with the memmap pack cache (data/feature_store.py) so the host side
never needs the corpus in RAM either.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

from pytorch_scalablefhvae_tpu.data.device_store import EpochPlan
from pytorch_scalablefhvae_tpu.data.segments import SegmentDataset


@dataclass(frozen=True)
class ChunkSpec:
    """One sequence-aligned slice of the packed store.

    Sequences (and therefore segments — ``make_segments`` emits them
    sequence-major) are contiguous per chunk, so the chunk's frames are ONE
    contiguous ``[n_frames, dim]`` region of the pack and its segments one
    contiguous range of the dataset's segment index.
    """

    seq_lo: int
    seq_hi: int
    frame_base: int  # global frame offset of seq_lo's first frame
    n_frames: int
    seg_lo: int  # segment-index range [seg_lo, seg_hi) in dataset order
    seg_hi: int

    @property
    def n_segments(self) -> int:
        return self.seg_hi - self.seg_lo


def partition_chunks(lens: np.ndarray, nsegs: np.ndarray, dim: int,
                     itemsize: int, chunk_bytes: int) -> list[ChunkSpec]:
    """Greedy sequence-aligned partition: walk sequences in store order,
    close a chunk when adding the next sequence would exceed ``chunk_bytes``.
    A single sequence larger than the budget raises (it could never stage).
    """
    lens = np.asarray(lens, dtype=np.int64)
    nsegs = np.asarray(nsegs, dtype=np.int64)
    row_bytes = dim * itemsize
    max_rows = max(chunk_bytes // max(row_bytes, 1), 1)
    too_big = int(lens.max(initial=0))
    if too_big > max_rows:
        raise ValueError(
            f"a single sequence has {too_big} frames "
            f"({too_big * row_bytes / 2**20:.1f} MiB) — larger than the "
            f"{chunk_bytes / 2**20:.1f} MiB stream chunk budget; raise "
            f"--stream-chunk-bytes")
    chunks: list[ChunkSpec] = []
    seq_starts = np.concatenate([[0], np.cumsum(lens)])
    seg_starts = np.concatenate([[0], np.cumsum(nsegs)])
    lo = 0
    n = len(lens)
    while lo < n:
        hi = lo
        rows = 0
        while hi < n and rows + lens[hi] <= max_rows:
            rows += int(lens[hi])
            hi += 1
        chunks.append(ChunkSpec(
            seq_lo=lo, seq_hi=hi,
            frame_base=int(seq_starts[lo]), n_frames=rows,
            seg_lo=int(seg_starts[lo]), seg_hi=int(seg_starts[hi]),
        ))
        lo = hi
    return chunks


class StreamingDeviceSource:
    """Double-buffered chunk staging plus per-chunk epoch plans.

    One instance per training run. HBM residency is bounded by ~2 staged
    chunks plus whatever a draining dispatch still references, so the
    caller's budget should leave ~3x ``chunk_bytes`` of headroom: the
    training loop defaults ``chunk_bytes`` to ``device_store_max_bytes //
    4`` (train/loop.py), reserving the remaining quarter for the staged
    dev split.

    All chunk arrays share ONE static shape ``[chunk_rows, dim]`` and all
    plans one static length, so a single compiled train-step program serves
    every chunk of every epoch.
    """

    def __init__(self, dataset: SegmentDataset, chunk_bytes: int,
                 batch_size: int, mesh=None,
                 shard_store: bool = False, store_dtype: str = "float32"):
        import jax

        self._jax = jax
        store = dataset.store
        self.dataset = dataset
        self.mesh = mesh
        self.shard_store = bool(shard_store and mesh is not None
                                and mesh.shape["model"] > 1)
        self.quantized = store_dtype == "int8"
        if store_dtype == "bfloat16":
            import ml_dtypes

            self.dtype = np.dtype(ml_dtypes.bfloat16)
        elif self.quantized:
            # per-column affine uint8, quantized PER CHUNK on the host
            # (data/quantize.py — Kaldi CompressedMatrix semantics): 4x
            # fewer wire bytes than float32; chunk partitions are fixed for
            # the run, so each chunk's (scale, offset) are deterministic and
            # identical every epoch. The step dequantizes in-graph.
            self.dtype = np.dtype(np.uint8)
        else:
            self.dtype = np.dtype(np.float32)
        self.chunks = partition_chunks(
            store.lens, dataset.nsegs, store.dim, self.dtype.itemsize,
            chunk_bytes)
        rows = max(c.n_frames for c in self.chunks)
        if self.shard_store:
            m = mesh.shape["model"]
            rows += (-rows) % m
        self.chunk_rows = rows
        # fixed plan length: every chunk's plan pads to a whole number of
        # batches, so ONE uploaded-array shape serves every chunk of every
        # epoch. (Padding further to B*steps_per_dispatch would not save
        # tail compiles — an all-padding batch still takes an Adam step, so
        # the consumer dispatches only REAL batches and compiles per tail
        # size regardless.)
        segs = max(c.n_segments for c in self.chunks)
        self.plan_rows = segs + (-segs) % batch_size
        self.batch_size = batch_size

        self._sharding = None
        self._plan_sharding = None
        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P

            self._sharding = NamedSharding(
                mesh, P("model", None) if self.shard_store else P())
            self._plan_sharding = NamedSharding(mesh, P())
        # per-sequence nsegs table (global rows), staged once per run
        self.nsegs_tab = self._put_plan(dataset.nsegs.astype(np.float32))
        # int8 tier: per-chunk quantized buffers reused across epochs.
        # BOUNDED: at corpus scale the f32 pack is memmapped
        # (pack_cache_dir), so an unbounded cache would become the
        # dominant heap allocation (a 110 GB pack quantizes to ~27 GB).
        # Past the cap, chunks are re-quantized per stage — deterministic
        # (fixed partitions), pure numpy, and cheap next to the upload.
        self._qcache: dict[int, tuple] = {}
        self._qcache_left = max(4 * int(chunk_bytes), 256 << 20)

    # ---- staging ----

    def _put_plan(self, arr):
        if self._plan_sharding is not None:
            return self._jax.device_put(arr, self._plan_sharding)
        return self._jax.device_put(arr)

    def _stage_chunk(self, spec: ChunkSpec):
        """Start the async host->device transfer of one chunk's frames.

        One host-side allocation + copy handles the dtype cast and the
        fixed-shape row padding (padding rows are never addressed by real
        plan rows). Returns the (not-yet-awaited) device array — for the
        int8 tier, a ``(q, scale, offset)`` tuple (data/quantize.py) whose
        tiny param legs ride the plan sharding.
        """
        data = self.dataset.store.data
        real = data[spec.frame_base : spec.frame_base + spec.n_frames]
        if self.quantized:
            from pytorch_scalablefhvae_tpu.data.quantize import (
                quantize_columns,
            )

            # chunk partitions are fixed for the run and the quant params
            # deterministic, so quantize each chunk ONCE and reuse the
            # uint8 buffer every epoch — up to the cache's byte budget
            # (see __init__; beyond it, re-quantize per stage)
            cached = self._qcache.get(spec.frame_base)
            if cached is None:
                q, scale, offset = quantize_columns(real)
                buf = np.zeros((self.chunk_rows, data.shape[1]), self.dtype)
                buf[: spec.n_frames] = q
                cached = (buf, scale, offset)
                if self._qcache_left >= buf.nbytes:
                    self._qcache[spec.frame_base] = cached
                    self._qcache_left -= buf.nbytes
            buf, scale, offset = cached
            rows = (self._jax.device_put(buf, self._sharding)
                    if self._sharding is not None
                    else self._jax.device_put(buf))
            return (rows, self._put_plan(scale), self._put_plan(offset))
        buf = np.zeros((self.chunk_rows, data.shape[1]), self.dtype)
        buf[: spec.n_frames] = real
        if self._sharding is not None:
            return self._jax.device_put(buf, self._sharding)
        return self._jax.device_put(buf)

    def host_bytes_per_epoch(self) -> int:
        """Link bytes one epoch ships (chunk padding included)."""
        row = self.dataset.store.dim * self.dtype.itemsize
        per_chunk = self.chunk_rows * row
        if self.quantized:  # + the per-column scale/offset f32 legs
            per_chunk += 2 * self.dataset.store.dim * 4
        return per_chunk * len(self.chunks)

    # ---- scheduling ----

    def epoch_schedule(self, epoch_seed: int) -> list[tuple[ChunkSpec, np.ndarray]]:
        """The epoch's deterministic schedule: shuffled chunk visit order,
        with a within-chunk permutation of GLOBAL segment indices per chunk.
        Exposed separately so the trajectory-equivalence test (and mid-epoch
        resume) can re-derive exactly what :meth:`epoch_batches` trains on.
        """
        rng = np.random.default_rng(epoch_seed)
        visit = rng.permutation(len(self.chunks))
        out = []
        for ci in visit:
            c = self.chunks[ci]
            order = c.seg_lo + rng.permutation(c.n_segments)
            out.append((c, order))
        return out

    def _plan_for(self, spec: ChunkSpec, order: np.ndarray) -> tuple[EpochPlan, np.ndarray, np.ndarray]:
        """Chunk plan: GLOBAL sequence rows (the mu2 table is corpus-wide)
        and CHUNK-RELATIVE frame starts, zero-padded to the fixed length."""
        ds = self.dataset
        seq_idx = ds.seq_idx[order].astype(np.int32)
        abs_starts = (ds.store.seq_starts[seq_idx] + ds.starts[order]
                      - spec.frame_base).astype(np.int32)
        n_real = len(order)
        seq_pad = np.zeros(self.plan_rows, np.int32)
        start_pad = np.zeros(self.plan_rows, np.int32)
        seq_pad[:n_real] = seq_idx
        start_pad[:n_real] = abs_starts
        # n_rows reflects the REAL batch count (ceil(n_real / B)) — the
        # arrays are padded further, to the fixed plan_rows, purely so one
        # compiled program serves every chunk; those extra batches are
        # never dispatched (an all-padding batch would still take an Adam
        # step: zero grads decay the moments, moving the params — a step
        # the host path never takes)
        plan = EpochPlan(seq_idx=None, abs_starts=None, n_real=n_real,
                         batch_size=self.batch_size,
                         n_rows=n_real + (-n_real) % self.batch_size)
        return plan, seq_pad, start_pad

    def epoch_batches(self, epoch_seed: int, skip_batches: int = 0):
        """Yield ``(plan, chunk_dev, seq_dev, starts_dev, start_batch)`` per
        chunk, with the NEXT chunk's transfer already dispatched before the
        current one is yielded — staging overlaps the consumer's train
        dispatches.

        ``skip_batches``: mid-epoch resume cursor — chunks whose batches are
        entirely behind it are dropped WITHOUT staging; the first surviving
        chunk carries the within-chunk ``start_batch`` offset.
        """
        schedule = self.epoch_schedule(epoch_seed)

        def stage(item, start_batch):
            spec, order = item
            plan, seq_np, starts_np = self._plan_for(spec, order)
            return (plan, self._stage_chunk(spec),
                    self._put_plan(seq_np), self._put_plan(starts_np),
                    start_batch)

        prev = None
        for spec, order in schedule:
            n_batches = -(-len(order) // self.batch_size)
            if skip_batches >= n_batches:
                skip_batches -= n_batches
                continue
            cur = stage((spec, order), skip_batches)
            skip_batches = 0
            if prev is not None:
                yield prev
            prev = cur
        if prev is not None:
            yield prev


def resolve_data_mode(
    placement: str,
    store,
    mesh=None,
    shard_store: bool = False,
    max_bytes: int = 4 << 30,
    legacy: bool = False,
    store_dtype: str = "float32",
    hierarchical: bool = False,
) -> str:
    """Decide the run's data tier: ``"device"`` (whole store staged),
    ``"stream"`` (chunked double-buffered staging), or ``"host"``.

    ``auto`` picks device iff the packed bytes fit the budget (scaled by the
    model-axis size when row-sharded), else stream — unless the run is
    legacy (per-batch log/break semantics) or hierarchical (round subsets
    re-sample sequences across the whole pack, so chunk streaming does not
    compose), which fall back to host. A hierarchical "host" resolution is
    then upgraded by the training loop to PER-ROUND subset staging when one
    round's sub-pack fits the budget (train/loop.py round_rows_ceiling) —
    the loader stays host-built, but the round's data lives in HBM.
    """
    from pytorch_scalablefhvae_tpu.data.device_store import (
        resolve_data_placement,
    )

    if placement == "stream":
        if legacy:
            raise ValueError("data_placement=stream is incompatible with "
                             "legacy per-step epochs; use host")
        if hierarchical:
            # chunk streaming does not compose with hierarchical sampling
            # (round subsets re-sample sequences across the whole pack), but
            # the hier-native staging tier does: resolve to "host" and the
            # training loop upgrades it to per-round sub-pack staging
            # (train/loop.py round_rows_ceiling), which raises there if even
            # one round's subset cannot fit the budget.
            return "host"
        return "stream"
    if placement == "auto" and not legacy and not hierarchical:
        if resolve_data_placement("auto", store, mesh, shard_store=shard_store,
                                  max_bytes=max_bytes, legacy=legacy,
                                  store_dtype=store_dtype):
            return "device"
        return "stream"
    if placement == "device" and hierarchical and not legacy:
        # an over-budget pack is not a hard config error for hier runs: the
        # unit that must fit is ONE round's sub-pack, checked by the loop's
        # round-staging gate (which raises if it cannot honor the placement)
        if resolve_data_placement("auto", store, mesh, shard_store=shard_store,
                                  max_bytes=max_bytes, legacy=legacy,
                                  store_dtype=store_dtype):
            return "device"
        return "host"
    fits = resolve_data_placement(placement, store, mesh,
                                  shard_store=shard_store,
                                  max_bytes=max_bytes, legacy=legacy,
                                  store_dtype=store_dtype)
    return "device" if fits else "host"
