"""Fixed-shape batch loader with background prefetch.

Replaces the reference's ``torch.utils.data.DataLoader(num_workers=4)``
(train_model.py:379-395) with a TPU-appropriate design:

- every batch has the same static shape ``[B, seg_len, dim]`` (jit retraces
  on shape changes); the final partial batch is padded and carries a weight
  mask so padded rows contribute zero loss;
- a batch is one vectorized gather from the packed :class:`FeatureStore`
  (no per-item file I/O);
- an optional background thread keeps ``prefetch`` batches ready so host
  batch assembly overlaps device compute.
"""

from __future__ import annotations

import queue
import threading
from dataclasses import dataclass
from typing import Iterator

import numpy as np

from pytorch_scalablefhvae_tpu.data.segments import SegmentDataset


@dataclass
class Batch:
    """One fixed-shape training batch.

    Attributes:
        feats:   [B, seg_len, dim] float32
        seq_idx: [B] int32 — mu2-table row of each segment's sequence
        nsegs:   [B] float32 — segment count of the owning sequence
                 (weights log p(mu2) in the ELBO; simple_fhvae.py:116)
        weight:  [B] float32 — 1 for real rows, 0 for padding
    """

    feats: np.ndarray
    seq_idx: np.ndarray
    nsegs: np.ndarray
    weight: np.ndarray
    # real-row count, cached host-side so reading it never syncs a device
    # array after ``device_prefetch`` transfers the batch
    n_real: int = -1

    @property
    def num_real(self) -> int:
        if self.n_real >= 0:
            return self.n_real
        return int(np.asarray(self.weight).sum())


class SegmentLoader:
    def __init__(
        self,
        dataset: SegmentDataset,
        batch_size: int,
        shuffle: bool = True,
        seed: int = 0,
        drop_last: bool = False,
        prefetch: int = 2,
        transfer_dtype: str = "float32",
        indices: "np.ndarray | None" = None,
    ):
        """``transfer_dtype``: dtype of the emitted feature batches.
        "bfloat16" halves host->device transfer bytes (and HBM for the staged
        batch); the model upcasts to float32 on entry, so only the feature
        quantization (~3 decimal digits) changes. Opt-in: useful when the
        input link, not compute, bounds throughput.

        ``indices``: optional fixed subset of GLOBAL segment indices to
        iterate instead of the whole dataset (e.g. the chunk-skip subsample
        of a hierarchical round's MAP-init pass,
        data.segments.chunk_skip_indices)."""
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.seed = seed
        self.drop_last = drop_last
        self.prefetch = prefetch
        self.indices = None if indices is None else np.asarray(indices)
        if transfer_dtype == "bfloat16":
            import ml_dtypes

            self.feats_dtype = np.dtype(ml_dtypes.bfloat16)
        else:
            self.feats_dtype = np.dtype(np.float32)
        self._epoch = 0

    def set_epoch(self, epoch: int) -> None:
        self._epoch = epoch
        if self.dataset.rand_seg:
            self.dataset.resample_segments(self.seed + 7919 * epoch)

    def __len__(self) -> int:
        n = (len(self.indices) if self.indices is not None
             else len(self.dataset))
        if self.drop_last:
            return n // self.batch_size
        return (n + self.batch_size - 1) // self.batch_size

    def _order(self) -> np.ndarray:
        base = (self.indices if self.indices is not None
                else np.arange(len(self.dataset)))
        if self.shuffle:
            rng = np.random.default_rng(self.seed + 1_000_003 * self._epoch)
            return rng.permutation(base)
        return base

    def _assemble(self, idx: np.ndarray) -> Batch:
        ds = self.dataset
        B = self.batch_size
        real = len(idx)
        if real < B:
            # pad by repeating the first index; weights zero the extras
            pad = np.full(B - real, idx[0] if real else 0, dtype=idx.dtype)
            idx = np.concatenate([idx, pad])
        seq_idx = ds.seq_idx[idx]
        feats = ds.store.gather_segments(seq_idx, ds.starts[idx], ds.seg_len)
        nsegs = ds.nsegs[seq_idx].astype(np.float32)
        weight = np.zeros(B, dtype=np.float32)
        weight[:real] = 1.0
        return Batch(
            feats=np.ascontiguousarray(feats, dtype=self.feats_dtype),
            seq_idx=seq_idx.astype(np.int32),
            nsegs=nsegs,
            weight=weight,
            n_real=real,
        )

    def _batches_indices(self, start_batch: int = 0) -> Iterator[np.ndarray]:
        order = self._order()
        n = len(order)
        stop = (n // self.batch_size) * self.batch_size if self.drop_last else n
        for s in range(start_batch * self.batch_size, stop, self.batch_size):
            yield order[s : s + self.batch_size]

    def __iter__(self) -> Iterator[Batch]:
        return self.batches_from(0)

    def batches_from(self, start_batch: int) -> Iterator[Batch]:
        """Iterate the epoch from batch ``start_batch`` (mid-epoch resume:
        the skipped batches are never assembled — the deterministic order
        is just sliced past them)."""
        if self.prefetch <= 0:
            for idx in self._batches_indices(start_batch):
                yield self._assemble(idx)
            return

        q: "queue.Queue" = queue.Queue(maxsize=self.prefetch)
        _SENTINEL = object()
        stop = threading.Event()
        failure: list[BaseException] = []

        def _put(item) -> bool:
            """Blocking put that aborts when the consumer abandoned us."""
            while not stop.is_set():
                try:
                    q.put(item, timeout=0.1)
                    return True
                except queue.Full:
                    continue
            return False

        def producer():
            try:
                for idx in self._batches_indices(start_batch):
                    if not _put(self._assemble(idx)):
                        return
            except BaseException as e:  # surface in the consumer, never
                failure.append(e)       # silently truncate the epoch
            finally:
                _put(_SENTINEL)

        t = threading.Thread(target=producer, daemon=True)
        t.start()
        try:
            while True:
                item = q.get()
                if item is _SENTINEL:
                    if failure:
                        raise failure[0]
                    break
                yield item
        finally:
            # consumer abandoned the iterator (break / GC): release the
            # producer so it does not stay blocked on the bounded queue
            stop.set()
            while True:
                try:
                    q.get_nowait()
                except queue.Empty:
                    break
            t.join(timeout=5.0)


def stack_prefetch(batches, k: int, put=None, size: int = 1):
    """Stack K batches and ship them to the device ahead of consumption —
    the K-step-dispatch analogue of :func:`device_prefetch`.

    Yields ``("stack", placed_arrays, counts)`` for every full group of K
    batches and ``("tail", batch, num_real)`` for the leftovers. The next
    stack is assembled and its (async) transfer dispatched before the
    previous one is yielded, so host stacking and host->device copies
    overlap the device's K-step program instead of serializing with it.

    ``put``: placement callable taking ONE 4-tuple ``(feats, seq_idx, nsegs,
    weight)`` of stacked ``[K, B, ...]`` arrays and returning the placed
    tuple; defaults to plain per-array ``jax.device_put``. Mesh callers wrap
    ``shard_stacked_batch``: ``lambda arrs: shard_stacked_batch(mesh, *arrs)``.
    """
    import collections

    import jax

    if put is None:
        def put(arrs):
            return tuple(jax.device_put(a) for a in arrs)

    buf: "collections.deque" = collections.deque()
    pending: list[Batch] = []

    def make_stack():
        arrs = (
            np.stack([p.feats for p in pending]),
            np.stack([p.seq_idx for p in pending]),
            np.stack([p.nsegs for p in pending]),
            np.stack([p.weight for p in pending]),
        )
        counts = [p.num_real for p in pending]
        pending.clear()
        return ("stack", put(arrs), counts)

    for b in batches:
        pending.append(b)
        if len(pending) == k:
            buf.append(make_stack())
            while len(buf) > size:
                yield buf.popleft()
    while buf:
        yield buf.popleft()
    for b in pending:
        yield ("tail", b, b.num_real)


def device_prefetch(batches, size: int = 2):
    """Overlap host->device transfer with device compute.

    Eagerly ``jax.device_put``s up to ``size`` upcoming batches while the
    caller's current step is executing (JAX dispatch is async), so the step
    stream never waits on PCIe/host copies.
    """
    import collections

    import jax

    buf: "collections.deque" = collections.deque()
    it = iter(batches)

    def put(b: Batch) -> Batch:
        return Batch(
            feats=jax.device_put(b.feats),
            seq_idx=jax.device_put(b.seq_idx),
            nsegs=jax.device_put(b.nsegs),
            weight=jax.device_put(b.weight),
            n_real=b.num_real,
        )

    try:
        for _ in range(size):
            buf.append(put(next(it)))
    except StopIteration:
        pass
    while buf:
        out = buf.popleft()
        try:
            buf.append(put(next(it)))
        except StopIteration:
            pass
        yield out
