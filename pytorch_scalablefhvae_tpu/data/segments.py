"""Segment index construction.

Windowing math matches the reference (datasets.py:155-185): deterministic
mode yields ``(len - seg_len) // seg_shift + 1`` segments at stride
``seg_shift``; random mode draws ``floor(len / seg_shift)`` start positions
per sequence (the *documented* contract, datasets.py:70-72 — the reference
code drew the sliding-window count instead; defect B19 is fixed here).

The index is held as flat numpy arrays (seq_idx, start) — no per-segment
Python objects — so shuffling and batch gathering are vectorized.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

from pytorch_scalablefhvae_tpu.data.feature_store import FeatureStore


def make_segments(
    lens: np.ndarray,
    seg_len: int = 20,
    seg_shift: int = 8,
    rand_seg: bool = False,
    rng: np.random.Generator | None = None,
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Build the segment index for per-sequence lengths.

    Returns:
        seq_idx: [n_segments] int32 — owning sequence of each segment
        starts:  [n_segments] int32 — frame offset within the sequence
        nsegs:   [n_seqs] int32 — segment count per sequence
    """
    lens = np.asarray(lens, dtype=np.int64)
    if rand_seg:
        if rng is None:
            rng = np.random.default_rng()
        nsegs = np.maximum(lens // seg_shift, 0).astype(np.int32)
        nsegs = np.where(lens >= seg_len, nsegs, 0).astype(np.int32)
        seq_idx = np.repeat(np.arange(len(lens), dtype=np.int32), nsegs)
        max_start = np.repeat((lens - seg_len).clip(min=0), nsegs)
        starts = (rng.random(len(seq_idx)) * (max_start + 1)).astype(np.int32)
    else:
        nsegs = np.where(lens >= seg_len, (lens - seg_len) // seg_shift + 1, 0).astype(np.int32)
        seq_idx = np.repeat(np.arange(len(lens), dtype=np.int32), nsegs)
        within = np.concatenate([np.arange(n, dtype=np.int32) for n in nsegs]) if len(lens) else np.zeros(0, np.int32)
        starts = within * seg_shift
    return seq_idx.astype(np.int32), starts.astype(np.int32), nsegs


@dataclass
class SegmentDataset:
    """A feature store plus its segment index.

    Equivalent capability to reference ``NumpyDataset`` / ``KaldiDataset``
    (datasets.py:188-274): item ``i`` is ``(seq_idx, [seg_len, dim] feature
    slice, nsegs-of-that-sequence)``.
    """

    store: FeatureStore
    seg_len: int = 20
    seg_shift: int = 8
    rand_seg: bool = False
    seed: int = 0

    def __post_init__(self):
        rng = np.random.default_rng(self.seed) if self.rand_seg else None
        self.seq_idx, self.starts, self.nsegs = make_segments(
            self.store.lens, self.seg_len, self.seg_shift, self.rand_seg, rng
        )

    def resample_segments(self, seed: int) -> None:
        """Redraw random segment starts (rand_seg mode), e.g. per epoch."""
        if self.rand_seg:
            rng = np.random.default_rng(seed)
            self.seq_idx, self.starts, self.nsegs = make_segments(
                self.store.lens, self.seg_len, self.seg_shift, True, rng
            )

    def __len__(self) -> int:
        return len(self.seq_idx)

    @property
    def num_seqs(self) -> int:
        return self.store.num_seqs

    def __getitem__(self, i: int) -> tuple[int, np.ndarray, int]:
        s = int(self.seq_idx[i])
        feat = self.store.gather_segments(
            self.seq_idx[i : i + 1], self.starts[i : i + 1], self.seg_len
        )[0]
        return s, feat, int(self.nsegs[s])
