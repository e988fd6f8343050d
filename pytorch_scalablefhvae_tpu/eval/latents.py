"""Latent extraction and mu2 MAP estimation.

Implements the evaluation capabilities the reference left as TODO
(eval_model.py:57-59) and the mu2 estimation it attempted in
``estimate_mu2_dict`` (utils.py:45-60, defect B10):

- per-segment z1/z2 posterior means over a split;
- per-sequence MAP estimate of mu2 from encoder means:
  ``mu2[y] = sum(z2_mu of y's segments) / (nsegs(y) + var(pz2)/var(pmu2))``
  (utils.py:58-59 formula, the paper's closed-form posterior mean);
- per-sequence averaged z1 (speaker-invariant content summary).
"""

from __future__ import annotations

import jax
import numpy as np

from pytorch_scalablefhvae_tpu.data.loader import SegmentLoader
from pytorch_scalablefhvae_tpu.train.step import make_latent_step
from pytorch_scalablefhvae_tpu.utils.dispatch import DispatchWindow


def extract_latents(
    model, params, loader: SegmentLoader, seed: int = 0, table=None
) -> dict[str, np.ndarray]:
    """Run the encoder over every segment of a split.

    Returns dict with ``z1_mu`` [N, z1], ``z2_mu`` [N, z2], ``seq_idx`` [N],
    ``lower_bound`` [N] for the N real (non-padded) segments, in loader order.

    ``table``: mu2 table the per-segment lower_bound is scored against.
    For held-out splits this MUST be the split's MAP-estimated table —
    the learned table has no rows for held-out sequences, and indexing it
    by the split's sequence ids would pair them with arbitrary training
    rows (documented deviation D6).
    """
    step = make_latent_step(model, with_table_override=table is not None,
                            packed=True)
    key = jax.random.PRNGKey(seed)
    z1s, z2s, seqs, lbs = [], [], [], []

    # only the packed [B, z1+z2+1] block is pushed (x_mu's buffer frees as
    # each dispatch completes): ONE device->host fetch per batch — each
    # readback is a full link round trip, which dominates warm serving
    # latency on high-latency links (train/step.py make_latent_step)
    def drain_one(item):
        packed, d1, d2, seq_idx, weight = item
        real = weight > 0
        block = np.asarray(packed)[real]
        z1s.append(block[:, :d1])
        z2s.append(block[:, d1 : d1 + d2])
        lbs.append(block[:, -1])
        seqs.append(seq_idx[real])

    window = DispatchWindow(drain_one)
    for i, b in enumerate(loader):
        args = (params, b.feats, b.seq_idx, b.nsegs,
                jax.random.fold_in(key, i))
        out = step(*args) if table is None else step(*args, table)
        window.push((out["packed"], out["z1_mu"].shape[1],
                     out["z2_mu"].shape[1], b.seq_idx, b.weight))
    window.close()
    return {
        "z1_mu": np.concatenate(z1s) if z1s else np.zeros((0, 0)),
        "z2_mu": np.concatenate(z2s) if z2s else np.zeros((0, 0)),
        "lower_bound": np.concatenate(lbs) if lbs else np.zeros(0),
        "seq_idx": np.concatenate(seqs) if seqs else np.zeros(0, np.int32),
    }


def estimate_mu2(
    z2_mu: np.ndarray,
    seq_idx: np.ndarray,
    num_seqs: int,
    pz2_var: float = 0.25,
    pmu2_var: float = 1.0,
) -> np.ndarray:
    """Closed-form MAP estimate of mu2 per sequence (utils.py:58-59 intent).

    ``mu2[y] = sum_{segments of y} z2_mu / (n_y + pz2_var / pmu2_var)``
    """
    dim = z2_mu.shape[1] if z2_mu.ndim == 2 else 0
    sums = np.zeros((num_seqs, dim), dtype=np.float64)
    counts = np.zeros(num_seqs, dtype=np.float64)
    np.add.at(sums, seq_idx, z2_mu)
    np.add.at(counts, seq_idx, 1.0)
    r = pz2_var / pmu2_var
    return (sums / (counts + r)[:, None]).astype(np.float32)


def sequence_mean_z1(z1_mu: np.ndarray, seq_idx: np.ndarray, num_seqs: int) -> np.ndarray:
    dim = z1_mu.shape[1] if z1_mu.ndim == 2 else 0
    sums = np.zeros((num_seqs, dim), dtype=np.float64)
    counts = np.zeros(num_seqs, dtype=np.float64)
    np.add.at(sums, seq_idx, z1_mu)
    np.add.at(counts, seq_idx, 1.0)
    counts = np.maximum(counts, 1.0)
    return (sums / counts[:, None]).astype(np.float32)
