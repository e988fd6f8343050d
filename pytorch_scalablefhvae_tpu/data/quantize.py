"""Per-column affine uint8 quantization for staged feature stores.

Wire format for the ``transfer_dtype="int8"`` staging tier: a feature block
``x [rows, dim]`` ships as ``q [rows, dim] uint8`` plus per-column
``scale [dim]`` / ``offset [dim]`` float32, with

    x_hat = q * scale + offset,   q = round((x - offset) / scale)

where ``offset = col_min`` and ``scale = (col_max - col_min) / 255``. This is
the same compression family Kaldi ships fbank features in on disk
(``CompressedMatrix``: per-column affine byte codes — the reference's own
Kaldi toolchain emits it via compress=true ark options; see
/root/reference/prepare_kaldi_data.py:38-46 for where those arks originate),
applied here to the host->device link instead of the filesystem: 4x fewer
wire bytes than float32, 2x fewer than bfloat16. On a link-bound rig the
streaming tier's throughput scales directly with wire bytes (SCALING.md,
"the wire is the wall"), so int8 is the fastest staging dtype this framework
offers.

Accuracy: log-mel features after MVN span a few sigma per column; 255 levels
put the worst-case rounding error at ``scale/2`` — about 1-2% of a column's
range, comparable to the dither the extractors already inject
(misc/fbank.conf dither=1). The dequantized values are BIT-DETERMINISTIC
given the block, so equivalence tests can replay the exact same training
trajectory through the host path by dequantizing on the host
(tests/test_stream_data.py).

Columns are quantized independently (per-mel-bin dynamic range varies ~20 dB
across the bank); a degenerate column (max == min) gets scale 0 and
reconstructs exactly.
"""

from __future__ import annotations

import numpy as np


def quantize_columns(x: np.ndarray) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Quantize ``x [rows, dim]`` to (q uint8, scale f32 [dim], offset f32 [dim]).

    ``rows == 0`` is allowed (empty blocks quantize to empty q, zero params).
    """
    x = np.asarray(x)
    if x.size == 0:
        dim = x.shape[1] if x.ndim == 2 else 0
        return (np.zeros(x.shape, np.uint8), np.zeros(dim, np.float32),
                np.zeros(dim, np.float32))
    lo = x.min(axis=0).astype(np.float64)
    hi = x.max(axis=0).astype(np.float64)
    scale = (hi - lo) / 255.0
    # degenerate columns (constant value): scale 0, q 0, offset reconstructs
    safe = np.where(scale > 0, scale, 1.0)
    q = np.clip(np.rint((x - lo) / safe), 0, 255).astype(np.uint8)
    q[:, scale <= 0] = 0
    return q, scale.astype(np.float32), lo.astype(np.float32)


def dequantize(q: np.ndarray, scale: np.ndarray, offset: np.ndarray) -> np.ndarray:
    """Host mirror of the in-graph dequant: ``q * scale + offset`` in f32.

    Must stay bit-identical to the device step's
    ``take(q).astype(f32) * scale + offset`` (train/device_step.py) — the
    trajectory-equivalence tests feed THIS function's output through the
    host loader and require the same parameter trajectory.
    """
    return (q.astype(np.float32) * np.asarray(scale, np.float32)
            + np.asarray(offset, np.float32))
