"""Chunked windowed-segment gather as a Pallas DMA kernel.

The segment datasets address the packed feature store with OVERLAPPING
fixed-stride windows (``seg_len`` frames every ``seg_shift``,
data/segments.py deterministic mode — the reference's sliding windows,
datasets.py:155-185). XLA lowers ``jnp.take`` with a ``[B, seg_len]`` index
matrix to a per-ROW hardware gather, which on TPU is element-rate bound
(~5 G elem/s measured on v5e — ~2% of HBM bandwidth for fp32 rows of 80
mels); a windowed ``lax.gather`` with ``slice_sizes=(seg_len, D)`` lowers
even worse (3.7x slower than take, measured).

This kernel exploits what the gather unit cannot: for a schedule of
CONSECUTIVE windows of the same sequence (exactly what the MAP mu2 passes
walk — sequence-ordered, device_step.make_device_map_pass_rows), a chunk of
``spb`` consecutive windows covers ONE contiguous frame region of
``(spb-1) * stride + seg_len`` rows. Each grid step issues a single DMA for
that region (tens of KB, full HBM bandwidth) and fans the windows out of
VMEM — bytes read drop from ``spb * seg_len`` rows to ``~spb * stride``
(the overlap is re-read from VMEM, not HBM), and descriptor count drops
``spb * seg_len``-fold.

The region DMA is double-buffered across grid steps (start chunk c+1's copy
before fanning out chunk c), so the kernel streams at
``max(region DMA, window fan-out)`` rate.

Out-of-range slack: the last chunk's region may extend past its sequence's
frames (the extra windows are weight-masked downstream) — the STORE must
provide ``(spb - 1) * stride + seg_len`` rows of tail slack past the last
addressable chunk start (data/device_store.py pads the staged pack; zero
frames are never consumed by a real window).

Lane alignment: Mosaic tiles HBM memrefs to 128 lanes and requires DMA
region slices to be lane-aligned — a ``[reg_rows, 80]`` slice of an 80-mel
store fails to compile on real TPUs ("Slice shape along dimension 1 must
be aligned to tiling (128)"; interpret mode does not enforce this). The
wrapper therefore pads the feature dim to the 128 multiple the HBM layout
already occupies physically, runs the kernel at the padded width, and
slices the output back — XLA fuses that slice into the consumer's operand
read, and the region DMAs stream the padding lanes the tiled layout would
have transferred anyway.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(chunk_starts_ref, store_ref, out_ref, region, sems,
            *, spb, seg_len, stride, reg_rows, n_chunks):
    c = pl.program_id(0)
    slot = jax.lax.rem(c, 2)

    @pl.when(c == 0)
    def _():
        # warm the pipeline: start chunk 0's region copy
        pltpu.make_async_copy(
            store_ref.at[pl.ds(chunk_starts_ref[0], reg_rows)],
            region.at[0], sems.at[0],
        ).start()

    @pl.when(c + 1 < n_chunks)
    def _():
        # overlap: chunk c+1's region streams in while c fans out
        pltpu.make_async_copy(
            store_ref.at[pl.ds(chunk_starts_ref[c + 1], reg_rows)],
            region.at[1 - slot], sems.at[1 - slot],
        ).start()

    pltpu.make_async_copy(
        store_ref.at[pl.ds(chunk_starts_ref[c], reg_rows)],
        region.at[slot], sems.at[slot],
    ).wait()
    for i in range(spb):
        out_ref[pl.ds(i * seg_len, seg_len), :] = (
            region[slot, pl.ds(i * stride, seg_len), :]
        )


@functools.partial(
    jax.jit,
    static_argnames=("spb", "seg_len", "stride", "interpret"),
)
def windowed_chunk_gather(
    store: jnp.ndarray,
    chunk_starts: jnp.ndarray,
    *,
    spb: int,
    seg_len: int,
    stride: int,
    interpret: bool = False,
) -> jnp.ndarray:
    """Gather ``C * spb`` stride-``stride`` windows as ``C`` region DMAs.

    Args:
        store: ``[N, D]`` packed frames (any float dtype). Must keep
            ``(spb - 1) * stride + seg_len`` rows of slack beyond the
            largest ``chunk_starts`` entry.
        chunk_starts: ``[C]`` int32 — frame offset of each chunk's FIRST
            window; window ``w`` of chunk ``c`` covers frames
            ``[chunk_starts[c] + stride * w, + seg_len)``.
        spb: windows per chunk.

    Returns ``[C * spb, seg_len, D]`` in ``store``'s dtype.
    """
    C = chunk_starts.shape[0]
    D = store.shape[1]
    # Mosaic requires 128-lane-aligned DMA slices of the HBM store (see
    # module docstring); run the kernel at the tiled width.
    D_pad = -(-D // 128) * 128
    if D_pad != D:
        store = jnp.pad(store, ((0, 0), (0, D_pad - D)))
    reg_rows = (spb - 1) * stride + seg_len
    out = pl.pallas_call(
        functools.partial(_kernel, spb=spb, seg_len=seg_len, stride=stride,
                          reg_rows=reg_rows, n_chunks=C),
        grid=(C,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),  # chunk_starts
            pl.BlockSpec(memory_space=pl.ANY),      # store stays in HBM
        ],
        out_shape=jax.ShapeDtypeStruct((C * spb * seg_len, D_pad),
                                       store.dtype),
        out_specs=pl.BlockSpec((spb * seg_len, D_pad), lambda c: (c, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((2, reg_rows, D_pad), store.dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=interpret,
    )(chunk_starts.astype(jnp.int32), store)
    return out[:, :D].reshape(C * spb, seg_len, D)
