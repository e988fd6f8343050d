"""Pallas TPU kernel: streaming discriminative log-softmax over the mu2 table.

The FHVAE discriminative objective needs, per segment b,
``log q(y=seq_idx[b] | z2) = logits[b, y_b] - LSE_n logits[b, n]`` with
``logits[b, n] = -||z2_mu[b] - mu2[n]||^2 / (2 sigma^2)``
over **all N sequences** in the corpus (reference simple_fhvae.py:119-122).
At LibriSpeech-960 scale (N ~ 280k) the naive ``[B, N]`` logits tensor is
~300 MB of HBM traffic per step. This kernel streams mu2 through VMEM in
blocks, maintaining an online (flash-softmax-style) running max / sum / picked
logit per row, so HBM traffic is ``O(B*D + N*D)`` and nothing of size
``[B, N]`` is ever materialized. The block cross term is one
``[B, D] x [D, BLK]`` matmul on the MXU per block.

A custom VJP streams the same blocks on the backward pass, recomputing block
logits from the saved LSE (standard flash recompute), producing dz2 and dmu2
without the [B, N] intermediate either.

The ``||z2||^2`` term is constant across n and cancels in the log-softmax;
its z2-gradient contribution is identically zero (rows of dlogits sum to 0),
so dropping it is exact in both passes.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30


def _fwd_kernel(z2_ref, mu2_ref, seq_ref, out_ref, m_ref, s_ref, picked_ref, *, n_total, blk, inv_two_var):
    i = pl.program_id(0)
    nblocks = pl.num_programs(0)

    @pl.when(i == 0)
    def _():
        m_ref[:] = jnp.full_like(m_ref, NEG_INF)
        s_ref[:] = jnp.zeros_like(s_ref)
        picked_ref[:] = jnp.zeros_like(picked_ref)

    z2 = z2_ref[:]  # [B, D]
    mu2 = mu2_ref[:]  # [BLK, D]
    B = z2.shape[0]

    cross = jax.lax.dot_general(
        z2, mu2, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )  # [B, BLK]
    sq = jnp.sum(mu2 * mu2, axis=1)[None, :]  # [1, BLK]
    logits = inv_two_var * (2.0 * cross - sq)

    col = jax.lax.broadcasted_iota(jnp.int32, (B, blk), 1) + i * blk
    valid = col < n_total
    logits = jnp.where(valid, logits, NEG_INF)

    # online LSE update
    m_old = m_ref[:]  # [B, 1]
    m_new = jnp.maximum(m_old, jnp.max(logits, axis=1, keepdims=True))
    s_ref[:] = s_ref[:] * jnp.exp(m_old - m_new) + jnp.sum(
        jnp.exp(logits - m_new), axis=1, keepdims=True
    )
    m_ref[:] = m_new

    # pick logits at the true sequence where it falls in this block
    onehot = (col == seq_ref[:]).astype(jnp.float32)
    picked_ref[:] = picked_ref[:] + jnp.sum(
        jnp.where(valid, logits, 0.0) * onehot, axis=1, keepdims=True
    )

    @pl.when(i == nblocks - 1)
    def _():
        out_ref[:] = picked_ref[:] - (m_ref[:] + jnp.log(s_ref[:]))


def _bwd_kernel(z2_ref, mu2_ref, seq_ref, lse_ref, g_ref, dz2_ref, dmu2_ref, *, n_total, blk, inv_two_var):
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        dz2_ref[:] = jnp.zeros_like(dz2_ref)

    z2 = z2_ref[:]  # [B, D]
    B = z2.shape[0]
    # zero out padded rows of the final block — the out-of-bounds region of
    # an input block is undefined and would poison the matmuls via 0 * NaN
    row_valid = (jax.lax.broadcasted_iota(jnp.int32, (blk, 1), 0) + i * blk) < n_total
    mu2 = jnp.where(row_valid, mu2_ref[:], 0.0)  # [BLK, D]

    cross = jax.lax.dot_general(
        z2, mu2, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )
    sq = jnp.sum(mu2 * mu2, axis=1)[None, :]
    logits = inv_two_var * (2.0 * cross - sq)

    col = jax.lax.broadcasted_iota(jnp.int32, (B, blk), 1) + i * blk
    valid = col < n_total
    p = jnp.where(valid, jnp.exp(logits - lse_ref[:]), 0.0)  # [B, BLK]
    onehot = jnp.where(valid, (col == seq_ref[:]).astype(jnp.float32), 0.0)
    dlogits = g_ref[:] * (onehot - p)  # [B, BLK]

    # dmu2 block: 2c * (dlogits^T @ z2) - 2c * mu2 * rowsum(dlogits)
    dl_t_z2 = jax.lax.dot_general(
        dlogits, z2, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )  # [BLK, D]
    colsum = jnp.sum(dlogits, axis=0)[:, None]  # [BLK, 1]
    dmu2_ref[:] = 2.0 * inv_two_var * (dl_t_z2 - mu2 * colsum)

    # dz2 accumulation directly in the revisited output block (stays in VMEM)
    dz2_ref[:] = dz2_ref[:] + 2.0 * inv_two_var * jax.lax.dot_general(
        dlogits, mu2, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )


def _pick_block(n: int, batch: int, n_temps: int) -> int:
    """Largest power-of-two block such that the kernel's ~n_temps live
    [B, BLK] f32 intermediates fit comfortably in the 16 MB VMEM budget."""
    budget = 10 * 1024 * 1024
    cap = budget // max(n_temps * batch * 4, 1)
    blk = 128
    while blk * 2 <= min(cap, 4096) and blk * 2 <= max(n, 128):
        blk *= 2
    return blk


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def discriminative_log_qy_pallas(
    z2_mu: jnp.ndarray,
    mu2_table: jnp.ndarray,
    seq_idx: jnp.ndarray,
    pz2_logvar: float,
    interpret: bool = False,
) -> jnp.ndarray:
    out, _ = _fwd_impl(z2_mu, mu2_table, seq_idx, pz2_logvar, interpret)
    return out


def _fwd_impl(z2_mu, mu2_table, seq_idx, pz2_logvar, interpret):
    B, D = z2_mu.shape
    N = mu2_table.shape[0]
    blk = _pick_block(N, B, n_temps=4)
    nblocks = pl.cdiv(N, blk)
    inv_two_var = float(0.5 / np.exp(pz2_logvar))

    kernel = functools.partial(
        _fwd_kernel, n_total=N, blk=blk, inv_two_var=inv_two_var
    )
    out = pl.pallas_call(
        kernel,
        grid=(nblocks,),
        in_specs=[
            pl.BlockSpec((B, D), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((blk, D), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((B, 1), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((B, 1), lambda i: (0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, 1), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((B, 1), jnp.float32),
            pltpu.VMEM((B, 1), jnp.float32),
            pltpu.VMEM((B, 1), jnp.float32),
        ],
        interpret=interpret,
    )(z2_mu.astype(jnp.float32), mu2_table.astype(jnp.float32), seq_idx[:, None].astype(jnp.int32))
    log_qy = out[:, 0]
    # LSE is recovered as picked - log_qy; avoid a second output by saving it
    return log_qy, None


def _vjp_fwd(z2_mu, mu2_table, seq_idx, pz2_logvar, interpret):
    log_qy, _ = _fwd_impl(z2_mu, mu2_table, seq_idx, pz2_logvar, interpret)
    # recover lse[b] = logits[b, y_b] - log_qy[b]; logits at y needs a gather:
    mu2_y = mu2_table[seq_idx]
    inv_two_var = 0.5 / np.exp(pz2_logvar)
    picked = inv_two_var * (
        2.0 * jnp.sum(z2_mu * mu2_y, axis=-1) - jnp.sum(mu2_y * mu2_y, axis=-1)
    )
    lse = picked - log_qy
    return log_qy, (z2_mu, mu2_table, seq_idx, lse)


def _vjp_bwd(pz2_logvar, interpret, res, g):
    z2_mu, mu2_table, seq_idx, lse = res
    B, D = z2_mu.shape
    N = mu2_table.shape[0]
    blk = _pick_block(N, B, n_temps=6)
    nblocks = pl.cdiv(N, blk)
    inv_two_var = float(0.5 / np.exp(pz2_logvar))

    kernel = functools.partial(
        _bwd_kernel, n_total=N, blk=blk, inv_two_var=inv_two_var
    )
    dz2, dmu2 = pl.pallas_call(
        kernel,
        grid=(nblocks,),
        in_specs=[
            pl.BlockSpec((B, D), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((blk, D), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((B, 1), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((B, 1), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((B, 1), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((B, D), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((blk, D), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, D), jnp.float32),
            jax.ShapeDtypeStruct((N, D), jnp.float32),
        ],
        interpret=interpret,
    )(
        z2_mu.astype(jnp.float32),
        mu2_table.astype(jnp.float32),
        seq_idx[:, None].astype(jnp.int32),
        lse[:, None].astype(jnp.float32),
        g[:, None].astype(jnp.float32),
    )
    dseq = np.zeros(seq_idx.shape, dtype=jax.dtypes.float0)
    return dz2, dmu2, dseq


discriminative_log_qy_pallas.defvjp(_vjp_fwd, _vjp_bwd)
