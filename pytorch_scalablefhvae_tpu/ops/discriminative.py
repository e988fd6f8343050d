"""Pallas TPU kernel: streaming discriminative log-softmax over the mu2 table.

The FHVAE discriminative objective needs, per segment b,
``log q(y=seq_idx[b] | z2) = logits[b, y_b] - LSE_n logits[b, n]`` with
``logits[b, n] = -||z2_mu[b] - mu2[n]||^2 / (2 sigma^2)``
over **all N sequences** in the corpus (reference simple_fhvae.py:119-122).
At LibriSpeech-960 scale (N ~ 280k) the naive ``[B, N]`` logits tensor is
~300 MB of HBM traffic per step. The kernel streams mu2 through VMEM in
blocks, maintaining an online (flash-softmax-style) running max / sum / picked
logit per row, so HBM traffic is ``O(B*D + N*D)`` and nothing of size
``[B, N]`` is ever materialized. The block cross term is one
``[B, D] x [D, BLK]`` matmul on the MXU per block.

The kernel emits the *partials* ``(m, s, picked)`` — running max, rescaled
exp-sum, and the logit at the true sequence — rather than the finished
``log_qy``. That makes one kernel serve two callers:

- :func:`discriminative_log_qy_pallas` finishes ``picked - (m + log s)``
  on a single device;
- :func:`discriminative_log_qy_pallas_sharded` runs the kernel per shard
  inside ``shard_map`` over a (data, model) mesh with the mu2 table
  row-sharded, then combines partials across the "model" axis with
  ``pmax``/``psum`` (the distributed log-sum-exp of SURVEY.md §2.3) — so the
  streaming kernel and the sharded table compose instead of excluding each
  other.

Row masking is data-driven: a ``row_bias`` vector (0 for real rows, -1e30
for padding) is streamed alongside the table blocks, so one compiled kernel
handles corpora whose size is not divisible by the model axis (rows are
padded to a multiple; see ``parallel.mesh.padded_num_seqs``).

A custom VJP streams the same blocks on the backward pass, recomputing block
logits from the saved LSE (standard flash recompute), producing dz2 and dmu2
without the [B, N] intermediate either. In the sharded form the VJP wraps the
``shard_map`` itself: dmu2 shards are exact per device; dz2 partials are
``psum``-ed over the "model" axis.

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
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P

NEG_INF = -1e30


def _fwd_kernel(z2_ref, mu2_ref, seq_ref, bias_ref, m_ref, s_ref, picked_ref,
                *, n_total, blk, inv_two_var):
    i = pl.program_id(0)

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
    logits = inv_two_var * (2.0 * cross - sq) + bias_ref[:]  # bias masks padding

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

    # pick logits at the true sequence where it falls in this block (the true
    # row is always a real row, so its bias contribution is 0)
    onehot = (col == seq_ref[:]).astype(jnp.float32)
    picked_ref[:] = picked_ref[:] + jnp.sum(
        jnp.where(valid, logits, 0.0) * onehot, axis=1, keepdims=True
    )


def _bwd_kernel(z2_ref, mu2_ref, seq_ref, bias_ref, lse_ref, g_ref, dz2_ref, dmu2_ref,
                *, n_total, blk, inv_two_var):
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
    logits = inv_two_var * (2.0 * cross - sq) + bias_ref[:]

    col = jax.lax.broadcasted_iota(jnp.int32, (B, blk), 1) + i * blk
    valid = col < n_total
    # padded rows carry bias -1e30, so exp underflows to exactly 0 — they
    # contribute nothing to dlogits and receive zero gradient
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


def _row_bias(n_rows: int, num_real: int) -> jnp.ndarray:
    """[1, n_rows] additive logit bias: 0 for real rows, -1e30 for padding."""
    return jnp.where(jnp.arange(n_rows)[None, :] < num_real, 0.0, NEG_INF).astype(
        jnp.float32
    )


def _partials_call(z2_mu, mu2_table, seq_idx, bias, inv_two_var, interpret):
    """Run the streaming forward kernel; returns (m, s, picked) each [B, 1]."""
    B, D = z2_mu.shape
    N = mu2_table.shape[0]
    blk = _pick_block(N, B, n_temps=5)
    nblocks = pl.cdiv(N, blk)
    kernel = functools.partial(
        _fwd_kernel, n_total=N, blk=blk, inv_two_var=float(inv_two_var)
    )
    out_spec = pl.BlockSpec((B, 1), lambda i: (0, 0), memory_space=pltpu.VMEM)
    m, s, picked = pl.pallas_call(
        kernel,
        grid=(nblocks,),
        in_specs=[
            pl.BlockSpec((B, D), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((blk, D), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((B, 1), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, blk), lambda i: (0, i), memory_space=pltpu.VMEM),
        ],
        out_specs=[out_spec, out_spec, out_spec],
        out_shape=[jax.ShapeDtypeStruct((B, 1), jnp.float32)] * 3,
        interpret=interpret,
    )(
        z2_mu.astype(jnp.float32),
        mu2_table.astype(jnp.float32),
        seq_idx[:, None].astype(jnp.int32),
        bias,
    )
    return m, s, picked


def _bwd_call(z2_mu, mu2_table, seq_idx, bias, lse, g, inv_two_var, interpret):
    """Run the streaming backward kernel; returns (dz2 [B, D], dmu2 [N, D])."""
    B, D = z2_mu.shape
    N = mu2_table.shape[0]
    blk = _pick_block(N, B, n_temps=7)
    nblocks = pl.cdiv(N, blk)
    kernel = functools.partial(
        _bwd_kernel, n_total=N, blk=blk, inv_two_var=float(inv_two_var)
    )
    dz2, dmu2 = pl.pallas_call(
        kernel,
        grid=(nblocks,),
        in_specs=[
            pl.BlockSpec((B, D), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((blk, D), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((B, 1), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, blk), lambda i: (0, i), memory_space=pltpu.VMEM),
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
        bias,
        lse[:, None].astype(jnp.float32),
        g[:, None].astype(jnp.float32),
    )
    return dz2, dmu2


# ---------------------------------------------------------------------------
# single-device entry point
# ---------------------------------------------------------------------------


def discriminative_log_qy_pallas(
    z2_mu: jnp.ndarray,
    mu2_table: jnp.ndarray,
    seq_idx: jnp.ndarray,
    pz2_logvar: float,
    num_real: int | None = None,
    interpret: bool = False,
) -> jnp.ndarray:
    """Streaming log q(y|z2) on one device.

    ``num_real``: number of real table rows; rows beyond it (padding added by
    ``parallel.mesh.padded_num_seqs``) are masked out of the log-sum-exp.
    """
    n = mu2_table.shape[0]
    num_real = n if num_real is None else int(num_real)
    return _log_qy_single(
        z2_mu, mu2_table, seq_idx, float(pz2_logvar), num_real, bool(interpret)
    )


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def _log_qy_single(z2_mu, mu2_table, seq_idx, pz2_logvar, num_real, interpret):
    out, _ = _single_fwd(z2_mu, mu2_table, seq_idx, pz2_logvar, num_real, interpret)
    return out


def _single_fwd(z2_mu, mu2_table, seq_idx, pz2_logvar, num_real, interpret):
    inv_two_var = 0.5 / np.exp(pz2_logvar)
    bias = _row_bias(mu2_table.shape[0], num_real)
    m, s, picked = _partials_call(z2_mu, mu2_table, seq_idx, bias, inv_two_var, interpret)
    lse = (m + jnp.log(s))[:, 0]
    log_qy = picked[:, 0] - lse
    return log_qy, (z2_mu, mu2_table, seq_idx, lse)


def _single_bwd(pz2_logvar, num_real, interpret, res, g):
    z2_mu, mu2_table, seq_idx, lse = res
    inv_two_var = 0.5 / np.exp(pz2_logvar)
    bias = _row_bias(mu2_table.shape[0], num_real)
    dz2, dmu2 = _bwd_call(
        z2_mu, mu2_table, seq_idx, bias, lse, g, inv_two_var, interpret
    )
    dseq = np.zeros(seq_idx.shape, dtype=jax.dtypes.float0)
    return dz2, dmu2, dseq


_log_qy_single.defvjp(_single_fwd, _single_bwd)


# ---------------------------------------------------------------------------
# mesh-sharded entry point: shard_map(streaming kernel) + collective LSE
# ---------------------------------------------------------------------------


def discriminative_log_qy_pallas_sharded(
    z2_mu: jnp.ndarray,
    mu2_table: jnp.ndarray,
    seq_idx: jnp.ndarray,
    pz2_logvar: float,
    mesh: Mesh,
    num_real: int | None = None,
    data_axis: str = "data",
    model_axis: str = "model",
    interpret: bool = False,
) -> jnp.ndarray:
    """Distributed streaming log q(y|z2) over a (data, model) mesh.

    The mu2 table is row-sharded over ``model_axis`` and the batch over
    ``data_axis``. Each device streams its table shard through the Pallas
    kernel (online partial LSE + picked logit), then the partials are
    combined across the model axis:

        m* = pmax(m);  s* = psum(s * exp(m - m*));  picked* = psum(picked)
        log_qy = picked* - (m* + log s*)

    Table rows must be padded to a multiple of the model-axis size
    (``parallel.mesh.padded_num_seqs``); padded rows sit at the global tail
    and are masked via the per-shard row-bias. The backward pass runs the
    streaming bwd kernel per shard: dmu2 shards are exact locally, dz2
    partials are psum-ed over the model axis.
    """
    n_padded = mu2_table.shape[0]
    num_real = n_padded if num_real is None else int(num_real)
    m_size = mesh.shape[model_axis]
    if n_padded % m_size != 0:
        raise ValueError(
            f"mu2 table rows ({n_padded}) must be a multiple of the model "
            f"axis ({m_size}); pad with parallel.mesh.padded_num_seqs"
        )
    n_local = n_padded // m_size
    inv_two_var = 0.5 / np.exp(pz2_logvar)
    interpret = bool(interpret)

    def fwd_local(z2, mu2_loc, seq):
        offset = jax.lax.axis_index(model_axis) * n_local
        seq_local = seq - offset  # out-of-range on non-owning shards: no match
        bias = jnp.where(
            jnp.arange(n_local)[None, :] + offset < num_real, 0.0, NEG_INF
        ).astype(jnp.float32)
        m, s, picked = _partials_call(z2, mu2_loc, seq_local, bias, inv_two_var, interpret)
        # cross-shard online-LSE combine. An all-padding shard reports
        # m = -1e30 with a garbage s; exp(m - m*) underflows to exactly 0
        # there, so the garbage never enters the sum.
        m_glob = jax.lax.pmax(m, model_axis)
        s_glob = jax.lax.psum(s * jnp.exp(m - m_glob), model_axis)
        picked_glob = jax.lax.psum(picked, model_axis)
        lse = (m_glob + jnp.log(s_glob))[:, 0]
        return picked_glob[:, 0] - lse, lse

    def bwd_local(z2, mu2_loc, seq, lse, g):
        offset = jax.lax.axis_index(model_axis) * n_local
        bias = jnp.where(
            jnp.arange(n_local)[None, :] + offset < num_real, 0.0, NEG_INF
        ).astype(jnp.float32)
        dz2_part, dmu2_loc = _bwd_call(
            z2, mu2_loc, seq - offset, bias, lse, g, inv_two_var, interpret
        )
        # dz2 rows are batch rows (data-sharded) but each device only saw its
        # local table columns -> sum over "model"; dmu2 rows are table rows
        # (model-sharded) but each device only saw its local batch rows ->
        # sum over "data"
        return (
            jax.lax.psum(dz2_part, model_axis),
            jax.lax.psum(dmu2_loc, data_axis),
        )

    batch_spec = P(data_axis)
    fwd_mapped = shard_map(
        fwd_local,
        mesh=mesh,
        in_specs=(P(data_axis, None), P(model_axis, None), batch_spec),
        out_specs=(batch_spec, batch_spec),
        check_vma=False,
    )
    bwd_mapped = shard_map(
        bwd_local,
        mesh=mesh,
        in_specs=(P(data_axis, None), P(model_axis, None), batch_spec,
                  batch_spec, batch_spec),
        out_specs=(P(data_axis, None), P(model_axis, None)),
        check_vma=False,
    )

    @jax.custom_vjp
    def f(z2_mu, mu2_table, seq_idx):
        log_qy, _ = fwd_mapped(z2_mu, mu2_table, seq_idx)
        return log_qy

    def f_fwd(z2_mu, mu2_table, seq_idx):
        log_qy, lse = fwd_mapped(z2_mu, mu2_table, seq_idx)
        return log_qy, (z2_mu, mu2_table, seq_idx, lse)

    def f_bwd(res, g):
        z2, table, seq, lse = res
        dz2, dmu2 = bwd_mapped(z2, table, seq, lse, g)
        dseq = np.zeros(seq.shape, dtype=jax.dtypes.float0)
        return dz2, dmu2, dseq

    f.defvjp(f_fwd, f_bwd)
    return f(z2_mu, mu2_table, seq_idx)
