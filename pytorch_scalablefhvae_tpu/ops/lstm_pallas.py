"""Pallas-fused two-layer LSTM for the FHVAE recurrent stacks.

The XLA formulation (models/fhvae.py run_lstm / run_lstm_wavefront2) hoists
the input projection onto the MXU and scans the recurrence, but every scan
step is still XLA-scheduled: gate tensors round-trip between fusions, and the
carried h/c cross HLO boundaries T times per layer. This kernel runs the
whole recurrence of a two-layer stack (the reference configuration:
z1_hus/z2_hus/x_hus = (H, H), fhvae.py:5-13) inside one ``pallas_call``:

- grid ``(batch_tiles, T)`` with time innermost — Pallas double-buffers the
  per-step ``[BT, 4H]`` input-projection block DMAs behind compute;
- h/c for both layers live in VMEM scratch, persisting across grid steps;
- all four recurrent matmuls per step hit the MXU back-to-back with no
  dispatch gaps; gate nonlinearities run on the VPU in-register.

The input projection ``xg1 = xs @ w1x + b1`` stays OUTSIDE the kernel as one
large ``[B*T, D] x [D, 4H]`` XLA matmul (it is embarrassingly parallel over
time; only the recurrence benefits from fusion).

Backward is a second Pallas kernel running the reverse-time recurrence with
the standard LSTM adjoint, recomputing gate activations from the saved h/c
sequences (cheaper than streaming ``[BT, 4H]`` gate tensors to HBM and back),
and accumulating weight gradients in VMEM scratch across the entire grid.

Numerics match run_lstm exactly (same order of operations per step);
asserted by tests/test_lstm_pallas.py against the lax.scan path, fwd + grad.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def lstm2_vmem_bytes(hid: int, batch: int, block_batch: int = 256) -> int:
    """Worst-case VMEM residency estimate (bytes) for the BACKWARD kernel —
    the larger of the two. Used by run_lstm's "auto" gating to fall back to
    the wavefront scan when a wide stack (e.g. z1_hus=(1024,1024)) would
    blow the ~16 MB VMEM budget and fail to compile at runtime (ADVICE r03).

    Resident per grid step: 3 weight blocks + 3 weight-grad outputs + 3
    fp32 weight-grad accumulators ([H, 4H] each = 36 H^2 fp32 total), the
    b2/db2/ab2 rows, 4 [bt, H] carry scratches, and the streamed per-step
    blocks (xg1 + dxg1 [bt, 4H], two resid views [bt, 3H], tops/g_tops/g_h2
    [bt, H]) which Pallas double-buffers.
    """
    bt = min(block_batch, max(_round_up(batch, 8), 8))
    weights = 9 * hid * 4 * hid + 4 * (4 * hid)          # [H,4H] x9 + rows
    carries = 4 * bt * hid
    streamed = 2 * bt * (4 * hid + 4 * hid + 3 * hid + 3 * hid + 3 * hid)
    return 4 * (weights + carries + streamed)


# conservative budget: v5e VMEM is ~128 KB/lane-group * 128 = 16 MB/core;
# leave headroom for Mosaic's own buffers and the fwd kernel's residual
LSTM2_VMEM_BUDGET = 12 * 1024 * 1024


def _sigmoid(x):
    return jax.nn.sigmoid(x)


def _cell_fwd(gates, c_prev, hid):
    i = _sigmoid(gates[:, :hid])
    f = _sigmoid(gates[:, hid : 2 * hid])
    g = jnp.tanh(gates[:, 2 * hid : 3 * hid])
    o = _sigmoid(gates[:, 3 * hid :])
    c_new = f * c_prev + i * g
    h_new = o * jnp.tanh(c_new)
    return h_new, c_new


def _cell_bwd(gates, c_prev, c_new, dh, dc, hid):
    """Adjoint of _cell_fwd. Returns (dgates [BT,4H], dc_prev)."""
    i = _sigmoid(gates[:, :hid])
    f = _sigmoid(gates[:, hid : 2 * hid])
    g = jnp.tanh(gates[:, 2 * hid : 3 * hid])
    o = _sigmoid(gates[:, 3 * hid :])
    tc = jnp.tanh(c_new)
    do = dh * tc * o * (1.0 - o)
    dc_tot = dc + dh * o * (1.0 - tc * tc)
    di = dc_tot * g * i * (1.0 - i)
    df = dc_tot * c_prev * f * (1.0 - f)
    dg = dc_tot * i * (1.0 - g * g)
    dc_prev = dc_tot * f
    return jnp.concatenate([di, df, dg, do], axis=1), dc_prev


# ---------------------------------------------------------------- forward


def _fwd_kernel(xg1_ref, w1h_ref, w2x_ref, w2h_ref, b2_ref,
                tops_ref, resid_ref, h2last_ref,
                h1, c1, h2, c2, *, hid):
    t = pl.program_id(1)

    @pl.when(t == 0)
    def _():
        for buf in (h1, c1, h2, c2):
            buf[:] = jnp.zeros_like(buf)

    g1 = xg1_ref[:] + jnp.dot(h1[:], w1h_ref[:],
                              preferred_element_type=jnp.float32)
    h1n, c1n = _cell_fwd(g1, c1[:], hid)
    g2 = (
        jnp.dot(h1n, w2x_ref[:], preferred_element_type=jnp.float32)
        + jnp.dot(h2[:], w2h_ref[:], preferred_element_type=jnp.float32)
        + b2_ref[:]
    )
    h2n, c2n = _cell_fwd(g2, c2[:], hid)
    h1[:], c1[:], h2[:], c2[:] = h1n, c1n, h2n, c2n
    tops_ref[:] = h2n
    resid_ref[:] = jnp.concatenate([h1n, c1n, c2n], axis=1)
    h2last_ref[:] = h2n  # revisited block: the t = T-1 write is flushed


def _fwd_call(xg1, w1h, w2x, w2h, b2, bt, interpret):
    """xg1 [B, T*4H] batch-major -> (tops [B,T*H], resid [B,T*3H], h2 [B,H]).

    Batch-major column-blocked layout throughout: time step t is the column
    block [:, t*4H : (t+1)*4H]. The model's natural [B, T, 4H] arrays reshape
    to this for free (row-major bitcast) — time-major blocks would instead
    make XLA materialize [T, B, 4H] transpose copies around every kernel
    invocation (measured ~18% of the fhvae train step). The backward's
    per-step activations (h1 | c1 | c2) travel as ONE fused residual stream
    so each grid step issues one wide DMA instead of three narrow ones.
    """
    B, TH4 = xg1.shape
    hid = w1h.shape[0]
    H4 = 4 * hid
    T = TH4 // H4
    n_bt = B // bt
    const = lambda i, t: (0, 0)  # noqa: E731
    step = lambda i, t: (i, t)  # noqa: E731
    return pl.pallas_call(
        functools.partial(_fwd_kernel, hid=hid),
        grid=(n_bt, T),
        in_specs=[
            pl.BlockSpec((bt, H4), step, memory_space=pltpu.VMEM),
            pl.BlockSpec((hid, H4), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((hid, H4), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((hid, H4), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, H4), const, memory_space=pltpu.VMEM),
        ],
        out_shape=(
            jax.ShapeDtypeStruct((B, T * hid), jnp.float32),
            jax.ShapeDtypeStruct((B, T * 3 * hid), jnp.float32),
            jax.ShapeDtypeStruct((B, hid), jnp.float32),
        ),
        out_specs=(
            pl.BlockSpec((bt, hid), step, memory_space=pltpu.VMEM),
            pl.BlockSpec((bt, 3 * hid), step, memory_space=pltpu.VMEM),
            pl.BlockSpec((bt, hid), lambda i, t: (i, 0), memory_space=pltpu.VMEM),
        ),
        scratch_shapes=[pltpu.VMEM((bt, hid), jnp.float32) for _ in range(4)],
        cost_estimate=pl.CostEstimate(
            flops=2 * T * B * hid * H4 * 3,
            bytes_accessed=4 * T * B * (H4 + 4 * hid),
            transcendentals=8 * T * B * hid,
        ),
        interpret=interpret,
    )(xg1, w1h, w2x, w2h, b2.reshape(1, H4))


# ---------------------------------------------------------------- backward


def _bwd_kernel(xg1_ref, resid_ref, residp_ref, topsp_ref,
                w1h_ref, w2x_ref, w2h_ref, b2_ref, gtops_ref, gh2_ref,
                dxg1_ref, dw1h_ref, dw2x_ref, dw2h_ref, db2_ref,
                dh1, dc1, dh2, dc2, aw1h, aw2x, aw2h, ab2, *, hid, T):
    i_bt = pl.program_id(0)
    i = pl.program_id(1)  # reversed step: time t = T-1-i
    first_t = i == 0
    t_is_zero = i == T - 1
    zeros_bh = jnp.zeros_like(dh1[:])

    @pl.when(first_t)
    def _():
        dh1[:] = jnp.zeros_like(dh1)
        dc1[:] = jnp.zeros_like(dc1)
        dh2[:] = gh2_ref[:]
        dc2[:] = jnp.zeros_like(dc2)

    @pl.when(jnp.logical_and(first_t, i_bt == 0))
    def _():
        aw1h[:] = jnp.zeros_like(aw1h)
        aw2x[:] = jnp.zeros_like(aw2x)
        aw2h[:] = jnp.zeros_like(aw2h)
        ab2[:] = jnp.zeros_like(ab2)

    # fused residual stream: (h1 | c1 | c2) at t and t-1
    h1_t = resid_ref[:, :hid]
    c1_t = resid_ref[:, hid : 2 * hid]
    c2_t = resid_ref[:, 2 * hid :]
    h1_prev = jnp.where(t_is_zero, 0.0, residp_ref[:, :hid])
    c1_prev = jnp.where(t_is_zero, 0.0, residp_ref[:, hid : 2 * hid])
    c2_prev = jnp.where(t_is_zero, 0.0, residp_ref[:, 2 * hid :])
    h2_prev = jnp.where(t_is_zero, 0.0, topsp_ref[:])

    # ---- layer 2 (recompute gates, then adjoint)
    g2 = (
        jnp.dot(h1_t, w2x_ref[:], preferred_element_type=jnp.float32)
        + jnp.dot(h2_prev, w2h_ref[:], preferred_element_type=jnp.float32)
        + b2_ref[:]
    )
    dh2_tot = dh2[:] + gtops_ref[:]
    dgates2, dc2_prev = _cell_bwd(g2, c2_prev, c2_t, dh2_tot, dc2[:], hid)
    # contracted-dim dot_generals express A @ W.T / A.T @ B without explicit
    # transposes (Mosaic handles transposed contraction natively on the MXU)
    nt = lambda a, b: jax.lax.dot_general(  # noqa: E731  — [M,K] x [N,K] -> [M,N]
        a, b, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32)
    tn = lambda a, b: jax.lax.dot_general(  # noqa: E731  — [K,M] x [K,N] -> [M,N]
        a, b, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32)
    dh2[:] = nt(dgates2, w2h_ref[:])
    dc2[:] = dc2_prev
    aw2x[:] += tn(h1_t, dgates2)
    aw2h[:] += tn(h2_prev, dgates2)
    ab2[:] += jnp.sum(dgates2, axis=0, keepdims=True)

    # ---- layer 1
    g1 = xg1_ref[:] + jnp.dot(h1_prev, w1h_ref[:],
                              preferred_element_type=jnp.float32)
    dh1_tot = dh1[:] + nt(dgates2, w2x_ref[:])
    dgates1, dc1_prev = _cell_bwd(g1, c1_prev, c1_t, dh1_tot, dc1[:], hid)
    dh1[:] = nt(dgates1, w1h_ref[:])
    dc1[:] = dc1_prev
    aw1h[:] += tn(h1_prev, dgates1)
    dxg1_ref[:] = dgates1

    # boundary guard: at t=0 the "previous h" is zero, so the recurrent
    # gradient must not flow further back (next bt tile re-inits anyway)
    dh1[:] = jnp.where(t_is_zero, zeros_bh, dh1[:])
    dh2[:] = jnp.where(t_is_zero, zeros_bh, dh2[:])

    is_last = jnp.logical_and(i == T - 1, i_bt == pl.num_programs(0) - 1)

    @pl.when(is_last)
    def _():
        dw1h_ref[:] = aw1h[:]
        dw2x_ref[:] = aw2x[:]
        dw2h_ref[:] = aw2h[:]
        db2_ref[:] = ab2[:]


def _bwd_call(xg1, resid, tops, w1h, w2x, w2h, b2,
              g_tops, g_h2, bt, interpret):
    B, TH4 = xg1.shape
    hid = w1h.shape[0]
    H4 = 4 * hid
    T = TH4 // H4
    n_bt = B // bt
    const = lambda i, t: (0, 0)  # noqa: E731
    rev = lambda i, t: (i, T - 1 - t)  # noqa: E731
    # "previous step" views: column block T-2-t, clamped at t = T-1
    # (masked in-kernel)
    prev = lambda i, t: (i, jnp.maximum(T - 2 - t, 0))  # noqa: E731
    w_spec = pl.BlockSpec((hid, H4), const, memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(_bwd_kernel, hid=hid, T=T),
        grid=(n_bt, T),
        in_specs=[
            pl.BlockSpec((bt, H4), rev, memory_space=pltpu.VMEM),   # xg1
            pl.BlockSpec((bt, 3 * hid), rev, memory_space=pltpu.VMEM),   # resid t
            pl.BlockSpec((bt, 3 * hid), prev, memory_space=pltpu.VMEM),  # resid t-1
            pl.BlockSpec((bt, hid), prev, memory_space=pltpu.VMEM),  # tops t-1
            w_spec, w_spec, w_spec,     # w1h, w2x, w2h
            pl.BlockSpec((1, H4), const, memory_space=pltpu.VMEM),  # b2
            pl.BlockSpec((bt, hid), rev, memory_space=pltpu.VMEM),  # g_tops
            pl.BlockSpec((bt, hid), lambda i, t: (i, 0),
                         memory_space=pltpu.VMEM),  # g_h2
        ],
        out_shape=(
            jax.ShapeDtypeStruct((B, T * H4), jnp.float32),
            jax.ShapeDtypeStruct((hid, H4), jnp.float32),
            jax.ShapeDtypeStruct((hid, H4), jnp.float32),
            jax.ShapeDtypeStruct((hid, H4), jnp.float32),
            jax.ShapeDtypeStruct((1, H4), jnp.float32),
        ),
        out_specs=(
            pl.BlockSpec((bt, H4), rev, memory_space=pltpu.VMEM),
            w_spec, w_spec, w_spec,
            pl.BlockSpec((1, H4), const, memory_space=pltpu.VMEM),
        ),
        scratch_shapes=(
            [pltpu.VMEM((bt, hid), jnp.float32) for _ in range(4)]
            + [pltpu.VMEM((hid, H4), jnp.float32) for _ in range(3)]
            + [pltpu.VMEM((1, H4), jnp.float32)]
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * T * B * hid * H4 * 9,
            bytes_accessed=4 * T * B * (2 * H4 + 9 * hid),
            transcendentals=16 * T * B * hid,
        ),
        interpret=interpret,
    )(
        xg1, resid, resid, tops,
        w1h, w2x, w2h, b2.reshape(1, H4), g_tops, g_h2,
    )


# ------------------------------------------------------------- public op


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6))
def _lstm2(xg1, w1h, w2x, w2h, b2, bt, interpret):
    tops, _, h2 = _fwd_call(xg1, w1h, w2x, w2h, b2, bt, interpret)
    return tops, h2


def _lstm2_fwd(xg1, w1h, w2x, w2h, b2, bt, interpret):
    tops, resid, h2 = _fwd_call(xg1, w1h, w2x, w2h, b2, bt, interpret)
    return (tops, h2), (xg1, resid, tops, w1h, w2x, w2h, b2)


def _lstm2_bwd(bt, interpret, res, grads):
    xg1, resid, tops, w1h, w2x, w2h, b2 = res
    g_tops, g_h2 = grads
    dxg1, dw1h, dw2x, dw2h, db2 = _bwd_call(
        xg1, resid, tops, w1h, w2x, w2h, b2, g_tops, g_h2, bt, interpret,
    )
    return dxg1, dw1h, dw2x, dw2h, db2.reshape(b2.shape)


_lstm2.defvjp(_lstm2_fwd, _lstm2_bwd)


def lstm2_pallas(
    p: dict,
    xs: jnp.ndarray,
    cdt=None,
    *,
    block_batch: int = 256,
    interpret: bool = False,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Drop-in for models.fhvae.run_lstm on two-layer equal-width stacks.

    Args:
        p: ``{"cells": [{"w": [D+H, 4H], "b": [4H]}, {"w": [2H, 4H], "b"}]}``.
        xs: ``[B, T, D]`` inputs (batch-major, like run_lstm).
        cdt: optional compute dtype for the hoisted input projection.

    Returns ``(seq [B, T, H], last_h [B, H])``, matching run_lstm.
    """
    B, T, _ = xs.shape
    c1p, c2p = p["cells"]
    hid = c1p["w"].shape[1] // 4
    d_in = c1p["w"].shape[0] - hid
    w1x, w1h = c1p["w"][:d_in], c1p["w"][d_in:]
    w2x, w2h = c2p["w"][:hid], c2p["w"][hid:]

    # input projection: one [B*T, D] x [D, 4H] MXU matmul, outside the kernel
    if cdt is not None:
        xg1 = jnp.dot(xs.reshape(B * T, d_in).astype(cdt), w1x.astype(cdt),
                      preferred_element_type=jnp.float32)
    else:
        xg1 = jnp.dot(xs.reshape(B * T, d_in), w1x,
                      preferred_element_type=jnp.float32)
    # batch-major column-blocked [B, T*4H]: a free row-major bitcast of
    # [B, T, 4H] (no transpose copies around the kernel)
    xg1 = (xg1 + c1p["b"]).reshape(B, T * 4 * hid)

    bt = min(block_batch, _round_up(B, 8))
    b_pad = _round_up(B, bt)
    if b_pad != B:
        xg1 = jnp.pad(xg1, ((0, b_pad - B), (0, 0)))

    tops, h2 = _lstm2(xg1, w1h, w2x, w2h, c2p["b"], bt, bool(interpret))
    return tops.reshape(b_pad, T, hid)[:B], h2[:B]
