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
large ``[T*B, D] x [D, 4H]`` XLA matmul (it is embarrassingly parallel over
time; only the recurrence benefits from fusion).

Layout: the kernel streams TIME-MAJOR row blocks — ``xg1``/``tops``/``resid``
are ``[T*B, .]`` with time outermost, so time step t is rows
``[t*B, (t+1)*B)``. The model's ``[T, B, 4H]`` projection output collapses to
this for free (leading-dim collapse preserves the (8,128) tiling when B is a
sublane multiple), whereas the previous batch-major column-blocked
``[B, T*4H]`` interface forced XLA to materialize real tiled-layout reshapes
around every kernel invocation (~18% of the b1024 train step on v5e).

``mm_dtype`` (optional, e.g. bfloat16) casts the *matmul operands* — weights
and hidden states — inside the kernel while keeping gates, carries, residuals
and all accumulation in fp32. On the MXU an fp32 matmul runs as a multi-pass
bf16 decomposition, so single-pass bf16 operands roughly triple matmul
throughput; fp32 carries keep the recurrence numerically stable (standard
mixed-precision recurrent practice).

``const_x`` mode serves the FHVAE decoder, whose per-step input is the SAME
``[z1, z2]`` vector at every frame (models/fhvae.py decode): the projected
``[B, 4H]`` block is fetched once per batch tile and revisited across all T
grid steps — no ``[T*B, 4H]`` broadcast is ever materialized in HBM, and the
backward pass accumulates ``dxg1`` across time in VMEM.

Backward is a second Pallas kernel running the reverse-time recurrence with
the standard LSTM adjoint, recomputing gate activations from the saved h/c
sequences (cheaper than streaming ``[T*B, 4H]`` gate tensors to HBM and
back), and accumulating weight gradients in VMEM scratch across the grid.

Numerics match run_lstm exactly at the default fp32 (same order of
operations per step); asserted by tests/test_lstm_pallas.py against the
lax.scan path, fwd + grad.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def lstm2_vmem_bytes(hid: int, batch: int, block_batch: int = 256,
                     d_in: int = 0, xgc_tile: bool = False) -> int:
    """Worst-case VMEM residency estimate (bytes) for the BACKWARD kernel —
    the larger of the two. Used by run_lstm's "auto" gating to fall back to
    the wavefront scan when a wide stack (e.g. z1_hus=(1024,1024)) would
    blow the ~16 MB VMEM budget and fail to compile at runtime (ADVICE r03).

    Resident per grid step: 3 weight blocks + 3 weight-grad outputs + 3
    fp32 weight-grad accumulators ([H, 4H] each = 36 H^2 fp32 total), the
    b2/db2/ab2 rows, 4 [bt, H] carry scratches, and the streamed per-step
    blocks (xg1 + dxg1 [bt, 4H], two resid views [bt, 3H], tops/g_tops/g_h2
    [bt, H]) which Pallas double-buffers.

    ``d_in > 0`` models the projection-fused variant (lstm2_pallas_tm_proj),
    whose backward additionally keeps the [d_in, 4H] x-projection weight
    block, its grad output, and an fp32 accumulator resident, and streams
    double-buffered x / dx [bt, d_in] blocks. Gates for the proj kernel
    MUST pass the input width or a wide-feature model (e.g. D=512
    spectrograms) passes the gate and then fails Mosaic compilation.

    ``xgc_tile`` models a BATCH-TILED xgc operand (the z1 encoder's
    z2-conditioned gate block, fhvae._apply_fused): its backward keeps the
    [bt, 4H] xgc in-block plus the revisited [bt, 4H] dxgc out-block
    resident, both double-buffered — ~2 MB extra at bt=256/H=128 that an
    un-flagged gate would miss for configs sized just under the budget.
    (A constant xgc — the decoder's [1, 4H] block — is row-sized, ignored.)
    """
    bt = min(block_batch, max(_round_up(batch, 8), 8))
    weights = 9 * hid * 4 * hid + 4 * (4 * hid)          # [H,4H] x9 + rows
    carries = 4 * bt * hid
    streamed = 2 * bt * (4 * hid + 4 * hid + 3 * hid + 3 * hid + 3 * hid)
    if d_in > 0:
        weights += 3 * d_in * 4 * hid        # w1x block + dw1x + fp32 accum
        streamed += 2 * bt * (2 * d_in)      # x and dx per-step blocks
    if xgc_tile:
        streamed += 2 * bt * (2 * 4 * hid)   # xgc + revisited dxgc blocks
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


# -------------------------------------------------- shared kernel pieces
#
# The plain (precomputed-xg1) and projection-fused kernel pairs share all
# of the two-layer recurrence body except how the layer-1 gates are formed
# and how dgates1 leaves the kernel; the shared pieces live here ONCE so a
# numerics or masking fix cannot silently diverge the two paths.


def _make_ref_dot(mm):
    """dot(a, w_ref) with the optional reduced-precision matmul operands."""
    def dot(a, w_ref):
        w = w_ref[:]
        if mm is not None:
            a, w = a.astype(mm), w.astype(mm)
        return jnp.dot(a, w, preferred_element_type=jnp.float32)
    return dot


def _zero_when(cond, bufs):
    @pl.when(cond)
    def _():
        for buf in bufs:
            buf[:] = jnp.zeros_like(buf)


def _fwd_tail(g1, w2x_ref, w2h_ref, b2_ref, tops_ref, resid_ref, h2last_ref,
              h1, c1, h2, c2, hid, dot):
    """Everything after the layer-1 gates: both cells, carry updates, and
    the output/residual/h2-last stores."""
    h1n, c1n = _cell_fwd(g1, c1[:], hid)
    g2 = dot(h1n, w2x_ref) + dot(h2[:], w2h_ref) + b2_ref[:]
    h2n, c2n = _cell_fwd(g2, c2[:], hid)
    h1[:], c1[:], h2[:], c2[:] = h1n, c1n, h2n, c2n
    tops_ref[:] = h2n
    resid_ref[:] = jnp.concatenate([h1n, c1n, c2n], axis=1)
    h2last_ref[:] = h2n  # revisited block: the t = T-1 write is flushed


def _make_bwd_fns(mm):
    """(cast, dot, nt, tn): the backward's matmul helpers. ``nt``/``tn``
    are contracted-dim dot_generals expressing A @ W.T / A.T @ B without
    explicit transposes (Mosaic handles transposed contraction natively
    on the MXU)."""
    def cast(a):
        return a if mm is None else a.astype(mm)

    def dot(a, b):
        return jnp.dot(cast(a), b, preferred_element_type=jnp.float32)

    def nt(a, b):  # [M,K] x [N,K] -> [M,N]
        return jax.lax.dot_general(
            cast(a), cast(b), (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)

    def tn(a, b):  # [K,M] x [K,N] -> [M,N]
        return jax.lax.dot_general(
            cast(a), cast(b), (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)

    return cast, dot, nt, tn


def _bwd_carry_init(first_t, i_bt, gh2_ref, dh1, dc1, dh2, dc2, accs):
    """Reset the carry adjoints at the start of each batch tile's reversed
    sweep (dh2 seeds from the last-step gradient) and zero the weight-grad
    accumulators once, on the very first grid step."""
    @pl.when(first_t)
    def _():
        dh1[:] = jnp.zeros_like(dh1)
        dc1[:] = jnp.zeros_like(dc1)
        dh2[:] = gh2_ref[:]
        dc2[:] = jnp.zeros_like(dc2)

    _zero_when(jnp.logical_and(first_t, i_bt == 0), accs)


def _unpack_resid(resid_ref, residp_ref, topsp_ref, t_is_zero, hid):
    """(h1, c1, c2) at t, and the t-1 views masked to zero at the t=0
    boundary (the ``prev`` BlockSpec clamps the row index there)."""
    h1_t = resid_ref[:, :hid]
    c1_t = resid_ref[:, hid : 2 * hid]
    c2_t = resid_ref[:, 2 * hid :]
    h1_prev = jnp.where(t_is_zero, 0.0, residp_ref[:, :hid])
    c1_prev = jnp.where(t_is_zero, 0.0, residp_ref[:, hid : 2 * hid])
    c2_prev = jnp.where(t_is_zero, 0.0, residp_ref[:, 2 * hid :])
    h2_prev = jnp.where(t_is_zero, 0.0, topsp_ref[:])
    return h1_t, c1_t, c2_t, h1_prev, c1_prev, c2_prev, h2_prev


def _bwd_layer2(h1_t, h2_prev, c2_prev, c2_t, w2x_ref, w2h_ref, b2_ref,
                gtops_ref, dh2, dc2, aw2x, aw2h, ab2, hid, cast, dot,
                nt, tn):
    """Layer-2 recompute + adjoint; updates the layer-2 carries and weight
    accumulators and returns dgates2 for layer 1's dh contribution."""
    g2 = dot(h1_t, cast(w2x_ref[:])) + dot(h2_prev, cast(w2h_ref[:])) + b2_ref[:]
    dh2_tot = dh2[:] + gtops_ref[:]
    dgates2, dc2_prev = _cell_bwd(g2, c2_prev, c2_t, dh2_tot, dc2[:], hid)
    dh2[:] = nt(dgates2, w2h_ref[:])
    dc2[:] = dc2_prev
    aw2x[:] += tn(h1_t, dgates2)
    aw2h[:] += tn(h2_prev, dgates2)
    ab2[:] += jnp.sum(dgates2, axis=0, keepdims=True)
    return dgates2


def _accum_revisited(ref, val, first_t):
    """Accumulate into a revisited output block across the time sweep:
    overwrite on the tile's first step, add afterwards (Pallas flushes
    the block once per batch tile)."""
    @pl.when(first_t)
    def _():
        ref[:] = val

    @pl.when(jnp.logical_not(first_t))
    def _():
        ref[:] += val


def _mask_boundary(t_is_zero, dh1, dh2):
    """At t=0 the "previous h" is zero, so the recurrent gradient must not
    flow further back (the next bt tile re-inits anyway)."""
    zeros_bh = jnp.zeros_like(dh1[:])
    dh1[:] = jnp.where(t_is_zero, zeros_bh, dh1[:])
    dh2[:] = jnp.where(t_is_zero, zeros_bh, dh2[:])


# ---------------------------------------------------------------- forward


def _fwd_kernel(xg1_ref, w1h_ref, w2x_ref, w2h_ref, b2_ref,
                tops_ref, resid_ref, h2last_ref,
                h1, c1, h2, c2, *, hid, mm):
    t = pl.program_id(1)
    _zero_when(t == 0, (h1, c1, h2, c2))
    dot = _make_ref_dot(mm)
    g1 = xg1_ref[:] + dot(h1[:], w1h_ref)
    _fwd_tail(g1, w2x_ref, w2h_ref, b2_ref, tops_ref, resid_ref, h2last_ref,
              h1, c1, h2, c2, hid, dot)


def _fwd_call(xg1, w1h, w2x, w2h, b2, bt, interpret, mm, const_x, T):
    """Time-major fwd dispatch.

    ``xg1``: ``[T*B, 4H]`` (time-major rows), or ``[B, 4H]`` when
    ``const_x`` (the same projected input at every step — decoder mode;
    Pallas keeps the revisited block in VMEM, one DMA per batch tile).
    Returns ``(tops [T*B, H], resid [T*B, 3H], h2 [B, H])``. The backward's
    per-step activations (h1 | c1 | c2) travel as ONE fused residual stream
    so each grid step issues one wide DMA instead of three narrow ones.
    """
    hid = w1h.shape[0]
    H4 = 4 * hid
    B = xg1.shape[0] if const_x else xg1.shape[0] // T
    n_bt = B // bt
    const = lambda i, t: (0, 0)  # noqa: E731
    step = lambda i, t: (t * n_bt + i, 0)  # noqa: E731
    xg_map = (lambda i, t: (i, 0)) if const_x else step
    return pl.pallas_call(
        functools.partial(_fwd_kernel, hid=hid, mm=mm),
        grid=(n_bt, T),
        in_specs=[
            pl.BlockSpec((bt, H4), xg_map, memory_space=pltpu.VMEM),
            pl.BlockSpec((hid, H4), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((hid, H4), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((hid, H4), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, H4), const, memory_space=pltpu.VMEM),
        ],
        out_shape=(
            jax.ShapeDtypeStruct((T * B, hid), jnp.float32),
            jax.ShapeDtypeStruct((T * B, 3 * hid), jnp.float32),
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
                dh1, dc1, dh2, dc2, aw1h, aw2x, aw2h, ab2,
                *, hid, T, mm, const_x):
    i_bt = pl.program_id(0)
    i = pl.program_id(1)  # reversed step: time t = T-1-i
    first_t = i == 0
    t_is_zero = i == T - 1
    _bwd_carry_init(first_t, i_bt, gh2_ref, dh1, dc1, dh2, dc2,
                    (aw1h, aw2x, aw2h, ab2))
    cast, dot, nt, tn = _make_bwd_fns(mm)
    h1_t, c1_t, c2_t, h1_prev, c1_prev, c2_prev, h2_prev = _unpack_resid(
        resid_ref, residp_ref, topsp_ref, t_is_zero, hid)

    dgates2 = _bwd_layer2(h1_t, h2_prev, c2_prev, c2_t, w2x_ref, w2h_ref,
                          b2_ref, gtops_ref, dh2, dc2, aw2x, aw2h, ab2,
                          hid, cast, dot, nt, tn)

    # ---- layer 1
    g1 = xg1_ref[:] + dot(h1_prev, cast(w1h_ref[:]))
    dh1_tot = dh1[:] + nt(dgates2, w2x_ref[:])
    dgates1, dc1_prev = _cell_bwd(g1, c1_prev, c1_t, dh1_tot, dc1[:], hid)
    dh1[:] = nt(dgates1, w1h_ref[:])
    dc1[:] = dc1_prev
    aw1h[:] += tn(h1_prev, dgates1)
    if const_x:
        # the same input fed every step: dxg1 accumulates over time in the
        # revisited [bt, 4H] output block
        _accum_revisited(dxg1_ref, dgates1, first_t)
    else:
        dxg1_ref[:] = dgates1

    _mask_boundary(t_is_zero, dh1, dh2)

    is_last = jnp.logical_and(i == T - 1, i_bt == pl.num_programs(0) - 1)

    @pl.when(is_last)
    def _():
        dw1h_ref[:] = aw1h[:]
        dw2x_ref[:] = aw2x[:]
        dw2h_ref[:] = aw2h[:]
        db2_ref[:] = ab2[:]


def _bwd_call(xg1, resid, tops, w1h, w2x, w2h, b2,
              g_tops, g_h2, bt, interpret, mm, const_x, T):
    hid = w1h.shape[0]
    H4 = 4 * hid
    B = xg1.shape[0] if const_x else xg1.shape[0] // T
    n_bt = B // bt
    const = lambda i, t: (0, 0)  # noqa: E731
    rev = lambda i, t: ((T - 1 - t) * n_bt + i, 0)  # noqa: E731
    # "previous step" views: row block at time T-2-t, clamped at t = T-1
    # (masked in-kernel)
    prev = lambda i, t: (jnp.maximum(T - 2 - t, 0) * n_bt + i, 0)  # noqa: E731
    xg_map = (lambda i, t: (i, 0)) if const_x else rev
    w_spec = pl.BlockSpec((hid, H4), const, memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(_bwd_kernel, hid=hid, T=T, mm=mm, const_x=const_x),
        grid=(n_bt, T),
        in_specs=[
            pl.BlockSpec((bt, H4), xg_map, memory_space=pltpu.VMEM),  # xg1
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
            jax.ShapeDtypeStruct(xg1.shape, jnp.float32),
            jax.ShapeDtypeStruct((hid, H4), jnp.float32),
            jax.ShapeDtypeStruct((hid, H4), jnp.float32),
            jax.ShapeDtypeStruct((hid, H4), jnp.float32),
            jax.ShapeDtypeStruct((1, H4), jnp.float32),
        ),
        out_specs=(
            pl.BlockSpec((bt, H4), xg_map, memory_space=pltpu.VMEM),
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


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7, 8, 9))
def _lstm2(xg1, w1h, w2x, w2h, b2, bt, interpret, mm, const_x, T):
    tops, _, h2 = _fwd_call(xg1, w1h, w2x, w2h, b2, bt, interpret, mm,
                            const_x, T)
    return tops, h2


def _lstm2_fwd(xg1, w1h, w2x, w2h, b2, bt, interpret, mm, const_x, T):
    tops, resid, h2 = _fwd_call(xg1, w1h, w2x, w2h, b2, bt, interpret, mm,
                                const_x, T)
    return (tops, h2), (xg1, resid, tops, w1h, w2x, w2h, b2)


def _lstm2_bwd(bt, interpret, mm, const_x, T, res, grads):
    xg1, resid, tops, w1h, w2x, w2h, b2 = res
    g_tops, g_h2 = grads
    dxg1, dw1h, dw2x, dw2h, db2 = _bwd_call(
        xg1, resid, tops, w1h, w2x, w2h, b2, g_tops, g_h2, bt, interpret,
        mm, const_x, T,
    )
    return dxg1, dw1h, dw2x, dw2h, db2.reshape(b2.shape)


_lstm2.defvjp(_lstm2_fwd, _lstm2_bwd)


# ------------------------------------------- projection-fused variant
#
# The z1/z2 encoder stacks are HBM-bound, and most of their traffic is the
# layer-1 gate tensor: the hoisted XLA projection writes ``[T*B, 4H]`` to
# HBM, the fwd kernel reads it back, the bwd kernel writes ``dxg1`` of the
# same size, and XLA reads THAT twice more (dx and dW matmuls) — ~170 MB
# per encoder per b1024 step against ~6.5 MB of raw input. This variant
# streams raw ``x`` instead and runs the input projection on the MXU
# inside the kernel (fwd: one extra [bt, D] x [D, 4H] per grid step; bwd:
# recompute + dx/dW1x/db1 accumulated in VMEM), eliminating the gate
# tensor from HBM entirely. The optional ``xgc`` operand carries the
# z-conditioned additive gate block of the z1 encoder ([B, 4H], revisited
# per batch tile) or collapses to the b1 bias row.


def _fwd_kernel_p(x_ref, w1x_ref, xgc_ref, w1h_ref, w2x_ref, w2h_ref,
                  b2_ref, tops_ref, resid_ref, h2last_ref,
                  h1, c1, h2, c2, *, hid, mm):
    t = pl.program_id(1)
    _zero_when(t == 0, (h1, c1, h2, c2))
    dot = _make_ref_dot(mm)
    g1 = dot(x_ref[:], w1x_ref) + xgc_ref[:] + dot(h1[:], w1h_ref)
    _fwd_tail(g1, w2x_ref, w2h_ref, b2_ref, tops_ref, resid_ref, h2last_ref,
              h1, c1, h2, c2, hid, dot)


def _fwd_call_p(x, w1x, xgc, w1h, w2x, w2h, b2, bt, interpret, mm, T):
    hid = w1h.shape[0]
    H4 = 4 * hid
    d_in = x.shape[1]
    B = x.shape[0] // T
    n_bt = B // bt
    xgc_tile = xgc.shape[0] != 1
    const = lambda i, t: (0, 0)  # noqa: E731
    step = lambda i, t: (t * n_bt + i, 0)  # noqa: E731
    tile = lambda i, t: (i, 0)  # noqa: E731
    return pl.pallas_call(
        functools.partial(_fwd_kernel_p, hid=hid, mm=mm),
        grid=(n_bt, T),
        in_specs=[
            pl.BlockSpec((bt, d_in), step, memory_space=pltpu.VMEM),
            pl.BlockSpec((d_in, H4), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((bt if xgc_tile else 1, H4),
                         tile if xgc_tile else const,
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((hid, H4), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((hid, H4), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((hid, H4), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, H4), const, memory_space=pltpu.VMEM),
        ],
        out_shape=(
            jax.ShapeDtypeStruct((T * B, hid), jnp.float32),
            jax.ShapeDtypeStruct((T * B, 3 * hid), jnp.float32),
            jax.ShapeDtypeStruct((B, hid), jnp.float32),
        ),
        out_specs=(
            pl.BlockSpec((bt, hid), step, memory_space=pltpu.VMEM),
            pl.BlockSpec((bt, 3 * hid), step, memory_space=pltpu.VMEM),
            pl.BlockSpec((bt, hid), tile, memory_space=pltpu.VMEM),
        ),
        scratch_shapes=[pltpu.VMEM((bt, hid), jnp.float32) for _ in range(4)],
        cost_estimate=pl.CostEstimate(
            flops=2 * T * B * hid * H4 * 3 + 2 * T * B * d_in * H4,
            bytes_accessed=4 * T * B * (d_in + 4 * hid),
            transcendentals=8 * T * B * hid,
        ),
        interpret=interpret,
    )(x, w1x, xgc, w1h, w2x, w2h, b2.reshape(1, H4))


def _bwd_kernel_p(x_ref, xgc_ref, resid_ref, residp_ref, topsp_ref,
                  w1x_ref, w1h_ref, w2x_ref, w2h_ref, b2_ref,
                  gtops_ref, gh2_ref,
                  dx_ref, dxgc_ref, dw1x_ref, dw1h_ref, dw2x_ref, dw2h_ref,
                  db2_ref,
                  dh1, dc1, dh2, dc2, aw1x, aw1h, aw2x, aw2h, ab2, axgc,
                  *, hid, T, mm, xgc_tile):
    i_bt = pl.program_id(0)
    i = pl.program_id(1)  # reversed step: time t = T-1-i
    first_t = i == 0
    t_is_zero = i == T - 1
    _bwd_carry_init(first_t, i_bt, gh2_ref, dh1, dc1, dh2, dc2,
                    (aw1x, aw1h, aw2x, aw2h, ab2, axgc))
    cast, dot, nt, tn = _make_bwd_fns(mm)
    h1_t, c1_t, c2_t, h1_prev, c1_prev, c2_prev, h2_prev = _unpack_resid(
        resid_ref, residp_ref, topsp_ref, t_is_zero, hid)

    dgates2 = _bwd_layer2(h1_t, h2_prev, c2_prev, c2_t, w2x_ref, w2h_ref,
                          b2_ref, gtops_ref, dh2, dc2, aw2x, aw2h, ab2,
                          hid, cast, dot, nt, tn)

    # ---- layer 1 (recompute projected gates from raw x)
    g1 = (dot(x_ref[:], cast(w1x_ref[:])) + xgc_ref[:]
          + dot(h1_prev, cast(w1h_ref[:])))
    dh1_tot = dh1[:] + nt(dgates2, w2x_ref[:])
    dgates1, dc1_prev = _cell_bwd(g1, c1_prev, c1_t, dh1_tot, dc1[:], hid)
    dh1[:] = nt(dgates1, w1h_ref[:])
    dc1[:] = dc1_prev
    aw1x[:] += tn(x_ref[:], dgates1)
    aw1h[:] += tn(h1_prev, dgates1)
    dx_ref[:] = nt(dgates1, w1x_ref[:])
    if xgc_tile:
        # per-batch additive gate block: its grad accumulates over time in
        # the revisited [bt, 4H] output block
        _accum_revisited(dxgc_ref, dgates1, first_t)
    else:
        axgc[:] += jnp.sum(dgates1, axis=0, keepdims=True)

    _mask_boundary(t_is_zero, dh1, dh2)

    is_last = jnp.logical_and(i == T - 1, i_bt == pl.num_programs(0) - 1)

    @pl.when(is_last)
    def _():
        dw1x_ref[:] = aw1x[:]
        dw1h_ref[:] = aw1h[:]
        dw2x_ref[:] = aw2x[:]
        dw2h_ref[:] = aw2h[:]
        db2_ref[:] = ab2[:]
        if not xgc_tile:
            dxgc_ref[:] = axgc[:]


def _bwd_call_p(x, xgc, resid, tops, w1x, w1h, w2x, w2h, b2,
                g_tops, g_h2, bt, interpret, mm, T):
    hid = w1h.shape[0]
    H4 = 4 * hid
    d_in = x.shape[1]
    B = x.shape[0] // T
    n_bt = B // bt
    xgc_tile = xgc.shape[0] != 1
    const = lambda i, t: (0, 0)  # noqa: E731
    rev = lambda i, t: ((T - 1 - t) * n_bt + i, 0)  # noqa: E731
    prev = lambda i, t: (jnp.maximum(T - 2 - t, 0) * n_bt + i, 0)  # noqa: E731
    tile = lambda i, t: (i, 0)  # noqa: E731
    xgc_spec = pl.BlockSpec((bt if xgc_tile else 1, H4),
                            tile if xgc_tile else const,
                            memory_space=pltpu.VMEM)
    w_spec = pl.BlockSpec((hid, H4), const, memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(_bwd_kernel_p, hid=hid, T=T, mm=mm,
                          xgc_tile=xgc_tile),
        grid=(n_bt, T),
        in_specs=[
            pl.BlockSpec((bt, d_in), rev, memory_space=pltpu.VMEM),  # x
            xgc_spec,                                                # xgc
            pl.BlockSpec((bt, 3 * hid), rev, memory_space=pltpu.VMEM),
            pl.BlockSpec((bt, 3 * hid), prev, memory_space=pltpu.VMEM),
            pl.BlockSpec((bt, hid), prev, memory_space=pltpu.VMEM),  # tops t-1
            pl.BlockSpec((d_in, H4), const, memory_space=pltpu.VMEM),  # w1x
            w_spec, w_spec, w_spec,     # w1h, w2x, w2h
            pl.BlockSpec((1, H4), const, memory_space=pltpu.VMEM),  # b2
            pl.BlockSpec((bt, hid), rev, memory_space=pltpu.VMEM),  # g_tops
            pl.BlockSpec((bt, hid), tile, memory_space=pltpu.VMEM),  # g_h2
        ],
        out_shape=(
            jax.ShapeDtypeStruct(x.shape, jnp.float32),
            jax.ShapeDtypeStruct(xgc.shape, jnp.float32),
            jax.ShapeDtypeStruct((d_in, H4), jnp.float32),
            jax.ShapeDtypeStruct((hid, H4), jnp.float32),
            jax.ShapeDtypeStruct((hid, H4), jnp.float32),
            jax.ShapeDtypeStruct((hid, H4), jnp.float32),
            jax.ShapeDtypeStruct((1, H4), jnp.float32),
        ),
        out_specs=(
            pl.BlockSpec((bt, d_in), rev, memory_space=pltpu.VMEM),
            xgc_spec,
            pl.BlockSpec((d_in, H4), const, memory_space=pltpu.VMEM),
            w_spec, w_spec, w_spec,
            pl.BlockSpec((1, H4), const, memory_space=pltpu.VMEM),
        ),
        scratch_shapes=(
            [pltpu.VMEM((bt, hid), jnp.float32) for _ in range(4)]
            + [pltpu.VMEM((d_in, H4), jnp.float32)]
            + [pltpu.VMEM((hid, H4), jnp.float32) for _ in range(3)]
            + [pltpu.VMEM((1, H4), jnp.float32)]
            + [pltpu.VMEM((1, H4), jnp.float32)]
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * T * B * hid * H4 * 9 + 6 * T * B * d_in * H4,
            bytes_accessed=4 * T * B * (2 * d_in + 9 * hid),
            transcendentals=16 * T * B * hid,
        ),
        interpret=interpret,
    )(
        x, xgc, resid, resid, tops,
        w1x, w1h, w2x, w2h, b2.reshape(1, H4), g_tops, g_h2,
    )


@functools.partial(jax.custom_vjp, nondiff_argnums=(7, 8, 9, 10))
def _lstm2p(x, w1x, xgc, w1h, w2x, w2h, b2, bt, interpret, mm, T):
    tops, _, h2 = _fwd_call_p(x, w1x, xgc, w1h, w2x, w2h, b2, bt,
                              interpret, mm, T)
    return tops, h2


def _lstm2p_fwd(x, w1x, xgc, w1h, w2x, w2h, b2, bt, interpret, mm, T):
    tops, resid, h2 = _fwd_call_p(x, w1x, xgc, w1h, w2x, w2h, b2, bt,
                                  interpret, mm, T)
    return (tops, h2), (x, xgc, resid, tops, w1x, w1h, w2x, w2h, b2)


def _lstm2p_bwd(bt, interpret, mm, T, res, grads):
    x, xgc, resid, tops, w1x, w1h, w2x, w2h, b2 = res
    g_tops, g_h2 = grads
    dx, dxgc, dw1x, dw1h, dw2x, dw2h, db2 = _bwd_call_p(
        x, xgc, resid, tops, w1x, w1h, w2x, w2h, b2, g_tops, g_h2, bt,
        interpret, mm, T,
    )
    return dx, dw1x, dxgc, dw1h, dw2x, dw2h, db2.reshape(b2.shape)


_lstm2p.defvjp(_lstm2p_fwd, _lstm2p_bwd)


def lstm2_pallas_tm_proj(
    p: dict,
    x: jnp.ndarray,
    xgc: jnp.ndarray | None = None,
    *,
    T: int,
    block_batch: int = 256,
    interpret: bool = False,
    mm_dtype=None,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Projection-fused time-major entry: the kernel streams raw ``x``.

    Args:
        p: two-layer stack params (see :func:`lstm2_pallas`). The layer-1
            weight's first ``x.shape[-1]`` rows are the x-projection; any
            remaining input rows (e.g. the z1 encoder's z2 block) must be
            projected by the caller into ``xgc``.
        x: ``[T, B, D]`` time-major raw inputs.
        xgc: optional ``[B, 4H]`` additive gate block — the projection of
            the input's non-x part PLUS the layer-1 bias. When ``None``,
            the layer-1 bias row alone is used.
        T: number of time steps.

    Returns ``(tops [T, B, H], last_h [B, H])``.

    Versus :func:`lstm2_pallas_tm`, the ``[T*B, 4H]`` layer-1 gate tensor
    never exists in HBM: forward projects each ``[bt, D]`` block on the
    MXU in VMEM, backward recomputes it and emits ``dx``/``dw1x``/``db1``
    directly (dx via the transposed contraction, dw1x accumulated in VMEM
    across the grid). At the flagship b1024/H=128 config this removes
    ~340 MB of HBM traffic per encoder train step.
    """
    c1p, c2p, hid, _ = _split_stack(p)
    T_, B, d_in = x.shape
    assert T_ == T
    w1x = c1p["w"][:d_in]
    if xgc is None:
        xgc = c1p["b"].reshape(1, -1)
    w2x, w2h = c2p["w"][:hid], c2p["w"][hid:]
    w1h = c1p["w"][-hid:]
    mm = _resolve_mm(mm_dtype)

    bt = min(block_batch, _round_up(B, 8))
    b_pad = _round_up(B, bt)
    if b_pad != B:
        x = jnp.pad(x, ((0, 0), (0, b_pad - B), (0, 0)))
        if xgc.shape[0] != 1:
            xgc = jnp.pad(xgc, ((0, b_pad - B), (0, 0)))
    tops, h2 = _lstm2p(x.reshape(T * b_pad, d_in), w1x, xgc, w1h, w2x, w2h,
                       c2p["b"], bt, bool(interpret), mm, T)
    return tops.reshape(T, b_pad, hid)[:, :B], h2[:B]


def _resolve_mm(mm_dtype):
    if mm_dtype is None or mm_dtype == "float32":
        return None
    return jnp.dtype(mm_dtype)


def _split_stack(p):
    c1p, c2p = p["cells"]
    hid = c1p["w"].shape[1] // 4
    d_in = c1p["w"].shape[0] - hid
    return c1p, c2p, hid, d_in


def lstm2_pallas_tm(
    p: dict,
    xg1: jnp.ndarray,
    *,
    T: int,
    block_batch: int = 256,
    interpret: bool = False,
    mm_dtype=None,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Time-major entry: the caller supplies the layer-1 pre-activations.

    Args:
        p: two-layer stack params (see :func:`lstm2_pallas`).
        xg1: ``[T, B, 4H]`` layer-1 gate pre-activations (input projection
            + bias already applied, time-major), or ``[B, 4H]`` when the
            per-step input is constant over time (decoder mode — the
            broadcast over T never materializes).
        T: number of time steps.
        mm_dtype: optional matmul operand dtype (e.g. ``jnp.bfloat16``);
            carries/gates/accumulation stay fp32.

    Returns ``(tops [T, B, H] time-major, last_h [B, H])``.

    Why this entry exists: the model hoists the input projections itself
    (fusing the z2/z-conditioned parts, models/fhvae.py), and time-major
    ``[T, B, .]`` arrays collapse to the kernel's ``[T*B, .]`` row blocks
    for free — the batch-major interface cost real tiled-layout reshapes
    around every invocation.
    """
    c1p, c2p, hid, _ = _split_stack(p)
    const_x = xg1.ndim == 2
    B = xg1.shape[0] if const_x else xg1.shape[1]
    w2x, w2h = c2p["w"][:hid], c2p["w"][hid:]
    w1h = c1p["w"][-hid:]
    mm = _resolve_mm(mm_dtype)

    bt = min(block_batch, _round_up(B, 8))
    b_pad = _round_up(B, bt)
    if b_pad != B:
        pad = ((0, b_pad - B), (0, 0)) if const_x else \
            ((0, 0), (0, b_pad - B), (0, 0))
        xg1 = jnp.pad(xg1, pad)
    flat = xg1 if const_x else xg1.reshape(T * b_pad, 4 * hid)
    tops, h2 = _lstm2(flat, w1h, w2x, w2h, c2p["b"], bt, bool(interpret),
                      mm, const_x, T)
    return tops.reshape(T, b_pad, hid)[:, :B], h2[:B]


def lstm2_pallas(
    p: dict,
    xs: jnp.ndarray,
    cdt=None,
    *,
    block_batch: int = 256,
    interpret: bool = False,
    mm_dtype=None,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Drop-in for models.fhvae.run_lstm on two-layer equal-width stacks.

    Args:
        p: ``{"cells": [{"w": [D+H, 4H], "b": [4H]}, {"w": [2H, 4H], "b"}]}``.
        xs: ``[B, T, D]`` inputs (batch-major, like run_lstm).
        cdt: optional compute dtype for the hoisted input projection.
        mm_dtype: optional in-kernel matmul operand dtype (see
            :func:`lstm2_pallas_tm`).

    Returns ``(seq [B, T, H], last_h [B, H])``, matching run_lstm.

    ``cdt`` is accepted for interface parity with run_lstm but unused: the
    input projection runs INSIDE the kernel (lstm2_pallas_tm_proj), where
    ``mm_dtype`` governs all matmul operand casting.
    """
    del cdt
    B, T, d_in = xs.shape
    tops, h2 = lstm2_pallas_tm_proj(
        p, jnp.swapaxes(xs, 0, 1), None, T=T, block_batch=block_batch,
        interpret=interpret, mm_dtype=mm_dtype)
    return jnp.swapaxes(tops, 0, 1), h2
