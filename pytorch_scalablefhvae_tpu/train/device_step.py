"""Train steps that gather their batches from a device-resident store.

Counterpart of ``train/step.py``'s host-fed steps: instead of taking a
``[B, seg_len, dim]`` features array shipped from the host every step, these
programs take the staged packed store (data/device_store.py) plus the epoch's
index plan, and build the batch *inside* the compiled program with one HBM
gather — host->device traffic per dispatch is two scalars (plan offset and
real-row count travel with the plan upload / dispatch arguments).

Equivalence contract (tested): given the same epoch permutation, these steps
produce the same parameter trajectory as the host-loader path — padding rows
carry weight 0, so their (arbitrary) gathered content contributes exactly
zero gradient, same as the host loader's padded tail rows.

Sharding: under a mesh the gathered batch is constrained to the "data" axis
(pure DP, as in parallel/sharded_step.py). The store is replicated by
default; with ``shard_store=True`` it is row-sharded over "model" and the
gather runs under ``shard_map`` — each shard contributes the rows it owns and
a ``psum`` over "model" rebuilds full segments (SURVEY.md §2.3's collective
style, applied to the input pipeline).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax import shard_map
from jax.sharding import NamedSharding, PartitionSpec as P

from pytorch_scalablefhvae_tpu.models.base import (
    METRIC_KEYS as _METRIC_KEYS,
    loss_from_outputs,
)
from pytorch_scalablefhvae_tpu.train.step import TrainState


def _make_gather(seg_len: int, mesh, shard_store: bool):
    """Build the [B] starts -> [B, seg_len, dim] segment gather.

    ``store`` is either the staged ``[rows, dim]`` array or — for the int8
    staging tier — a ``(q uint8 [rows, dim], scale f32 [dim], offset f32
    [dim])`` tuple (data/quantize.py): the gather reads the byte rows and
    dequantizes ``q * scale + offset`` in-graph, so the full-precision
    features never exist in HBM — only the ``[B, seg_len, dim]`` batch does.
    """

    def abs_index(starts):
        return starts[:, None] + jnp.arange(seg_len, dtype=starts.dtype)[None, :]

    def dequant(g, store):
        if isinstance(store, tuple):
            _, scale, offset = store
            return g.astype(jnp.float32) * scale + offset
        return g

    def rows_of(store):
        return store[0] if isinstance(store, tuple) else store

    if mesh is None or not shard_store:
        def gather(store, starts):
            g = jnp.take(rows_of(store), abs_index(starts), axis=0)
            return dequant(g, store)

        return gather

    def gather_local(store_loc, idx):
        # store row-sharded over "model": each shard owns rows
        # [m_i * rows_local, (m_i + 1) * rows_local); contribute owned rows,
        # zero elsewhere, and psum over "model" to rebuild full segments.
        # int8 stores dequantize BEFORE the mask/psum (scale/offset are
        # replicated), so non-owned rows contribute exact zeros in f32.
        store_rows = rows_of(store_loc)
        rows_local = store_rows.shape[0]
        rel = idx - jax.lax.axis_index("model") * rows_local
        ok = (rel >= 0) & (rel < rows_local)
        g = jnp.take(store_rows, jnp.clip(rel, 0, rows_local - 1), axis=0)
        g = dequant(g, store_loc)
        g = jnp.where(ok[..., None], g, jnp.zeros((), g.dtype))
        return jax.lax.psum(g, "model")

    def gather(store, starts):
        # the scale/offset legs of a tuple store are replicated alongside
        # the row-sharded byte rows
        store_specs = ((P("model", None), P(None), P(None))
                       if isinstance(store, tuple) else P("model", None))
        mapped = shard_map(
            gather_local,
            mesh=mesh,
            in_specs=(store_specs, P("data", None)),
            out_specs=P("data", None, None),
            check_vma=False,
        )
        return mapped(store, abs_index(starts))

    return gather


def _make_batch_views(seg_len: int, batch_size: int, mesh, shard_store: bool):
    """Shared per-batch prologue for every device-resident pass: slice the
    plan rows at ``off``, build the padding weight mask, gather segments
    from the staged store, and look up per-sequence nsegs — with "data"
    sharding constraints applied under a mesh. The ONE definition the train,
    eval, and encode scan bodies all use."""
    gather = _make_gather(seg_len, mesh, shard_store)
    B = batch_size
    data_sh = (NamedSharding(mesh, P("data")) if mesh is not None else None)

    def views(store, seq_idx_all, starts_all, nsegs_tab, off, n_real):
        seq_idx = jax.lax.dynamic_slice_in_dim(seq_idx_all, off, B)
        starts = jax.lax.dynamic_slice_in_dim(starts_all, off, B)
        weight = ((off + jnp.arange(B, dtype=jnp.int32)) < n_real).astype(
            jnp.float32
        )
        if data_sh is not None:
            seq_idx = jax.lax.with_sharding_constraint(seq_idx, data_sh)
            starts = jax.lax.with_sharding_constraint(starts, data_sh)
            weight = jax.lax.with_sharding_constraint(weight, data_sh)
        feats = gather(store, starts).astype(jnp.float32)
        if nsegs_tab is None:
            # MAP passes: the z2-trunk encode needs no per-sequence nsegs
            return feats, seq_idx, None, weight
        nsegs = jnp.take(nsegs_tab, seq_idx, axis=0, mode="clip")
        if data_sh is not None:
            nsegs = jax.lax.with_sharding_constraint(nsegs, data_sh)
        return feats, seq_idx, nsegs, weight

    return views


def _compile_on_mesh(mesh, fn, shard_store: bool, lead_shardings,
                     n_tail: int, out_shardings=None, donate_argnums=()):
    """Lazily jit ``fn(lead, store, *tail)`` with mesh shardings: ``lead``
    (state or params) via ``lead_shardings``, the staged store replicated or
    row-sharded, everything else replicated. Compilation is deferred to the
    first call so the lead argument's pytree is available;
    ``out_shardings`` may be a callable of the resolved lead shardings (the
    train step pins its output state to the input's layout so donation and
    the next call's in_shardings line up)."""
    repl = NamedSharding(mesh, P())
    store_sh = (NamedSharding(mesh, P("model", None)) if shard_store else repl)
    compiled = {}

    def run(lead, store, *tail):
        if not compiled:
            lead_sh = lead_shardings(lead)
            out_sh = (out_shardings(lead_sh) if callable(out_shardings)
                      else out_shardings)
            # int8 tuple stores: only the [rows, dim] byte rows are
            # row-shardable; the per-column scale/offset legs replicate
            store_in = jax.tree.map(
                lambda x: store_sh if np.ndim(x) == 2 else repl, store)
            compiled["fn"] = jax.jit(
                fn,
                in_shardings=(lead_sh, store_in) + (repl,) * n_tail,
                out_shardings=out_sh,
                donate_argnums=donate_argnums,
            )
        return compiled["fn"](lead, store, *tail)

    return run


def make_device_train_step(
    model,
    optimizer,
    alpha: float,
    seg_len: int,
    batch_size: int,
    k: int,
    mesh=None,
    shard_store: bool = False,
    donate: bool = True,
):
    """K bundled optimizer steps reading from the staged store.

    Returned callable:
        ``step(state, store, seq_idx_all, starts_all, nsegs_tab, base, n_real)
        -> (state, metrics)`` with each metric stacked ``[k]``.

    ``base`` (int32): offset of this dispatch's first segment in the plan.
    ``n_real`` (int32): total real segments in the plan; rows at global
    positions >= n_real get weight 0.
    """
    views = _make_batch_views(seg_len, batch_size, mesh, shard_store)
    B = batch_size

    def multi_fn(state: TrainState, store, seq_idx_all, starts_all, nsegs_tab,
                 base, n_real):
        def body(state, k_i):
            feats, seq_idx, nsegs, weight = views(
                store, seq_idx_all, starts_all, nsegs_tab,
                base + k_i * B, n_real)
            step_key = jax.random.fold_in(state.rng, state.step)

            def loss_fn(params):
                out = model.apply(params, feats, seq_idx, nsegs, step_key,
                                  sample=True)
                return loss_from_outputs(out, weight, alpha)

            (loss, metrics), grads = jax.value_and_grad(
                loss_fn, has_aux=True
            )(state.params)
            updates, new_opt = optimizer.update(grads, state.opt_state,
                                                state.params)
            new_params = optax.apply_updates(state.params, updates)
            return (
                TrainState(new_params, new_opt, state.step + 1, state.rng),
                metrics,
            )

        return jax.lax.scan(body, state, jnp.arange(k, dtype=jnp.int32))

    donate_argnums = (0,) if donate else ()
    if mesh is None:
        return jax.jit(multi_fn, donate_argnums=donate_argnums)

    from pytorch_scalablefhvae_tpu.parallel.mesh import state_shardings

    repl = NamedSharding(mesh, P())
    return _compile_on_mesh(
        mesh, multi_fn, shard_store,
        lambda state: state_shardings(mesh, state), n_tail=5,
        out_shardings=lambda st_sh: (st_sh, {m: repl for m in _METRIC_KEYS}),
        donate_argnums=donate_argnums,
    )


def make_device_eval_pass(model, alpha: float, seg_len: int, batch_size: int,
                          n_batches: int, mesh=None, shard_store: bool = False):
    """Whole-split evaluation as ONE dispatched program over the staged store.

    The per-epoch dev evaluation otherwise re-ships the entire dev split over
    the host link every epoch (two passes: MAP encode + scoring). This scans
    all ``n_batches`` eval batches inside one compiled program, gathering
    segments from HBM, and returns per-batch weighted metric sums stacked
    ``[n_batches]`` (plus "count") — the host reduces them in float64,
    matching train.loop.evaluate_split's accumulation semantics exactly.

    Eval is deterministic (``sample=False``), so no key is threaded.
    """
    views = _make_batch_views(seg_len, batch_size, mesh, shard_store)
    B = batch_size

    def pass_fn(params, store, seq_idx_all, starts_all, nsegs_tab,
                n_real, table):
        def body(carry, b_i):
            feats, seq_idx, nsegs, weight = views(
                store, seq_idx_all, starts_all, nsegs_tab, b_i * B, n_real)
            out = model.apply(params, feats, seq_idx, nsegs,
                              jax.random.PRNGKey(0), sample=False,
                              mu2_table=table)
            _loss, metrics = loss_from_outputs(out, weight, alpha)
            n = jnp.sum(weight)
            sums = {k: v * n for k, v in metrics.items()}
            sums["count"] = n
            return carry, sums

        _, stacked = jax.lax.scan(body, None,
                                  jnp.arange(n_batches, dtype=jnp.int32))
        return stacked

    if mesh is None:
        return jax.jit(pass_fn)

    from pytorch_scalablefhvae_tpu.parallel.mesh import params_shardings

    return _compile_on_mesh(mesh, pass_fn, shard_store,
                            lambda params: params_shardings(mesh, params),
                            n_tail=5)


def make_device_map_pass(model, seg_len: int, batch_size: int,
                         n_batches: int, num_rows: int, pz2_var: float,
                         mesh=None, shard_store: bool = False,
                         pmu2_var: float = 1.0, shard_table: bool = True):
    """Whole-subset MAP mu2 table as ONE device program.

    Fuses the hierarchical round's entire turnover — encode every segment of
    the round subset, accumulate per-sequence z2-mean sums/counts, and apply
    the closed-form MAP posterior mean ``sum / (count + pz2_var/pmu2_var)``
    (train/loop.py:_map_table, utils.py:58-59 intent) — into one dispatch
    that returns the ``[num_rows, z2_dim]`` replacement table directly in
    HBM. Nothing round-trips the host: the prior encode-pass formulation
    fetched ``[n_seg, z2_dim]`` means, ran the scatter-add on the host, and
    re-uploaded the table, leaving the device idle for the whole host leg
    (31% round overhead at LibriSpeech scale, BENCH_r03).

    Rows in ``[num_seqs, num_rows)`` (mesh padding) accumulate zero counts
    and finish as exact zeros — identical to the host path's zero-padding.
    Accumulation is fp32 on device (the host path used fp64); with <= a few
    thousand segments per sequence the difference is ~1e-6 relative, covered
    by tests/test_device_data.py.

    The encoder leg runs ``model.encode_z2`` — the z2 trunk alone, ~3x less
    compute than the full encoder (no z1 stack / decoder / sampling heads)
    — and ``batch_size`` is independent of the training batch: the round
    loop passes a larger one (fewer, fatter scan iterations; the pass is
    embarrassingly parallel over segments).
    """
    scan_fn = _make_map_scan(model, seg_len, batch_size, n_batches, num_rows,
                             pz2_var / pmu2_var, mesh, shard_store,
                             shard_table)

    if mesh is None:
        return jax.jit(scan_fn)

    from pytorch_scalablefhvae_tpu.parallel.mesh import params_shardings

    return _compile_on_mesh(mesh, scan_fn, shard_store,
                            lambda params: params_shardings(mesh, params),
                            n_tail=3)


def make_device_map_pass_rows(model, seg_len: int, seg_shift: int,
                              batch_size: int, n_batches: int,
                              num_rows: int, pz2_var: float,
                              mesh=None, shard_store: bool = False,
                              pmu2_var: float = 1.0,
                              shard_table: bool = True):
    """MAP mu2 table from per-SEQUENCE metadata only: O(K) upload per round.

    Same program as :func:`make_device_map_pass`, but the per-segment plan
    (owning row + absolute start of every segment) is derived IN-GRAPH from
    the round subset's ``sel_starts [K]`` (absolute frame offset of each
    selected sequence in the staged pack) and ``sel_nsegs [K]`` (its
    deterministic-windowing segment count): segment r of the flat schedule
    belongs to sequence ``k = searchsorted(cumsum(sel_nsegs), r, 'right')``
    at within-sequence index ``j = r - cum[k-1]``, frame
    ``sel_starts[k] + j * seg_shift`` (data/segments.py:make_segments,
    deterministic mode). The hierarchical round loop uploads two [K] int32
    vectors per round instead of three [n_segments] arrays — at
    LibriSpeech-960 round sizes, ~40 KB instead of ~8 MB, and zero host
    plan-building work. Deterministic windowing only (``rand_seg`` rounds
    fall back to the array-plan pass).
    """
    scan_fn = _make_map_scan(model, seg_len, batch_size, n_batches, num_rows,
                             pz2_var / pmu2_var, mesh, shard_store,
                             shard_table)
    rows = n_batches * batch_size

    def pass_fn(params, store, sel_starts, sel_nsegs):
        cum = jnp.cumsum(sel_nsegs.astype(jnp.int32))
        n_real = cum[-1]
        r = jnp.arange(rows, dtype=jnp.int32)
        k = jnp.searchsorted(cum, r, side="right").astype(jnp.int32)
        k = jnp.minimum(k, sel_nsegs.shape[0] - 1)  # padding rows -> last
        prev = jnp.where(k > 0, jnp.take(cum, jnp.maximum(k - 1, 0)), 0)
        j = r - prev
        starts_all = (jnp.take(sel_starts.astype(jnp.int32), k)
                      + j * jnp.int32(seg_shift))
        # padding rows (r >= n_real) would index past the pack; jnp.take's
        # out-of-bounds fill is NaN and NaN * 0-weight still poisons the
        # accumulators — pin them to frame 0 (weight 0 discards the content)
        starts_all = jnp.where(r < n_real, starts_all, 0)
        return scan_fn(params, store, k, starts_all, n_real)

    if mesh is None:
        return jax.jit(pass_fn)

    from pytorch_scalablefhvae_tpu.parallel.mesh import params_shardings

    return _compile_on_mesh(mesh, pass_fn, shard_store,
                            lambda params: params_shardings(mesh, params),
                            n_tail=2)


def make_device_map_pass_chunked(model, seg_len: int, seg_shift: int,
                                 batch_size: int, n_batches: int,
                                 num_rows: int, pz2_var: float,
                                 spb: int = 16, pmu2_var: float = 1.0,
                                 chunk_skip: int = 1,
                                 interpret: bool = False):
    """MAP mu2 table with the Pallas chunked-DMA window gather.

    Same O(K)-upload contract as :func:`make_device_map_pass_rows`
    (``pass_fn(params, store, sel_starts [K], sel_nsegs [K])``), but the
    schedule is laid out in CHUNKS of ``spb`` consecutive windows of one
    sequence, each fetched as a single contiguous region DMA
    (ops/window_gather_pallas.py) instead of per-row XLA gathers — the
    gather leg runs at HBM bandwidth rather than the gather unit's
    ~5 G elem/s. Each sequence's window count is padded up to a multiple of
    ``spb`` (the pad windows carry weight 0 and read frames past the
    sequence's span — garbage or the staged pack's zero slack, never
    consumed); ``batch_size`` must be a multiple of ``spb``; the staged
    store must keep ``(spb - 1) * seg_shift + seg_len`` rows of tail slack
    (data/device_store.py:STORE_TAIL_SLACK). Single-device only — the
    pallas_call does not partition under GSPMD; mesh runs use the
    array-plan/rows passes.

    HBM note: the gather kernel's region DMAs need a 128-multiple feature
    dim, so the pass lane-pads the staged store ONCE per dispatch in-graph
    (hoisted out of the batch scan) — a TRANSIENT copy of the whole store
    at ``(-dim % 128) / dim`` extra relative size (60% at dim=80) that
    frees when the pass returns. Callers sizing staging against a budget
    must account for that peak (train/loop.py's round-staging gate does).

    ``chunk_skip > 1`` subsamples the MAP estimate: only every
    ``chunk_skip``-th chunk of ``spb`` consecutive windows is encoded
    (bursts spread evenly across each sequence's span). The table this
    pass produces is an INITIALIZATION the round's Adam steps immediately
    refine, z2 is by construction a sequence-level factor present in every
    segment, and adjacent windows overlap ``(seg_len - seg_shift)`` frames
    anyway — so a stride-``chunk_skip`` burst sample changes the MAP mean
    negligibly while cutting the encode compute by that factor (the
    reference's estimate likewise used whatever segments its loader
    happened to produce, utils.py:45-60). Use ``chunk_skip=1`` where the
    estimate itself is the product (dev-eval MAP tables).
    """
    from pytorch_scalablefhvae_tpu.data.device_store import STORE_TAIL_SLACK
    from pytorch_scalablefhvae_tpu.ops.window_gather_pallas import (
        windowed_chunk_gather,
    )

    # int8 tuple stores don't flow through the region-DMA kernel (it reads
    # raw rows); callers gate on transfer_dtype and use the array-plan/rows
    # passes, whose gather dequantizes in-graph (_make_gather)
    B = batch_size
    assert B % spb == 0, "batch_size must be a multiple of spb"
    # the staged pack's tail slack must cover a full chunk region: the
    # last chunk of the pack-final sequence DMAs (spb-1)*stride + seg_len
    # rows starting at its first frame, possibly all past that sequence's
    # span (weight-0 padding windows) — an unchecked overhang would read
    # out of bounds on real TPU with no error
    region = (spb - 1) * seg_shift + seg_len
    if region > STORE_TAIL_SLACK:
        raise ValueError(
            f"chunk region (spb-1)*seg_shift+seg_len = {region} exceeds the "
            f"staged store's tail slack ({STORE_TAIL_SLACK}); lower spb or "
            f"use the array-plan/rows MAP passes"
        )
    cpb = B // spb  # chunks per batch
    rows = n_batches * B

    def pass_fn(params, store, sel_starts, sel_nsegs):
        # the UNPADDED feature width, captured before lane-padding so
        # batch_fn can slice the gathered windows back to what the encoder
        # expects (shapes are static at trace time)
        d = store.shape[1]

        def batch_fn(store, plan, b_i):
            seq_all, valid_all, chunk_starts_all = plan
            off = b_i * B
            seq_idx = jax.lax.dynamic_slice_in_dim(seq_all, off, B)
            valid = jax.lax.dynamic_slice_in_dim(valid_all, off, B)
            chunk_starts = jax.lax.dynamic_slice_in_dim(
                chunk_starts_all, b_i * cpb, cpb)
            feats = windowed_chunk_gather(
                store, chunk_starts, spb=spb, seg_len=seg_len,
                stride=seg_shift, interpret=interpret)
            return feats[..., :d], seq_idx, valid

        scan_fn = _map_scan_core(model, n_batches, num_rows,
                                 pz2_var / pmu2_var, None, True, batch_fn)
        # Lane-pad the store ONCE, outside the batch scan: the gather
        # kernel needs a 128-multiple feature dim for its HBM region DMAs
        # (ops/window_gather_pallas.py docstring) and pads internally, but
        # XLA does not hoist that full-store pad out of the while loop —
        # measured 3.3 ms/iteration (117 ms of a 210 ms pass) re-padding
        # 2M rows per batch on v5e before this was lifted here.
        if store.shape[1] % 128:
            store = jnp.pad(
                store, ((0, 0), (0, -store.shape[1] % 128)))
        # per-sequence chunk layout: sequence k owns chunks
        # [cumc[k-1], cumc[k]) with cps[k] = ceil(ceil(nseg/spb)/skip);
        # its rows are the chunks' spb windows, the tail ones weight-0
        # padding. Selected chunk j of sequence k is ORIGINAL chunk
        # j*skip (window j*skip*spb of the sequence).
        skip = jnp.int32(chunk_skip)
        nseg = sel_nsegs.astype(jnp.int32)
        chunks = -(-nseg // spb)  # ceil(nseg / spb)
        cps = -(-chunks // skip)  # ceil(chunks / skip)
        cumc = jnp.cumsum(cps)
        n_chunks_real = cumc[-1]
        q = jnp.arange(rows // spb, dtype=jnp.int32)
        k_q = jnp.searchsorted(cumc, q, side="right").astype(jnp.int32)
        k_q = jnp.minimum(k_q, nseg.shape[0] - 1)
        prev = jnp.where(k_q > 0, jnp.take(cumc, jnp.maximum(k_q - 1, 0)), 0)
        qj = (q - prev) * skip  # original chunk index within its sequence
        chunk_starts = (jnp.take(sel_starts.astype(jnp.int32), k_q)
                        + qj * jnp.int32(spb * seg_shift))
        # padding chunks (q >= n_chunks_real) would address past the pack
        chunk_starts = jnp.where(q < n_chunks_real, chunk_starts, 0)
        # per-window row metadata
        seq_all = jnp.repeat(k_q, spb, total_repeat_length=rows)
        j_in_seq = (jnp.repeat(qj, spb, total_repeat_length=rows)
                    * jnp.int32(spb)
                    + jnp.tile(jnp.arange(spb, dtype=jnp.int32),
                               rows // spb))
        valid = ((j_in_seq < jnp.take(nseg, seq_all))
                 & (jnp.repeat(q, spb, total_repeat_length=rows)
                    < n_chunks_real)).astype(jnp.float32)
        return scan_fn(params, store, seq_all, valid, chunk_starts)

    return jax.jit(pass_fn)


def _map_scan_core(model, n_batches: int, num_rows: int, r_ratio: float,
                   mesh, shard_table: bool, batch_fn):
    """Shared scan body of the MAP passes: batched z2-trunk encode +
    per-sequence (sums, counts) accumulation + the closed-form MAP finish,
    all in HBM. ``batch_fn(store, plan, b_i) -> (feats, seq_idx, valid)``
    supplies each batch — the array-plan, in-graph-plan, and chunked-DMA
    factories differ only there."""

    def scan_fn(params, store, *plan):
        z2_dim = params["mu2_table"].shape[-1]

        def body(carry, b_i):
            sums, counts = carry
            feats, seq_idx, valid = batch_fn(store, plan, b_i)
            z2_mu = model.encode_z2(params, feats.astype(jnp.float32))
            sums = sums + jax.ops.segment_sum(
                z2_mu * valid[:, None], seq_idx,
                num_segments=num_rows)
            counts = counts + jax.ops.segment_sum(
                valid, seq_idx, num_segments=num_rows)
            return (sums, counts), None

        init = (jnp.zeros((num_rows, z2_dim), jnp.float32),
                jnp.zeros((num_rows,), jnp.float32))
        (sums, counts), _ = jax.lax.scan(
            body, init, jnp.arange(n_batches, dtype=jnp.int32))
        table = sums / (counts + r_ratio)[:, None]
        if mesh is not None:
            # shard_table: the table replaces state.params["mu2_table"],
            # which the train step expects row-sharded over "model";
            # otherwise (dev-eval override tables) replicate
            spec = P("model", None) if shard_table else P()
            table = jax.lax.with_sharding_constraint(
                table, NamedSharding(mesh, spec))
        return table

    return scan_fn


def _make_map_scan(model, seg_len: int, batch_size: int, n_batches: int,
                   num_rows: int, r_ratio: float, mesh, shard_store: bool,
                   shard_table: bool):
    """Array-plan batches: slice (seq_idx_all, starts_all), validity from
    ``n_real`` — the shared ``_make_batch_views`` prologue without the
    nsegs lookup."""
    views = _make_batch_views(seg_len, batch_size, mesh, shard_store)
    B = batch_size

    def batch_fn(store, plan, b_i):
        seq_idx_all, starts_all, n_real = plan
        feats, seq_idx, _, valid = views(
            store, seq_idx_all, starts_all, None, b_i * B, n_real)
        return feats, seq_idx, valid

    return _map_scan_core(model, n_batches, num_rows, r_ratio, mesh,
                          shard_table, batch_fn)
