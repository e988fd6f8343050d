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
import optax
from jax import shard_map
from jax.sharding import NamedSharding, PartitionSpec as P

from pytorch_scalablefhvae_tpu.models.base import loss_from_outputs
from pytorch_scalablefhvae_tpu.train.step import TrainState

_METRIC_KEYS = ("loss", "lower_bound", "log_qy", "log_px_z",
                "neg_kld_z1", "neg_kld_z2", "log_pmu2")


def _make_gather(seg_len: int, mesh, shard_store: bool):
    """Build the [B] starts -> [B, seg_len, dim] segment gather."""

    def abs_index(starts):
        return starts[:, None] + jnp.arange(seg_len, dtype=starts.dtype)[None, :]

    if mesh is None or not shard_store:
        def gather(store, starts):
            return jnp.take(store, abs_index(starts), axis=0)

        return gather

    def gather_local(store_loc, idx):
        # store row-sharded over "model": each shard owns rows
        # [m_i * rows_local, (m_i + 1) * rows_local); contribute owned rows,
        # zero elsewhere, and psum over "model" to rebuild full segments
        rows_local = store_loc.shape[0]
        rel = idx - jax.lax.axis_index("model") * rows_local
        ok = (rel >= 0) & (rel < rows_local)
        g = jnp.take(store_loc, jnp.clip(rel, 0, rows_local - 1), axis=0)
        g = jnp.where(ok[..., None], g, jnp.zeros((), g.dtype))
        return jax.lax.psum(g, "model")

    mapped = shard_map(
        gather_local,
        mesh=mesh,
        in_specs=(P("model", None), P("data", None)),
        out_specs=P("data", None, None),
        check_vma=False,
    )

    def gather(store, starts):
        return mapped(store, abs_index(starts))

    return gather


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
    gather = _make_gather(seg_len, mesh, shard_store)
    B = batch_size
    data_sh = (NamedSharding(mesh, P("data")) if mesh is not None else None)

    def multi_fn(state: TrainState, store, seq_idx_all, starts_all, nsegs_tab,
                 base, n_real):
        def body(state, k_i):
            off = base + k_i * B
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
            nsegs = jnp.take(nsegs_tab, seq_idx, axis=0, mode="clip")
            if data_sh is not None:
                nsegs = jax.lax.with_sharding_constraint(nsegs, data_sh)
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
    store_sh = (NamedSharding(mesh, P("model", None)) if shard_store else repl)
    compiled = {}

    def step(state, store, seq_idx_all, starts_all, nsegs_tab, base, n_real):
        if not compiled:
            st_sh = state_shardings(mesh, state)
            compiled["fn"] = jax.jit(
                multi_fn,
                in_shardings=(st_sh, store_sh, repl, repl, repl, repl, repl),
                out_shardings=(st_sh, {m: repl for m in _METRIC_KEYS}),
                donate_argnums=donate_argnums,
            )
        return compiled["fn"](state, store, seq_idx_all, starts_all,
                              nsegs_tab, base, n_real)

    return step


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
    gather = _make_gather(seg_len, mesh, shard_store)
    B = batch_size
    data_sh = (NamedSharding(mesh, P("data")) if mesh is not None else None)

    def pass_fn(params, store, seq_idx_all, starts_all, nsegs_tab,
                n_real, table):
        def body(carry, b_i):
            off = b_i * B
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
            nsegs = jnp.take(nsegs_tab, seq_idx, axis=0, mode="clip")
            if data_sh is not None:
                nsegs = jax.lax.with_sharding_constraint(nsegs, data_sh)
            out = model.apply(params, feats, seq_idx, nsegs,
                              jax.random.PRNGKey(0), sample=False,
                              mu2_table=table)
            from pytorch_scalablefhvae_tpu.models.base import loss_from_outputs

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

    repl = NamedSharding(mesh, P())
    store_sh = (NamedSharding(mesh, P("model", None)) if shard_store else repl)
    from pytorch_scalablefhvae_tpu.parallel.mesh import params_shardings

    compiled = {}

    def run(params, store, seq_idx_all, starts_all, nsegs_tab, n_real, table):
        if not compiled:
            p_sh = params_shardings(mesh, params)
            compiled["fn"] = jax.jit(
                pass_fn,
                in_shardings=(p_sh, store_sh, repl, repl, repl, repl, repl),
                out_shardings=None,
            )
        return compiled["fn"](params, store, seq_idx_all, starts_all,
                              nsegs_tab, n_real, table)

    return run


def make_device_encode_pass(model, seg_len: int, batch_size: int,
                            n_batches: int, mesh=None,
                            shard_store: bool = False):
    """Whole-split encoder pass (z2 posterior means) as one dispatch.

    Returns ``z2_mu`` stacked ``[n_batches, B, z2_dim]``; the host runs the
    same fp64 MAP accumulation as the host-loader path (estimate_split_mu2),
    so the resulting tables are bit-identical.
    """
    gather = _make_gather(seg_len, mesh, shard_store)
    B = batch_size
    data_sh = (NamedSharding(mesh, P("data")) if mesh is not None else None)

    def pass_fn(params, store, starts_all):
        def body(carry, b_i):
            starts = jax.lax.dynamic_slice_in_dim(starts_all, b_i * B, B)
            if data_sh is not None:
                starts = jax.lax.with_sharding_constraint(starts, data_sh)
            feats = gather(store, starts).astype(jnp.float32)
            enc = model.encode(params, feats, jax.random.PRNGKey(0),
                               sample=False)
            return carry, enc["z2_mu"]

        _, z2 = jax.lax.scan(body, None,
                             jnp.arange(n_batches, dtype=jnp.int32))
        return z2

    if mesh is None:
        return jax.jit(pass_fn)

    repl = NamedSharding(mesh, P())
    store_sh = (NamedSharding(mesh, P("model", None)) if shard_store else repl)
    from pytorch_scalablefhvae_tpu.parallel.mesh import params_shardings

    compiled = {}

    def run(params, store, starts_all):
        if not compiled:
            p_sh = params_shardings(mesh, params)
            compiled["fn"] = jax.jit(
                pass_fn, in_shardings=(p_sh, store_sh, repl),
                out_shardings=None,
            )
        return compiled["fn"](params, store, starts_all)

    return run
