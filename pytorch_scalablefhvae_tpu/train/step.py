"""Compiled training/eval steps.

The reference's hot loop (train_model.py:443-468: forward, loss, backward,
Adam step, NaN check) becomes a single jitted, donated function — one XLA
program per step, no host round-trips except the metric fetch. The same step
runs under pjit over a device mesh: batch arrays are sharded on the "data"
axis and the mu2 table on the "model" axis; XLA inserts the gradient
all-reduce and the log-softmax collectives (SURVEY.md §2.3).
"""

from __future__ import annotations

from typing import Any, NamedTuple

import jax
import jax.numpy as jnp
import optax

from pytorch_scalablefhvae_tpu.models.base import loss_from_outputs


class TrainState(NamedTuple):
    params: Any
    opt_state: Any
    step: jnp.ndarray  # int32 scalar
    rng: jax.Array  # PRNG key threaded through steps


def create_train_state(model, optimizer, seed: int = 0) -> TrainState:
    key = jax.random.PRNGKey(seed)
    k_init, k_state = jax.random.split(key)
    params = model.init(k_init)
    opt_state = optimizer.init(params)
    return TrainState(params=params, opt_state=opt_state, step=jnp.int32(0), rng=k_state)


def make_optimizer(
    learning_rate: float,
    beta_one: float,
    beta_two: float,
    grad_clip_norm: float | None = 100.0,
) -> optax.GradientTransformation:
    """Adam with the reference hyperparameters (train_model.py:409-411).

    A loose global-norm clip (off: ``grad_clip_norm=None``) guards the first
    few steps on un-normalized features; Adam's per-param scaling makes it a
    no-op once training settles.
    """
    adam = optax.adam(learning_rate, b1=beta_one, b2=beta_two)
    if grad_clip_norm is None:
        return adam
    return optax.chain(optax.clip_by_global_norm(grad_clip_norm), adam)


def train_step_fn(model, optimizer, alpha: float):
    """Un-jitted train step body: forward, loss, backward, Adam update.

    The ONE definition — ``make_train_step`` below and the mesh-compiled
    wrapper (``parallel/sharded_step.make_sharded_train_step``) both jit
    exactly this, so the two cannot drift (same pattern as
    :func:`eval_step_fn`).
    """

    def step_fn(state: TrainState, feats, seq_idx, nsegs, weight):
        step_key = jax.random.fold_in(state.rng, state.step)

        def loss_fn(params):
            out = model.apply(params, feats, seq_idx, nsegs, step_key, sample=True)
            return loss_from_outputs(out, weight, alpha)

        (loss, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(state.params)
        updates, new_opt_state = optimizer.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        new_state = TrainState(
            params=new_params,
            opt_state=new_opt_state,
            step=state.step + 1,
            rng=state.rng,
        )
        return new_state, metrics

    return step_fn


def multi_train_fn(model, optimizer, alpha: float):
    """Un-jitted K-step bundle body (``lax.scan`` over stacked batches);
    shared by the single-device and mesh-compiled wrappers like
    :func:`train_step_fn`."""
    step_fn = train_step_fn(model, optimizer, alpha)

    def multi_fn(state: TrainState, feats_k, seq_idx_k, nsegs_k, weight_k):
        def body(state, batch):
            return step_fn(state, *batch)

        return jax.lax.scan(body, state, (feats_k, seq_idx_k, nsegs_k, weight_k))

    return multi_fn


def make_train_step(model, optimizer, alpha: float, donate: bool = True):
    """Build the jitted train step.

    Step semantics: loss = -mean(lower_bound + alpha * log_qy) over real
    (non-padded) rows; one Adam update over all params including the mu2
    table. The per-step PRNG key is derived from the state key and the step
    counter so runs are deterministic per seed regardless of batch order
    history.
    """
    donate_argnums = (0,) if donate else ()
    return jax.jit(train_step_fn(model, optimizer, alpha),
                   donate_argnums=donate_argnums)


def make_multi_train_step(model, optimizer, alpha: float, donate: bool = True):
    """Bundle K optimizer steps into ONE dispatched XLA program.

    Takes stacked batches ``[K, B, ...]`` and runs the K updates inside a
    ``lax.scan`` — for sub-millisecond steps (this model on a TPU chip) the
    per-dispatch host/runtime overhead dominates wall-clock, and bundling
    amortizes it K-fold. Returns per-substep metrics stacked ``[K]``.
    """
    donate_argnums = (0,) if donate else ()
    return jax.jit(multi_train_fn(model, optimizer, alpha),
                   donate_argnums=donate_argnums)


def eval_step_fn(model, alpha: float):
    """Un-jitted eval step body: posterior-mean forward pass, weighted metric
    sums + row count. The ONE definition of the eval contract — the
    single-device wrapper below and the mesh-compiled wrapper
    (parallel/sharded_step.make_sharded_eval_step) both jit exactly this, so
    the two cannot drift."""

    def step_fn(params, feats, seq_idx, nsegs, weight, key, table=None):
        out = model.apply(params, feats, seq_idx, nsegs, key, sample=False,
                          mu2_table=table)
        loss, metrics = loss_from_outputs(out, weight, alpha)
        n = jnp.sum(weight)
        sums = {k: v * n for k, v in metrics.items()}
        sums["count"] = n
        return sums

    return step_fn


def encode_step_fn(model):
    """Un-jitted encoder-only body -> z2 posterior means; shared by the
    single-device and mesh-compiled wrappers like :func:`eval_step_fn`.

    Runs ``model.encode_z2`` — the z2 trunk alone is ~3x less compute than
    the full encoder (no z1 stack, no sampling heads) and both models
    guarantee identical z2_mu numerics; the device-resident MAP passes
    already use it (train/device_step.py)."""

    def step_fn(params, feats):
        return model.encode_z2(params, feats.astype(jnp.float32))

    return step_fn


def make_eval_step(model, alpha: float, with_table_override: bool = False):
    """Jitted eval step: posterior-mean forward pass, no parameter update.

    Returns weighted *sums* of each metric plus the row count so the caller
    accumulates exact split-level means (fixes reference defect B5/B12 where
    val metrics used training-loop tensors and summaries were never reduced).

    With ``with_table_override``, the step takes an extra mu2 table argument
    — used to evaluate held-out splits against their MAP-estimated tables
    (the learned table only covers training sequences).
    """
    step_fn = eval_step_fn(model, alpha)
    if with_table_override:
        return jax.jit(step_fn)
    return jax.jit(lambda params, feats, seq_idx, nsegs, weight, key: step_fn(
        params, feats, seq_idx, nsegs, weight, key
    ))


def make_encode_step(model):
    """Jitted encoder-only pass returning z2 posterior means — the cheap
    first pass of mu2 MAP estimation (utils.py:45-60 intent)."""
    return jax.jit(encode_step_fn(model))


def make_grad_step(model, alpha: float):
    """Jitted gradient snapshot: per-parameter grads for one batch, no
    update. Grads never leave the jitted train step (they are consumed by
    the fused Adam update), so ``--log-params`` gradient histograms
    (reference logger.py:80-86) are produced by this separate pass — one
    extra fwd+bwd per epoch, only when the flag is on.
    """

    def step_fn(params, feats, seq_idx, nsegs, weight, key):
        def loss_fn(p):
            out = model.apply(p, feats, seq_idx, nsegs, key, sample=True)
            return loss_from_outputs(out, weight, alpha)

        return jax.grad(lambda p: loss_fn(p)[0])(params)

    return jax.jit(step_fn)


def make_latent_step(model, with_table_override: bool = False,
                     packed: bool = False):
    """Jitted latent-extraction step for evaluation (eval_model.py TODO:57-59).

    With ``with_table_override`` the step takes the split's MAP-estimated
    mu2 table as a trailing argument: held-out sequences have no rows in
    the LEARNED table, so scoring their lower_bound against
    ``params['mu2_table'][seq_idx]`` would pair dev sequence i with
    training sequence i's mu2 row — the exact defect the reference's eval
    had (documented deviation D6).

    The jitted step is CACHED per (model, override-flag): each call
    previously built a fresh closure, so every ``extract_latents`` — and
    therefore every warm `sfhvae serve` request — recompiled from scratch
    (~1.5 s per request measured on v5e vs ~30 ms served from jit cache).
    The cache lives ON the model instance (the jitted fn closes over the
    model, so a weak-keyed registry could never collect its entries) — it
    dies with the model."""
    per_model = model.__dict__.setdefault("_latent_step_cache", {})
    cached = per_model.get((with_table_override, packed))
    if cached is not None:
        return cached

    def step_fn(params, feats, seq_idx, nsegs, key, table=None):
        out = model.apply(params, feats, seq_idx, nsegs, key, sample=False,
                          mu2_table=table)
        res = {
            "z1_mu": out.z1_mu,
            "z2_mu": out.z2_mu,
            "x_mu": out.x_mu,
            "lower_bound": out.lower_bound,
        }
        if packed:
            # one fetchable [B, z1+z2+1] block: on a high-latency link each
            # device->host readback costs a full round trip (~150 ms on the
            # tunneled rig), so extract_latents reads THIS and slices on
            # the host — one fetch per batch instead of three. Gated on the
            # flag: callers that fetch the individual legs (evaluate.py's
            # reconstruction loop) should not pay for the extra concat
            # buffer in every compiled batch.
            res["packed"] = jnp.concatenate(
                [out.z1_mu, out.z2_mu, out.lower_bound[:, None]], axis=1)
        return res

    if with_table_override:
        fn = jax.jit(step_fn)
    else:
        fn = jax.jit(lambda params, feats, seq_idx, nsegs, key: step_fn(
            params, feats, seq_idx, nsegs, key
        ))
    per_model[(with_table_override, packed)] = fn
    return fn
