"""Mesh-sharded training: pjit-compiled step with explicit shardings.

Builds the same train/eval steps as ``train/step.py`` but compiled against a
``(data, model)`` mesh:

- batch rows sharded over "data" (pure data parallelism; XLA all-reduces
  gradients over ICI);
- the mu2 table and its Adam moments row-sharded over "model"; the
  discriminative ``[B, d] x [d, N]`` matmul partitions over N and the
  log-sum-exp reduces over the "model" axis with an XLA collective — the
  distributed softmax of SURVEY.md §2.3 expressed through GSPMD rather than
  hand-written collectives.

Requirement: the "data" axis size must divide the global batch size, and the
mu2 row count must be padded to a multiple of the "model" axis size
(``parallel.mesh.padded_num_seqs``; the training loop sets the model's
``num_seqs_padded`` accordingly).

Evaluation under a mesh shards the batch over "data" too
(:func:`make_sharded_eval_step` / :func:`make_sharded_encode_step`): dev/test
splits are scored against small MAP-estimated per-split mu2 tables, which
stay replicated (they are O(dev-split) rows), while the two per-epoch dev
passes (encode for the MAP table + scoring) scale with the mesh instead of
serializing onto one device.
"""

from __future__ import annotations

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from pytorch_scalablefhvae_tpu.models.base import METRIC_KEYS
from pytorch_scalablefhvae_tpu.parallel.mesh import (
    batch_sharding,
    params_shardings,
    stacked_batch_sharding,
    state_shardings,
)
from pytorch_scalablefhvae_tpu.train.step import (
    multi_train_fn,
    train_step_fn,
)


def _metric_shardings(mesh):
    metric_sh = NamedSharding(mesh, P())
    return {k: metric_sh for k in METRIC_KEYS}


def make_sharded_train_step(model, optimizer, alpha: float, mesh: Mesh, donate: bool = True):
    """pjit the train step with explicit in/out shardings over ``mesh``.

    The body is ``train.step.train_step_fn`` — literally the same function
    the single-device wrapper jits, so the two cannot drift.
    """
    step_fn = train_step_fn(model, optimizer, alpha)
    compiled = {}

    def step(state, feats, seq_idx, nsegs, weight):
        if not compiled:
            st_sh = state_shardings(mesh, state)
            b_sh = batch_sharding(mesh)
            compiled["fn"] = jax.jit(
                step_fn,
                in_shardings=(st_sh, b_sh["feats"], b_sh["seq_idx"],
                              b_sh["nsegs"], b_sh["weight"]),
                out_shardings=(st_sh, _metric_shardings(mesh)),
                donate_argnums=(0,) if donate else (),
            )
        return compiled["fn"](state, feats, seq_idx, nsegs, weight)

    return step


def make_sharded_eval_step(model, alpha: float, mesh: Mesh):
    """Mesh-compiled eval step (posterior-mean pass, weighted metric sums).

    Same contract as ``train.step.make_eval_step(with_table_override=True)``
    — literally the same body (train.step.eval_step_fn), jitted here with
    mesh shardings: the extra trailing argument is the split's MAP-estimated
    mu2 table, which stays replicated (it is O(split sequences), tiny next
    to the training table). Batch arrays shard over "data" so the two
    per-epoch dev passes scale with the mesh (SURVEY §3.1 eval at scale).
    """
    from pytorch_scalablefhvae_tpu.train.step import eval_step_fn

    step_fn = eval_step_fn(model, alpha)
    compiled = {}

    def step(params, feats, seq_idx, nsegs, weight, key, table):
        if not compiled:
            p_sh = params_shardings(mesh, params)
            b_sh = batch_sharding(mesh)
            repl = NamedSharding(mesh, P())
            compiled["fn"] = jax.jit(
                step_fn,
                in_shardings=(p_sh, b_sh["feats"], b_sh["seq_idx"],
                              b_sh["nsegs"], b_sh["weight"], repl, repl),
                out_shardings=None,
            )
        return compiled["fn"](params, feats, seq_idx, nsegs, weight, key, table)

    return step


def make_sharded_encode_step(model, mesh: Mesh):
    """Mesh-compiled encoder pass -> z2 posterior means, batch-sharded.

    Used by the MAP mu2 estimation passes (dev eval + hierarchical round
    init), which previously ran unsharded on one device under a mesh. The
    body is train.step.encode_step_fn, jitted here with mesh shardings.
    """
    from pytorch_scalablefhvae_tpu.train.step import encode_step_fn

    step_fn = encode_step_fn(model)
    compiled = {}

    def step(params, feats):
        if not compiled:
            p_sh = params_shardings(mesh, params)
            f_sh = NamedSharding(mesh, P("data", None, None))
            compiled["fn"] = jax.jit(
                step_fn, in_shardings=(p_sh, f_sh),
                out_shardings=NamedSharding(mesh, P("data", None)),
            )
        return compiled["fn"](params, feats)

    return step


def make_sharded_multi_train_step(model, optimizer, alpha: float, mesh: Mesh,
                                  donate: bool = True):
    """K optimizer steps in ONE dispatched XLA program over the mesh.

    Same ``lax.scan`` bundling as ``train.step.make_multi_train_step`` (the
    per-dispatch host overhead dominates sub-millisecond steps), compiled
    with explicit shardings: stacked batches ``[K, B, ...]`` shard rows over
    "data" with the scan axis replicated; the mu2 table stays row-sharded
    over "model" through every substep. Returns per-substep metrics ``[K]``.
    """

    multi_fn = multi_train_fn(model, optimizer, alpha)
    compiled = {}

    def step(state, feats_k, seq_idx_k, nsegs_k, weight_k):
        if not compiled:
            st_sh = state_shardings(mesh, state)
            b_sh = stacked_batch_sharding(mesh)
            compiled["fn"] = jax.jit(
                multi_fn,
                in_shardings=(st_sh, b_sh["feats"], b_sh["seq_idx"],
                              b_sh["nsegs"], b_sh["weight"]),
                out_shardings=(st_sh, _metric_shardings(mesh)),
                donate_argnums=(0,) if donate else (),
            )
        return compiled["fn"](state, feats_k, seq_idx_k, nsegs_k, weight_k)

    return step
