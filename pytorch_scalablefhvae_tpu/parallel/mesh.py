"""Device mesh and sharding rules.

The reference has no distributed layer at all (SURVEY.md §2.3); this module
is the TPU-native equivalent of the absent NCCL/DDP stack, expressed as
GSPMD sharding rules over a ``jax.sharding.Mesh``:

- axis "data": segment batches are sharded (data parallel); gradients are
  all-reduced by XLA over ICI;
- axis "model": the mu2 posterior table is *row*-sharded — it is
  O(num_sequences x z2_dim) (simple_fhvae.py:51) and reaches ~280k rows on
  LibriSpeech-960, and the discriminative softmax needs z2_mu against every
  row (simple_fhvae.py:119-121). With the table sharded on "model", XLA
  partitions the ``[B, d] x [d, N]`` logits matmul over N and the
  log-sum-exp's reduction becomes an all-reduce over the "model" axis.

Everything else (MLP/LSTM params, optimizer moments for them) is replicated.
Optimizer moments for the mu2 table follow the table's sharding
automatically because shardings are propagated from params to opt_state.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
MODEL_AXIS = "model"


def padded_num_seqs(num_seqs: int, model_axis_size: int) -> int:
    """Round the mu2 row count up to a multiple of the model axis so the
    row-sharded table divides evenly on any corpus (TIMIT's 4620 train
    sequences on a model=8 axis, etc.). Padded rows carry zero weight: they
    are masked out of the discriminative log-sum-exp (models/base.py
    ``num_real``) and no segment ever gathers them."""
    if model_axis_size <= 1:
        return num_seqs
    return -(-num_seqs // model_axis_size) * model_axis_size


def make_mesh(
    mesh_shape: tuple[int, int] | None = None, devices=None
) -> Mesh:
    """Create a (data, model) mesh.

    Only ``None`` means "default to all devices data-parallel": an explicit
    ``(1, 1)`` on a multi-device host is a non-covering shape and raises
    like any other, instead of silently becoming an (n, 1) mesh.
    """
    if devices is None:
        devices = jax.devices()
    n = len(devices)
    if mesh_shape is None:
        mesh_shape = (n, 1)
    d, m = mesh_shape
    if d * m != n:
        raise ValueError(f"mesh_shape {mesh_shape} does not cover {n} devices")
    dev_array = np.asarray(devices).reshape(d, m)
    return Mesh(dev_array, (DATA_AXIS, MODEL_AXIS))


def validate_multihost_mesh(
    mesh_shape: tuple[int, int],
    process_count: int | None = None,
    local_device_count: int | None = None,
) -> None:
    """Assert a (data, model) mesh is placeable on a multi-host pod.

    Placement rule (SCALING.md): ``jax.devices()`` orders devices
    host-by-host and ``make_mesh`` reshapes row-major, so the trailing
    "model" axis is host-local iff its size divides the per-host device
    count. The model axis carries the distributed-softmax collectives
    (pmax/psum per step) and must ride ICI; only the "data" axis — one
    gradient all-reduce per step — may span hosts over DCN.
    """
    if process_count is None:
        process_count = jax.process_count()
    if local_device_count is None:
        local_device_count = jax.local_device_count()
    d, m = mesh_shape
    total = process_count * local_device_count
    if d * m != total:
        raise ValueError(
            f"mesh_shape {mesh_shape} does not cover {total} devices "
            f"({process_count} hosts x {local_device_count})"
        )
    if m > local_device_count or local_device_count % m != 0:
        raise ValueError(
            f"model axis {m} would span host boundaries "
            f"({local_device_count} devices per host): the distributed-softmax "
            f"collectives would ride DCN instead of ICI. Use a model axis that "
            f"divides the per-host device count and put the surplus on 'data'."
        )


def batch_sharding(mesh: Mesh) -> dict[str, NamedSharding]:
    """Shardings for one (feats, seq_idx, nsegs, weight) batch."""
    return {
        "feats": NamedSharding(mesh, P(DATA_AXIS, None, None)),
        "seq_idx": NamedSharding(mesh, P(DATA_AXIS)),
        "nsegs": NamedSharding(mesh, P(DATA_AXIS)),
        "weight": NamedSharding(mesh, P(DATA_AXIS)),
    }


def shard_batch(mesh: Mesh, feats, seq_idx, nsegs, weight):
    sh = batch_sharding(mesh)
    return (
        jax.device_put(feats, sh["feats"]),
        jax.device_put(seq_idx, sh["seq_idx"]),
        jax.device_put(nsegs, sh["nsegs"]),
        jax.device_put(weight, sh["weight"]),
    )


def stacked_batch_sharding(mesh: Mesh) -> dict[str, NamedSharding]:
    """Shardings for K stacked batches ``[K, B, ...]`` (multi-step dispatch):
    the scan axis K is replicated, rows shard over "data" as usual."""
    return {
        "feats": NamedSharding(mesh, P(None, DATA_AXIS, None, None)),
        "seq_idx": NamedSharding(mesh, P(None, DATA_AXIS)),
        "nsegs": NamedSharding(mesh, P(None, DATA_AXIS)),
        "weight": NamedSharding(mesh, P(None, DATA_AXIS)),
    }


def shard_stacked_batch(mesh: Mesh, feats_k, seq_idx_k, nsegs_k, weight_k):
    sh = stacked_batch_sharding(mesh)
    return (
        jax.device_put(feats_k, sh["feats"]),
        jax.device_put(seq_idx_k, sh["seq_idx"]),
        jax.device_put(nsegs_k, sh["nsegs"]),
        jax.device_put(weight_k, sh["weight"]),
    )


def _assign_sharding(mesh: Mesh, path, leaf) -> NamedSharding:
    """ONE sharding rule for params and full TrainStates: leaves whose
    pytree path contains 'mu2_table' AND are rank-2 (the table itself, its
    Adam moments) row-shard over "model"; everything else replicates. The
    ndim guard keeps any future non-2D leaf under a table-named path (a
    per-row scale, a count) from receiving a rank-2 spec and failing
    in_shardings with a rank error."""
    path_str = "/".join(str(p) for p in path)
    if "mu2_table" in path_str and np.ndim(leaf) == 2:
        return NamedSharding(mesh, P(MODEL_AXIS, None))
    return NamedSharding(mesh, P())


def params_shardings(mesh: Mesh, params) -> object:
    """NamedSharding pytree for a params pytree."""
    return jax.tree_util.tree_map_with_path(
        lambda path, leaf: _assign_sharding(mesh, path, leaf), params)


def state_shardings(mesh: Mesh, state) -> object:
    """NamedSharding pytree for a full TrainState.

    The mu2 table's Adam moments share the table's row sharding; every other
    leaf is replicated. Matching is by pytree *path*: the optimizer state
    mirrors the params dict, so the table's moment leaves carry 'mu2_table'
    in their path (shape matching would also capture dense heads that happen
    to share the table's shape).
    """
    return jax.tree_util.tree_map_with_path(
        lambda path, leaf: _assign_sharding(mesh, path, leaf), state)


def shard_state(mesh: Mesh, state):
    """Place a TrainState onto the mesh per :func:`state_shardings`."""
    shardings = state_shardings(mesh, state)
    return jax.tree_util.tree_map(jax.device_put, state, shardings)
