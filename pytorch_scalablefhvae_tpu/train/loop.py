"""Training loop orchestration.

The reference's epoch loop (train_model.py:439-541) rebuilt: train phase,
posterior-mean eval phase, metric recording, best-model tracking with early
stopping, per-epoch checkpoints, NaN-divergence abort (exit code 2), legacy
step-based epochs, and hierarchical mu2 re-estimation — with its defects
fixed (B4 log-interval precedence, B5 val metrics from val tensors, B6
best-value update, B12 per-term summaries reported).
"""

from __future__ import annotations

import time
from dataclasses import dataclass
from pathlib import Path
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from pytorch_scalablefhvae_tpu.config import ExperimentConfig
from pytorch_scalablefhvae_tpu.data.loader import SegmentLoader, device_prefetch
from pytorch_scalablefhvae_tpu.models.base import build_model
from pytorch_scalablefhvae_tpu.train import checkpoint as ckpt
from pytorch_scalablefhvae_tpu.train.metrics import MetricHistory, MetricWriter
from pytorch_scalablefhvae_tpu.utils.dispatch import DispatchWindow
from pytorch_scalablefhvae_tpu.train.step import (
    TrainState,
    create_train_state,
    make_encode_step,
    make_eval_step,
    make_optimizer,
    make_train_step,
)


def check_best(val_lower_bound: float, best_val_lb: float) -> bool:
    """Higher dev lower bound is better (utils.py:14-17)."""
    return val_lower_bound > best_val_lb


def check_terminate(epoch: int, best_epoch: int, patience: int, epochs: int) -> bool:
    """Early-stopping rule: stop after ``patience`` consecutive
    non-improving epochs, or at the epoch budget (train_model.py:254-261
    intent; the reference's off-by-one meant patience effectively never
    fired together with B6)."""
    if epoch - best_epoch >= patience:
        return True
    if epoch + 1 >= epochs:
        return True
    return False


def _replace_mu2_table(state: TrainState, table) -> TrainState:
    """Swap in a new mu2 table and zero its optimizer moments (the table is
    per-round "fast weights" under hierarchical sampling; MLP moments are
    preserved). Moments are matched by pytree *path* — the optimizer state
    mirrors the params dict, so its mu2 leaves carry 'mu2_table' in their
    path (shape matching would also hit dense heads of the same shape)."""
    params = dict(state.params, mu2_table=table)

    def reset(path, leaf):
        if any("mu2_table" in str(getattr(p, "key", p)) for p in path):
            return jnp.zeros_like(leaf)
        return leaf

    opt_state = jax.tree_util.tree_map_with_path(reset, state.opt_state)
    return TrainState(params=params, opt_state=opt_state, step=state.step, rng=state.rng)


class _StopRun(Exception):
    """Internal: unwind the epoch loop when --max-steps is reached (the
    boundary state is already checkpointed)."""

    def __init__(self, state, epoch):
        self.state = state
        self.epoch = epoch


@dataclass
class TrainResult:
    state: TrainState
    best_epoch: int
    best_val_lb: float
    last_epoch: int
    history: MetricHistory
    diverged: bool = False


def evaluate_split(
    eval_step, params, loader: SegmentLoader, key, table=None
) -> dict[str, float]:
    """Full-split evaluation: exact weighted means of every metric.

    Eval dispatches run ahead of result fetches through a bounded window
    (per-batch sums are scalars), so the device pipelines the pass instead
    of stalling on a host round-trip per batch — while capping how many
    batches of input feats are simultaneously live in device memory.
    """
    totals: dict[str, float] = {}
    count = 0.0

    def drain_one(item):
        # ONE device->host fetch per batch: the metric sums are stacked
        # into a single vector right after dispatch — fetching the dict's
        # scalars individually costs a full link round trip EACH (~150 ms
        # x 8 metrics per batch on the tunneled rig)
        nonlocal count
        keys, vec = item
        sums = dict(zip(keys, np.asarray(vec, dtype=np.float64).tolist()))
        count += sums.pop("count")
        for k, v in sums.items():
            totals[k] = totals.get(k, 0.0) + v

    window = DispatchWindow(drain_one)
    for i, b in enumerate(loader):
        args = (params, b.feats, b.seq_idx, b.nsegs, b.weight,
                jax.random.fold_in(key, i))
        out = (eval_step(*args) if table is None
               else eval_step(*args, table))
        window.push((list(out.keys()), jnp.stack(list(out.values()))))
    window.close()
    if count == 0:
        return {k: float("nan") for k in ("loss", "lower_bound", "log_qy")}
    return {k: v / count for k, v in totals.items()}


# loader batches concatenated per encode dispatch in estimate_split_mu2
_ENCODE_GROUP = 16

def dispatch_losses_diverged(losses: np.ndarray) -> bool:
    """Whether a completed K-step dispatch's sub-losses show divergence.

    Both the FIRST and LAST sub-loss are checked: a NaN injected at
    sub-step 0 is caught one dispatch later, bounding the overrun at one
    dispatch (~K steps) even with ``donate_state`` having consumed the
    pre-NaN state; NaNs propagate forward through the params, so a NaN
    appearing mid-dispatch reaches the last sub-loss too. (The reference
    checked every step synchronously, train_model.py:464-466 — here the
    check must not drain the dispatch pipeline.)
    """
    flat = losses.ravel()
    return not (np.isfinite(flat[0]) and np.isfinite(flat[-1]))


def _map_table(sums: np.ndarray, counts: np.ndarray, pz2_var: float,
               pmu2_var: float = 1.0) -> np.ndarray:
    """Closed-form MAP posterior mean from fp64 accumulators:
    ``mu2[y] = sum / (count + pz2_var/pmu2_var)`` (utils.py:58-59 intent).
    The host-loader path finishes through it; the device-resident passes
    apply the same formula in HBM (device_step.make_device_map_pass)."""
    r = pz2_var / pmu2_var
    return (sums / (counts + r)[:, None]).astype(np.float32)


def estimate_split_mu2(
    encode_step, params, loader: SegmentLoader, num_seqs: int,
    pz2_var: float, pmu2_var: float = 1.0, z2_dim: int | None = None,
) -> np.ndarray:
    """MAP-estimate a mu2 table for a split from encoder means.

    ``mu2[y] = sum(z2_mu of y's segments) / (nsegs(y) + pz2_var/pmu2_var)``
    (the closed-form posterior mean; utils.py:58-59 intent).

    Dispatch economics: per-dispatch overhead dominates this pass (the
    encode compute per batch is tiny), so batches are concatenated into
    super-batches of up to ``_ENCODE_GROUP`` before dispatch — 16x fewer
    dispatches — and every result is fetched only after all dispatches are
    queued. SegmentLoader pads every batch to full size, so at most two
    program shapes compile (the full group and the final partial group),
    and mesh-sharded encode steps keep their batch-divisibility guarantee
    (any multiple of a divisible batch size divides too). Accumulation
    stays host-side fp64 — bit-identical to the original per-batch
    formulation (bench.bench_hier_round measures the round-turnover cost
    this bounds).
    """
    group: list = []
    sums = None
    counts = np.zeros(num_seqs, dtype=np.float64)

    def drain_one(item):
        nonlocal sums
        z2_dev, seq_idx, weight = item
        z2 = np.asarray(z2_dev)
        if sums is None:
            sums = np.zeros((num_seqs, z2.shape[1]), dtype=np.float64)
        real = weight > 0
        np.add.at(sums, seq_idx[real], z2[real])
        np.add.at(counts, seq_idx[real], 1.0)

    # each pushed item holds an _ENCODE_GROUP-batch SUPER-batch of input
    # feats, so the window must shrink by that factor to keep the same
    # in-flight HBM bound the default was sized for (utils/dispatch.py)
    from pytorch_scalablefhvae_tpu.utils.dispatch import PENDING_WINDOW

    window = DispatchWindow(drain_one,
                            window=max(PENDING_WINDOW // _ENCODE_GROUP, 2))

    def flush_group():
        if not group:
            return
        if len(group) == 1:
            b = group[0]
            feats, seq, w = b.feats, b.seq_idx, b.weight
        else:
            feats = np.concatenate([b.feats for b in group])
            seq = np.concatenate([b.seq_idx for b in group])
            w = np.concatenate([b.weight for b in group])
        window.push((encode_step(params, feats), seq, w))
        group.clear()

    for b in loader:
        group.append(b)
        if len(group) >= _ENCODE_GROUP:
            flush_group()
    flush_group()
    window.close()
    if sums is None:
        sums = np.zeros((num_seqs, z2_dim or 1), dtype=np.float64)
    return _map_table(sums, counts, pz2_var, pmu2_var)


def run_training(
    config: ExperimentConfig,
    train_loader: SegmentLoader,
    dev_loader: SegmentLoader,
    exp_dir: str | Path,
    continue_from: str | Path | None = None,
    finetune: bool = False,
    feat_dim: int | None = None,
    verbose: bool = True,
) -> TrainResult:
    exp_dir = Path(exp_dir)
    exp_dir.mkdir(parents=True, exist_ok=True)
    config.save(exp_dir / "config.json")  # args persistence (B14: JSON, not pickle)

    ds = train_loader.dataset
    seg_len, dim = ds.seg_len, ds.store.dim
    input_size = seg_len * dim
    num_seqs = ds.num_seqs

    # hierarchical sampling: each epoch trains against a fresh sampled subset
    # of K sequences, so the mu2 table (and the discriminative softmax) is
    # O(K) regardless of corpus size — the "scalable" training scheme of
    # arXiv 1804.03201 (train_model.py:424-436 intent, B10 fixed)
    hier = config.train.sample_hierarchical
    hier_k = min(config.train.num_hierarchical_sequences, num_seqs)
    if hier:
        num_seqs = hier_k

    # device mesh: explicit shape from config, or single-device by default
    mesh = None
    if tuple(config.train.mesh_shape) != (1, 1):
        from pytorch_scalablefhvae_tpu.parallel.mesh import (
            make_mesh,
            padded_num_seqs,
            shard_state,
            validate_multihost_mesh,
        )

        if jax.process_count() > 1:
            # validate the shape that actually trains (on resume the saved
            # config's mesh wins, so the CLI-time check may not have seen it)
            validate_multihost_mesh(tuple(config.train.mesh_shape))
        mesh = make_mesh(tuple(config.train.mesh_shape))

    # device-resident data path: stage the packed store in HBM once; steps
    # gather segments on device, so per-epoch host->device traffic is one
    # tiny index-plan upload instead of every batch (data/device_store.py).
    # Corpora larger than the budget stream through HBM in double-buffered
    # sequence-aligned chunks instead (data/stream_store.py): the link
    # carries each frame once per epoch, windows still materialize on device.
    # Resolved BEFORE the model is built: the hierarchical round-staging
    # ceiling below can reduce the effective round size, which sizes the
    # mu2 table (and so the whole discriminative softmax).
    from pytorch_scalablefhvae_tpu.data.device_store import (
        STORE_TAIL_SLACK,
        DeviceDataSource,
        resolve_data_placement,
        staging_itemsize,
    )
    from pytorch_scalablefhvae_tpu.data.stream_store import (
        StreamingDeviceSource,
        resolve_data_mode,
    )

    data_mode = resolve_data_mode(
        config.data.data_placement, ds.store, mesh,
        shard_store=config.data.shard_device_store,
        max_bytes=config.data.device_store_max_bytes,
        legacy=config.train.legacy,
        store_dtype=config.data.transfer_dtype,
        hierarchical=hier,
    )
    use_device_data = data_mode == "device"
    device_source = None
    stream_source = None
    # Hierarchical rounds on packs larger than HBM: the full pack cannot
    # stage (data_mode resolved to "host"), but ONE round's K-sequence
    # subset usually can — the paper's scalable configuration (round
    # subsets over LibriSpeech-960-class corpora) is exactly this regime.
    # Each round materializes its subset into a contiguous sub-pack and
    # stages it at a FIXED row ceiling (one compiled program for all
    # rounds); per-round link traffic is O(subset frames) once, instead of
    # the host loader's per-batch overlapping-window shipping.
    round_rows_ceiling = None
    if (hier and data_mode == "host" and not config.train.legacy
            and config.data.data_placement in ("auto", "device", "stream")):
        _isz = staging_itemsize(config.data.transfer_dtype)
        _hk = min(hier_k, ds.store.num_seqs)
        # plans/dev-split headroom: cap the sub-pack at 3/4 of the budget.
        # The budget scales by the model-axis size when the sub-pack
        # row-shards over it — the SAME scaling resolve_data_placement
        # applies, since each device holds only rows/m of the round's
        # DeviceDataSource(pad_to_rows=ceiling) staging.
        _bytes_budget = config.data.device_store_max_bytes
        if (mesh is not None and config.data.shard_device_store
                and mesh.shape["model"] > 1):
            _bytes_budget *= mesh.shape["model"]
        _budget_rows = (_bytes_budget * 3 // 4) // max(
            ds.store.dim * _isz, 1)
        _floor = int(ds.store.lens.max()) + STORE_TAIL_SLACK
        if _budget_rows >= _floor:
            # STATIC effective round size: the largest k whose WORST-CASE
            # draw (the k longest sequences) fits the budget. The softmax's
            # real-row count compiles in statically (models/base.py
            # compute_log_qy num_real), so the round size must be static
            # too — trimming an oversized draw at round time would leave
            # hier_k - K' zero "phantom" rows INSIDE the softmax: scored,
            # normalized over, and drifting under Adam, diverging from the
            # host-loader semantics the equivalence tests pin.
            _desc = np.sort(np.asarray(ds.store.lens))[::-1][:_hk]
            _k_eff = int(np.searchsorted(
                np.cumsum(_desc), int(_budget_rows) - STORE_TAIL_SLACK,
                side="right"))
            if _k_eff < _hk:
                if verbose:
                    print(
                        f"Hierarchical round size reduced {_hk} -> {_k_eff}:"
                        f" a round's worst-case sub-pack must fit the "
                        f"device-store budget (raise "
                        f"--device-store-max-bytes or use --transfer-dtype "
                        f"bfloat16/int8 for larger rounds)")
                hier_k = _k_eff
                num_seqs = hier_k
            round_rows_ceiling = int(_desc[:_k_eff].sum()) + STORE_TAIL_SLACK
            if verbose:
                mb = round_rows_ceiling * ds.store.dim * _isz / 1e6
                print(f"Hierarchical rounds stage their subset device-"
                      f"resident ({mb:.1f} MB ceiling per round)")
        elif config.data.data_placement in ("device", "stream"):
            # the user forced a staged placement but not even one round's
            # sub-pack fits: fail as a config error rather than silently
            # degrading to the host loader (auto degrades; explicit doesn't)
            raise ValueError(
                f"data_placement={config.data.data_placement} with "
                f"hierarchical sampling stages each round's sub-pack, but "
                f"the longest sequence needs {_floor} rows and the "
                f"device-store budget allows only {int(_budget_rows)} — "
                f"raise --device-store-max-bytes, use --transfer-dtype "
                f"bfloat16/int8, or use data_placement=auto/host")

    model = build_model(config.model.model_type, input_size, config.model, num_seqs,
                        feat_dim=dim)
    if mesh is not None:
        import dataclasses as _dc

        # pad the mu2 table to a multiple of the model axis (padded rows are
        # masked out of the softmax) and hand the mesh to the model so the
        # Pallas discriminative path runs per-shard under shard_map with a
        # collective LSE combine; the jnp path partitions via GSPMD instead
        model = _dc.replace(
            model,
            num_seqs_padded=padded_num_seqs(num_seqs, mesh.shape["model"]),
            shard_mesh=mesh,
        )
    optimizer = make_optimizer(
        config.optim.learning_rate, config.optim.beta_one, config.optim.beta_two
    )
    state = create_train_state(model, optimizer, seed=config.train.seed)
    if mesh is not None:
        state = shard_state(mesh, state)
        if verbose:
            print(f"Training on mesh {dict(mesh.shape)}")

    # mid-epoch checkpoint cadence / step budget: both need the epoch
    # schedule to be a pure function of (seed, epoch) so a resume can
    # re-derive and skip into it — legacy and hierarchical runs are not
    ckpt_every = max(config.train.ckpt_every_steps, 0)
    max_steps = max(config.train.max_steps, 0)
    if (ckpt_every or max_steps) and config.train.legacy:
        raise ValueError(
            "--ckpt-every-steps/--max-steps are not supported with legacy "
            "step-epochs (their schedule is not a pure function of "
            "(seed, epoch)); hierarchical rounds ARE supported — round "
            "subsets draw from an rng keyed by the boundary epoch")

    start_epoch = 0
    best_epoch, best_val_lb = 0, -np.inf
    history = MetricHistory()
    mid_cursor = None  # (epoch, batches_done) from a mid-epoch checkpoint
    mid_partial: dict = {}  # pre-kill metric partials of that epoch
    # order-sensitive corpus identity: saved in every sidecar and compared
    # on resume — a different corpus with the SAME sequence count must not
    # silently pair its sequences with the table's unrelated rows
    corpus_fp = ckpt.corpus_fingerprint(ds.store.seq_keys)
    if continue_from is not None:
        # expected_num_seqs: a non-finetune resume onto a different corpus
        # must raise — the mu2 table is per-sequence state (--finetune is
        # the supported cross-corpus path). Hierarchical runs skip the
        # check: their table is per-round fast weights, MAP-re-initialized
        # at the next round turnover, so a changed K is layout, not state.
        state, meta = ckpt.load_any_checkpoint(
            continue_from, state, finetune=finetune,
            expected_num_seqs=None if hier else num_seqs,
            expected_fingerprint=None if hier else corpus_fp)
        start_epoch = meta["start_epoch"]
        best_epoch = meta.get("best_epoch", 0)
        best_val_lb = meta.get("best_val_lb", -np.inf)
        history = MetricHistory(meta.get("values", {}))
        mid = None if finetune else meta.get("mid_epoch")
        if mid is not None:
            # step-cadence checkpoint: re-enter the SAME epoch and skip the
            # already-trained prefix of its deterministic schedule
            start_epoch = int(mid["epoch"])
            mid_cursor = (start_epoch, int(mid["batches_done"]))
            # the pre-kill prefix's metric partials (when present): folded
            # into the resumed epoch's totals so its recorded train_loss /
            # seg-per-sec cover the WHOLE epoch, not just the remainder
            mid_partial = {k: float(mid[k])
                           for k in ("loss_sum", "count_sum", "elapsed_s")
                           if k in mid}
        if verbose:
            print(f"Resumed from {continue_from} at epoch {start_epoch}"
                  + (f" (mid-epoch, batch {mid_cursor[1]})"
                     if mid_cursor else ""))

    # (data placement was resolved before the model was built — the
    # round-staging ceiling can REDUCE the effective round size, which
    # sizes the mu2 table)
    if data_mode in ("device", "stream") or round_rows_ceiling is not None:
        from pytorch_scalablefhvae_tpu.train.device_step import (
            make_device_train_step,
        )

        _device_steps: dict[int, Any] = {}

        def device_step_for(k: int):
            """One compiled program per scan length: the main K plus the
            epoch's tail (n_batches % K) run as ONE dispatch each — per-batch
            tail dispatches would dominate wall-clock on high-latency links."""
            if k not in _device_steps:
                _device_steps[k] = make_device_train_step(
                    model, optimizer, config.optim.alpha_dis, seg_len,
                    train_loader.batch_size, k, mesh,
                    shard_store=config.data.shard_device_store,
                    donate=config.train.donate_state,
                )
            return _device_steps[k]
    if use_device_data:
        device_source = DeviceDataSource(
            ds.store, mesh, shard_store=config.data.shard_device_store,
            store_dtype=config.data.transfer_dtype,
        )
        if verbose:
            mb = ds.store.data.shape[0] * ds.store.dim * (
                staging_itemsize(config.data.transfer_dtype)) / 1e6
            print(f"Training data device-resident ({mb:.0f} MB staged"
                  f"{', row-sharded' if config.data.shard_device_store and mesh is not None else ''})")
    elif data_mode == "stream":
        chunk_bytes = (config.data.stream_chunk_bytes
                       or max(config.data.device_store_max_bytes // 4, 1))
        stream_source = StreamingDeviceSource(
            ds, chunk_bytes, train_loader.batch_size, mesh=mesh,
            shard_store=config.data.shard_device_store,
            store_dtype=config.data.transfer_dtype,
        )
        if verbose:
            mb = (stream_source.chunk_rows * ds.store.dim
                  * stream_source.dtype.itemsize) / 1e6
            print(f"Training data streams through HBM "
                  f"({len(stream_source.chunks)} chunks of {mb:.0f} MB, "
                  f"double-buffered)")

    if mesh is not None:
        from pytorch_scalablefhvae_tpu.parallel import shard_batch as _shard_batch
        from pytorch_scalablefhvae_tpu.parallel.sharded_step import (
            make_sharded_train_step,
        )

        _raw_step = make_sharded_train_step(
            model, optimizer, config.optim.alpha_dis, mesh,
            donate=config.train.donate_state,
        )

        def train_step(state, feats, seq_idx, nsegs, weight):
            return _raw_step(state, *_shard_batch(mesh, feats, seq_idx, nsegs, weight))

    else:
        train_step = make_train_step(model, optimizer, config.optim.alpha_dis,
                                     donate=config.train.donate_state)
    # the K>1 loop places stacks itself via stack_prefetch (its ``put``
    # handles sharding/transfer ahead of compute), so multi_train_step is the
    # raw compiled program in both modes — no per-dispatch re-placement
    multi_train_step = None
    stack_placer = None
    if config.train.steps_per_dispatch > 1 and not config.train.legacy:
        if mesh is not None:
            from pytorch_scalablefhvae_tpu.parallel.mesh import shard_stacked_batch
            from pytorch_scalablefhvae_tpu.parallel.sharded_step import (
                make_sharded_multi_train_step,
            )

            multi_train_step = make_sharded_multi_train_step(
                model, optimizer, config.optim.alpha_dis, mesh,
                donate=config.train.donate_state,
            )

            def stack_placer(arrs):
                return shard_stacked_batch(mesh, *arrs)

        else:
            from pytorch_scalablefhvae_tpu.train.step import make_multi_train_step

            multi_train_step = make_multi_train_step(
                model, optimizer, config.optim.alpha_dis,
                donate=config.train.donate_state,
            )
    # dev evaluation is two-pass: MAP-estimate a dev mu2 table from encoder
    # means, then score the split against it — held-out sequences have no
    # rows in the learned table (the reference scored dev segments against
    # train-table rows, a meaningless pairing; the papers' test-time
    # procedure is MAP inference of mu2)
    if mesh is not None and dev_loader.batch_size % mesh.shape["data"] == 0 \
            and train_loader.batch_size % mesh.shape["data"] == 0:
        # both per-epoch dev passes (encode for the MAP table + scoring) and
        # the hierarchical-round encode scale with the mesh; the MAP tables
        # themselves stay replicated (O(split) rows)
        from pytorch_scalablefhvae_tpu.parallel.sharded_step import (
            make_sharded_encode_step,
            make_sharded_eval_step,
        )

        eval_step = make_sharded_eval_step(model, config.optim.alpha_dis, mesh)
        encode_step = make_sharded_encode_step(model, mesh)
    else:
        eval_step = make_eval_step(model, config.optim.alpha_dis,
                                   with_table_override=True)
        encode_step = make_encode_step(model)
    pz2_var = float(np.exp(model.pz2_logvar))

    # device-resident dev evaluation: when the training data is staged on
    # device, stage the dev split too (ONCE — its plan is epoch-invariant)
    # and run both per-epoch passes (MAP encode + scoring) as one dispatched
    # program each, instead of re-shipping the whole dev split every epoch.
    dev_device = None
    _itemsize = staging_itemsize(config.data.transfer_dtype)
    if stream_source is not None:
        # streamed runs keep <= 2 chunks staged plus a draining dispatch's
        # references; budget the dev split against that bound
        _train_staged = 3 * stream_source.chunk_rows * ds.store.dim * _itemsize
    elif round_rows_ceiling is not None:
        # per-round sub-pack at the fixed ceiling (plus the previous
        # round's buffer while a dispatch drains)
        _train_staged = 2 * round_rows_ceiling * ds.store.dim * _itemsize
    else:
        _train_staged = ds.store.data.shape[0] * ds.store.dim * _itemsize
    if (use_device_data or stream_source is not None
            or round_rows_ceiling is not None) and resolve_data_placement(
        # opportunistic ("auto" even under forced device placement — dev
        # staging must never OOM a run whose train store barely fits) and
        # budgeted against what the train store already staged
        "auto", dev_loader.dataset.store, mesh,
        shard_store=config.data.shard_device_store,
        max_bytes=max(config.data.device_store_max_bytes - _train_staged, 0),
        legacy=config.train.legacy,
        store_dtype=config.data.transfer_dtype,
    ) and (mesh is None
           or dev_loader.batch_size % mesh.shape["data"] == 0):
        from pytorch_scalablefhvae_tpu.train.device_step import (
            make_device_eval_pass,
            make_device_map_pass,
            make_device_map_pass_chunked,
        )

        _dev_ds = dev_loader.dataset
        _dev_src = DeviceDataSource(
            _dev_ds.store, mesh, shard_store=config.data.shard_device_store,
            store_dtype=config.data.transfer_dtype,
        )
        _dev_plan, (_dseq, _dstarts, _dnsegs) = _dev_src.stage_epoch(
            _dev_ds, np.arange(len(_dev_ds)), dev_loader.batch_size,
        )
        _spb = 16
        if (not _dev_ds.rand_seg and mesh is None
                and config.data.transfer_dtype != "int8"
                and dev_loader.batch_size % _spb == 0
                and (_spb - 1) * _dev_ds.seg_shift + _dev_ds.seg_len
                <= STORE_TAIL_SLACK):
            # the dev MAP pass runs EVERY epoch — use the Pallas
            # chunked-DMA gather (HBM-bandwidth, not the gather unit)
            _dev_padded = int((-(-_dev_ds.nsegs // _spb) * _spb).sum())
            _map = make_device_map_pass_chunked(
                model, _dev_ds.seg_len, _dev_ds.seg_shift,
                dev_loader.batch_size,
                max(-(-_dev_padded // dev_loader.batch_size), 1),
                _dev_ds.num_seqs, pz2_var, spb=_spb,
                interpret=jax.default_backend() not in ("tpu",))
            _map_args = (
                jax.device_put(_dev_ds.store.seq_starts.astype(np.int32)),
                jax.device_put(_dev_ds.nsegs.astype(np.int32)),
            )
        else:
            _map = make_device_map_pass(
                model, _dev_ds.seg_len, dev_loader.batch_size,
                _dev_plan.n_batches, _dev_ds.num_seqs, pz2_var, mesh,
                shard_store=config.data.shard_device_store,
                shard_table=False)
            _map_args = None  # array plan; filled per-call below
        dev_device = {
            "map": _map,
            "map_args": _map_args,
            "eval": make_device_eval_pass(
                model, config.optim.alpha_dis, _dev_ds.seg_len,
                dev_loader.batch_size, _dev_plan.n_batches, mesh,
                shard_store=config.data.shard_device_store),
            "src": _dev_src, "plan": _dev_plan,
            "args": (_dseq, _dstarts, _dnsegs),
        }
        if verbose:
            mb = _dev_ds.store.data.shape[0] * _dev_ds.store.dim * (
                staging_itemsize(config.data.transfer_dtype)) / 1e6
            print(f"Dev split device-resident ({mb:.0f} MB staged)")

    def _eval_dev_device(params):
        dd = dev_device
        plan, (dseq, dstarts, dnsegs) = dd["plan"], dd["args"]
        n_real = np.int32(plan.n_real)
        # MAP pass: one dispatch that leaves the table in HBM (fp32
        # accumulation; ~1e-6 of the host path's fp64 tables)
        if dd["map_args"] is not None:  # chunked: O(K) per-seq metadata
            table = dd["map"](params, dd["src"].data, *dd["map_args"])
        else:
            table = dd["map"](params, dd["src"].data, dseq, dstarts, n_real)
        # scoring pass: one dispatch; host f64 reduction of per-batch sums
        # (evaluate_split's accumulation semantics). The table never
        # round-trips the host between the two dispatches.
        stacked = dd["eval"](params, dd["src"].data, dseq, dstarts, dnsegs,
                             n_real, table)
        # one fetch for all metric rows (per-scalar-array readbacks cost a
        # link round trip each; same rationale as evaluate_split's drain)
        _keys = list(stacked.keys())
        _mat = np.asarray(jnp.stack([stacked[k] for k in _keys]),
                          dtype=np.float64)
        stacked = {k: _mat[i] for i, k in enumerate(_keys)}
        count = float(stacked.pop("count").sum())
        if count == 0:
            return {k: float("nan") for k in ("loss", "lower_bound", "log_qy")}
        return {k: float(v.sum()) / count for k, v in stacked.items()}

    def eval_dev(params, key):
        if dev_device is not None:
            return _eval_dev_device(params)
        dev_table = estimate_split_mu2(
            encode_step, params, dev_loader, dev_loader.dataset.num_seqs,
            pz2_var, z2_dim=config.model.z2_dim,
        )
        return evaluate_split(eval_step, params, dev_loader, key, table=dev_table)

    writer = MetricWriter(
        exp_dir,
        config.run_id(),
        tensorboard=config.train.tensorboard,
        tb_log_dir=config.train.tb_log_dir,
        log_params=config.train.log_params,
    )
    # --log-params gradient histograms (logger.py:80-86 parity): grads are
    # consumed inside the fused train step, so a separate once-per-epoch
    # snapshot pass recomputes them on the epoch's first batch
    grad_step = None
    if config.train.log_params and config.train.tensorboard:
        from pytorch_scalablefhvae_tpu.train.step import make_grad_step

        grad_step = make_grad_step(model, config.optim.alpha_dis)
    if start_epoch > 0:
        writer.replay_history(history, start_epoch)

    eval_key = jax.random.PRNGKey(config.train.seed + 17)
    legacy = config.train.legacy
    result = TrainResult(state, best_epoch, best_val_lb, start_epoch - 1, history)

    # host mirror of the global optimizer-step counter (--max-steps); one
    # sync here, then advanced per dispatched batch
    gstep = int(jax.device_get(state.step)) if max_steps else 0

    def save_state_checkpoint(st: TrainState, epoch: int, *,
                              cursor: dict | None = None,
                              summary_vals: dict | None = None,
                              suffix: str = ""):
        """The ONE checkpoint writer both cadences use — epoch saves (with
        per-epoch summary_vals) and step-cadence mid-epoch saves (with the
        plan cursor and an ``s<batches>`` suffix, never updating
        best-model). Keeping a single meta builder means a field added to
        one cadence cannot silently go missing from the other."""
        extra = {"num_seqs": num_seqs, "feat_dim": dim, "seg_len": seg_len,
                 "corpus_fingerprint": corpus_fp}
        if cursor is not None:
            extra["mid_epoch"] = cursor
        if config.train.ckpt_backend == "orbax":
            from pytorch_scalablefhvae_tpu.train.orbax_backend import (
                save_checkpoint_orbax,
            )

            meta = {
                "model_type": model.model_type,
                "model_params": list(model.model_params()),
                "best_epoch": best_epoch,
                "best_val_lb": float(best_val_lb),
                "values": history.to_json_dict(),
                **extra,
            }
            if summary_vals is not None:
                meta["summary_vals"] = summary_vals
            return save_checkpoint_orbax(
                exp_dir, st, model_type=model.model_type,
                run_info=config.base_string(), epoch=epoch, meta=meta,
                suffix=suffix,
            )
        return ckpt.save_checkpoint(
            exp_dir, st, model_type=model.model_type,
            model_params=model.model_params(),
            run_info=config.base_string(), epoch=epoch,
            best_epoch=best_epoch, best_val_lb=float(best_val_lb),
            values=history.to_json_dict(),
            summary_vals=summary_vals, extra_meta=extra, suffix=suffix,
        )

    def save_mid_checkpoint(st: TrainState, epoch: int, batches_done: int,
                            partials: dict | None = None):
        """Step-cadence checkpoint: full TrainState + the epoch-plan cursor
        (epoch, batches done, and this epoch's metric partials so the
        resumed epoch's recorded train_loss / seg-per-sec cover the whole
        epoch), so a resume continues mid-epoch with the identical
        trajectory."""
        cursor = {"epoch": int(epoch), "batches_done": int(batches_done)}
        if partials:
            cursor.update(partials)
        save_state_checkpoint(st, epoch, cursor=cursor,
                              suffix=f"s{int(batches_done)}")

    def make_after_dispatch(epoch: int, skip0: int, partials_fn=None,
                            divergence_check=None):
        """Per-epoch cadence hook: called after every dispatch with the
        epoch-schedule cursor. Saves every ``ckpt_every`` batches and
        unwinds via :class:`_StopRun` at the --max-steps boundary.
        ``partials_fn()`` supplies the epoch-so-far metric partials stored
        in the cursor (one device fetch; cadence saves are infrequent).
        ``divergence_check(st)`` runs before any save: the per-dispatch NaN
        check deliberately lags one dispatch (it must not drain the
        pipeline), but a save forces a sync anyway — and a NaN state must
        never be persisted, nor a --max-steps run exit 0 having saved one
        (the epoch-end isfinite gate never runs on the _StopRun unwind)."""
        last = {"b": skip0}

        def save(st, batches_done):
            save_mid_checkpoint(st, epoch, batches_done,
                                partials_fn() if partials_fn else None)

        def after(st: TrainState, batches_done: int, nb: int):
            nonlocal gstep
            gstep += nb
            due = bool(ckpt_every and batches_done - last["b"] >= ckpt_every)
            boundary = bool(max_steps and gstep >= max_steps)
            if (due or boundary) and divergence_check is not None:
                divergence_check(st)  # raises SystemExit(2) on NaN
            if due:
                last["b"] = batches_done
                save(st, batches_done)
            if boundary:
                if not due:
                    save(st, batches_done)
                raise _StopRun(st, epoch)

        return after


    # device-resident MAP init for hierarchical rounds: the round subsets are
    # zero-copy views of the already-staged pack, so the per-round encode
    # pass can read HBM directly instead of re-uploading the subset's
    # features. Plans pad to a fixed batch-count CEILING (the K largest
    # per-sequence segment counts) so every round reuses ONE compiled pass.
    hier_device = None
    if hier and (use_device_data or round_rows_ceiling is not None):
        from pytorch_scalablefhvae_tpu.data.device_store import build_epoch_plan
        from pytorch_scalablefhvae_tpu.train.device_step import (
            make_device_map_pass,
            make_device_map_pass_chunked,
            make_device_map_pass_rows,
        )

        # the MAP pass is embarrassingly parallel over segments, so it runs
        # at a LARGER batch than training (fewer, fatter scan iterations —
        # a multiple of the train batch keeps mesh data-axis divisibility)
        _B_tr = train_loader.batch_size
        _B_map = _B_tr * max(1, 2048 // _B_tr)
        _shift = train_loader.dataset.seg_shift
        _spb = 16
        _top = np.sort(np.asarray(train_loader.dataset.nsegs))[-hier_k:]
        _rand = train_loader.dataset.rand_seg
        # the slack gate mirrors make_device_map_pass_chunked's own check,
        # expressed against the SAME constant so the graceful fallback to
        # the array-plan/rows passes cannot drift from the factory's error
        # int8 tuple stores bypass the region-DMA kernel (it reads raw
        # rows); the array-plan/rows passes dequantize in their gather
        _chunked = (not _rand and mesh is None and _B_map % _spb == 0
                    and config.data.transfer_dtype != "int8"
                    and (_spb - 1) * _shift + seg_len <= STORE_TAIL_SLACK)
        if _chunked and ds.store.dim % 128:
            # the chunked pass lane-pads the staged store to a 128-multiple
            # feature dim in-graph — a TRANSIENT second copy in HBM during
            # the MAP dispatch (device_step.make_device_map_pass_chunked).
            # If that peak (staged rows x (dim + padded dim)) would exceed
            # the staging budget, fall back to the rows pass (same math,
            # O(K) upload, gather-unit instead of region-DMA) rather than
            # risk a device OOM the placement check never accounted for.
            _staged_rows = (round_rows_ceiling
                            if round_rows_ceiling is not None
                            else ds.store.data.shape[0] + STORE_TAIL_SLACK)
            _dim = ds.store.dim
            _peak = _staged_rows * (_dim + (_dim + (-_dim) % 128)) * (
                staging_itemsize(config.data.transfer_dtype))
            if _peak > config.data.device_store_max_bytes:
                _chunked = False
        _skip = max(getattr(config.train, "map_init_chunk_skip", 8), 1)
        if _chunked:
            # chunk layout: every _skip-th chunk of _spb windows, each
            # sequence padded to a whole number of selected chunks
            _chunks = -(-_top // _spb)          # ceil(nseg / spb)
            _sel = -(-_chunks // _skip)         # ceil(chunks / skip)
            _padded = int((_sel * _spb).sum())
            _ceil_batches = max(-(-_padded // _B_map), 1)
        else:
            _ceil_batches = max(int(-(-int(_top.sum()) // _B_map)), 1)
        if _rand:
            # random windowing: starts are drawn on the host, so the
            # per-segment plan must be uploaded (array-plan pass)
            _pass = make_device_map_pass(
                model, seg_len, _B_map, _ceil_batches, model.table_rows,
                pz2_var, mesh,
                shard_store=config.data.shard_device_store)
        elif _chunked:
            # deterministic windowing off-mesh: O(K) upload AND the
            # Pallas chunked-DMA gather (HBM-bandwidth, not gather-unit)
            _pass = make_device_map_pass_chunked(
                model, seg_len, _shift, _B_map, _ceil_batches,
                model.table_rows, pz2_var, spb=_spb, chunk_skip=_skip,
                interpret=jax.default_backend() not in ("tpu",))
        else:
            # deterministic windowing on a mesh: the plan derives in-graph
            # from two [K] vectors — per-round upload is O(K)
            _pass = make_device_map_pass_rows(
                model, seg_len, _shift, _B_map,
                _ceil_batches, model.table_rows, pz2_var, mesh,
                shard_store=config.data.shard_device_store)
        hier_device = {
            "pass": _pass,
            "rand": _rand,
            "batch": _B_map,
            "rows": _ceil_batches * _B_map,
            "plan": build_epoch_plan,
            # chunk layout of the compiled pass (None = row-per-segment):
            # the round loop re-derives each subset's row need from these
            # to guard the static ceiling (the in-graph plans would
            # otherwise DROP overflow segments silently — the host-plan
            # path raises for the same condition)
            "spb": _spb if _chunked else None,
            "skip": _skip,
        }

    # device-side epoch planning (--epoch-plan device): the segment schedule
    # derives in-graph from O(S) per-sequence metadata + a PRNG key
    # (device_store.make_device_epoch_plan), so the recurring per-epoch (and
    # per-hierarchical-round) host->device upload drops from O(segments)
    # index arrays to one key. Opt-in: the default host plan is bit-identical
    # to the host loader's order, which the host/device equivalence tests
    # pin; any uniform permutation is an equally valid epoch order.
    dev_planner = None
    dev_plan_meta = None  # (seq_starts i32, nsegs i32, nsegs f32) staged
    dev_plan_rows = None  # fixed plan-array length: a per-run CEILING, so
    # hierarchical rounds of varying subset size never re-specialize the
    # compiled device step on a new plan shape (host and device plans alike)
    if use_device_data or round_rows_ceiling is not None:
        if hier:
            dev_plan_rows = int(
                np.sort(np.asarray(train_loader.dataset.nsegs))[-hier_k:]
                .sum())
        else:
            dev_plan_rows = len(train_loader.dataset)
        dev_plan_rows += (-dev_plan_rows) % train_loader.batch_size
    if ((use_device_data or round_rows_ceiling is not None)
            and config.data.epoch_plan == "device"):
        if train_loader.dataset.rand_seg:
            raise ValueError(
                "--epoch-plan device requires deterministic windowing "
                "(rand_seg draws window starts on the host); "
                "use --epoch-plan host")
        from pytorch_scalablefhvae_tpu.data.device_store import (
            make_device_epoch_plan,
        )

        _n_plan_seqs = hier_k if hier else train_loader.dataset.num_seqs
        dev_planner = make_device_epoch_plan(
            _n_plan_seqs, dev_plan_rows, train_loader.dataset.seg_shift, mesh)
        if not hier:
            dev_plan_meta = device_source.stage_meta(train_loader.dataset)
        dev_plan_key = jax.random.PRNGKey(config.train.seed + 41)
        if verbose:
            print("Epoch plans derive on device (upload: one PRNG key)")
    elif config.data.epoch_plan == "device" and verbose:
        print("epoch_plan=device ignored: training data is "
              + ("chunk-streamed (plans are per-chunk, host-derived)"
                 if stream_source is not None else "host-resident"))

    hier_round_epochs = max(
        getattr(config.train, "hierarchical_round_epochs", 1), 1)
    epoch_loader = None
    round_source = None  # per-round staged sub-pack (hier, pack > HBM)
    if max_steps and gstep >= max_steps:
        # Resumed from a --max-steps boundary checkpoint: the cap is already
        # reached, so exit BEFORE dispatching. after_dispatch only checks the
        # cap after a bundle has run, so without this guard every re-invocation
        # of the same resume command would creep the "stopped" run forward by
        # up to steps_per_dispatch optimizer steps.
        if verbose:
            print(f"--max-steps {max_steps} already reached at restore "
                  f"(step {gstep}); nothing to train")
        return result
    for epoch in range(start_epoch, config.train.epochs):
        _boundary = hier and epoch % hier_round_epochs == 0
        if hier and (epoch_loader is None or _boundary):
            # sample this round's sequence subset and MAP-initialize its
            # mu2 rows from the current encoder; the table (and its Adam
            # moments) are per-round fast weights. With
            # --hierarchical-round-epochs N > 1 the subset and its MAP init
            # are reused for N epochs — the reference keeps ONE subset for
            # the whole run (train_model.py:424-436), so any finite cadence
            # is fresher than its semantics while amortizing the turnover.
            #
            # The round schedule is a PURE FUNCTION of (seed, epoch):
            # boundaries are absolute (epoch % N == 0) and each round's
            # subset draws from an rng keyed by its boundary epoch — so a
            # resume (per-epoch or mid-epoch) re-derives exactly the subset
            # the interrupted run was training, which is what makes
            # --ckpt-every-steps/--max-steps sound under hierarchical
            # sampling. The MAP re-init runs only when the round actually
            # TURNS OVER here: re-entering a live round (resume lands
            # mid-round, or a mid-epoch cursor points at the boundary
            # epoch) keeps the restored table — it IS the round's live
            # state, and re-deriving it from post-init params would fork
            # the trajectory.
            _e0 = epoch - (epoch % hier_round_epochs)
            _fresh_init = _boundary and not (
                mid_cursor is not None and epoch == mid_cursor[0])
            full_ds = train_loader.dataset
            _round_rng = np.random.default_rng(
                (config.train.seed + 23) * 1_000_003 + _e0)
            keys = list(_round_rng.choice(full_ds.store.seq_keys,
                                          size=hier_k, replace=False))
            from pytorch_scalablefhvae_tpu.data.segments import SegmentDataset as _SD

            if round_rows_ceiling is not None:
                # per-round subset staging (pack > HBM): materialize the
                # draw's sub-pack contiguously and stage it at the fixed
                # ceiling — every round reuses the same compiled programs.
                # The ceiling is sized for the K LARGEST sequences (with K
                # already reduced at setup to the largest worst-case-fitting
                # round size), so ANY draw fits; trimming here instead
                # would shrink the round below the compiled softmax's
                # static num_seqs and leave phantom zero rows inside it.
                _lens = np.asarray([
                    int(full_ds.store.lens[full_ds.store.seq2idx[k]])
                    for k in keys])
                if int(_lens.sum()) + STORE_TAIL_SLACK > round_rows_ceiling:
                    raise RuntimeError(
                        f"round draw needs {int(_lens.sum())} frames but the "
                        f"staging ceiling holds "
                        f"{round_rows_ceiling - STORE_TAIL_SLACK} — ceiling "
                        f"sizing bug (it must cover the K largest sequences)")
                sub_store = full_ds.store.subset(keys, materialize=True)
                round_source = DeviceDataSource(
                    sub_store, mesh,
                    shard_store=config.data.shard_device_store,
                    store_dtype=config.data.transfer_dtype,
                    pad_to_rows=round_rows_ceiling,
                )
            else:
                sub_store = full_ds.store.subset(keys)
            # seeds key on the round's BOUNDARY epoch (_e0), not the entry
            # epoch: a resume landing mid-round rebuilds the identical
            # dataset/loader the uninterrupted run created at the boundary
            # (per-epoch shuffles re-derive from set_epoch below)
            sub_ds = _SD(sub_store, seg_len=full_ds.seg_len,
                         seg_shift=full_ds.seg_shift, rand_seg=full_ds.rand_seg,
                         seed=config.train.seed + _e0)
            epoch_loader = SegmentLoader(
                sub_ds, train_loader.batch_size, shuffle=True,
                seed=config.train.seed + 31 * _e0,
                transfer_dtype=config.data.transfer_dtype,
            )
            # the round's PLANNER metadata must stage on every turnover —
            # including resume re-entries that skip the MAP init below — or
            # the epoch's first dispatch dereferences dev_plan_meta=None
            # (--epoch-plan device derives each epoch's schedule from it)
            if dev_planner is not None:
                dev_plan_meta = (round_source or device_source).stage_meta(
                    sub_ds,
                    pad_seqs=hier_k if round_source is not None else None)
            if not _fresh_init:
                pass  # restored table is the round's live state
            elif hier_device is not None:
                # the whole round turnover is ONE device program over the
                # staged pack (subset views keep absolute offsets): encode,
                # per-sequence accumulation, and the MAP formula all run in
                # HBM and the replacement table never touches the host
                # (device_step.make_device_map_pass*). Padding rows beyond
                # num_seqs finish as exact zeros — masked out of the
                # softmax, never gathered.
                if hier_device["rand"]:
                    plan = hier_device["plan"](
                        sub_ds, np.arange(len(sub_ds)), hier_device["batch"])
                    rows = hier_device["rows"]
                    starts = np.zeros(rows, plan.abs_starts.dtype)
                    starts[: len(plan.abs_starts)] = plan.abs_starts
                    seq_rows = np.zeros(rows, plan.seq_idx.dtype)
                    seq_rows[: len(plan.seq_idx)] = plan.seq_idx
                    table = hier_device["pass"](
                        state.params, (round_source or device_source).data,
                        jax.device_put(seq_rows), jax.device_put(starts),
                        np.int32(plan.n_real))
                else:
                    # O(K) upload: the pass derives the segment plan
                    # in-graph from per-sequence (abs offset, nseg). With
                    # device planning the SAME two staged vectors also feed
                    # the round's epoch plans.
                    # trimmed rounds (subset staging) zero-pad the vectors
                    # to hier_k so the compiled passes keep ONE shape
                    _pad_k = hier_k if round_source is not None else None
                    # ceiling guard: the pass's plan derives IN-GRAPH, so a
                    # subset overflowing the compiled row capacity would
                    # silently drop segments (biasing the MAP mean) instead
                    # of raising like the host-plan path does. The ceiling
                    # is built from the K largest sequences, so this can
                    # only fire on a future caller/ceiling regression.
                    _ns_g = np.asarray(sub_ds.nsegs, dtype=np.int64)
                    if hier_device["spb"]:
                        _sg, _kg = hier_device["spb"], hier_device["skip"]
                        _need_rows = int(
                            ((-(-(-(-_ns_g // _sg)) // _kg)) * _sg).sum())
                    else:
                        _need_rows = int(_ns_g.sum())
                    if _need_rows > hier_device["rows"]:
                        raise RuntimeError(
                            f"round MAP plan needs {_need_rows} rows but the "
                            f"compiled pass holds {hier_device['rows']} — "
                            f"ceiling underestimation bug")
                    if dev_plan_meta is not None:
                        _starts_i, _nsegs_i = dev_plan_meta[:2]
                    else:
                        # one padding rule for planner AND MAP vectors:
                        # stage_meta owns pad-to-hier_k (nsegs-0 rows
                        # contribute nothing)
                        _starts_i, _nsegs_i = (round_source or device_source
                            ).stage_meta(sub_ds, pad_seqs=_pad_k)[:2]
                    table = hier_device["pass"](
                        state.params, (round_source or device_source).data,
                        _starts_i, _nsegs_i)
            else:
                # host-loader MAP init honors the same chunk-skip
                # subsampling as the device pass (the table is an
                # initialization the round's Adam steps immediately
                # refine): every skip-th chunk of 16 consecutive windows
                # per sequence, chunk 0 always kept — cuts the round's
                # encode compute AND host->device feature shipping by the
                # skip factor. Random windowing redraws starts per epoch,
                # so its windows are already a sample — no skip there
                # (mirrors the device rand path).
                _skip_h = max(
                    getattr(config.train, "map_init_chunk_skip", 8), 1)
                est_idx = None
                if _skip_h > 1 and not sub_ds.rand_seg:
                    from pytorch_scalablefhvae_tpu.data.segments import (
                        chunk_skip_indices,
                    )

                    est_idx = chunk_skip_indices(
                        sub_ds.seq_idx, spb=16, skip=_skip_h)
                est_loader = SegmentLoader(
                    sub_ds, train_loader.batch_size, shuffle=False, seed=0,
                    transfer_dtype=config.data.transfer_dtype,
                    indices=est_idx)
                table_np = estimate_split_mu2(
                    encode_step, state.params, est_loader, hier_k, pz2_var,
                    z2_dim=config.model.z2_dim,
                )
                pad = model.table_rows - table_np.shape[0]
                if pad:
                    # zero rows beyond num_seqs: masked out of the softmax,
                    # never gathered
                    table_np = np.pad(table_np, ((0, pad), (0, 0)))
                if mesh is not None:
                    # keep the replacement table on the mesh with the step's
                    # expected row sharding (a plain device_put would commit
                    # it to one device and fight the compiled in_shardings)
                    from jax.sharding import NamedSharding, PartitionSpec as P

                    table = jax.device_put(
                        table_np, NamedSharding(mesh, P("model", None))
                    )
                else:
                    table = jax.device_put(table_np)
            if _fresh_init:
                state = _replace_mu2_table(state, table)
        elif not hier:
            epoch_loader = train_loader
        epoch_loader.set_epoch(epoch)
        profiling = (
            config.train.profile_dir is not None
            and epoch == min(config.train.profile_epoch, config.train.epochs - 1)
        )
        if profiling:
            jax.profiler.start_trace(config.train.profile_dir)
        epoch_t0 = time.perf_counter()
        # Per-step losses stay on device; the host only syncs at the NaN-check
        # cadence and at epoch end, so the step stream never stalls on a
        # metric fetch (the reference synced every step implicitly).
        step_losses: list[Any] = []
        step_counts: list[float] = []
        nan_check_every = 50

        def _divergence_abort():
            print("Training diverged")
            writer.close()
            raise SystemExit(2)  # train_model.py:464-466 exit-code parity

        def _prev_dispatch_diverged() -> bool:
            # NaN check on the PREVIOUS dispatch's sub-losses (already
            # complete, so the fetch never drains the pipeline)
            return dispatch_losses_diverged(np.asarray(step_losses[-2]))

        def _record_dispatch(state, metrics, counts_slice):
            """The one post-dispatch bookkeeping path every K-bundled tier
            shares: push the on-device loss stack, record real counts, and
            run the lag-one divergence abort — so a fix to any of it cannot
            silently miss a tier."""
            step_losses.append(metrics["loss"])
            step_counts.extend(counts_slice)
            if len(step_losses) >= 2 and _prev_dispatch_diverged():
                result.state, result.diverged, result.last_epoch = (
                    state, True, epoch)
                _divergence_abort()
            return state

        # mid-epoch resume: skip the already-trained prefix of this epoch's
        # deterministic schedule (no-op except on the checkpointed epoch)
        skip0 = (mid_cursor[1]
                 if mid_cursor is not None and epoch == mid_cursor[0] else 0)
        # pre-kill metric partials of THIS epoch (mid-epoch resume): folded
        # into epoch totals below and carried forward by further cadence
        # saves, so the recorded epoch metrics always span the whole epoch
        _prior = (dict(mid_partial) if skip0 else {})

        def _epoch_partials():
            if step_losses:
                _l = np.asarray(
                    jnp.concatenate([jnp.atleast_1d(x) for x in step_losses]),
                    dtype=np.float64)
                _c = np.asarray(step_counts, dtype=np.float64)
                ls, cs = float((_l * _c).sum()), float(_c.sum())
            else:
                ls = cs = 0.0
            return {
                "loss_sum": ls + _prior.get("loss_sum", 0.0),
                "count_sum": cs + _prior.get("count_sum", 0.0),
                "elapsed_s": (time.perf_counter() - epoch_t0)
                + _prior.get("elapsed_s", 0.0),
            }

        def _abort_if_latest_diverged(st):
            # pre-save gate: inspect the MOST RECENT dispatch (the lag-one
            # per-dispatch check would miss a NaN born in the final dispatch
            # before a cadence save or the --max-steps boundary)
            if step_losses and dispatch_losses_diverged(
                    np.asarray(step_losses[-1])):
                result.state, result.diverged, result.last_epoch = (
                    st, True, epoch)
                _divergence_abort()

        after_dispatch = make_after_dispatch(epoch, skip0, _epoch_partials,
                                             _abort_if_latest_diverged)

        stopped = False
        try:
            if stream_source is not None:
                # streaming path: chunks double-buffer through HBM (the next
                # chunk's transfer is dispatched before the current chunk's
                # batches are consumed); within a chunk the dispatch structure
                # mirrors the device-resident path exactly
                k_dev = max(config.train.steps_per_dispatch, 1)
                B = epoch_loader.batch_size
                device_step_for(k_dev)  # compile the main program up front
                global_b = skip0  # epoch-schedule cursor across chunks
                for plan, chunk_dev, seq_dev, starts_dev, start_b in (
                        stream_source.epoch_batches(
                            config.train.seed + 1_000_003 * epoch,
                            skip_batches=skip0)):
                    counts_all = plan.batch_real_counts()
                    n_real = np.int32(plan.n_real)

                    base_b = start_b
                    while base_b < plan.n_batches:
                        nb = min(k_dev, plan.n_batches - base_b)
                        if max_steps:
                            # clamp the bundle at the step budget: a full
                            # K-dispatch would overshoot --max-steps by up
                            # to K-1 optimizer steps and checkpoint the
                            # overshot state (the loop already compiles one
                            # program per tail size, so this costs at most
                            # one extra compile)
                            nb = min(nb, max_steps - gstep)
                        state, metrics = device_step_for(nb)(
                            state, chunk_dev, seq_dev, starts_dev,
                            stream_source.nsegs_tab, np.int32(base_b * B),
                            n_real)
                        state = _record_dispatch(
                            state, metrics, counts_all[base_b : base_b + nb])
                        base_b += nb
                        global_b += nb
                        after_dispatch(state, global_b, nb)
            elif use_device_data or round_source is not None:
                # device-resident path: upload the epoch's index plan, then every
                # dispatch reads HBM only (base offset + real count are scalars).
                # Divergence is checked on the PREVIOUS dispatch's loss, like the
                # stack path — the fetch never drains the pipeline.
                k_dev = max(config.train.steps_per_dispatch, 1)
                if dev_planner is not None:
                    from pytorch_scalablefhvae_tpu.data.device_store import (
                        EpochPlan,
                    )

                    _n_real = len(epoch_loader.dataset)
                    seq_dev, starts_dev = dev_planner(
                        jax.random.fold_in(dev_plan_key, epoch),
                        dev_plan_meta[0], dev_plan_meta[1], np.int32(_n_real))
                    nsegs_dev = dev_plan_meta[2]
                    plan = EpochPlan.meta(_n_real, epoch_loader.batch_size)
                else:
                    plan, (seq_dev, starts_dev, nsegs_dev) = (
                        (round_source or device_source).stage_epoch(
                            epoch_loader.dataset, epoch_loader._order(),
                            epoch_loader.batch_size, pad_rows=dev_plan_rows,
                            pad_seqs=(hier_k if round_source is not None
                                      else None),
                        ))
                counts_all = plan.batch_real_counts()
                B = epoch_loader.batch_size
                n_real = np.int32(plan.n_real)
                store_dev = (round_source or device_source).data

                device_step_for(k_dev)  # compile the main program up front
                base_b = skip0
                while base_b < plan.n_batches:
                    nb = min(k_dev, plan.n_batches - base_b)
                    if max_steps:
                        # same clamp as the stream path: never dispatch past
                        # the --max-steps boundary
                        nb = min(nb, max_steps - gstep)
                    state, metrics = device_step_for(nb)(
                        state, store_dev, seq_dev, starts_dev, nsegs_dev,
                        np.int32(base_b * B), n_real,
                    )
                    state = _record_dispatch(
                        state, metrics, counts_all[base_b : base_b + nb])
                    base_b += nb
                    after_dispatch(state, base_b, nb)
            elif multi_train_step is not None and config.train.steps_per_dispatch > 1:
                from pytorch_scalablefhvae_tpu.data.loader import stack_prefetch

                # stacks transfer ahead of compute (stack_prefetch); divergence
                # is checked on the PREVIOUS flush's loss — already complete, so
                # the fetch never drains the dispatch pipeline
                k_dispatch = max(config.train.steps_per_dispatch, 1)
                batches_done = skip0
                _src = epoch_loader.batches_from(skip0)
                if max_steps:
                    import itertools

                    # cap the epoch's batch feed at the step budget so the
                    # k-stacker cannot bundle past the --max-steps boundary
                    # (the final sub-k remainder flows through the stacker's
                    # own single-step tail path; after_dispatch raises
                    # _StopRun exactly at the boundary item)
                    _src = itertools.islice(_src, max(max_steps - gstep, 0))
                for item in stack_prefetch(_src,
                                           k_dispatch, put=stack_placer):
                    if item[0] == "stack":
                        _, arrs, counts = item
                        state, metrics = multi_train_step(state, *arrs)
                        # metrics["loss"] is the [k] on-device sub-loss stack
                        state = _record_dispatch(state, metrics, counts)
                        batches_done += len(counts)
                        after_dispatch(state, batches_done, len(counts))
                    else:  # tail: single-step path for the leftover batches
                        _, b, n = item
                        state, metrics = train_step(state, b.feats, b.seq_idx,
                                                    b.nsegs, b.weight)
                        step_losses.append(metrics["loss"])
                        step_counts.append(n)
                        batches_done += 1
                        after_dispatch(state, batches_done, 1)
            else:
                for batch_idx, b in enumerate(
                        device_prefetch(epoch_loader.batches_from(skip0))):
                    state, metrics = train_step(state, b.feats, b.seq_idx, b.nsegs, b.weight)
                    step_losses.append(metrics["loss"])
                    step_counts.append(b.num_real)
                    after_dispatch(state, skip0 + batch_idx + 1, 1)
                    if (batch_idx + 1) % nan_check_every == 0 and not np.isfinite(
                        float(step_losses[-1])
                    ):
                        result.state, result.diverged, result.last_epoch = state, True, epoch
                        _divergence_abort()
                    if legacy and (batch_idx + 1) % config.train.log_interval == 0:  # B4 fixed
                        if verbose:
                            pct = 100.0 * batch_idx / len(epoch_loader)
                            print(
                                f"====> Train Epoch: {epoch} "
                                f"[{batch_idx * epoch_loader.batch_size}/{len(epoch_loader.dataset)} "
                                f"({pct:.0f}%)]\tLoss: {float(step_losses[-1]):.6f}"
                            )
                    if legacy and (batch_idx + 1) % config.train.steps_per_epoch == 0:
                        break

        except _StopRun as stop:
            # --max-steps boundary: the state was checkpointed by
            # after_dispatch; skip this epoch's eval/epoch-checkpoint
            state = stop.state
            stopped = True
        if stopped:
            result = TrainResult(state, best_epoch, best_val_lb,
                                 epoch, history)
            if verbose:
                print(f"Reached --max-steps at epoch {epoch}; "
                      f"mid-epoch checkpoint saved")
            break

        # concatenate the per-dispatch loss stacks ON DEVICE and fetch the
        # result once: fetching each dispatch's array individually costs a
        # link round trip per dispatch (at corpus scale, thousands per
        # epoch on a high-latency link)
        losses = (np.asarray(
            jnp.concatenate([jnp.atleast_1d(l) for l in step_losses]),
            dtype=np.float64) if step_losses else np.zeros(0))
        counts = np.asarray(step_counts)
        # fold in the pre-kill prefix of a mid-epoch-resumed epoch so the
        # recorded metrics cover the WHOLE epoch (cursor partials)
        _p_loss = _prior.get("loss_sum", 0.0)
        _p_count = _prior.get("count_sum", 0.0)
        epoch_dt = (time.perf_counter() - epoch_t0
                    + _prior.get("elapsed_s", 0.0))
        segments_per_sec = float(
            (counts.sum() + _p_count) / max(epoch_dt, 1e-9))
        if profiling:
            jax.profiler.stop_trace()
            if verbose:
                print(f"Wrote profiler trace to {config.train.profile_dir}")
        if not np.isfinite(losses).all():
            result.state, result.diverged, result.last_epoch = state, True, epoch
            _divergence_abort()
        train_loss = float(((losses * counts).sum() + _p_loss)
                           / max(counts.sum() + _p_count, 1.0))
        if verbose:
            print(f"====> Train set average loss: {train_loss:.4f}")

        val = eval_dev(state.params, jax.random.fold_in(eval_key, epoch))
        if verbose:
            print(f"====> Validation set loss: {val['loss']:.4f}  "
                  f"LB: {val['lower_bound']:.4f}")

        history.record(epoch, train_loss, val["loss"], val["lower_bound"],
                       val["log_qy"])
        scalars = {
            "train_loss": train_loss,
            "train_segments_per_sec": segments_per_sec,
            "val_loss": val["loss"],
            "val_lower_bound": val["lower_bound"],
            "val_log_qy": val["log_qy"],
            # per-term ELBO summaries over the val split (B12 fixed)
            "val_log_px_z": val.get("log_px_z", float("nan")),
            "val_neg_kld_z1": val.get("neg_kld_z1", float("nan")),
            "val_neg_kld_z2": val.get("neg_kld_z2", float("nan")),
            "val_log_pmu2": val.get("log_pmu2", float("nan")),
        }
        grads = None
        if grad_step is not None:
            b = next(iter(epoch_loader))
            grads = grad_step(state.params, b.feats, b.seq_idx, b.nsegs,
                              b.weight,
                              jax.random.fold_in(eval_key, 100000 + epoch))
        writer.write_epoch(epoch, scalars, params=state.params, grads=grads)
        if config.train.plot_curves:
            from pytorch_scalablefhvae_tpu.train.plots import write_curves_svg

            # history already spans resumed epochs, so the curves replay
            # prior training exactly like the reference logger.py:52-54
            write_curves_svg(history, Path(exp_dir) / "curves.svg",
                             config.run_id())

        if check_best(val["lower_bound"], best_val_lb):
            best_epoch = epoch
            best_val_lb = val["lower_bound"]  # B6 fixed: track the best value

        save_state_checkpoint(
            state, epoch,
            summary_vals={k: float(v) for k, v in scalars.items()},
        )

        if ckpt_every or max_steps or mid_cursor is not None:
            # the epoch checkpoint supersedes this epoch's (and any stale
            # earlier) step-cadence checkpoints — including ones a previous
            # --max-steps boundary save left behind when THIS run has no
            # cadence flag (mid_cursor marks such a resume); flush async
            # saves so the deletion cannot race a still-committing save
            if config.train.ckpt_backend == "orbax":
                from pytorch_scalablefhvae_tpu.train.orbax_backend import (
                    wait_for_saves,
                )

                wait_for_saves()
            # multihost: wait_for_saves only flushes THIS process's async
            # pipeline — sync all processes before deleting, and delete
            # from process 0 only, so no rank can rmtree a directory a
            # lagging peer is still committing shards into
            if jax.process_count() > 1:
                from jax.experimental import multihost_utils

                multihost_utils.sync_global_devices("cleanup_mid_epoch")
            if jax.process_index() == 0:
                ckpt.cleanup_mid_epoch(exp_dir, model.model_type,
                                       config.base_string(), epoch)

        result = TrainResult(state, best_epoch, best_val_lb, epoch, history)
        if check_terminate(epoch, best_epoch, config.train.patience, config.train.epochs):
            if verbose:
                print("Training terminated!")
            break

    writer.close()
    if config.train.ckpt_backend == "orbax":
        # flush the async save pipeline before handing control back
        from pytorch_scalablefhvae_tpu.train.orbax_backend import wait_for_saves

        wait_for_saves()
    if verbose:
        print("Training complete!")
    return result
