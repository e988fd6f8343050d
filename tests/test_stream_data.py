"""Streaming device-data tier (data/stream_store.py).

- sequence-aligned chunk partition properties
- data-mode resolution (device / stream / host tiers)
- trajectory equivalence: the streamed path (chunked staging + in-graph
  window gather) produces the SAME parameter trajectory as a host-fed replay
  of the identical schedule — the tier changes where windows materialize,
  never the math
- full runs through run_training with forced chunking
"""

import jax
import numpy as np
import pytest

from pytorch_scalablefhvae_tpu.config import (
    DataConfig,
    ExperimentConfig,
    ModelConfig,
    TrainConfig,
)
from pytorch_scalablefhvae_tpu.data.feature_store import FeatureStore
from pytorch_scalablefhvae_tpu.data.segments import SegmentDataset
from pytorch_scalablefhvae_tpu.data.stream_store import (
    StreamingDeviceSource,
    partition_chunks,
    resolve_data_mode,
)
from pytorch_scalablefhvae_tpu.features.pipeline import preprocess_data
from pytorch_scalablefhvae_tpu.train.driver import train_from_config


def make_store(rng, n_seqs=6, frames=60, dim=8):
    return FeatureStore.from_arrays({
        f"s{i}": rng.standard_normal((frames + i, dim)).astype(np.float32)
        for i in range(n_seqs)
    })


class TestPartition:
    def test_covers_everything_within_budget(self, rng):
        store = make_store(rng)
        ds = SegmentDataset(store, seg_len=20, seg_shift=8)
        row_bytes = store.dim * 4
        budget = 2 * 66 * row_bytes  # ~2 sequences per chunk
        chunks = partition_chunks(store.lens, ds.nsegs, store.dim, 4, budget)
        assert len(chunks) >= 3
        # sequence-aligned, contiguous, complete
        assert chunks[0].seq_lo == 0 and chunks[-1].seq_hi == store.num_seqs
        for a, b in zip(chunks, chunks[1:]):
            assert a.seq_hi == b.seq_lo and a.seg_hi == b.seg_lo
        assert sum(c.n_frames for c in chunks) == store.data.shape[0]
        assert sum(c.n_segments for c in chunks) == len(ds)
        for c in chunks:
            assert c.n_frames * row_bytes <= budget
            assert c.frame_base == store.seq_starts[c.seq_lo]

    def test_oversized_sequence_raises(self, rng):
        store = make_store(rng)
        ds = SegmentDataset(store, seg_len=20, seg_shift=8)
        with pytest.raises(ValueError, match="stream chunk budget"):
            partition_chunks(store.lens, ds.nsegs, store.dim, 4, 64)


class TestResolveMode:
    def test_auto_tiers(self, rng):
        store = make_store(rng)
        assert resolve_data_mode("auto", store, max_bytes=1 << 30) == "device"
        assert resolve_data_mode("auto", store, max_bytes=64) == "stream"
        assert resolve_data_mode("host", store) == "host"
        assert resolve_data_mode("stream", store) == "stream"
        assert resolve_data_mode("device", store, max_bytes=1 << 30) == "device"

    def test_legacy_and_hier_fall_back_to_host(self, rng):
        store = make_store(rng)
        assert resolve_data_mode("auto", store, max_bytes=64,
                                 legacy=True) == "host"
        assert resolve_data_mode("auto", store, max_bytes=64,
                                 hierarchical=True) == "host"
        with pytest.raises(ValueError, match="legacy"):
            resolve_data_mode("stream", store, legacy=True)
        # explicit staged placements route hierarchical runs to "host",
        # which the training loop upgrades to per-round subset staging
        # (and raises there if a round's sub-pack can't fit the budget)
        assert resolve_data_mode("stream", store,
                                 hierarchical=True) == "host"
        assert resolve_data_mode("device", store, max_bytes=64,
                                 hierarchical=True) == "host"
        # ... and when the whole pack fits, explicit device stays device
        assert resolve_data_mode("device", store, max_bytes=1 << 30,
                                 hierarchical=True) == "device"


class TestSchedule:
    def test_schedule_is_deterministic_permutation(self, rng):
        store = make_store(rng)
        ds = SegmentDataset(store, seg_len=20, seg_shift=8)
        src = StreamingDeviceSource(ds, 2 * 66 * store.dim * 4, batch_size=8)
        sched = src.epoch_schedule(7)
        again = src.epoch_schedule(7)
        assert [c.seq_lo for c, _ in sched] == [c.seq_lo for c, _ in again]
        for (_, a), (_, b) in zip(sched, again):
            np.testing.assert_array_equal(a, b)
        # all segments covered exactly once, each within its chunk's range
        all_idx = np.concatenate([o for _, o in sched])
        np.testing.assert_array_equal(np.sort(all_idx), np.arange(len(ds)))
        for c, o in sched:
            assert (o >= c.seg_lo).all() and (o < c.seg_hi).all()
        # a different seed gives a different order
        other = np.concatenate([o for _, o in src.epoch_schedule(8)])
        assert not np.array_equal(all_idx, other)

    def test_bytes_accounting(self, rng):
        store = make_store(rng)
        ds = SegmentDataset(store, seg_len=20, seg_shift=8)
        src = StreamingDeviceSource(ds, 2 * 66 * store.dim * 4, batch_size=8)
        assert src.host_bytes_per_epoch() == (
            len(src.chunks) * src.chunk_rows * store.dim * 4)


class TestStreamEquivalence:
    def test_trajectory_matches_host_replay(self, rng):
        """Streamed training == host-fed training on the same schedule.

        The host replay assembles every batch with the numpy store gather
        and runs the plain jitted train step; the streamed path gathers the
        same windows in-graph from staged chunks. Same batches in the same
        order => the same Adam trajectory.
        """
        from pytorch_scalablefhvae_tpu.models import SimpleFHVAE
        from pytorch_scalablefhvae_tpu.train.device_step import (
            make_device_train_step,
        )
        from pytorch_scalablefhvae_tpu.train.step import (
            create_train_state,
            make_optimizer,
            make_train_step,
        )

        store = make_store(rng)
        ds = SegmentDataset(store, seg_len=20, seg_shift=8)
        model = SimpleFHVAE(input_size=20 * 8, num_seqs=store.num_seqs,
                            z1_hus=(16, 16), z2_hus=(16, 16), x_hus=(16, 16),
                            z1_dim=4, z2_dim=4)
        opt = make_optimizer(1e-3, 0.9, 0.999)
        alpha, B, k = 10.0, 8, 2
        src = StreamingDeviceSource(ds, 2 * 66 * store.dim * 4,
                                    batch_size=B)
        assert len(src.chunks) >= 3

        step_fns = {
            kk: make_device_train_step(model, opt, alpha, 20, B, kk,
                                       donate=False)
            for kk in (k, 1)
        }
        state = create_train_state(model, opt, seed=0)
        for epoch in range(2):
            for plan, chunk, seq_d, starts_d, start_b in src.epoch_batches(epoch):
                assert start_b == 0
                groups, tail = plan.n_batches // k, plan.n_batches % k
                for g in range(groups):
                    state, _ = step_fns[k](
                        state, chunk, seq_d, starts_d, src.nsegs_tab,
                        np.int32(g * k * B), np.int32(plan.n_real))
                if tail:
                    state, _ = step_fns[tail](
                        state, chunk, seq_d, starts_d, src.nsegs_tab,
                        np.int32(groups * k * B), np.int32(plan.n_real))

        host_step = make_train_step(model, opt, alpha, donate=False)
        state_h = create_train_state(model, opt, seed=0)
        for epoch in range(2):
            for spec, order in src.epoch_schedule(epoch):
                n = len(order)
                for b0 in range(0, n, B):
                    idx = order[b0 : b0 + B]
                    real = len(idx)
                    if real < B:
                        idx = np.concatenate(
                            [idx, np.full(B - real, idx[0], idx.dtype)])
                    seq_idx = ds.seq_idx[idx]
                    feats = store.gather_segments(seq_idx, ds.starts[idx], 20)
                    weight = np.zeros(B, np.float32)
                    weight[:real] = 1.0
                    state_h, _ = host_step(
                        state_h, feats.astype(np.float32),
                        seq_idx.astype(np.int32),
                        ds.nsegs[seq_idx].astype(np.float32), weight)

        assert int(state.step) == int(state_h.step)
        jax.tree_util.tree_map(
            lambda a, b: np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=2e-4, atol=2e-5),
            state.params, state_h.params,
        )


class TestQuantize:
    def test_roundtrip_error_bound(self, rng):
        from pytorch_scalablefhvae_tpu.data.quantize import (
            dequantize,
            quantize_columns,
        )

        x = rng.standard_normal((500, 12)).astype(np.float32) * 3.0 + 1.0
        q, scale, offset = quantize_columns(x)
        assert q.dtype == np.uint8 and scale.shape == (12,)
        err = np.abs(dequantize(q, scale, offset) - x)
        # affine uint8: worst-case rounding error is scale/2 per column
        assert (err <= scale / 2 + 1e-6).all()
        # column extremes reconstruct (q=0 -> min, q=255 -> max)
        np.testing.assert_allclose(
            dequantize(q, scale, offset).min(axis=0), x.min(axis=0),
            rtol=1e-5, atol=1e-6)

    def test_degenerate_and_empty(self, rng):
        from pytorch_scalablefhvae_tpu.data.quantize import (
            dequantize,
            quantize_columns,
        )

        x = np.full((10, 3), 2.5, np.float32)
        x[:, 1] = rng.standard_normal(10)
        q, scale, offset = quantize_columns(x)
        assert (scale[[0, 2]] == 0).all() and (q[:, [0, 2]] == 0).all()
        np.testing.assert_array_equal(dequantize(q, scale, offset)[:, 0],
                                      x[:, 0])
        q0, s0, o0 = quantize_columns(np.zeros((0, 4), np.float32))
        assert q0.shape == (0, 4) and s0.shape == (4,)

    def test_quantize_blocked_matches_whole_and_never_mutates(self, rng):
        """quantize_columns runs in row blocks (the whole-pack caller hands
        it memmapped corpora, so transients must stay O(block)): any block
        size must produce identical output, and the input — which for f32
        inputs could silently alias a view — must never be written."""
        from pytorch_scalablefhvae_tpu.data.quantize import quantize_columns

        x = rng.normal(size=(37, 5)).astype(np.float32) * 8.0
        x_orig = x.copy()
        whole = quantize_columns(x)
        for block in (1, 3, 16, 36, 37):
            q, s, o = quantize_columns(x, block_rows=block)
            np.testing.assert_array_equal(q, whole[0])
            np.testing.assert_array_equal(s, whole[1])
            np.testing.assert_array_equal(o, whole[2])
        np.testing.assert_array_equal(x, x_orig)

    def test_stream_bytes_accounting_int8(self, rng):
        store = make_store(rng)
        ds = SegmentDataset(store, seg_len=20, seg_shift=8)
        src = StreamingDeviceSource(ds, 2 * 66 * store.dim, batch_size=8,
                                    store_dtype="int8")
        assert src.quantized and src.dtype == np.dtype(np.uint8)
        assert src.host_bytes_per_epoch() == len(src.chunks) * (
            src.chunk_rows * store.dim + 2 * store.dim * 4)


class TestInt8Equivalence:
    def test_int8_stream_matches_dequantized_host_replay(self, rng):
        """int8 streamed training == host-fed training on the SAME
        dequantized values: quantization is the ONLY difference vs f32, and
        it is deterministic per chunk — so replaying the schedule through
        the plain host step with host-dequantized features reproduces the
        parameter trajectory."""
        from pytorch_scalablefhvae_tpu.data.quantize import (
            dequantize,
            quantize_columns,
        )
        from pytorch_scalablefhvae_tpu.models import SimpleFHVAE
        from pytorch_scalablefhvae_tpu.train.device_step import (
            make_device_train_step,
        )
        from pytorch_scalablefhvae_tpu.train.step import (
            create_train_state,
            make_optimizer,
            make_train_step,
        )

        store = make_store(rng)
        ds = SegmentDataset(store, seg_len=20, seg_shift=8)
        model = SimpleFHVAE(input_size=20 * 8, num_seqs=store.num_seqs,
                            z1_hus=(16, 16), z2_hus=(16, 16), x_hus=(16, 16),
                            z1_dim=4, z2_dim=4)
        opt = make_optimizer(1e-3, 0.9, 0.999)
        alpha, B = 10.0, 8
        src = StreamingDeviceSource(ds, 2 * 66 * store.dim, batch_size=B,
                                    store_dtype="int8")
        assert len(src.chunks) >= 3

        step1 = make_device_train_step(model, opt, alpha, 20, B, 1,
                                       donate=False)
        state = create_train_state(model, opt, seed=0)
        for epoch in range(2):
            for plan, chunk, seq_d, starts_d, _ in src.epoch_batches(epoch):
                assert isinstance(chunk, tuple) and len(chunk) == 3
                for b in range(plan.n_batches):
                    state, _ = step1(
                        state, chunk, seq_d, starts_d, src.nsegs_tab,
                        np.int32(b * B), np.int32(plan.n_real))

        # host mirror: per-chunk quantize+dequantize of the pack rows
        deq = np.concatenate([
            dequantize(*quantize_columns(
                store.data[c.frame_base : c.frame_base + c.n_frames]))
            for c in src.chunks
        ])
        host_step = make_train_step(model, opt, alpha, donate=False)
        state_h = create_train_state(model, opt, seed=0)
        for epoch in range(2):
            for spec, order in src.epoch_schedule(epoch):
                for b0 in range(0, len(order), B):
                    idx = order[b0 : b0 + B]
                    real = len(idx)
                    if real < B:
                        idx = np.concatenate(
                            [idx, np.full(B - real, idx[0], idx.dtype)])
                    seq_idx = ds.seq_idx[idx]
                    abs_start = store.seq_starts[seq_idx] + ds.starts[idx]
                    feats = np.stack([deq[a : a + 20] for a in abs_start])
                    weight = np.zeros(B, np.float32)
                    weight[:real] = 1.0
                    state_h, _ = host_step(
                        state_h, feats.astype(np.float32),
                        seq_idx.astype(np.int32),
                        ds.nsegs[seq_idx].astype(np.float32), weight)

        assert int(state.step) == int(state_h.step)
        jax.tree_util.tree_map(
            lambda a, b: np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=2e-4, atol=2e-5),
            state.params, state_h.params,
        )

    def test_int8_qcache_budget_requantizes_identically(self, rng):
        """The quantized-chunk cache is bounded (at corpus scale an
        unbounded cache would hold the whole pack in heap); past the
        budget, chunks re-quantize per stage — deterministically, so the
        staged bytes are identical with the cache disabled."""
        store = make_store(rng)
        ds = SegmentDataset(store, seg_len=20, seg_shift=8)
        cached = StreamingDeviceSource(ds, 2 * 66 * store.dim, batch_size=8,
                                       store_dtype="int8")
        uncached = StreamingDeviceSource(ds, 2 * 66 * store.dim, batch_size=8,
                                         store_dtype="int8")
        uncached._qcache_left = 0
        for spec in cached.chunks:
            qc, sc, oc = cached._stage_chunk(spec)
            qu, su, ou = uncached._stage_chunk(spec)
            np.testing.assert_array_equal(np.asarray(qc), np.asarray(qu))
            np.testing.assert_array_equal(np.asarray(sc), np.asarray(su))
            np.testing.assert_array_equal(np.asarray(oc), np.asarray(ou))
        assert len(cached._qcache) == len(cached.chunks)
        assert not uncached._qcache  # budget respected: nothing retained

    def test_int8_device_resident_store(self, rng):
        """DeviceDataSource with store_dtype=int8 stages a (q, scale,
        offset) tuple; the device step's gathered batch matches the host
        dequantization of the same windows."""
        from pytorch_scalablefhvae_tpu.data.device_store import (
            DeviceDataSource,
        )
        from pytorch_scalablefhvae_tpu.data.quantize import (
            dequantize,
            quantize_columns,
        )
        from pytorch_scalablefhvae_tpu.models import SimpleFHVAE
        from pytorch_scalablefhvae_tpu.train.device_step import (
            make_device_train_step,
        )
        from pytorch_scalablefhvae_tpu.train.step import (
            create_train_state,
            make_optimizer,
            make_train_step,
        )
        from pytorch_scalablefhvae_tpu.data.loader import SegmentLoader

        store = make_store(rng)
        ds = SegmentDataset(store, seg_len=20, seg_shift=8)
        model = SimpleFHVAE(input_size=20 * 8, num_seqs=store.num_seqs,
                            z1_hus=(16, 16), z2_hus=(16, 16), x_hus=(16, 16),
                            z1_dim=4, z2_dim=4)
        opt = make_optimizer(1e-3, 0.9, 0.999)
        B = 8
        dsrc = DeviceDataSource(store, store_dtype="int8")
        assert isinstance(dsrc.data, tuple) and dsrc.data[0].dtype == np.uint8
        loader = SegmentLoader(ds, B, shuffle=True, seed=3)
        loader.set_epoch(0)
        plan, (seq_d, starts_d, nsegs_d) = dsrc.stage_epoch(
            ds, loader._order(), B)
        step1 = make_device_train_step(model, opt, 10.0, 20, B, 1,
                                       donate=False)
        state = create_train_state(model, opt, seed=0)
        for b in range(plan.n_batches):
            state, m = step1(state, dsrc.data, seq_d, starts_d, nsegs_d,
                             np.int32(b * B), np.int32(plan.n_real))
        assert np.isfinite(float(np.asarray(m["loss"]).ravel()[-1]))

        # whole-pack quantization mirror through the host step
        deq = dequantize(*quantize_columns(store.data))
        host_step = make_train_step(model, opt, 10.0, donate=False)
        state_h = create_train_state(model, opt, seed=0)
        order = loader._order()
        n_real = len(order)
        pad = plan.n_batches * B - n_real
        idx_all = np.concatenate([order, np.zeros(pad, order.dtype)])
        for b in range(plan.n_batches):
            idx = idx_all[b * B : (b + 1) * B]
            seq_idx = ds.seq_idx[idx]
            abs_start = store.seq_starts[seq_idx] + ds.starts[idx]
            feats = np.stack([deq[a : a + 20] for a in abs_start])
            weight = ((b * B + np.arange(B)) < n_real).astype(np.float32)
            state_h, _ = host_step(
                state_h, feats.astype(np.float32), seq_idx.astype(np.int32),
                ds.nsegs[seq_idx].astype(np.float32), weight)
        jax.tree_util.tree_map(
            lambda a, b: np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=2e-4, atol=2e-5),
            state.params, state_h.params,
        )


@pytest.fixture(scope="module")
def corpus(tmp_path_factory):
    root = tmp_path_factory.mktemp("corpus")
    cfg = ExperimentConfig(data=DataConfig(dataset="synthetic"))
    preprocess_data(cfg, root=root)
    return root


def run_stream(corpus, tmp_path, tag, **kw):
    data_kw = dict(
        dataset="synthetic",
        mvn_path=str(tmp_path / f"mvn_{tag}.json"),
        training_batch_size=32,
        dev_batch_size=64,
        data_placement="stream",
        stream_chunk_bytes=kw.pop("stream_chunk_bytes", 64 << 10),
    )
    for k in ("transfer_dtype", "rand_seg"):
        if k in kw:
            data_kw[k] = kw.pop(k)
    cfg = ExperimentConfig(
        data=DataConfig(**data_kw),
        model=ModelConfig(z1_hus=(32, 32), z2_hus=(32, 32), x_hus=(32, 32),
                          z1_dim=8, z2_dim=8),
        train=TrainConfig(epochs=2, patience=10, seed=0, **kw),
    )
    res = train_from_config(
        cfg, data_root=corpus, exp_root=tmp_path / f"exp_{tag}",
        is_preprocessed=True, verbose=False,
    )
    assert not res.diverged
    return res


@pytest.mark.slow
class TestStreamRuns:
    def test_trains_finite_multi_chunk(self, corpus, tmp_path):
        res = run_stream(corpus, tmp_path, "base", steps_per_dispatch=3)
        assert np.isfinite(
            list(res.history.values["train_loss_results"].values())
        ).all()
        assert np.isfinite(
            list(res.history.values["val_loss_results"].values())
        ).all()

    def test_rand_seg_and_bf16(self, corpus, tmp_path):
        res = run_stream(corpus, tmp_path, "rnd", rand_seg=True,
                         transfer_dtype="bfloat16")
        assert np.isfinite(
            list(res.history.values["train_loss_results"].values())
        ).all()

    def test_on_mesh(self, corpus, tmp_path):
        res = run_stream(corpus, tmp_path, "mesh", mesh_shape=(4, 2),
                         steps_per_dispatch=2)
        assert np.isfinite(
            list(res.history.values["train_loss_results"].values())
        ).all()

    def test_int8_stream_on_mesh(self, corpus, tmp_path):
        """int8 chunks under a mesh: the tuple store's byte rows replicate
        (shard_store off) and the dequantizing gather runs mesh-compiled."""
        res = run_stream(corpus, tmp_path, "q8m", transfer_dtype="int8",
                         mesh_shape=(4, 2), steps_per_dispatch=2)
        assert np.isfinite(
            list(res.history.values["train_loss_results"].values())
        ).all()

    def test_int8_stream_full_run(self, corpus, tmp_path):
        res = run_stream(corpus, tmp_path, "q8", transfer_dtype="int8",
                         steps_per_dispatch=2)
        assert np.isfinite(
            list(res.history.values["train_loss_results"].values())
        ).all()
        assert np.isfinite(
            list(res.history.values["val_loss_results"].values())
        ).all()
