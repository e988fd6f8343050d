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
        with pytest.raises(ValueError, match="hierarchical"):
            resolve_data_mode("stream", store, hierarchical=True)


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
                                    batch_size=B, round_to=k)
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
