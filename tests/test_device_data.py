"""Device-resident training data path (data/device_store.py).

- epoch-plan construction and padding semantics
- host-loader vs device-resident training equivalence (same permutation,
  same parameter trajectory)
- placement resolution (auto gating, legacy exclusion)
- mesh: replicated and row-sharded staged store, gather correctness
"""

import dataclasses

import jax
import numpy as np
import pytest

from pytorch_scalablefhvae_tpu.config import (
    DataConfig,
    ExperimentConfig,
    ModelConfig,
    TrainConfig,
)
from pytorch_scalablefhvae_tpu.data.device_store import (
    DeviceDataSource,
    build_epoch_plan,
    resolve_data_placement,
)
from pytorch_scalablefhvae_tpu.data.feature_store import FeatureStore
from pytorch_scalablefhvae_tpu.data.segments import SegmentDataset
from pytorch_scalablefhvae_tpu.features.pipeline import preprocess_data
from pytorch_scalablefhvae_tpu.train.driver import train_from_config


def make_store(rng, n_seqs=6, frames=60, dim=8):
    return FeatureStore.from_arrays({
        f"s{i}": rng.standard_normal((frames + i, dim)).astype(np.float32)
        for i in range(n_seqs)
    })


class TestEpochPlan:
    def test_padding_and_counts(self, rng):
        ds = SegmentDataset(make_store(rng), seg_len=20, seg_shift=8)
        order = np.arange(len(ds))
        plan = build_epoch_plan(ds, order, batch_size=7)
        assert len(plan.seq_idx) % 7 == 0
        assert plan.n_real == len(ds)
        counts = plan.batch_real_counts()
        assert sum(counts) == len(ds)
        assert all(c == 7 for c in counts[:-1])
        # padded tail rows are (seq 0, frame 0)
        assert (plan.seq_idx[plan.n_real:] == 0).all()
        assert (plan.abs_starts[plan.n_real:] == 0).all()

    def test_pad_rows_must_cover_batch_rounding(self, rng):
        """pad_rows below the batch-rounded row count must raise: shorter
        index arrays make the device step's dynamic_slice clamp its start,
        silently training some segments twice and skipping others."""
        ds = SegmentDataset(make_store(rng), seg_len=20, seg_shift=8)
        order = np.arange(11)
        with pytest.raises(ValueError, match="batch-rounded"):
            build_epoch_plan(ds, order, batch_size=8, pad_rows=12)
        plan = build_epoch_plan(ds, order, batch_size=8, pad_rows=16)
        assert len(plan.seq_idx) == 16 and plan.n_batches == 2

    def test_abs_starts_index_the_pack(self, rng):
        store = make_store(rng)
        ds = SegmentDataset(store, seg_len=20, seg_shift=8)
        order = np.arange(len(ds))
        plan = build_epoch_plan(ds, order, batch_size=len(ds))
        # gather via the plan == the store's own segment gather
        via_plan = store.data[
            plan.abs_starts[:, None] + np.arange(20)[None, :]
        ]
        via_store = store.gather_segments(ds.seq_idx, ds.starts, 20)
        np.testing.assert_array_equal(via_plan[: plan.n_real], via_store)


class TestPlacementResolution:
    def test_auto_gates_on_bytes(self, rng):
        store = make_store(rng)
        assert resolve_data_placement("auto", store, max_bytes=1 << 30)
        assert not resolve_data_placement("auto", store, max_bytes=16)
        assert resolve_data_placement("device", store, max_bytes=1 << 30)
        # forcing device over the budget is a clean configuration error,
        # not a later opaque device-OOM inside jax.device_put
        with pytest.raises(ValueError, match="device-store budget"):
            resolve_data_placement("device", store, max_bytes=16)
        assert not resolve_data_placement("host", store)

    def test_legacy_forces_host(self, rng):
        store = make_store(rng)
        assert not resolve_data_placement("auto", store, legacy=True)
        with pytest.raises(ValueError):
            resolve_data_placement("device", store, legacy=True)

    def test_sharded_budget_scales_with_model_axis(self, rng):
        from pytorch_scalablefhvae_tpu.parallel.mesh import make_mesh

        store = make_store(rng)  # ~6*63*8*4 ≈ 12 KB
        mesh = make_mesh((2, 4))
        per_chip = store.data.nbytes // 3  # fits only when x4 sharded
        assert not resolve_data_placement("auto", store, mesh, False, per_chip)
        assert resolve_data_placement("auto", store, mesh, True, per_chip)


class TestDeviceEpochPlan:
    """make_device_epoch_plan: the in-graph schedule vs the host builder."""

    def _setup(self, rng, batch=7):
        store = make_store(rng)  # ragged sequence lengths
        ds = SegmentDataset(store, seg_len=20, seg_shift=8)
        from pytorch_scalablefhvae_tpu.data.device_store import (
            make_device_epoch_plan,
        )

        n_real = len(ds)
        rows = n_real + (-n_real) % batch
        meta = (
            jax.device_put(store.seq_starts.astype(np.int32)),
            jax.device_put(ds.nsegs.astype(np.int32)),
        )
        return ds, make_device_epoch_plan, n_real, rows, meta

    def test_unshuffled_matches_host_plan(self, rng):
        """shuffle=False reproduces build_epoch_plan's identity order
        exactly — pins the in-graph (seq, abs_start) derivation."""
        ds, make_plan, n_real, rows, meta = self._setup(rng)
        plan_fn = make_plan(ds.num_seqs, rows, ds.seg_shift, shuffle=False)
        seq_d, starts_d = plan_fn(jax.random.PRNGKey(0), *meta,
                                  np.int32(n_real))
        host = build_epoch_plan(ds, np.arange(n_real), batch_size=7)
        np.testing.assert_array_equal(np.asarray(seq_d), host.seq_idx)
        np.testing.assert_array_equal(np.asarray(starts_d), host.abs_starts)

    def test_shuffled_is_permutation_with_tail_padding(self, rng):
        ds, make_plan, n_real, rows, meta = self._setup(rng)
        plan_fn = make_plan(ds.num_seqs, rows, ds.seg_shift)
        seq_d, starts_d = plan_fn(jax.random.PRNGKey(3), *meta,
                                  np.int32(n_real))
        seq_d, starts_d = np.asarray(seq_d), np.asarray(starts_d)
        host = build_epoch_plan(ds, np.arange(n_real), batch_size=7)
        # real rows are a permutation of the host plan's (seq, start) pairs
        got = sorted(zip(seq_d[:n_real].tolist(), starts_d[:n_real].tolist()))
        want = sorted(zip(host.seq_idx[:n_real].tolist(),
                          host.abs_starts[:n_real].tolist()))
        assert got == want
        # padding stays strictly at the tail (weight-0 region)
        assert (seq_d[n_real:] == 0).all()
        assert (starts_d[n_real:] == 0).all()
        # different keys give different orders
        seq2, _ = plan_fn(jax.random.PRNGKey(4), *meta, np.int32(n_real))
        assert not np.array_equal(seq_d, np.asarray(seq2))

    def test_ceiling_rows_reused_across_subset_sizes(self, rng):
        """One compiled planner serves rounds of varying n_real (traced),
        padding past each round's real rows."""
        ds, make_plan, n_real, _, meta = self._setup(rng)
        rows_ceil = n_real + 16
        plan_fn = make_plan(ds.num_seqs, rows_ceil, ds.seg_shift)
        for nr in (n_real, n_real - 5):
            seq_d, starts_d = plan_fn(jax.random.PRNGKey(1), *meta,
                                      np.int32(nr))
            assert (np.asarray(seq_d)[nr:] == 0).all()
            assert (np.asarray(starts_d)[nr:] == 0).all()

    def test_host_plan_pad_rows_ceiling(self, rng):
        """build_epoch_plan(pad_rows=...): arrays padded to the ceiling, but
        n_batches still covers only the real batches."""
        ds = SegmentDataset(make_store(rng), seg_len=20, seg_shift=8)
        n = len(ds)
        plan = build_epoch_plan(ds, np.arange(n), batch_size=7,
                                pad_rows=n + 21)
        assert len(plan.seq_idx) == n + 21
        assert plan.n_batches == -(-n // 7)
        assert sum(plan.batch_real_counts()) == n
        with pytest.raises(ValueError):
            build_epoch_plan(ds, np.arange(n), batch_size=7, pad_rows=n - 1)


@pytest.fixture(scope="module")
def corpus(tmp_path_factory):
    root = tmp_path_factory.mktemp("corpus")
    cfg = ExperimentConfig(data=DataConfig(dataset="synthetic"))
    preprocess_data(cfg, root=root)
    return root


def cfg_for(tmp_path, placement, **kw):
    data_kw = dict(
        dataset="synthetic",
        mvn_path=str(tmp_path / f"mvn_{placement}.json"),
        training_batch_size=32,
        dev_batch_size=64,
        data_placement=placement,
    )
    for k in ("transfer_dtype", "shard_device_store", "epoch_plan",
              "rand_seg"):
        if k in kw:
            data_kw[k] = kw.pop(k)
    return ExperimentConfig(
        data=DataConfig(**data_kw),
        model=ModelConfig(z1_hus=(32, 32), z2_hus=(32, 32), x_hus=(32, 32),
                          z1_dim=8, z2_dim=8),
        train=TrainConfig(epochs=2, patience=10, seed=0, **kw),
    )


def final_params(corpus, tmp_path, placement, **kw):
    cfg = cfg_for(tmp_path, placement, **kw)
    res = train_from_config(
        cfg, data_root=corpus, exp_root=tmp_path / f"exp_{placement}",
        is_preprocessed=True, verbose=False,
    )
    assert not res.diverged
    return res


@pytest.mark.slow
class TestHostDeviceEquivalence:
    def test_same_parameter_trajectory(self, corpus, tmp_path):
        """Same seed + same permutation => same trained params, K=1."""
        host = final_params(corpus, tmp_path, "host")
        dev = final_params(corpus, tmp_path, "device")
        jax.tree_util.tree_map(
            lambda a, b: np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=2e-4, atol=2e-5
            ),
            host.state.params, dev.state.params,
        )
        for series in ("train_loss_results", "val_loss_results",
                       "lower_bound_results", "discrim_loss_results"):
            # val series also pin the device-resident dev evaluation
            # (single-dispatch MAP + scoring passes) against the host path
            h = list(host.history.values[series].values())
            d = list(dev.history.values[series].values())
            np.testing.assert_allclose(h, d, rtol=1e-4, atol=1e-5)

    def test_k_bundled_dispatch(self, corpus, tmp_path):
        """K>1 groups + tail batches on the device path track the host path."""
        host = final_params(corpus, tmp_path, "host", steps_per_dispatch=3)
        dev = final_params(corpus, tmp_path, "device", steps_per_dispatch=3)
        jax.tree_util.tree_map(
            lambda a, b: np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=2e-4, atol=2e-5
            ),
            host.state.params, dev.state.params,
        )

    def test_hierarchical_composes(self, corpus, tmp_path):
        """Round subsets share the staged pack (zero-copy views)."""
        res = final_params(corpus, tmp_path, "device",
                           sample_hierarchical=True,
                           num_hierarchical_sequences=3)
        assert res.state.params["mu2_table"].shape[0] == 3
        assert np.isfinite(
            list(res.history.values["train_loss_results"].values())
        ).all()

    def test_hierarchical_device_map_matches_host(self, corpus, tmp_path):
        """The device-resident round MAP init (one dispatch over the staged
        pack, fixed-ceiling plan) tracks the host-loader estimate path."""
        host = final_params(corpus, tmp_path, "host",
                            sample_hierarchical=True,
                            num_hierarchical_sequences=3)
        dev = final_params(corpus, tmp_path, "device",
                           sample_hierarchical=True,
                           num_hierarchical_sequences=3)
        for series in ("train_loss_results", "val_loss_results"):
            np.testing.assert_allclose(
                list(dev.history.values[series].values()),
                list(host.history.values[series].values()),
                rtol=1e-4, atol=1e-5,
            )


@pytest.mark.slow
class TestDeviceEpochPlanTraining:
    """--epoch-plan device: full runs with in-graph epoch schedules."""

    def test_trains_finite(self, corpus, tmp_path):
        res = final_params(corpus, tmp_path, "device", epoch_plan="device")
        assert np.isfinite(
            list(res.history.values["train_loss_results"].values())
        ).all()
        assert np.isfinite(
            list(res.history.values["val_loss_results"].values())
        ).all()

    def test_hierarchical_rounds_share_meta(self, corpus, tmp_path):
        """Hier rounds: the MAP pass and the epoch plan share one O(K)
        metadata upload; every round reuses the compiled planner/step."""
        res = final_params(corpus, tmp_path, "device", epoch_plan="device",
                           sample_hierarchical=True,
                           num_hierarchical_sequences=3)
        assert res.state.params["mu2_table"].shape[0] == 3
        assert np.isfinite(
            list(res.history.values["train_loss_results"].values())
        ).all()

    def test_rand_seg_rejected(self, corpus, tmp_path):
        with pytest.raises(ValueError, match="deterministic windowing"):
            final_params(corpus, tmp_path, "device", epoch_plan="device",
                         rand_seg=True)

    def test_composes_with_mesh(self, corpus, tmp_path):
        """Planner outputs replicate over the mesh (out_shardings=P())."""
        res = final_params(corpus, tmp_path, "device", epoch_plan="device",
                           mesh_shape=(4, 2))
        assert np.isfinite(
            list(res.history.values["train_loss_results"].values())
        ).all()


@pytest.mark.slow
class TestMesh:
    def test_device_data_on_mesh(self, corpus, tmp_path):
        dev = final_params(corpus, tmp_path, "device", mesh_shape=(4, 2))
        host = final_params(corpus, tmp_path, "host", mesh_shape=(4, 2))
        jax.tree_util.tree_map(
            lambda a, b: np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=2e-4, atol=2e-5
            ),
            host.state.params, dev.state.params,
        )
        # the device-resident dev evaluation composes with the mesh too
        for series in ("val_loss_results", "lower_bound_results"):
            np.testing.assert_allclose(
                list(dev.history.values[series].values()),
                list(host.history.values[series].values()),
                rtol=1e-4, atol=1e-5,
            )

    def test_sharded_store_full_run_with_device_eval(self, corpus, tmp_path):
        """Row-sharded staged store + device-resident dev eval == host path.

        The dev store is row-sharded over "model" here too, so the eval
        pass's shard_map gather + psum runs inside the whole-split scans."""
        dev = final_params(corpus, tmp_path, "device", mesh_shape=(4, 2),
                           shard_device_store=True)
        host = final_params(corpus, tmp_path, "host", mesh_shape=(4, 2))
        for series in ("train_loss_results", "val_loss_results"):
            np.testing.assert_allclose(
                list(dev.history.values[series].values()),
                list(host.history.values[series].values()),
                rtol=1e-4, atol=1e-5,
            )

    def test_sharded_store_gather_correct(self, rng):
        """Row-sharded staged store: shard_map gather == numpy gather."""
        from pytorch_scalablefhvae_tpu.parallel.mesh import make_mesh
        from pytorch_scalablefhvae_tpu.train.device_step import _make_gather

        mesh = make_mesh((4, 2))
        store = make_store(rng, n_seqs=4, frames=50, dim=8)
        src = DeviceDataSource(store, mesh, shard_store=True)
        ds = SegmentDataset(store, seg_len=20, seg_shift=8)
        order = rng.permutation(len(ds))[:8]
        plan = build_epoch_plan(ds, order, batch_size=8)
        gather = _make_gather(20, mesh, shard_store=True)
        out = jax.jit(gather)(src.data, jax.device_put(plan.abs_starts))
        expect = store.data[plan.abs_starts[:, None] + np.arange(20)[None, :]]
        np.testing.assert_allclose(np.asarray(out), expect, rtol=1e-6)

    def test_sharded_store_gather_int8(self, rng):
        """Row-sharded int8 tuple store: dequant happens per shard before
        the psum; result matches the host per-column dequantization."""
        from pytorch_scalablefhvae_tpu.data.quantize import (
            dequantize,
            quantize_columns,
        )
        from pytorch_scalablefhvae_tpu.parallel.mesh import make_mesh
        from pytorch_scalablefhvae_tpu.train.device_step import _make_gather

        mesh = make_mesh((4, 2))
        store = make_store(rng, n_seqs=4, frames=50, dim=8)
        src = DeviceDataSource(store, mesh, shard_store=True,
                               store_dtype="int8")
        assert isinstance(src.data, tuple)
        ds = SegmentDataset(store, seg_len=20, seg_shift=8)
        order = rng.permutation(len(ds))[:8]
        plan = build_epoch_plan(ds, order, batch_size=8)
        gather = _make_gather(20, mesh, shard_store=True)
        out = jax.jit(gather)(src.data, jax.device_put(plan.abs_starts))
        deq = dequantize(*quantize_columns(store.data))
        expect = deq[plan.abs_starts[:, None] + np.arange(20)[None, :]]
        np.testing.assert_allclose(np.asarray(out), expect,
                                   rtol=1e-6, atol=1e-6)

    def test_sharded_store_training_runs(self, corpus, tmp_path):
        res = final_params(corpus, tmp_path, "device", mesh_shape=(4, 2),
                           shard_device_store=True, steps_per_dispatch=2)
        assert np.isfinite(
            list(res.history.values["train_loss_results"].values())
        ).all()


@pytest.mark.slow
class TestDeviceMapPass:
    """make_device_map_pass: the single-dispatch MAP table vs the host path."""

    def _setup(self, rng, mesh=None, shard_store=False, shard_table=True):
        from pytorch_scalablefhvae_tpu.models import SimpleFHVAE
        from pytorch_scalablefhvae_tpu.train.device_step import (
            make_device_map_pass,
        )
        from pytorch_scalablefhvae_tpu.train.loop import estimate_split_mu2
        from pytorch_scalablefhvae_tpu.train.step import make_encode_step

        store = make_store(rng, n_seqs=5, frames=60, dim=8)
        ds = SegmentDataset(store, seg_len=20, seg_shift=8)
        # on a mesh the params table is padded to the model-axis multiple,
        # exactly as run_training sizes it
        padded = 6 if mesh is not None else None
        model = SimpleFHVAE(input_size=20 * 8, num_seqs=5,
                            z1_hus=(16, 16), z2_hus=(16, 16), x_hus=(16, 16),
                            z1_dim=4, z2_dim=4, num_seqs_padded=padded,
                            shard_mesh=mesh)
        params = model.init(jax.random.PRNGKey(0))
        src = DeviceDataSource(store, mesh, shard_store=shard_store)
        B = 8
        plan, (seq_dev, starts_dev, _) = src.stage_epoch(
            ds, np.arange(len(ds)), B)
        pz2_var = float(np.exp(model.pz2_logvar))
        map_pass = make_device_map_pass(
            model, 20, B, plan.n_batches, 5, pz2_var, mesh,
            shard_store=shard_store, shard_table=shard_table)
        table = np.asarray(map_pass(params, src.data, seq_dev, starts_dev,
                                    np.int32(plan.n_real)))

        from pytorch_scalablefhvae_tpu.data.loader import SegmentLoader

        loader = SegmentLoader(ds, B, shuffle=False, seed=0)
        ref = estimate_split_mu2(make_encode_step(model), params, loader,
                                 5, pz2_var, z2_dim=4)
        return table, ref

    def test_matches_host_estimate(self, rng):
        table, ref = self._setup(rng)
        np.testing.assert_allclose(table, ref, rtol=1e-5, atol=1e-6)

    def test_padded_rows_are_zero(self, rng):
        """num_rows beyond num_seqs (mesh padding) must finish exactly 0."""
        from pytorch_scalablefhvae_tpu.models import SimpleFHVAE
        from pytorch_scalablefhvae_tpu.train.device_step import (
            make_device_map_pass,
        )

        store = make_store(rng, n_seqs=3, frames=40, dim=8)
        ds = SegmentDataset(store, seg_len=20, seg_shift=8)
        model = SimpleFHVAE(input_size=20 * 8, num_seqs=3,
                            z1_hus=(16, 16), z2_hus=(16, 16), x_hus=(16, 16),
                            z1_dim=4, z2_dim=4, num_seqs_padded=8)
        params = model.init(jax.random.PRNGKey(0))
        src = DeviceDataSource(store)
        plan, (seq_dev, starts_dev, _) = src.stage_epoch(
            ds, np.arange(len(ds)), 8)
        map_pass = make_device_map_pass(model, 20, 8, plan.n_batches,
                                        8, 0.25)
        table = np.asarray(map_pass(params, src.data, seq_dev, starts_dev,
                                    np.int32(plan.n_real)))
        assert table.shape == (8, 4)
        np.testing.assert_array_equal(table[3:], 0.0)
        assert np.abs(table[:3]).min() > 0

    def test_on_mesh_sharded_store(self, rng):
        from pytorch_scalablefhvae_tpu.parallel.mesh import make_mesh

        mesh = make_mesh((4, 2))
        table, ref = self._setup(rng, mesh=mesh, shard_store=False,
                                 shard_table=False)
        np.testing.assert_allclose(table, ref, rtol=1e-5, atol=1e-6)

    def test_rows_variant_matches_array_plan(self, rng):
        """make_device_map_pass_rows (O(K)-upload, in-graph plan) must
        produce the same table as the array-plan pass and the host path."""
        from pytorch_scalablefhvae_tpu.models import SimpleFHVAE
        from pytorch_scalablefhvae_tpu.train.device_step import (
            make_device_map_pass_rows,
        )

        store = make_store(rng, n_seqs=5, frames=60, dim=8)
        ds = SegmentDataset(store, seg_len=20, seg_shift=8)
        model = SimpleFHVAE(input_size=20 * 8, num_seqs=5,
                            z1_hus=(16, 16), z2_hus=(16, 16), x_hus=(16, 16),
                            z1_dim=4, z2_dim=4)
        params = model.init(jax.random.PRNGKey(0))
        src = DeviceDataSource(store)
        B = 8
        n_batches = -(-len(ds) // B)
        pz2_var = float(np.exp(model.pz2_logvar))
        rows_pass = make_device_map_pass_rows(
            model, 20, 8, B, n_batches, 5, pz2_var)
        table = np.asarray(rows_pass(
            params, src.data,
            jax.device_put(store.seq_starts.astype(np.int32)),
            jax.device_put(ds.nsegs.astype(np.int32))))

        from pytorch_scalablefhvae_tpu.data.loader import SegmentLoader
        from pytorch_scalablefhvae_tpu.train.loop import estimate_split_mu2
        from pytorch_scalablefhvae_tpu.train.step import make_encode_step

        loader = SegmentLoader(ds, B, shuffle=False, seed=0)
        want = estimate_split_mu2(make_encode_step(model), params, loader,
                                  5, pz2_var, z2_dim=4)
        np.testing.assert_allclose(table, want, rtol=1e-5, atol=1e-6)

    def test_rows_variant_subset_view(self, rng):
        """Round-subset semantics: a subset view's (abs offsets, nsegs) give
        the same table as host estimation over the subset dataset."""
        from pytorch_scalablefhvae_tpu.data.loader import SegmentLoader
        from pytorch_scalablefhvae_tpu.models import SimpleFHVAE
        from pytorch_scalablefhvae_tpu.train.device_step import (
            make_device_map_pass_rows,
        )
        from pytorch_scalablefhvae_tpu.train.loop import estimate_split_mu2
        from pytorch_scalablefhvae_tpu.train.step import make_encode_step

        store = make_store(rng, n_seqs=6, frames=60, dim=8)
        sub = store.subset([store.seq_keys[i] for i in (4, 1, 3)])
        sub_ds = SegmentDataset(sub, seg_len=20, seg_shift=8)
        model = SimpleFHVAE(input_size=20 * 8, num_seqs=3,
                            z1_hus=(16, 16), z2_hus=(16, 16), x_hus=(16, 16),
                            z1_dim=4, z2_dim=4)
        params = model.init(jax.random.PRNGKey(0))
        src = DeviceDataSource(store)  # FULL pack staged
        B = 8
        n_batches = -(-len(sub_ds) // B) + 1  # ceiling w/ slack, as the loop
        pz2_var = float(np.exp(model.pz2_logvar))
        rows_pass = make_device_map_pass_rows(
            model, 20, 8, B, n_batches, 3, pz2_var)
        table = np.asarray(rows_pass(
            params, src.data,
            jax.device_put(sub.seq_starts.astype(np.int32)),
            jax.device_put(sub_ds.nsegs.astype(np.int32))))
        loader = SegmentLoader(sub_ds, B, shuffle=False, seed=0)
        want = estimate_split_mu2(make_encode_step(model), params, loader,
                                  3, pz2_var, z2_dim=4)
        np.testing.assert_allclose(table, want, rtol=1e-5, atol=1e-6)

    def test_chunked_variant_matches_host(self, rng):
        """make_device_map_pass_chunked (Pallas region-DMA gather,
        per-sequence spb padding) == host estimate, including a subset view
        whose last chunk overhangs into the next sequence / tail slack."""
        from pytorch_scalablefhvae_tpu.data.loader import SegmentLoader
        from pytorch_scalablefhvae_tpu.models import SimpleFHVAE
        from pytorch_scalablefhvae_tpu.train.device_step import (
            make_device_map_pass_chunked,
        )
        from pytorch_scalablefhvae_tpu.train.loop import estimate_split_mu2
        from pytorch_scalablefhvae_tpu.train.step import make_encode_step

        # ragged lengths -> nsegs not multiples of spb
        store = make_store(rng, n_seqs=5, frames=61, dim=8)
        ds = SegmentDataset(store, seg_len=20, seg_shift=8)
        model = SimpleFHVAE(input_size=20 * 8, num_seqs=5,
                            z1_hus=(16, 16), z2_hus=(16, 16), x_hus=(16, 16),
                            z1_dim=4, z2_dim=4)
        params = model.init(jax.random.PRNGKey(0))
        src = DeviceDataSource(store)
        spb, B = 4, 8
        padded = int((-(-ds.nsegs // spb) * spb).sum())
        n_batches = max(-(-padded // B), 1)
        pz2_var = float(np.exp(model.pz2_logvar))
        cpass = make_device_map_pass_chunked(
            model, 20, 8, B, n_batches, 5, pz2_var, spb=spb,
            interpret=jax.default_backend() != "tpu")
        table = np.asarray(cpass(
            params, src.data,
            jax.device_put(store.seq_starts.astype(np.int32)),
            jax.device_put(ds.nsegs.astype(np.int32))))
        loader = SegmentLoader(ds, B, shuffle=False, seed=0)
        want = estimate_split_mu2(make_encode_step(model), params, loader,
                                  5, pz2_var, z2_dim=4)
        np.testing.assert_allclose(table, want, rtol=1e-5, atol=1e-6)

    def test_chunked_variant_chunk_skip(self, rng):
        """chunk_skip=N encodes exactly every Nth chunk's windows: the
        table equals the MAP formula applied to that subsampled window set
        (counts included — the shrinkage denominator uses the subsampled
        count)."""
        import jax.numpy as jnp

        from pytorch_scalablefhvae_tpu.models import SimpleFHVAE
        from pytorch_scalablefhvae_tpu.train.device_step import (
            make_device_map_pass_chunked,
        )

        store = make_store(rng, n_seqs=5, frames=137, dim=8)
        ds = SegmentDataset(store, seg_len=20, seg_shift=8)
        model = SimpleFHVAE(input_size=20 * 8, num_seqs=5,
                            z1_hus=(16, 16), z2_hus=(16, 16), x_hus=(16, 16),
                            z1_dim=4, z2_dim=4)
        params = model.init(jax.random.PRNGKey(0))
        src = DeviceDataSource(store)
        spb, B, skip = 4, 8, 2
        chunks = -(-ds.nsegs // spb)       # ceil(nseg / spb)
        sel_chunks = -(-chunks // skip)    # ceil(chunks / skip)
        padded = int((sel_chunks * spb).sum())
        n_batches = max(-(-padded // B), 1)
        pz2_var = float(np.exp(model.pz2_logvar))
        cpass = make_device_map_pass_chunked(
            model, 20, 8, B, n_batches, 5, pz2_var, spb=spb,
            chunk_skip=skip, interpret=jax.default_backend() != "tpu")
        table = np.asarray(cpass(
            params, src.data,
            jax.device_put(store.seq_starts.astype(np.int32)),
            jax.device_put(ds.nsegs.astype(np.int32))))

        # expected: per sequence, windows of chunks 0, skip, 2*skip, ...
        ratio = pz2_var  # pmu2_var = 1.0
        want = np.zeros((5, 4), np.float32)
        for k in range(store.num_seqs):
            feats = store.sequence(k)
            n = int(ds.nsegs[k])
            wins = [c * spb + i
                    for c in range(0, -(-n // spb), skip)
                    for i in range(spb) if c * spb + i < n]
            x = np.stack([feats[w * 8 : w * 8 + 20] for w in wins])
            z2_mu = np.asarray(model.encode_z2(
                params, jnp.asarray(x, jnp.float32)))
            want[k] = z2_mu.sum(0) / (len(wins) + ratio)
        np.testing.assert_allclose(table, want, rtol=1e-5, atol=1e-6)

    def test_chunked_pass_rejects_oversized_region(self, rng):
        """A chunk region larger than the staged store's tail slack must
        be a clean factory error — the overhanging region DMA would read
        out of bounds on real TPU with no error."""
        from pytorch_scalablefhvae_tpu.models import SimpleFHVAE
        from pytorch_scalablefhvae_tpu.train.device_step import (
            make_device_map_pass_chunked,
        )

        model = SimpleFHVAE(input_size=20 * 8, num_seqs=5,
                            z1_hus=(16, 16), z2_hus=(16, 16), x_hus=(16, 16),
                            z1_dim=4, z2_dim=4)
        with pytest.raises(ValueError, match="tail slack"):
            make_device_map_pass_chunked(
                model, 20, 20, 16, 1, 5, 0.25, spb=16)  # 15*20+20 = 320

    def test_host_chunk_skip_matches_device(self, rng):
        """The HOST MAP-init subsample (chunk_skip_indices feeding
        SegmentLoader + estimate_split_mu2 — the loop's host hier branch)
        produces the same table as the device chunked pass at the same
        spb/skip: both subsampling implementations select identical
        windows."""
        from pytorch_scalablefhvae_tpu.data.loader import SegmentLoader
        from pytorch_scalablefhvae_tpu.data.segments import (
            chunk_skip_indices,
        )
        from pytorch_scalablefhvae_tpu.models import SimpleFHVAE
        from pytorch_scalablefhvae_tpu.train.device_step import (
            make_device_map_pass_chunked,
        )
        from pytorch_scalablefhvae_tpu.train.loop import estimate_split_mu2
        from pytorch_scalablefhvae_tpu.train.step import make_encode_step

        store = make_store(rng, n_seqs=5, frames=137, dim=8)
        ds = SegmentDataset(store, seg_len=20, seg_shift=8)
        model = SimpleFHVAE(input_size=20 * 8, num_seqs=5,
                            z1_hus=(16, 16), z2_hus=(16, 16), x_hus=(16, 16),
                            z1_dim=4, z2_dim=4)
        params = model.init(jax.random.PRNGKey(0))
        src = DeviceDataSource(store)
        spb, B, skip = 4, 8, 2
        sel_chunks = -(-(-(-ds.nsegs // spb)) // skip)
        padded = int((sel_chunks * spb).sum())
        n_batches = max(-(-padded // B), 1)
        pz2_var = float(np.exp(model.pz2_logvar))
        cpass = make_device_map_pass_chunked(
            model, 20, 8, B, n_batches, 5, pz2_var, spb=spb,
            chunk_skip=skip, interpret=jax.default_backend() != "tpu")
        table = np.asarray(cpass(
            params, src.data,
            jax.device_put(store.seq_starts.astype(np.int32)),
            jax.device_put(ds.nsegs.astype(np.int32))))
        loader = SegmentLoader(
            ds, B, shuffle=False, seed=0,
            indices=chunk_skip_indices(ds.seq_idx, spb=spb, skip=skip))
        want = estimate_split_mu2(make_encode_step(model), params, loader,
                                  5, pz2_var, z2_dim=4)
        np.testing.assert_allclose(table, want, rtol=1e-5, atol=1e-6)


class TestWindowedChunkGather:
    def test_matches_take(self, rng):
        """The Pallas region-DMA gather == per-window jnp.take."""
        import jax.numpy as jnp

        from pytorch_scalablefhvae_tpu.ops.window_gather_pallas import (
            windowed_chunk_gather,
        )

        N, D, spb, seg, stride = 512, 16, 4, 20, 8
        store = jnp.asarray(
            rng.standard_normal((N, D)).astype(np.float32))
        chunk_starts = np.asarray([0, 8, 96, 200, 333, 400], np.int32)
        got = windowed_chunk_gather(
            store, jnp.asarray(chunk_starts), spb=spb, seg_len=seg,
            stride=stride, interpret=jax.default_backend() != "tpu")
        starts = (chunk_starts[:, None]
                  + stride * np.arange(spb)[None, :]).reshape(-1)
        want = np.stack([np.asarray(store[s : s + seg]) for s in starts])
        np.testing.assert_array_equal(np.asarray(got), want)
