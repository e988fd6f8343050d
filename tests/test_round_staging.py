"""Per-round subset staging: hierarchical rounds on packs larger than HBM.

When the full pack cannot stage (data_mode resolves to host) but a round's
K-sequence subset can, the loop materializes each round's subset into a
contiguous sub-pack and stages it at a fixed row ceiling
(train/loop.py round_rows_ceiling; FeatureStore.subset(materialize=True);
DeviceDataSource(pad_to_rows=...)). This file pins:

- materialized subsets: contiguous copies with local offsets, isolated from
  the parent pack
- DeviceDataSource pad_to_rows ceiling semantics
- activation: forced small budget -> the round-staged run REPORTS staging
  and reproduces the host-loader hierarchical trajectory (identical subset
  draws + loader orders => identical math)
- trimming: a budget below the worst-case draw still trains (uniform-prefix
  trim), including with int8 staging
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
    STORE_TAIL_SLACK,
    DeviceDataSource,
)
from pytorch_scalablefhvae_tpu.data.feature_store import FeatureStore
from pytorch_scalablefhvae_tpu.features.pipeline import preprocess_data
from pytorch_scalablefhvae_tpu.train.driver import (
    build_loaders,
    train_from_config,
)


def make_store(rng, n_seqs=6, frames=60, dim=8):
    return FeatureStore.from_arrays({
        f"s{i}": rng.standard_normal((frames + i, dim)).astype(np.float32)
        for i in range(n_seqs)
    })


class TestMaterializedSubset:
    def test_contiguous_local_copy(self, rng):
        store = make_store(rng)
        keys = ["s4", "s1", "s3"]
        sub = store.subset(keys, materialize=True)
        assert sub.data.shape[0] == sum(
            store.lens[store.seq2idx[k]] for k in keys)
        at = 0
        for j, k in enumerate(keys):
            i = store.seq2idx[k]
            assert sub.seq_starts[j] == at
            np.testing.assert_array_equal(sub.sequence(j), store.sequence(i))
            at += int(store.lens[i])
        # isolation: mutating the sub-pack leaves the parent untouched
        before = store.data.copy()
        sub.data += 1.0
        np.testing.assert_array_equal(store.data, before)

    def test_zero_copy_default_shares_buffer(self, rng):
        store = make_store(rng)
        sub = store.subset(["s2", "s0"])
        assert sub.data is store.data


class TestPadToRows:
    def test_ceiling_honored(self, rng):
        store = make_store(rng)
        rows = store.data.shape[0]
        src = DeviceDataSource(store, pad_to_rows=rows + STORE_TAIL_SLACK + 64)
        assert src.data.shape[0] == rows + STORE_TAIL_SLACK + 64
        np.testing.assert_array_equal(
            np.asarray(src.data[:rows]), store.data)
        # padding rows are zeros
        assert not np.asarray(src.data[rows:]).any()

    def test_too_small_raises(self, rng):
        store = make_store(rng)
        with pytest.raises(ValueError, match="pad_to_rows"):
            DeviceDataSource(store, pad_to_rows=store.data.shape[0])

    def test_int8_tuple_with_ceiling(self, rng):
        store = make_store(rng)
        rows = store.data.shape[0]
        src = DeviceDataSource(store, store_dtype="int8",
                               pad_to_rows=rows + STORE_TAIL_SLACK + 8)
        assert isinstance(src.data, tuple)
        assert src.data[0].shape[0] == rows + STORE_TAIL_SLACK + 8


@pytest.fixture(scope="module")
def corpus(tmp_path_factory):
    # larger than the default test corpus: the round ceiling includes the
    # 256-row chunked-DMA slack, which dominates at the 4-sequence default
    # (floor > pack => staging could never trigger); 12 speakers give the
    # train split enough sequences for pack > ceiling > floor to separate
    root = tmp_path_factory.mktemp("corpus")
    cfg = ExperimentConfig(data=DataConfig(dataset="synthetic",
                                           synthetic_speakers=12))
    preprocess_data(cfg, root=root)
    return root


def hier_cfg(tmp_path, tag, max_bytes, placement="auto", **kw):
    data_kw = dict(
        dataset="synthetic",
        mvn_path=str(tmp_path / f"mvn_{tag}.json"),
        training_batch_size=32,
        dev_batch_size=64,
        data_placement=placement,
        device_store_max_bytes=max_bytes,
    )
    for k in ("transfer_dtype",):
        if k in kw:
            data_kw[k] = kw.pop(k)
    return ExperimentConfig(
        data=DataConfig(**data_kw),
        model=ModelConfig(z1_hus=(32, 32), z2_hus=(32, 32), x_hus=(32, 32),
                          z1_dim=8, z2_dim=8),
        train=TrainConfig(epochs=2, patience=10, seed=0,
                          sample_hierarchical=True,
                          num_hierarchical_sequences=2, **kw),
    )


def pack_bytes(corpus, tmp_path):
    cfg = hier_cfg(tmp_path, "probe", 1 << 30)
    train_loader, _ = build_loaders(cfg, data_root=corpus)
    store = train_loader.dataset.store
    return store.data.shape[0] * store.dim * 4, store


@pytest.mark.slow
class TestRoundStagedRuns:
    def test_matches_host_hierarchical_trajectory(self, corpus, tmp_path,
                                                  capsys):
        """Budget below the pack but above the round ceiling: rounds stage
        device-resident and reproduce the host-loader hierarchical run
        (identical subset draws + orders => identical math)."""
        nbytes, store = pack_bytes(corpus, tmp_path)
        budget = nbytes - 1  # pack cannot stage; 3/4 budget >> 2-seq subset
        cfg = hier_cfg(tmp_path, "rs", budget)
        res = train_from_config(cfg, data_root=corpus,
                                exp_root=tmp_path / "exp_rs",
                                is_preprocessed=True, verbose=True)
        out = capsys.readouterr().out
        assert "stage their subset device-resident" in out
        assert not res.diverged

        host = train_from_config(
            hier_cfg(tmp_path, "host", budget, placement="host"),
            data_root=corpus, exp_root=tmp_path / "exp_host",
            is_preprocessed=True, verbose=False)
        jax.tree_util.tree_map(
            lambda a, b: np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=2e-4, atol=2e-5),
            res.state.params, host.state.params,
        )
        for series in ("train_loss_results", "val_loss_results"):
            np.testing.assert_allclose(
                list(res.history.values[series].values()),
                list(host.history.values[series].values()),
                rtol=1e-4, atol=1e-5,
            )

    def test_explicit_device_placement_round_stages(self, corpus, tmp_path,
                                                    capsys):
        """--data-placement device + hierarchical on a pack over budget is
        NOT a config error: the unit that must fit is one round's sub-pack,
        so the run round-stages (same tier auto picks) instead of raising
        at resolve_data_placement."""
        nbytes, _ = pack_bytes(corpus, tmp_path)
        cfg = hier_cfg(tmp_path, "expl", nbytes - 1, placement="device")
        res = train_from_config(cfg, data_root=corpus,
                                exp_root=tmp_path / "exp_expl",
                                is_preprocessed=True, verbose=True)
        out = capsys.readouterr().out
        assert "stage their subset device-resident" in out
        assert not res.diverged

    def test_sharded_budget_scales_by_model_axis(self, corpus, tmp_path,
                                                 capsys):
        """With --shard-device-store the round sub-pack row-shards over the
        mesh's model axis, so the staging budget scales by it — the same
        scaling resolve_data_placement applies. A budget whose UNSCALED 3/4
        is below the single-sequence floor must still round-stage (not
        raise) on a model=2 mesh that affords 2x the rows."""
        nbytes, store = pack_bytes(corpus, tmp_path)
        row = store.dim * 4
        floor = int(np.asarray(store.lens).max()) + STORE_TAIL_SLACK
        # target: unscaled 3/4-budget below the floor, scaled (x2) above it,
        # and the WHOLE pack still over the scaled budget (else it would
        # simply stage device-resident and never round-stage)
        budget = (floor * 3 // 5) * row * 4 // 3
        assert (budget * 3 // 4) // row < floor  # unscaled: would raise
        assert (budget * 2 * 3 // 4) // row >= floor  # scaled: stages
        assert nbytes > budget * 2  # pack itself still cannot stage
        cfg = hier_cfg(tmp_path, "shard", budget, placement="device",
                       mesh_shape=(4, 2))
        cfg = dataclasses.replace(
            cfg, data=dataclasses.replace(cfg.data, shard_device_store=True))
        res = train_from_config(cfg, data_root=corpus,
                                exp_root=tmp_path / "exp_shard",
                                is_preprocessed=True, verbose=True)
        out = capsys.readouterr().out
        assert "stage their subset device-resident" in out
        assert not res.diverged

    def test_trim_and_int8(self, corpus, tmp_path, capsys):
        """Budget below the worst-case 2-sequence draw but above the
        largest single sequence: oversized draws trim to a uniform prefix;
        int8 staging composes (tuple store through the rows MAP pass)."""
        _, store = pack_bytes(corpus, tmp_path)
        lens = np.sort(np.asarray(store.lens))
        # floor: largest sequence + slack must fit 3/4 of the budget (int8
        # itemsize 1); cap below the two largest so some draws trim
        need_floor = (int(lens[-1]) + STORE_TAIL_SLACK) * store.dim
        worst2 = (int(lens[-2:].sum()) + STORE_TAIL_SLACK) * store.dim
        budget = (need_floor + worst2) // 2 * 4 // 3 + 1
        cfg = hier_cfg(tmp_path, "trim", budget, transfer_dtype="int8")
        res = train_from_config(cfg, data_root=corpus,
                                exp_root=tmp_path / "exp_trim",
                                is_preprocessed=True, verbose=True)
        out = capsys.readouterr().out
        assert "stage their subset device-resident" in out
        assert not res.diverged
        assert np.isfinite(
            list(res.history.values["train_loss_results"].values())
        ).all()


class TestExplicitPlacementValidation:
    def test_device_placement_unstageable_round_raises(self, corpus,
                                                       tmp_path):
        """Explicit staged placement where not even one round's sub-pack
        fits: a config error at startup (auto would silently degrade to the
        host loader; explicit must not)."""
        _, store = pack_bytes(corpus, tmp_path)
        floor = (int(np.asarray(store.lens).max()) + STORE_TAIL_SLACK)
        budget = floor * store.dim * 4 * 3 // 4 - store.dim * 4
        cfg = hier_cfg(tmp_path, "tiny", budget, placement="device")
        with pytest.raises(ValueError, match="sub-pack"):
            train_from_config(cfg, data_root=corpus,
                              exp_root=tmp_path / "exp_tiny",
                              is_preprocessed=True, verbose=False)
