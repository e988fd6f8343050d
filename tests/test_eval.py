"""Evaluation-layer tests: latent extraction, MAP estimation, probes,
factor swap, and the evaluate_experiment surface."""

import numpy as np
import pytest

from pytorch_scalablefhvae_tpu.eval.latents import estimate_mu2, sequence_mean_z1
from pytorch_scalablefhvae_tpu.eval.probes import (
    default_speaker_of,
    linear_probe_accuracy,
    speaker_probes,
)


class TestMu2Map:
    def test_map_formula(self, rng):
        z2 = rng.standard_normal((10, 4)).astype(np.float32)
        seq = np.array([0, 0, 0, 1, 1, 1, 1, 2, 2, 2], np.int32)
        out = estimate_mu2(z2, seq, 3, pz2_var=0.25, pmu2_var=1.0)
        expected0 = z2[:3].sum(0) / (3 + 0.25)
        np.testing.assert_allclose(out[0], expected0, rtol=1e-5)

    def test_unseen_sequence_shrinks_to_prior_mean(self, rng):
        z2 = rng.standard_normal((4, 4)).astype(np.float32)
        seq = np.zeros(4, np.int32)
        out = estimate_mu2(z2, seq, 2, pz2_var=0.25)
        np.testing.assert_array_equal(out[1], np.zeros(4, np.float32))

    def test_sequence_mean_z1(self, rng):
        z1 = rng.standard_normal((6, 3)).astype(np.float32)
        seq = np.array([0, 0, 1, 1, 1, 1], np.int32)
        out = sequence_mean_z1(z1, seq, 2)
        np.testing.assert_allclose(out[0], z1[:2].mean(0), rtol=1e-5)


class TestProbes:
    def test_speaker_key_parsing(self):
        assert default_speaker_of("faks0_sa1") == "faks0"
        assert default_speaker_of("1272-128104-0000") == "1272"

    def test_separable_features_high_acc(self, rng):
        # clearly separable clusters -> near-perfect probe accuracy
        n_per, d = 80, 8
        feats = np.concatenate([
            rng.standard_normal((n_per, d)) * 0.1 + mu
            for mu in (np.zeros(d), np.ones(d) * 3, -np.ones(d) * 3)
        ]).astype(np.float32)
        labels = np.repeat([0, 1, 2], n_per)
        res = linear_probe_accuracy(feats, labels, seed=0)
        assert res["test_acc"] > 0.95
        assert res["n_classes"] == 3

    def test_random_features_near_chance(self, rng):
        feats = rng.standard_normal((300, 8)).astype(np.float32)
        labels = rng.integers(0, 3, 300)
        res = linear_probe_accuracy(feats, labels, seed=0)
        assert res["test_acc"] < 0.6  # chance is 1/3

    def test_grouped_split_is_temporal_and_leak_free(self, rng):
        """With groups, each utterance splits train-prefix / gap / test-
        tail: no test index within overlap_gap of a train index of the
        same group, every class still covered in training, and groups too
        short to split leak-free go wholly to train."""
        feats = rng.standard_normal((40, 4)).astype(np.float32)
        labels = np.repeat([0, 1, 2, 3], 10)
        groups = np.repeat([0, 1, 2, 3], 10)
        res = linear_probe_accuracy(feats, labels, seed=0, groups=groups,
                                    overlap_gap=2)
        assert res["n_examples"] == 40
        # reconstruct the split the same way to assert its properties
        tr, te = [], []
        for gv in range(4):
            idx = np.flatnonzero(groups == gv)
            te_start = len(idx) - max(int(len(idx) * 0.2), 1)
            tr += idx[: te_start - 2].tolist()
            te += idx[te_start:].tolist()
        for t in te:
            assert all(abs(t - s) > 2 for s in tr if groups[s] == groups[t])
        assert set(labels[tr]) == {0, 1, 2, 3}
        # a 3-segment utterance cannot split leak-free -> all train, no NaN
        res2 = linear_probe_accuracy(
            feats[:3], labels[:3] * 0, seed=0, groups=np.zeros(3, np.int64))
        assert res2["test_acc"] is None or np.isnan(res2["test_acc"])

    def test_json_safe_replaces_nonfinite(self):
        import json

        from pytorch_scalablefhvae_tpu.eval.probes import json_safe

        payload = {"a": float("nan"), "b": [1.0, float("inf")], "c": "x"}
        s = json.dumps(json_safe(payload))
        assert json.loads(s) == {"a": None, "b": [1.0, None], "c": "x"}

    def test_speaker_probes_structure(self, rng):
        lat = {
            "z1_mu": rng.standard_normal((50, 8)).astype(np.float32),
            "z2_mu": rng.standard_normal((50, 8)).astype(np.float32),
            "seq_idx": rng.integers(0, 4, 50).astype(np.int32),
        }
        keys = [f"spk{i % 2}_utt{i}" for i in range(4)]
        res = speaker_probes(lat, keys)
        assert res["num_speakers"] == 2
        assert 0 <= res["z2_speaker_probe"]["test_acc"] <= 1


class TestFactorSwap:
    def test_swap_decodes_finite(self, rng):
        import jax

        from pytorch_scalablefhvae_tpu.models import SimpleFHVAE

        model = SimpleFHVAE(input_size=20 * 8, num_seqs=4,
                            z1_hus=(16, 16), z2_hus=(16, 16), x_hus=(16, 16),
                            z1_dim=4, z2_dim=4)
        params = model.init(jax.random.PRNGKey(0))
        z1 = rng.standard_normal((3, 4)).astype(np.float32)
        z2 = rng.standard_normal((3, 4)).astype(np.float32)
        x_mu, _, _ = model.decode(params, z1, z2[[1, 2, 0]], out_shape=(20, 8),
                                  num_frames=20)
        assert x_mu.shape == (3, 20, 8)
        assert np.isfinite(np.asarray(x_mu)).all()


class TestDevicePrefetch:
    def test_prefetch_preserves_batches(self, rng):
        from pytorch_scalablefhvae_tpu.data.loader import Batch, device_prefetch

        batches = [
            Batch(
                feats=rng.standard_normal((4, 5, 3)).astype(np.float32),
                seq_idx=np.arange(4, dtype=np.int32),
                nsegs=np.ones(4, np.float32),
                weight=np.asarray([1, 1, 1, 0], np.float32),
                n_real=3,
            )
            for _ in range(5)
        ]
        out = list(device_prefetch(iter(batches), size=2))
        assert len(out) == 5
        for a, b in zip(batches, out):
            np.testing.assert_array_equal(a.feats, np.asarray(b.feats))
            assert b.num_real == 3

    def test_prefetch_short_iterator(self):
        from pytorch_scalablefhvae_tpu.data.loader import device_prefetch

        assert list(device_prefetch(iter([]), size=3)) == []


class TestLatentsUseOverrideTable:
    def test_lower_bound_scored_against_map_table(self, rng):
        """extract_latents(table=...) must score the per-segment lower
        bound against the SPLIT's MAP table, exactly like the split metrics
        — held-out sequences have no rows in the learned table, so the
        no-table path pairs them with arbitrary training rows (documented
        deviation D6)."""
        import jax

        from pytorch_scalablefhvae_tpu.data.feature_store import FeatureStore
        from pytorch_scalablefhvae_tpu.data.loader import SegmentLoader
        from pytorch_scalablefhvae_tpu.data.segments import SegmentDataset
        from pytorch_scalablefhvae_tpu.eval.latents import extract_latents
        from pytorch_scalablefhvae_tpu.models import SimpleFHVAE
        from pytorch_scalablefhvae_tpu.train.loop import evaluate_split
        from pytorch_scalablefhvae_tpu.train.step import make_eval_step

        store = FeatureStore.from_arrays({
            f"s{i}": rng.standard_normal((40, 8)).astype(np.float32)
            for i in range(4)
        })
        ds = SegmentDataset(store, seg_len=20, seg_shift=8)
        loader = SegmentLoader(ds, batch_size=8, shuffle=False, seed=0)
        model = SimpleFHVAE(input_size=20 * 8, num_seqs=4,
                            z1_hus=(16, 16), z2_hus=(16, 16), x_hus=(16, 16),
                            z1_dim=4, z2_dim=4)
        params = model.init(jax.random.PRNGKey(0))
        table = jax.numpy.asarray(
            rng.standard_normal((4, 4)).astype(np.float32) * 3.0)

        lat = extract_latents(model, params, loader, table=table)
        lat_no = extract_latents(model, params, loader)
        # the table changes the bound (the learned and MAP rows differ)...
        assert not np.allclose(lat["lower_bound"], lat_no["lower_bound"])
        # ...and the per-segment bounds mean-aggregate to the split metric
        # computed with the SAME table (keys are deterministic: sample=False)
        eval_step = make_eval_step(model, 10.0, with_table_override=True)
        metrics = evaluate_split(eval_step, params, loader,
                                 jax.random.PRNGKey(0), table=table)
        np.testing.assert_allclose(float(np.mean(lat["lower_bound"])),
                                   metrics["lower_bound"], rtol=1e-5)
