"""Data pipeline tests: segment math, feature store, MVN, loader shapes."""

import json

import numpy as np
import pytest

from pytorch_scalablefhvae_tpu.data import FeatureStore, SegmentDataset, SegmentLoader
from pytorch_scalablefhvae_tpu.data.segments import make_segments
from pytorch_scalablefhvae_tpu.utils.manifest import write_scp


def build_split(tmp_path, rng, lens=(40, 25, 20, 19, 64), dim=8):
    feats, lend = {}, {}
    for i, l in enumerate(lens):
        k = f"utt{i}"
        arr = rng.standard_normal((l, dim)).astype(np.float32)
        p = tmp_path / f"{k}.npy"
        np.save(p, arr)
        feats[k] = str(p)
        lend[k] = l
    write_scp(tmp_path / "feats.scp", feats)
    write_scp(tmp_path / "len.scp", lend)
    return tmp_path / "feats.scp", tmp_path / "len.scp"


class TestSegmentMath:
    def test_sliding_window_counts(self):
        # (l - seg_len) // shift + 1 (datasets.py:176)
        lens = np.array([20, 27, 28, 36, 19])
        _, _, nsegs = make_segments(lens, seg_len=20, seg_shift=8)
        np.testing.assert_array_equal(nsegs, [1, 1, 2, 3, 0])

    def test_starts_stride(self):
        seq_idx, starts, nsegs = make_segments(np.array([36]), 20, 8)
        np.testing.assert_array_equal(starts, [0, 8, 16])
        np.testing.assert_array_equal(seq_idx, [0, 0, 0])

    def test_random_segments_documented_contract(self):
        """rand mode: floor(len / shift) segments per sequence (B19 fix)."""
        rng = np.random.default_rng(0)
        seq_idx, starts, nsegs = make_segments(np.array([80]), 20, 8, rand_seg=True, rng=rng)
        assert nsegs[0] == 10
        assert (starts >= 0).all() and (starts <= 60).all()

    def test_short_sequences_excluded(self):
        rng = np.random.default_rng(0)
        _, _, nsegs = make_segments(np.array([10]), 20, 8, rand_seg=True, rng=rng)
        assert nsegs[0] == 0


class TestFeatureStore:
    def test_packing_and_min_len(self, tmp_path, rng):
        feat_scp, len_scp = build_split(tmp_path, rng)
        store = FeatureStore(feat_scp, len_scp, min_len=20, verbose=False)
        assert store.num_seqs == 4  # the 19-frame utt is dropped
        assert store.data.shape == (40 + 25 + 20 + 64, 8)
        np.testing.assert_array_equal(store.lens, [40, 25, 20, 64])
        seq1 = store.sequence(1)
        ref = np.load(tmp_path / "utt1.npy")
        np.testing.assert_array_equal(seq1, ref)

    def test_sequence_list_filter(self, tmp_path, rng):
        feat_scp, len_scp = build_split(tmp_path, rng)
        store = FeatureStore(feat_scp, len_scp, sequence_list=["utt4", "utt0"], verbose=False)
        assert store.seq_keys == ["utt4", "utt0"]

    def test_mvn_compute_cache_and_apply(self, tmp_path, rng):
        feat_scp, len_scp = build_split(tmp_path, rng)
        mvn = tmp_path / "mvn.json"
        store = FeatureStore(feat_scp, len_scp, min_len=1, mvn_path=mvn, verbose=False)
        assert mvn.exists()
        d = json.loads(mvn.read_text())
        assert set(d) == {"mean", "std"}
        # normalized data has ~zero mean / unit variance
        assert np.abs(store.data.mean(0)).max() < 1e-4
        assert np.abs(store.data.std(0) - 1).max() < 1e-3
        # undo restores originals
        orig = np.concatenate([np.load(tmp_path / f"utt{i}.npy") for i in range(5)])
        np.testing.assert_allclose(store.undo_mvn(store.data), orig, atol=1e-4)
        # second store reuses the cached file
        store2 = FeatureStore(feat_scp, len_scp, min_len=1, mvn_path=mvn, verbose=False)
        np.testing.assert_allclose(store2.data, store.data, atol=1e-6)

    def test_len_mismatch_raises(self, tmp_path, rng):
        feat_scp, len_scp = build_split(tmp_path, rng, lens=(30,))
        write_scp(len_scp, {"utt0": 31})
        with pytest.raises(ValueError, match="disagrees"):
            FeatureStore(feat_scp, len_scp, verbose=False)

    def test_gather_segments_matches_slices(self, tmp_path, rng):
        feat_scp, len_scp = build_split(tmp_path, rng)
        store = FeatureStore(feat_scp, len_scp, min_len=20, verbose=False)
        seg = store.gather_segments(np.array([1, 3]), np.array([2, 40]), 10)
        np.testing.assert_array_equal(seg[0], store.sequence(1)[2:12])
        np.testing.assert_array_equal(seg[1], store.sequence(3)[40:50])


class TestLoader:
    def test_fixed_shapes_and_padding(self, tmp_path, rng):
        feat_scp, len_scp = build_split(tmp_path, rng)
        store = FeatureStore(feat_scp, len_scp, min_len=20, verbose=False)
        ds = SegmentDataset(store, seg_len=20, seg_shift=8)
        n = len(ds)
        loader = SegmentLoader(ds, batch_size=4, shuffle=True, seed=0, prefetch=0)
        batches = list(loader)
        assert len(batches) == (n + 3) // 4
        total_real = 0
        for b in batches:
            assert b.feats.shape == (4, 20, 8)
            assert b.seq_idx.shape == (4,)
            assert b.weight.shape == (4,)
            total_real += b.num_real
        assert total_real == n

    def test_epoch_shuffling_deterministic(self, tmp_path, rng):
        feat_scp, len_scp = build_split(tmp_path, rng)
        store = FeatureStore(feat_scp, len_scp, min_len=20, verbose=False)
        ds = SegmentDataset(store, seg_len=20, seg_shift=8)
        loader = SegmentLoader(ds, batch_size=4, shuffle=True, seed=0, prefetch=0)
        loader.set_epoch(0)
        a = [b.seq_idx.copy() for b in loader]
        loader.set_epoch(0)
        b_ = [b.seq_idx.copy() for b in loader]
        loader.set_epoch(1)
        c = [b.seq_idx.copy() for b in loader]
        assert all((x == y).all() for x, y in zip(a, b_))
        assert any((x != y).any() for x, y in zip(a, c))

    def test_prefetch_equals_sync(self, tmp_path, rng):
        feat_scp, len_scp = build_split(tmp_path, rng)
        store = FeatureStore(feat_scp, len_scp, min_len=20, verbose=False)
        ds = SegmentDataset(store, seg_len=20, seg_shift=8)
        sync = list(SegmentLoader(ds, 4, shuffle=True, seed=3, prefetch=0))
        pre = list(SegmentLoader(ds, 4, shuffle=True, seed=3, prefetch=2))
        for a, b in zip(sync, pre):
            np.testing.assert_array_equal(a.feats, b.feats)
            np.testing.assert_array_equal(a.seq_idx, b.seq_idx)

    def test_getitem_matches_reference_contract(self, tmp_path, rng):
        """dataset[i] -> (seq_idx, [seg_len, dim] slice, nsegs)."""
        feat_scp, len_scp = build_split(tmp_path, rng)
        store = FeatureStore(feat_scp, len_scp, min_len=20, verbose=False)
        ds = SegmentDataset(store, seg_len=20, seg_shift=8)
        s, feat, nsegs = ds[0]
        assert feat.shape == (20, 8)
        assert nsegs == ds.nsegs[s]


class TestPackCache:
    def test_cache_roundtrip_with_mvn(self, tmp_path, rng):
        feat_scp, len_scp = build_split(tmp_path, rng)
        mvn = tmp_path / "mvn.json"
        cache = tmp_path / "cache" / "train_pack"
        s1 = FeatureStore(feat_scp, len_scp, min_len=1, mvn_path=mvn,
                          pack_cache=cache, verbose=False)
        assert (tmp_path / "cache" / "train_pack.bin").exists()
        # second construction memmaps; data identical, MVN params carried
        s2 = FeatureStore(feat_scp, len_scp, min_len=1, mvn_path=mvn,
                          pack_cache=cache, verbose=False)
        assert isinstance(s2.data, np.memmap)
        np.testing.assert_array_equal(np.asarray(s1.data), np.asarray(s2.data))
        assert s2.mvn_params is not None
        seg = s2.gather_segments(np.array([0]), np.array([3]), 7)
        np.testing.assert_array_equal(seg[0], s2.sequence(0)[3:10])

    def test_cache_rejects_different_keyset(self, tmp_path, rng):
        feat_scp, len_scp = build_split(tmp_path, rng)
        cache = tmp_path / "pack"
        FeatureStore(feat_scp, len_scp, min_len=1, pack_cache=cache, verbose=False)
        with pytest.raises(ValueError, match="different sequence set"):
            FeatureStore(feat_scp, len_scp, min_len=25, pack_cache=cache, verbose=False)
