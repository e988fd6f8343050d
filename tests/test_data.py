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

    def test_duplicate_sequence_list_raises(self, tmp_path, rng):
        """A duplicated key would leave the earlier duplicate's pack rows
        as uninitialized np.empty memory (seq2idx keeps only the last
        index and _stream_feats yields each key once) — a hard error, not
        silent garbage features."""
        feat_scp, len_scp = build_split(tmp_path, rng)
        with pytest.raises(ValueError, match="duplicate"):
            FeatureStore(feat_scp, len_scp,
                         sequence_list=["utt0", "utt2", "utt0"],
                         verbose=False)

    def test_missing_ark_names_archive(self, tmp_path):
        """A deleted/moved archive behind an rxspecifier must fail naming
        the ARCHIVE, not demote to a plain open of the colon-suffixed
        pseudo-path."""
        from pytorch_scalablefhvae_tpu.data.feature_store import _load_feat

        with pytest.raises(FileNotFoundError) as exc:
            _load_feat(str(tmp_path / "gone.ark") + ":12345")
        assert "gone.ark:12345" not in str(exc.value)
        assert "gone.ark" in str(exc.value)

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

    def test_cache_rejects_changed_mvn_stats(self, tmp_path, rng):
        """The cached pack is normalized with the stats recorded in its
        meta; a DIFFERENT stats file at mvn_path must raise, not be
        silently ignored — and a MISSING stats file is re-written from
        meta (schema parity for downstream consumers)."""
        feat_scp, len_scp = build_split(tmp_path, rng)
        mvn = tmp_path / "mvn.json"
        cache = tmp_path / "cache" / "pack"
        FeatureStore(feat_scp, len_scp, min_len=1, mvn_path=mvn,
                     pack_cache=cache, verbose=False)
        orig = mvn.read_text()
        d = json.loads(orig)
        d["mean"] = [[m + 1.0 for m in d["mean"][0]]]
        mvn.write_text(json.dumps(d))
        with pytest.raises(ValueError, match="different MVN stats"):
            FeatureStore(feat_scp, len_scp, min_len=1, mvn_path=mvn,
                         pack_cache=cache, verbose=False)
        mvn.unlink()
        s = FeatureStore(feat_scp, len_scp, min_len=1, mvn_path=mvn,
                         pack_cache=cache, verbose=False)
        assert s.mvn_params is not None
        assert json.loads(mvn.read_text()) == json.loads(orig)

    def test_cache_rejects_different_keyset(self, tmp_path, rng):
        feat_scp, len_scp = build_split(tmp_path, rng)
        cache = tmp_path / "pack"
        FeatureStore(feat_scp, len_scp, min_len=1, pack_cache=cache, verbose=False)
        with pytest.raises(ValueError, match="different sequence set"):
            FeatureStore(feat_scp, len_scp, min_len=25, pack_cache=cache, verbose=False)


class TestStreamingPack:
    def test_streamed_store_matches_naive_concat(self, tmp_path, rng):
        """The streaming build (write-at-offset, per-utterance) must be
        byte-identical to a naive load-everything + concatenate pack."""
        feat_scp, len_scp = build_split(tmp_path, rng, lens=(40, 25, 20, 64), dim=8)
        store = FeatureStore(feat_scp, len_scp, min_len=1, verbose=False)
        naive = np.concatenate(
            [np.load(tmp_path / f"utt{i}.npy") for i in range(4)], axis=0
        )
        np.testing.assert_array_equal(np.asarray(store.data), naive)

    def test_streamed_mvn_stats_match_full_pass(self, tmp_path, rng):
        """MVN statistics accumulated during the streaming pass == statistics
        of a full pass over the packed array (reference datasets.py:119-129
        semantics, JSON schema {"mean": [[...]], "std": [[...]]})."""
        feat_scp, len_scp = build_split(tmp_path, rng, lens=(40, 25, 64), dim=8)
        mvn = tmp_path / "mvn.json"
        store = FeatureStore(feat_scp, len_scp, min_len=1, mvn_path=mvn, verbose=False)
        naive = np.concatenate(
            [np.load(tmp_path / f"utt{i}.npy") for i in range(3)], axis=0
        ).astype(np.float64)
        mean, std = naive.mean(axis=0), naive.std(axis=0)
        got = json.loads(mvn.read_text())
        np.testing.assert_allclose(np.asarray(got["mean"]).ravel(), mean, rtol=1e-6)
        np.testing.assert_allclose(np.asarray(got["std"]).ravel(), std, rtol=1e-5)
        np.testing.assert_allclose(
            np.asarray(store.data), (naive - mean) / std, rtol=1e-5, atol=1e-5
        )

    def test_streamed_cache_matches_in_ram(self, tmp_path, rng):
        feat_scp, len_scp = build_split(tmp_path, rng, lens=(40, 25, 64), dim=8)
        mvn = tmp_path / "mvn.json"
        ram = FeatureStore(feat_scp, len_scp, min_len=1, mvn_path=mvn, verbose=False)
        cached = FeatureStore(feat_scp, len_scp, min_len=1, mvn_path=mvn,
                              pack_cache=tmp_path / "cache" / "train", verbose=False)
        np.testing.assert_array_equal(np.asarray(ram.data), np.asarray(cached.data))
        # and the reopened memmap path
        reopened = FeatureStore(feat_scp, len_scp, min_len=1, mvn_path=mvn,
                                pack_cache=tmp_path / "cache" / "train", verbose=False)
        np.testing.assert_array_equal(np.asarray(ram.data), np.asarray(reopened.data))

    def test_ark_backed_store_streams(self, tmp_path, rng):
        """Ark manifests stream sequentially through iter_ark."""
        from pytorch_scalablefhvae_tpu.utils.kaldi_ark import ArkWriter

        mats = {f"u{i}": rng.standard_normal((l, 6)).astype(np.float32)
                for i, l in enumerate((30, 22, 45))}
        ark, scp = tmp_path / "feats.ark", tmp_path / "feats.scp"
        with ArkWriter(ark, scp) as w:
            for k, m in mats.items():
                w.write(k, m)
        write_scp(tmp_path / "len.scp", {k: len(m) for k, m in mats.items()})
        store = FeatureStore(scp, tmp_path / "len.scp", min_len=1, verbose=False)
        for i, (k, m) in enumerate(mats.items()):
            np.testing.assert_allclose(store.sequence(store.seq2idx[k]), m)

    @pytest.mark.slow
    def test_pack_peak_memory_bounded(self, tmp_path):
        """Packing a split much larger than any single utterance must not
        hold the whole split twice: peak RSS of a child process packing
        ~400 MB stays far under the ~1 GB the old list+concatenate build
        needed (VERDICT r1 item 4 done-criterion)."""
        import subprocess
        import sys
        import textwrap

        rng = np.random.default_rng(0)
        feats, lend = {}, {}
        dim, n_utts, l = 80, 64, 20000  # 64 * 20000 * 80 * 4 B = 409.6 MB
        for i in range(n_utts):
            k = f"utt{i:03d}"
            arr = rng.standard_normal((l, dim)).astype(np.float32)
            np.save(tmp_path / f"{k}.npy", arr)
            feats[k] = str(tmp_path / f"{k}.npy")
            lend[k] = l
        write_scp(tmp_path / "feats.scp", feats)
        write_scp(tmp_path / "len.scp", lend)
        code = textwrap.dedent(f"""
            import tracemalloc
            import numpy as np
            from pytorch_scalablefhvae_tpu.data import FeatureStore
            tracemalloc.start()
            store = FeatureStore({str(tmp_path / 'feats.scp')!r},
                                 {str(tmp_path / 'len.scp')!r}, min_len=1,
                                 pack_cache={str(tmp_path / 'cache' / 'train')!r},
                                 verbose=False)
            _, peak = tracemalloc.get_traced_memory()
            tracemalloc.stop()
            assert store.data.shape == ({n_utts * l}, {dim})
            peak_mb = peak / 2**20
            print(f"HEAP_PEAK_MB={{peak_mb:.0f}}")
            # The streaming build holds at most ONE utterance (~6.4 MB here)
            # plus metadata in the heap while writing into the memmapped
            # pack; the old list + np.concatenate build materialized the
            # whole ~410 MB split (twice) in heap arrays. Heap peak (not
            # RSS) is asserted because RSS also counts clean memmapped
            # SOURCE pages, which stay resident whenever the page cache is
            # warm — an environment artifact, not an allocation.
            assert peak_mb < 64, (
                f"heap peak {{peak_mb:.0f}} MB: the pack build materialized "
                f"the split in memory")
        """)
        proc = subprocess.run([sys.executable, "-c", code], capture_output=True,
                              text=True, timeout=600)
        assert proc.returncode == 0, proc.stderr[-2000:]


class TestTransferDtype:
    def test_bfloat16_batches(self, tmp_path, rng):
        import ml_dtypes

        feat_scp, len_scp = build_split(tmp_path, rng)
        store = FeatureStore(feat_scp, len_scp, min_len=20, verbose=False)
        ds = SegmentDataset(store, seg_len=20, seg_shift=8)
        loader = SegmentLoader(ds, 8, shuffle=False, transfer_dtype="bfloat16")
        b = next(iter(loader))
        assert b.feats.dtype == np.dtype(ml_dtypes.bfloat16)
        # values quantized from the f32 gather, not garbage
        ref = next(iter(SegmentLoader(ds, 8, shuffle=False)))
        np.testing.assert_allclose(b.feats.astype(np.float32), ref.feats,
                                   rtol=1e-2, atol=1e-2)

    def test_train_step_accepts_bfloat16_feats(self, tmp_path, rng):
        from pytorch_scalablefhvae_tpu.models import SimpleFHVAE
        from pytorch_scalablefhvae_tpu.train.step import (
            create_train_state,
            make_optimizer,
            make_train_step,
        )

        feat_scp, len_scp = build_split(tmp_path, rng)
        store = FeatureStore(feat_scp, len_scp, min_len=20, verbose=False)
        ds = SegmentDataset(store, seg_len=20, seg_shift=8)
        loader = SegmentLoader(ds, 8, shuffle=False, transfer_dtype="bfloat16")
        model = SimpleFHVAE(input_size=20 * 8, num_seqs=store.num_seqs,
                            z1_hus=(16, 16), z2_hus=(16, 16), x_hus=(16, 16),
                            z1_dim=4, z2_dim=4)
        opt = make_optimizer(1e-3, 0.95, 0.999)
        state = create_train_state(model, opt, seed=0)
        step = make_train_step(model, opt, alpha=10.0, donate=False)
        b = next(iter(loader))
        _, m = step(state, b.feats, b.seq_idx, b.nsegs, b.weight)
        assert np.isfinite(float(m["loss"]))


class TestLoaderErrorPropagation:
    def test_producer_exception_reaches_consumer(self, tmp_path, rng):
        """A failure in the prefetch thread must raise in the consumer, not
        silently truncate the epoch."""
        feat_scp, len_scp = build_split(tmp_path, rng)
        store = FeatureStore(feat_scp, len_scp, min_len=20, verbose=False)
        ds = SegmentDataset(store, seg_len=20, seg_shift=8)
        loader = SegmentLoader(ds, batch_size=4, shuffle=False, prefetch=2)

        boom = RuntimeError("gather exploded")
        calls = {"n": 0}
        orig = loader._assemble

        def failing(idx):
            calls["n"] += 1
            if calls["n"] == 2:
                raise boom
            return orig(idx)

        loader._assemble = failing
        with pytest.raises(RuntimeError, match="gather exploded"):
            for _ in loader:
                pass


class TestChunkSkip:
    """Host mirror of the device MAP pass's chunk-skip subsampling
    (segments.chunk_skip_indices + SegmentLoader(indices=...))."""

    def test_indices_pattern_and_coverage(self):
        from pytorch_scalablefhvae_tpu.data.segments import chunk_skip_indices

        # ragged counts incl. one sequence shorter than a chunk
        nsegs = np.array([11, 3, 17, 4, 9])
        seq_idx = np.repeat(np.arange(5, dtype=np.int32), nsegs)
        idx = chunk_skip_indices(seq_idx, spb=4, skip=2)
        starts = np.r_[0, np.cumsum(nsegs)[:-1]]
        j = np.arange(len(seq_idx)) - starts[seq_idx]
        # exactly the windows of chunks 0, 2, 4, ... of each sequence
        want = np.flatnonzero((j // 4) % 2 == 0)
        np.testing.assert_array_equal(idx, want)
        # every sequence keeps at least min(spb, nsegs) windows (chunk 0)
        kept_per_seq = np.bincount(seq_idx[idx], minlength=5)
        assert (kept_per_seq >= np.minimum(nsegs, 4)).all()
        # skip=1 is the identity
        np.testing.assert_array_equal(
            chunk_skip_indices(seq_idx, spb=4, skip=1),
            np.arange(len(seq_idx)))

    def test_loader_indices_subset(self, tmp_path, rng):
        feat_scp, len_scp = build_split(tmp_path, rng)
        store = FeatureStore(feat_scp, len_scp, min_len=20, verbose=False)
        ds = SegmentDataset(store, seg_len=20, seg_shift=8)
        sub = np.array([0, 2, 5, 6])
        loader = SegmentLoader(ds, batch_size=3, shuffle=False, seed=0,
                               indices=sub)
        assert len(loader) == 2
        got_seq, got_feats, real = [], [], 0
        for b in loader:
            keep = b.weight > 0
            got_seq.extend(b.seq_idx[keep].tolist())
            got_feats.append(np.asarray(b.feats)[keep])
            real += b.n_real
        assert real == len(sub)
        np.testing.assert_array_equal(got_seq, ds.seq_idx[sub])
        want = ds.store.gather_segments(ds.seq_idx[sub], ds.starts[sub], 20)
        np.testing.assert_allclose(np.concatenate(got_feats), want)


class TestArkKeyBinding:
    def test_stale_same_key_in_other_archive_not_matched(self, tmp_path, rng):
        """The pack build must load each key from the archive its scp entry
        binds it to: a stale record with the same key in another referenced
        archive (mixed-generation scp) silently training on wrong features
        is the failure mode."""
        from pytorch_scalablefhvae_tpu.utils.kaldi_ark import ArkWriter

        fresh = rng.standard_normal((30, 8)).astype(np.float32)
        stale = np.zeros((30, 8), np.float32)  # same length: the length
        other = rng.standard_normal((25, 8)).astype(np.float32)  # check
        # arkA sorts first and contains a STALE 'utt1' plus a live 'utt0'
        offs = {}
        with ArkWriter(tmp_path / "arkA.ark", tmp_path / "a.scp") as w:
            w.write("utt0", other)
            w.write("utt1", stale)
        with ArkWriter(tmp_path / "arkB.ark", tmp_path / "b.scp") as w:
            w.write("utt1", fresh)
        scp = {}
        for line in (tmp_path / "a.scp").read_text().splitlines():
            k, v = line.split(None, 1)
            if k == "utt0":
                scp[k] = v
        for line in (tmp_path / "b.scp").read_text().splitlines():
            k, v = line.split(None, 1)
            scp[k] = v  # utt1 -> arkB (the fresh record)
        write_scp(tmp_path / "feats.scp", scp)
        write_scp(tmp_path / "len.scp", {"utt0": 25, "utt1": 30})
        store = FeatureStore(tmp_path / "feats.scp", tmp_path / "len.scp",
                             min_len=1, verbose=False)
        got = store.sequence(store.seq2idx["utt1"])
        np.testing.assert_array_equal(got, fresh)

    def test_missing_len_entry_curated_error(self, tmp_path, rng):
        feat_scp, len_scp = build_split(tmp_path, rng)
        # drop one len entry
        lines = len_scp.read_text().splitlines()
        len_scp.write_text("\n".join(lines[:-1]) + "\n")
        with pytest.raises(ValueError, match="missing from"):
            FeatureStore(feat_scp, len_scp, min_len=1, verbose=False)


class TestSameArkStaleDuplicate:
    def test_scp_offset_wins_within_one_archive(self, tmp_path, rng):
        """A partial re-extraction can APPEND a fresh record for a key the
        same archive already holds; the scp binds the key to the fresh
        record's offset, and the pack build must honor that binding — not
        the first same-key record the sequential pass encounters."""
        from pytorch_scalablefhvae_tpu.utils.kaldi_ark import ArkWriter

        stale = np.zeros((30, 8), np.float32)
        fresh = rng.standard_normal((30, 8)).astype(np.float32)  # same len
        ark = tmp_path / "arkA.ark"
        with ArkWriter(ark, tmp_path / "a.scp") as w:
            w.write("utt1", stale)
        # append the fresh record (ArkWriter truncates, so append manually
        # through a second writer on a temp file)
        with ArkWriter(tmp_path / "app.ark", tmp_path / "app.scp") as w:
            w.write("utt1", fresh)
        base = ark.read_bytes()
        ark.write_bytes(base + (tmp_path / "app.ark").read_bytes())
        # the fresh record's offset within arkA = len(base) + its offset
        # within the appended archive
        app_off = int((tmp_path / "app.scp").read_text().split(":")[-1])
        off = len(base) + app_off
        write_scp(tmp_path / "feats.scp", {"utt1": f"{ark}:{off}"})
        write_scp(tmp_path / "len.scp", {"utt1": 30})
        store = FeatureStore(tmp_path / "feats.scp", tmp_path / "len.scp",
                             min_len=1, verbose=False)
        np.testing.assert_array_equal(store.sequence(0), fresh)
