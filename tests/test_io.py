"""Manifest, audio, and Kaldi-ark I/O round-trip tests."""

import numpy as np

from pytorch_scalablefhvae_tpu.utils import audio_io, kaldi_ark, manifest


class TestManifest:
    def test_roundtrip_and_filter(self, tmp_path):
        p = tmp_path / "len.scp"
        manifest.write_scp(p, {"a_1": 10, "b_2": 20})
        d = manifest.read_scp(p, dtype=int)
        assert list(d.items()) == [("a_1", 10), ("b_2", 20)]
        d2 = manifest.read_scp(p, dtype=int, keep_keys=["b_2"])
        assert dict(d2) == {"b_2": 20}

    def test_value_with_spaces(self, tmp_path):
        p = tmp_path / "wav.scp"
        manifest.write_scp(p, {"utt": "/some dir/file.wav"})
        assert manifest.read_scp(p)["utt"] == "/some dir/file.wav"


class TestWav:
    def test_wav_roundtrip(self, tmp_path, rng):
        y = (0.3 * rng.standard_normal(16000)).astype(np.float32).clip(-1, 1)
        p = audio_io.write_wav(tmp_path / "a.wav", y, 16000)
        y2, sr = audio_io.read_wav(p)
        assert sr == 16000
        np.testing.assert_allclose(y, y2, atol=1.0 / 32767)

    def test_sphere_read(self, tmp_path, rng):
        pcm = (rng.standard_normal(8000) * 8000).astype("<i2")
        header = (
            b"NIST_1A\n    1024\n"
            b"sample_rate -i 16000\n"
            b"channel_count -i 1\n"
            b"sample_n_bytes -i 2\n"
            b"sample_byte_format -s2 01\n"
            b"sample_coding -s3 pcm\n"
            b"end_head\n"
        )
        p = tmp_path / "t.wav"
        with open(p, "wb") as f:
            f.write(header + b" " * (1024 - len(header)))
            f.write(pcm.tobytes())
        assert audio_io.is_sphere(p)
        y, sr = audio_io.read_sphere(p)
        assert sr == 16000
        np.testing.assert_allclose(y, pcm.astype(np.float32) / 32768.0, atol=1e-7)

    def test_resample_length(self, rng):
        y = rng.standard_normal(16000).astype(np.float32)
        y2 = audio_io.resample(y, 16000, 8000)
        assert abs(len(y2) - 8000) <= 1


class TestArk:
    def test_write_read_roundtrip(self, tmp_path, rng):
        mats = {
            "utt_a": rng.standard_normal((17, 80)).astype(np.float32),
            "utt_b": rng.standard_normal((5, 80)).astype(np.float32),
        }
        ark = tmp_path / "feats.ark"
        scp = tmp_path / "feats.scp"
        kaldi_ark.write_ark(ark, mats, scp)

        seq = kaldi_ark.read_ark(ark)
        assert list(seq.keys()) == ["utt_a", "utt_b"]
        for k in mats:
            np.testing.assert_array_equal(seq[k], mats[k])

        # random access through the scp rxspecifier
        entries = manifest.read_scp(scp)
        for k, rx in entries.items():
            np.testing.assert_array_equal(kaldi_ark.load_mat(rx), mats[k])

    def test_float64_matrix(self, tmp_path, rng):
        m = rng.standard_normal((3, 4))
        kaldi_ark.write_ark(tmp_path / "d.ark", {"x": m})
        out = kaldi_ark.read_ark(tmp_path / "d.ark")["x"]
        assert out.dtype == np.float64
        np.testing.assert_array_equal(out, m)


class TestDispatchWindow:
    """The bounded dispatch window shared by the eval/encode passes
    (utils/dispatch.py): drains oldest-first, caps in-flight items at the
    window size, and close() flushes everything exactly once."""

    def test_drains_oldest_first_and_bounds_inflight(self):
        from pytorch_scalablefhvae_tpu.utils.dispatch import DispatchWindow

        drained = []
        w = DispatchWindow(drained.append, window=4)
        for i in range(10):
            w.push(i)
            assert len(w._pending) <= 4
        assert drained == [0, 1, 2, 3, 4, 5]  # oldest-first, 4 still held
        w.close()
        assert drained == list(range(10))
        w.close()  # idempotent
        assert drained == list(range(10))

    def test_no_drain_under_window(self):
        from pytorch_scalablefhvae_tpu.utils.dispatch import DispatchWindow

        drained = []
        w = DispatchWindow(drained.append, window=8)
        for i in range(8):
            w.push(i)
        assert drained == []
        w.close()
        assert drained == list(range(8))


class TestSphereShortenRejected:
    def test_embedded_shorten_raises(self, tmp_path, rng):
        """LDC's 'pcm,embedded-shorten-v2.00' coding contains 'pcm' but the
        payload is a shorten bitstream — decoding it as raw PCM would
        produce silent garbage; it must raise with a pointer to sph2pipe."""
        header = (
            b"NIST_1A\n    1024\n"
            b"sample_rate -i 16000\n"
            b"channel_count -i 1\n"
            b"sample_n_bytes -i 2\n"
            b"sample_byte_format -s2 01\n"
            b"sample_coding -s26 pcm,embedded-shorten-v2.00\n"
            b"end_head\n"
        )
        p = tmp_path / "t.sph"
        with open(p, "wb") as f:
            f.write(header + b" " * (1024 - len(header)))
            f.write(b"ajkg\x02whatever-shorten-bits")
        import pytest

        with pytest.raises(ValueError, match="sph2pipe"):
            audio_io.read_sphere(p)


class TestCorruptArkRejected:
    def test_python_reader_raises_on_bad_marker(self, tmp_path, rng):
        from pytorch_scalablefhvae_tpu.utils import kaldi_ark

        mat = rng.standard_normal((5, 4)).astype(np.float32)
        ark = tmp_path / "f.ark"
        with kaldi_ark.ArkWriter(ark, tmp_path / "f.scp") as w:
            w.write("a", mat)
        data = bytearray(ark.read_bytes())
        # corrupt the first int32 size marker (\x04 after 'FM ')
        idx = data.index(b"FM \x04") + 3
        data[idx] = 0x05
        ark.write_bytes(bytes(data))
        import pytest

        with pytest.raises(ValueError, match="size markers"):
            dict(kaldi_ark.read_ark(ark))


class TestPythonArkTruncationSweep:
    def test_every_truncation_errors_or_clean_prefix(self, tmp_path, rng):
        """Python-reader mirror of the native sweep: every byte-boundary
        truncation either raises or yields exactly the complete-record
        prefix — never silent wrong data (mid-key EOF included)."""
        from pytorch_scalablefhvae_tpu.utils import kaldi_ark

        a = rng.standard_normal((3, 4)).astype(np.float32)
        b = rng.standard_normal((2, 4)).astype(np.float32)
        ark = tmp_path / "f.ark"
        with kaldi_ark.ArkWriter(ark, tmp_path / "f.scp") as w:
            w.write("a", a)
            w.write("b", b)
        full = ark.read_bytes()
        rec1_end = full.index(b"b \x00B")
        t = tmp_path / "cut.ark"
        for n in range(len(full) + 1):
            t.write_bytes(full[:n])
            try:
                recs = list(kaldi_ark.iter_ark(t))
            except ValueError:
                continue
            if n < rec1_end:
                assert recs == [], n
            elif n < len(full):
                assert [k for k, _ in recs] == ["a"], n
                np.testing.assert_array_equal(recs[0][1], a)
            else:
                assert [k for k, _ in recs] == ["a", "b"], n
