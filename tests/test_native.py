"""Native C++ extractor tests: build, agreement with the Python canonical
spec (features/kaldi_fbank.py), determinism, and driver integration."""

import shutil

import numpy as np
import pytest

pytestmark = pytest.mark.skipif(shutil.which("g++") is None, reason="no C++ toolchain")


@pytest.fixture(scope="module")
def native():
    from pytorch_scalablefhvae_tpu.native.binding import native_fbank

    return native_fbank


def make_signal(seconds=0.6, sr=16000, seed=5):
    rng = np.random.default_rng(seed)
    t = np.arange(int(sr * seconds)) / sr
    y = 0.4 * np.sin(2 * np.pi * 300 * t) + 0.1 * rng.standard_normal(t.shape)
    return y.astype(np.float32)


class TestNativeFbank:
    def test_matches_python_mirror_no_dither(self, native):
        from pytorch_scalablefhvae_tpu.features.kaldi_fbank import kaldi_fbank

        y = make_signal()
        ours = native(y, 16000, dither=0.0)
        ref = kaldi_fbank(y, 16000, dither=0.0)
        assert ours.shape == ref.shape
        np.testing.assert_allclose(ours, ref, rtol=2e-4, atol=2e-4)

    def test_dither_deterministic_per_seed(self, native):
        y = make_signal()
        a = native(y, 16000, dither=1.0, seed=42)
        b = native(y, 16000, dither=1.0, seed=42)
        c = native(y, 16000, dither=1.0, seed=43)
        np.testing.assert_array_equal(a, b)
        assert not np.array_equal(a, c)

    def test_dither_statistics_close_to_mirror(self, native):
        """Different RNG streams, same distribution: outputs stay close."""
        from pytorch_scalablefhvae_tpu.features.kaldi_fbank import kaldi_fbank

        y = make_signal(seconds=1.0)
        ours = native(y, 16000, dither=1.0, seed=1)
        ref = kaldi_fbank(y, 16000, dither=1.0, seed=1)
        # dither=1 on int16-scale samples is tiny; mean abs diff stays small
        assert np.abs(ours - ref).mean() < 0.05

    def test_short_signal_zero_frames(self, native):
        assert native(np.zeros(100, np.float32), 16000).shape == (0, 80)

    def test_window_types(self, native):
        from pytorch_scalablefhvae_tpu.features.kaldi_fbank import kaldi_fbank

        y = make_signal(seconds=0.3)
        for w in ("povey", "hanning", "rectangular", "blackman"):
            ours = native(y, 16000, dither=0.0, window_type=w)
            ref = kaldi_fbank(y, 16000, dither=0.0, window_type=w)
            np.testing.assert_allclose(ours, ref, rtol=2e-4, atol=2e-4)

    def test_extract_driver_uses_native(self, tmp_path, native):
        """prepare_kaldi picks up the native extractor transparently."""
        from pytorch_scalablefhvae_tpu.features.extract import prepare_kaldi
        from pytorch_scalablefhvae_tpu.utils.audio_io import write_wav
        from pytorch_scalablefhvae_tpu.utils.kaldi_ark import read_ark
        from pytorch_scalablefhvae_tpu.utils.manifest import write_scp

        y = make_signal()
        wav = write_wav(tmp_path / "wav" / "a.wav", y, 16000)
        (tmp_path / "train").mkdir()
        write_scp(tmp_path / "train" / "wav.scp", {"a": str(wav)})
        conf = tmp_path / "fbank.conf"
        conf.write_text("--window-type=hamming\n--use-energy=false\n"
                        "--sample-frequency=16000\n--dither=1\n"
                        "--num-mel-bins=80\n--htk-compat=true\n")
        count, (_, ark, scp, lens) = prepare_kaldi(tmp_path, "train", conf, verbose=False)
        assert count == 1
        mats = read_ark(ark)
        assert mats["a"].shape[1] == 80


class TestCorruptArk:
    def test_truncated_and_foreign_records_error_not_silent(self, tmp_path, rng, native):
        """A corrupt mid-archive record header must surface as an error,
        not a silent truncation to the valid prefix (the scan and packed
        read agreeing on the shorter count would pass every got==n
        check)."""
        from pytorch_scalablefhvae_tpu.native.binding import (
            native_read_ark_packed,
        )
        from pytorch_scalablefhvae_tpu.utils.kaldi_ark import ArkWriter

        ark = tmp_path / "f.ark"
        with ArkWriter(ark, tmp_path / "f.scp") as w:
            w.write("a", rng.standard_normal((6, 4)).astype(np.float32))
            w.write("b", rng.standard_normal((3, 4)).astype(np.float32))
        good = ark.read_bytes()
        keys, data, offs = native_read_ark_packed(ark)
        assert keys == ["a", "b"] and data.shape == (9, 4)

        # corrupt record b's binary marker -> error, not "1 record"
        idx = good.index(b"b \x00B")
        bad = bytearray(good)
        bad[idx + 2] = 0x7F
        ark.write_bytes(bytes(bad))
        with pytest.raises(RuntimeError):
            native_read_ark_packed(ark)

        # a foreign (compressed 'CM') token mid-archive is also an error
        bad = bytearray(good)
        fm = good.index(b"FM ", good.index(b"b \x00B"))
        bad[fm] = ord("C")
        ark.write_bytes(bytes(bad))
        with pytest.raises(RuntimeError):
            native_read_ark_packed(ark)

        # EOF exactly at a key boundary is still a clean end
        ark.write_bytes(good)
        keys, data, _ = native_read_ark_packed(ark)
        assert keys == ["a", "b"]


class TestArkTruncationSweep:
    def test_every_truncation_errors_or_clean_prefix(self, tmp_path, rng, native):
        """Truncate a 2-record archive at EVERY byte boundary: the bulk
        reader must either raise or return exactly the complete-record
        prefix with bit-correct data — never silently wrong features."""
        from pytorch_scalablefhvae_tpu.native.binding import (
            native_read_ark_packed,
        )
        from pytorch_scalablefhvae_tpu.utils.kaldi_ark import ArkWriter

        a = rng.standard_normal((3, 4)).astype(np.float32)
        b = rng.standard_normal((2, 4)).astype(np.float32)
        ark = tmp_path / "f.ark"
        with ArkWriter(ark, tmp_path / "f.scp") as w:
            w.write("a", a)
            w.write("b", b)
        full = ark.read_bytes()
        # end offsets of each complete record
        rec1_end = full.index(b"b \x00B")
        cut_points = range(0, len(full) + 1)  # inclusive: the intact file
        t = tmp_path / "cut.ark"
        clean_prefix_hits = 0
        for n in cut_points:
            t.write_bytes(full[:n])
            try:
                keys, data, offs = native_read_ark_packed(t)
            except RuntimeError:
                continue  # an error is always acceptable
            if n < rec1_end:
                assert keys == [] and data.shape[0] == 0, n
            elif n < len(full):
                assert keys == ["a"], n
                np.testing.assert_array_equal(data, a, err_msg=str(n))
                clean_prefix_hits += 1
            else:
                assert keys == ["a", "b"], n
                np.testing.assert_array_equal(data[:3], a)
                np.testing.assert_array_equal(data[3:], b)
        # the intact file must parse (the final else actually ran), and at
        # least the exact record boundary must yield the clean prefix
        assert keys == ["a", "b"]
        assert clean_prefix_hits >= 1
