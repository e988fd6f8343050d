"""Sanitizer tier (SURVEY.md §5): run the native extractor under ASan/UBSan.

Builds the ASan/UBSan variant of the C++ library and exercises fbank
extraction + ark bulk reading in a subprocess with libasan preloaded.
"""

import shutil
import subprocess
import sys
import textwrap

import pytest

pytestmark = pytest.mark.skipif(shutil.which("g++") is None, reason="no C++ toolchain")


def _libasan_path():
    try:
        out = subprocess.run(
            ["g++", "-print-file-name=libasan.so"], capture_output=True, check=True
        ).stdout.decode().strip()
        return out if out and out != "libasan.so" else None
    except Exception:
        return None


@pytest.mark.skipif(_libasan_path() is None, reason="libasan not available")
def test_native_under_asan(tmp_path):
    from pytorch_scalablefhvae_tpu.native.binding import build_native

    asan_lib = build_native(rebuild=True, sanitize=True)

    driver = tmp_path / "driver.py"
    driver.write_text(textwrap.dedent(f"""
        import ctypes
        import numpy as np

        lib = ctypes.CDLL({str(asan_lib)!r})
        lib.fbank_num_frames.restype = ctypes.c_int
        lib.fbank_num_frames.argtypes = [ctypes.c_int, ctypes.c_int,
                                         ctypes.c_double, ctypes.c_double]
        lib.fbank_compute.restype = ctypes.c_int
        lib.fbank_compute.argtypes = [
            ctypes.POINTER(ctypes.c_float), ctypes.c_int, ctypes.c_int,
            ctypes.c_double, ctypes.c_double, ctypes.c_int, ctypes.c_int,
            ctypes.c_double, ctypes.c_double, ctypes.c_int, ctypes.c_double,
            ctypes.c_double, ctypes.c_int, ctypes.c_int, ctypes.c_double,
            ctypes.c_uint64, ctypes.POINTER(ctypes.c_float),
        ]
        y = (0.1 * np.sin(np.arange(8000) / 10)).astype(np.float32)
        n = lib.fbank_num_frames(len(y), 16000, 25.0, 10.0)
        out = np.zeros((n, 80), np.float32)
        rc = lib.fbank_compute(
            y.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), len(y), 16000,
            25.0, 10.0, 80, 0, 1.0, 0.97, 1, 20.0, 0.0, 1, 1, 32768.0, 7,
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)))
        assert rc == n and np.isfinite(out).all()
        print("ASAN-RUN-OK", n)
    """))
    env = {"LD_PRELOAD": _libasan_path(), "ASAN_OPTIONS": "detect_leaks=0",
           "PATH": "/usr/bin:/bin:/usr/local/bin"}
    res = subprocess.run([sys.executable, str(driver)], capture_output=True,
                         env=env, timeout=120)
    assert b"ASAN-RUN-OK" in res.stdout, res.stderr.decode()[:2000]


@pytest.mark.skipif(_libasan_path() is None, reason="libasan not available")
def test_ark_reader_under_asan(tmp_path):
    """Byte-boundary truncation sweep of the ark bulk reader under
    ASan/UBSan: memory-checks the header parser, the sizing/read capacity
    bounds (the file-grew guard), and the keys-buffer writes."""
    import numpy as np

    from pytorch_scalablefhvae_tpu.native.binding import build_native
    from pytorch_scalablefhvae_tpu.utils.kaldi_ark import ArkWriter

    asan_lib = build_native(rebuild=True, sanitize=True)
    rng = np.random.default_rng(0)
    ark = tmp_path / "f.ark"
    with ArkWriter(ark, tmp_path / "f.scp") as w:
        w.write("utt_a", rng.standard_normal((7, 8)).astype(np.float32))
        w.write("utt_b", rng.standard_normal((5, 8)).astype(np.float32))

    driver = tmp_path / "driver.py"
    driver.write_text(textwrap.dedent(f"""
        import ctypes
        import numpy as np

        lib = ctypes.CDLL({str(asan_lib)!r})
        lib.ark_scan.restype = ctypes.c_int
        lib.ark_scan.argtypes = [
            ctypes.c_char_p, ctypes.POINTER(ctypes.c_int64),
            ctypes.POINTER(ctypes.c_int64), ctypes.POINTER(ctypes.c_int32)]
        lib.ark_read_packed.restype = ctypes.c_int64
        lib.ark_read_packed.argtypes = [
            ctypes.c_char_p, ctypes.POINTER(ctypes.c_float),
            ctypes.POINTER(ctypes.c_int64), ctypes.POINTER(ctypes.c_int64),
            ctypes.c_char_p, ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
            ctypes.c_int32]

        full = open({str(ark)!r}, 'rb').read()
        p = {str(tmp_path / 'cut.ark')!r}
        for n in range(0, len(full) + 1):
            open(p, 'wb').write(full[:n])
            nm, tr, co = (ctypes.c_int64(), ctypes.c_int64(),
                          ctypes.c_int32())
            rc = lib.ark_scan(p.encode(), ctypes.byref(nm), ctypes.byref(tr),
                              ctypes.byref(co))
            if rc != 0:
                continue
            rows, c = tr.value, max(co.value, 0)
            data = np.zeros((rows, c), np.float32)
            offs = np.zeros(nm.value + 1, np.int64)
            foffs = np.zeros(max(nm.value, 1), np.int64)
            keys = ctypes.create_string_buffer(64 * max(nm.value, 1))
            got = lib.ark_read_packed(
                p.encode(),
                data.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
                offs.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
                foffs.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
                keys, len(keys), nm.value, rows, ctypes.c_int32(c))
            assert got < 0 or got <= nm.value
        # file-grew guard: size for the truncated file, read the full one
        open(p, 'wb').write(full[: len(full) // 2])
        nm, tr, co = ctypes.c_int64(), ctypes.c_int64(), ctypes.c_int32()
        lib.ark_scan(p.encode(), ctypes.byref(nm), ctypes.byref(tr),
                     ctypes.byref(co))
        open(p, 'wb').write(full)  # the archive "grew" after sizing
        rows, c = tr.value, max(co.value, 0)
        data = np.zeros((max(rows, 1), max(c, 1)), np.float32)
        offs = np.zeros(nm.value + 1, np.int64)
        foffs = np.zeros(max(nm.value, 1), np.int64)
        keys = ctypes.create_string_buffer(64 * max(nm.value, 1))
        got = lib.ark_read_packed(
            p.encode(),
            data.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            offs.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
            foffs.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
            keys, len(keys), nm.value, rows, co)
        # -5 (over capacity) or -2 (width differs from the sizing pass):
        # either way the changed archive is rejected before any heap write
        assert got in (-5, -2), got
        print("ASAN-ARK-OK")
    """))
    env = {"LD_PRELOAD": _libasan_path(), "ASAN_OPTIONS": "detect_leaks=0",
           "PATH": "/usr/bin:/bin:/usr/local/bin"}
    res = subprocess.run([sys.executable, str(driver)], capture_output=True,
                         env=env, timeout=300)
    assert b"ASAN-ARK-OK" in res.stdout, (
        res.stderr.decode()[:2000] + res.stdout.decode()[-500:])
