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
