"""ctypes bindings for the native host components.

Builds ``libsfhvae_native.so`` from the C++ sources on first use (g++ is
baked into the image; pybind11 is not, hence the C ABI + ctypes). The build
is cached next to the sources; ``rebuild=True`` or deleting the .so forces a
recompile.
"""

from __future__ import annotations

import ctypes
import subprocess
from pathlib import Path

import numpy as np

_DIR = Path(__file__).resolve().parent
_SOURCES = [_DIR / "fbank.cc", _DIR / "ark.cc"]
_LIB_PATH = _DIR / "libsfhvae_native.so"

_WINDOW_CODES = {"hamming": 0, "povey": 1, "hanning": 2, "rectangular": 3, "blackman": 4}

_lib = None


def build_native(rebuild: bool = False) -> Path:
    sources = [s for s in _SOURCES if s.exists()]
    if _LIB_PATH.exists() and not rebuild:
        newest_src = max(s.stat().st_mtime for s in sources)
        if _LIB_PATH.stat().st_mtime >= newest_src:
            return _LIB_PATH
    cmd = [
        "g++", "-O3", "-march=native", "-shared", "-fPIC", "-std=c++17",
        *[str(s) for s in sources], "-o", str(_LIB_PATH),
    ]
    subprocess.run(cmd, check=True, capture_output=True)
    return _LIB_PATH


def load_native(rebuild: bool = False) -> ctypes.CDLL:
    global _lib
    if _lib is None or rebuild:
        lib = ctypes.CDLL(str(build_native(rebuild)))
        lib.fbank_num_frames.restype = ctypes.c_int
        lib.fbank_num_frames.argtypes = [
            ctypes.c_int, ctypes.c_int, ctypes.c_double, ctypes.c_double,
        ]
        lib.fbank_compute.restype = ctypes.c_int
        lib.fbank_compute.argtypes = [
            ctypes.POINTER(ctypes.c_float), ctypes.c_int, ctypes.c_int,
            ctypes.c_double, ctypes.c_double,
            ctypes.c_int, ctypes.c_int, ctypes.c_double,
            ctypes.c_double, ctypes.c_int,
            ctypes.c_double, ctypes.c_double,
            ctypes.c_int, ctypes.c_int,
            ctypes.c_double, ctypes.c_uint64,
            ctypes.POINTER(ctypes.c_float),
        ]
        _lib = lib
    return _lib


def native_fbank(
    y: np.ndarray,
    sr: int = 16000,
    *,
    frame_length_ms: float = 25.0,
    frame_shift_ms: float = 10.0,
    n_mels: int = 80,
    window_type: str = "hamming",
    dither: float = 1.0,
    preemphasis: float = 0.97,
    remove_dc_offset: bool = True,
    low_freq: float = 20.0,
    high_freq: float = 0.0,
    use_power: bool = True,
    use_log_fbank: bool = True,
    round_to_power_of_two: bool = True,  # accepted for parity; always pow2
    input_scale: float = 32768.0,
    seed: int | None = 0,
) -> np.ndarray:
    """Drop-in C++ replacement for ``features.kaldi_fbank.kaldi_fbank``."""
    lib = load_native()
    y = np.ascontiguousarray(y, dtype=np.float32)
    n_frames = lib.fbank_num_frames(len(y), sr, frame_length_ms, frame_shift_ms)
    out = np.zeros((max(n_frames, 0), n_mels), dtype=np.float32)
    if n_frames <= 0:
        return out
    rc = lib.fbank_compute(
        y.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), len(y), sr,
        frame_length_ms, frame_shift_ms,
        n_mels, _WINDOW_CODES[window_type], dither,
        preemphasis, int(remove_dc_offset),
        low_freq, high_freq,
        int(use_power), int(use_log_fbank),
        input_scale, int(seed or 0),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
    )
    if rc < 0:
        raise RuntimeError(f"native fbank_compute failed with code {rc}")
    return out
