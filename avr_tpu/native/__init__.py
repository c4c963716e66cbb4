"""Native (C++) host-side components, loaded via ctypes.

Builds lazily on first import (g++ -O3 -shared); all callers fall back to
the pure-python loaders when the toolchain or build is unavailable, so the
framework never hard-depends on the native path.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import List, Optional

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_SO = os.path.join(_HERE, "libavrfastload.so")
_SRC = os.path.join(_HERE, "fastload.cpp")
_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_build_failed = False


def _build() -> bool:
    try:
        subprocess.run(
            ["g++", "-O3", "-march=native", "-shared", "-fPIC", "-std=c++17",
             "-o", _SO, _SRC, "-lpthread"],
            check=True, capture_output=True, timeout=120,
        )
        return True
    except Exception:
        return False


def get_lib() -> Optional[ctypes.CDLL]:
    """The loaded native library, building it if needed; None if unavailable."""
    global _lib, _build_failed
    with _lock:
        if _lib is not None:
            return _lib
        if _build_failed:
            return None
        if not os.path.exists(_SO) or os.path.getmtime(_SO) < os.path.getmtime(_SRC):
            if not _build():
                _build_failed = True
                return None
        try:
            lib = ctypes.CDLL(_SO)
        except OSError:
            _build_failed = True
            return None
        for name in ("avr_load_npy_batch", "avr_load_wav_batch"):
            fn = getattr(lib, name)
            fn.restype = ctypes.c_int
        lib.avr_fastload_version.restype = ctypes.c_int
        _lib = lib
        return _lib


def available() -> bool:
    return get_lib() is not None


def _paths_array(paths: List[str]):
    arr = (ctypes.c_char_p * len(paths))()
    arr[:] = [p.encode() for p in paths]
    return arr


def load_npy_batch(
    paths: List[str], seq_len: int, stride: int = 1, start: int = 0
) -> np.ndarray:
    """Parallel-decode .npy IR files → float32 [n, seq_len].

    Row 0 of each array is stride-downsampled and windowed from `start`
    (the MeshRIR loader's convention, reference/datasets_loader.py:79-80).
    """
    lib = get_lib()
    if lib is None:
        raise RuntimeError("native fastload unavailable")
    out = np.empty((len(paths), seq_len), np.float32)
    rc = lib.avr_load_npy_batch(
        _paths_array(paths), len(paths),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        ctypes.c_int64(seq_len), ctypes.c_int64(stride), ctypes.c_int64(start),
    )
    if rc != 0:
        raise IOError(f"failed to decode {paths[-rc - 1]}")
    return out


def load_wav_batch(paths: List[str], seq_len: int, stride: int = 1) -> np.ndarray:
    """Parallel-decode WAV files → float32 [n, seq_len] (mono, strided)."""
    lib = get_lib()
    if lib is None:
        raise RuntimeError("native fastload unavailable")
    out = np.empty((len(paths), seq_len), np.float32)
    rc = lib.avr_load_wav_batch(
        _paths_array(paths), len(paths),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        ctypes.c_int64(seq_len), ctypes.c_int64(stride),
    )
    if rc != 0:
        raise IOError(f"failed to decode {paths[-rc - 1]}")
    return out
