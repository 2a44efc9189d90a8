"""ctypes bindings for the native (C++) batch TIFF decoder.

Builds ``native/libfloodgan_native.so`` on first use (make, ~1s) and falls
back to the pure-python codec (data/tiff.py) when a toolchain or zlib
headers are unavailable, or when a file uses a feature the native path
does not cover (it returns an error code rather than guessing).  The
fallback is ~100x slower, so it warns once rather than hiding the cliff.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import List, Optional

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))), "native")
_LIB_PATH = os.path.join(_NATIVE_DIR, "libfloodgan_native.so")

_lock = threading.Lock()
_lib = None
_tried = False


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    with _lock:
        if _tried:
            return _lib
        _tried = True
        if os.environ.get("FLOODGAN_DISABLE_NATIVE"):
            return None
        try:
            try:
                # make is mtime-incremental: a no-op when the .so is
                # current, a rebuild when tiff_decoder.cpp changed (an
                # existence-only check would keep loading a stale binary).
                subprocess.run(
                    ["make", "-C", _NATIVE_DIR],
                    check=True,
                    capture_output=True,
                    timeout=120,
                )
            except Exception:
                if not os.path.isfile(_LIB_PATH):
                    raise  # no toolchain AND no prebuilt library
                # toolchain unavailable but a prebuilt .so exists: use it
            lib = ctypes.CDLL(_LIB_PATH)
            lib.floodgan_decode_batch.restype = ctypes.c_int
            lib.floodgan_decode_batch.argtypes = [
                ctypes.c_char_p,
                ctypes.c_int64,
                ctypes.POINTER(ctypes.c_float),
                ctypes.c_int64,
                ctypes.c_int64,
                ctypes.c_int64,
                ctypes.c_int64,
            ]
            _lib = lib
        except Exception as e:
            _lib = None
            import warnings

            warnings.warn(
                "native TIFF decoder unavailable (build/load failed: "
                f"{type(e).__name__}: {e}); falling back to the ~100x "
                "slower pure-python codec.  Set FLOODGAN_DISABLE_NATIVE=1 "
                "to silence this if intentional."
            )
        return _lib


def available() -> bool:
    return _load() is not None


def decode_batch(
    paths: List[str], h: int, w: int, c: int, num_threads: int = 0
) -> Optional[np.ndarray]:
    """Decode ``paths`` into one (N, h, w, c) float32 array on a C++ thread
    pool.  Returns None if the native library is unavailable or any file is
    outside its format coverage (caller falls back to python decode)."""
    lib = _load()
    if lib is None:
        return None
    out = np.empty((len(paths), h, w, c), dtype=np.float32)
    joined = b"\0".join(p.encode() for p in paths) + b"\0"
    threads = num_threads or min(len(paths), os.cpu_count() or 1)
    rc = lib.floodgan_decode_batch(
        joined,
        len(paths),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        h,
        w,
        c,
        threads,
    )
    if rc != 0:
        return None
    return out
