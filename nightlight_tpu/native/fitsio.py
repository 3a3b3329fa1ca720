"""ctypes loader for the native FITS codec (_fitsio.c).

Compiles the extension on first use with the system C compiler and caches the
shared object next to the source. All entry points return None when the
native path is unavailable, so callers can fall back to numpy.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "_fitsio.c")

_lib = None
_lock = threading.Lock()
_tried = False


def _so_path() -> str:
    # Key the build cache on the source hash, not mtimes: a fresh clone gives
    # every file the same mtime, which would silently prefer a stale or
    # foreign-arch binary.
    import hashlib

    with open(_SRC, "rb") as f:
        digest = hashlib.sha256(f.read()).hexdigest()[:12]
    return os.path.join(_HERE, f"_fitsio-{digest}.so")


def _build() -> str | None:
    _SO = _so_path()
    if os.path.exists(_SO):
        return _SO
    for cc in ("cc", "gcc", "clang"):
        try:
            # temp name + atomic rename: an interrupted compile must not
            # cache a truncated .so (same pattern as native/packio.py)
            tmp = f"{_SO}.tmp{os.getpid()}"
            subprocess.run(
                [cc, "-O3", "-shared", "-fPIC", "-fopenmp", "-o", tmp, _SRC, "-lm"],
                check=True, capture_output=True, timeout=120,
            )
            os.replace(tmp, _SO)
            return _SO
        except (subprocess.CalledProcessError, FileNotFoundError,
                subprocess.TimeoutExpired, OSError):
            try:
                os.unlink(tmp)
            except OSError:
                pass
            continue
    return None


def _load():
    global _lib, _tried
    with _lock:
        if _tried:
            return _lib
        _tried = True
        so = _build()
        if so is None:
            return None
        try:
            lib = ctypes.CDLL(so)
        except OSError:
            return None
        lib.nl_fits_decode.restype = ctypes.c_int
        lib.nl_fits_decode.argtypes = [
            ctypes.c_char_p, ctypes.c_int, ctypes.c_long, ctypes.c_float, ctypes.c_float,
            ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float),
            ctypes.POINTER(ctypes.c_double),
        ]
        lib.nl_fits_encode.restype = None
        lib.nl_fits_encode.argtypes = [
            ctypes.POINTER(ctypes.c_float), ctypes.c_long, ctypes.c_char_p,
        ]
        _lib = lib
        return _lib


def decode(raw: bytes, bitpix: int, pixels: int, bscale: float, bzero: float):
    """Decode a FITS payload. Returns (float32 ndarray, min, mean, max) or None."""
    lib = _load()
    if lib is None:
        return None
    out = np.empty(pixels, dtype=np.float32)
    stats = (ctypes.c_float * 2)()
    total = ctypes.c_double()
    rc = lib.nl_fits_decode(
        raw, bitpix, pixels, bscale, bzero,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), stats, ctypes.byref(total),
    )
    if rc != 0:
        return None
    return out, float(stats[0]), float(total.value) / pixels, float(stats[1])


def encode(data: np.ndarray):
    """Encode float32 to big-endian bytes with NaN->0. Returns bytes or None."""
    lib = _load()
    if lib is None:
        return None
    data = np.ascontiguousarray(data, dtype=np.float32).reshape(-1)
    out = ctypes.create_string_buffer(data.size * 4)
    lib.nl_fits_encode(data.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), data.size, out)
    return out.raw
