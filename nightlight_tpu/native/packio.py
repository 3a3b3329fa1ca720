"""ctypes loader for the native pack codec (_packio.c).

Same pattern as native/fitsio.py: compile on first use with the system C
compiler, cache the shared object next to the source keyed on the source
hash, return None from every entry point when unavailable so io/pack.py
falls back to its numpy path. NIGHTLIGHT_NO_NATIVE_PACK=1 disables the
native path outright (A/B and debugging).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "_packio.c")

_lib = None
_lock = threading.Lock()
_tried = False


def _so_path() -> str:
    # Keyed on source hash AND the host CPU: the binary is built with
    # -march=native, and while it is never committed (.gitignore), a
    # working tree copied between machines (rsync, docker build, NFS)
    # would otherwise load a foreign-arch .so and SIGILL uncatchably —
    # the same hazard class as the XLA:CPU AOT cache (CLAUDE.md).
    import hashlib
    import platform

    h = hashlib.sha256()
    with open(_SRC, "rb") as f:
        h.update(f.read())
    h.update(platform.machine().encode())
    try:
        with open("/proc/cpuinfo") as f:
            for line in f:
                if line.startswith(("flags", "Features")):
                    h.update(line.encode())
                    break
    except OSError:
        pass
    return os.path.join(_HERE, f"_packio-{h.hexdigest()[:12]}.so")


def _build() -> str | None:
    _SO = _so_path()
    if os.path.exists(_SO):
        return _SO
    for flags in (["-O3", "-march=native"], ["-O3"]):
        for cc in ("cc", "gcc", "clang"):
            try:
                # compile to a temp name + atomic rename: an interrupted
                # compile must not leave a truncated .so that caches a
                # permanently-broken native path (and two processes
                # building concurrently must not corrupt each other)
                tmp = f"{_SO}.tmp{os.getpid()}"
                subprocess.run(
                    [cc, *flags, "-shared", "-fPIC", "-fopenmp",
                     "-o", tmp, _SRC],
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
    if os.environ.get("NIGHTLIGHT_NO_NATIVE_PACK"):
        return None
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
        u16p = ctypes.POINTER(ctypes.c_uint16)
        lib.nl_pack_scan.restype = None
        lib.nl_pack_scan.argtypes = [
            u16p, ctypes.c_long, ctypes.c_long, ctypes.c_long,
            ctypes.POINTER(ctypes.c_long), ctypes.POINTER(ctypes.c_long),
        ]
        lib.nl_pack_emit.restype = ctypes.c_long
        lib.nl_pack_emit.argtypes = [
            u16p, ctypes.c_long, ctypes.c_long, ctypes.c_long,
            ctypes.c_int, ctypes.c_int,
            ctypes.POINTER(ctypes.c_uint8),
            ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int32),
            ctypes.c_long,
        ]
        _lib = lib
        return _lib


def scan(u: np.ndarray, valid: int, width: int):
    """Exception counts for widths (8, 12, 14): ({k: count} identity,
    {k: count} delta) over the first `valid` rows, or None off-native."""
    lib = _load()
    if lib is None:
        return None
    u = np.ascontiguousarray(u, np.uint16)
    cid = (ctypes.c_long * 3)()
    cdl = (ctypes.c_long * 3)()
    lib.nl_pack_scan(u.ctypes.data_as(ctypes.POINTER(ctypes.c_uint16)),
                     valid, u.shape[1], width, cid, cdl)
    ks = (8, 12, 14)
    return ({k: int(c) for k, c in zip(ks, cid)},
            {k: int(c) for k, c in zip(ks, cdl)})


def emit(u: np.ndarray, width: int, kind: str, k: int, exc_cap: int):
    """(packed byte buffer incl. pad byte, idx int32, val int32) for the
    chosen transform/width, or None when unavailable / cap exceeded."""
    lib = _load()
    if lib is None:
        return None
    from nightlight_tpu.io.pack import plane_bytes  # single layout source

    u = np.ascontiguousarray(u, np.uint16)
    g, p = u.shape
    n_low, n_hi = plane_bytes(g, p, k)
    total = n_low + n_hi
    buf = np.zeros(total + (total & 1), np.uint8)
    cap = max(int(exc_cap), 1)
    idx = np.empty(cap, np.int32)
    val = np.empty(cap, np.int32)
    n = lib.nl_pack_emit(
        u.ctypes.data_as(ctypes.POINTER(ctypes.c_uint16)),
        g, p, width, 1 if kind == "delta" else 0, k,
        buf.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        idx.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        val.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)), cap)
    if n < 0:
        return None
    return buf, idx[:n], val[:n]
