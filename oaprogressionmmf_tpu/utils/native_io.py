"""ctypes bindings for the native host-IO helpers (native/fast_inflate.cpp).

`inflate_gz(path)` inflates a gzip file into a fresh numpy uint8 buffer in
one native call with the GIL released — the decode-thread scaling path of
the input pipeline (SURVEY §5.8; replaces the reference's process-pool
decode parallelism). Falls back to None when the shared library is absent
and cannot be built; callers then use the pure-Python codec.

The library is built on first use with the in-repo Makefile (g++ + zlib,
both baked into the image); set OAPROG_NO_NATIVE=1 to disable entirely.
"""

from __future__ import annotations

import ctypes
import logging
import os
import subprocess
import threading
from pathlib import Path

import numpy as np

logger = logging.getLogger("native_io")

_NATIVE_DIR = Path(__file__).resolve().parent.parent / "native"
_LIB_PATH = _NATIVE_DIR / "libfastinflate.so"
_lock = threading.Lock()
_lib = None
_lib_failed = False


def _load():
    global _lib, _lib_failed
    if _lib is not None or _lib_failed:
        return _lib
    with _lock:
        if _lib is not None or _lib_failed:
            return _lib
        if os.environ.get("OAPROG_NO_NATIVE"):
            _lib_failed = True
            return None
        try:
            # no-op when up to date; rebuilds when fast_inflate.cpp is
            # newer than a previously-built .so (stale-symbol safety).
            # A make failure (read-only install dir, missing toolchain)
            # must not disable a previously-built working .so — fall
            # through to the CDLL attempt; a missing/stale symbol there
            # raises and is caught by the same fallback handler.
            try:
                subprocess.run(["make", "-C", str(_NATIVE_DIR)],
                               check=True, capture_output=True, timeout=120)
            except Exception as e:  # noqa: BLE001
                if not _LIB_PATH.exists():
                    raise
                logger.info(f"native rebuild failed ({e}); "
                            f"trying the existing library")
            lib = ctypes.CDLL(str(_LIB_PATH))
            lib.fnifti_inflate.restype = ctypes.c_int64
            lib.fnifti_inflate.argtypes = [
                ctypes.c_char_p, ctypes.c_void_p, ctypes.c_int64]
            lib.fnifti_gz_isize.restype = ctypes.c_int64
            lib.fnifti_gz_isize.argtypes = [ctypes.c_char_p]
            lib.fnifti_deflate.restype = ctypes.c_int64
            lib.fnifti_deflate.argtypes = [
                ctypes.c_void_p, ctypes.c_int64, ctypes.c_char_p,
                ctypes.c_int]
            _lib = lib
        except Exception as e:  # noqa: BLE001 — any failure → python path
            logger.info(f"native inflate unavailable ({e}); "
                        f"using the Python codec")
            _lib_failed = True
    return _lib


def deflate_gz(data, path, level: int = 6) -> bool:
    """Gzip-compress bytes/uint8-array → `path` in one GIL-free native
    call (libdeflate). False → caller falls back to the Python codec.

    The prep apps' write hot loop (R4/R5 write thousands of volumes);
    libdeflate level 6 is ~4x zlib-9 speed at comparable size.
    """
    lib = _load()
    if lib is None:
        return False
    buf = np.frombuffer(data, dtype=np.uint8) if isinstance(
        data, (bytes, bytearray, memoryview)) else np.ascontiguousarray(
        data, dtype=np.uint8)
    n = lib.fnifti_deflate(buf.ctypes.data_as(ctypes.c_void_p),
                           ctypes.c_int64(buf.size), str(path).encode(),
                           ctypes.c_int(level))
    return n > 0


def inflate_gz(path) -> np.ndarray | None:
    """Inflate a .gz file → uint8 array, or None (caller falls back)."""
    lib = _load()
    if lib is None:
        return None
    p = str(path).encode()
    isize = lib.fnifti_gz_isize(p)
    if isize <= 0:
        return None
    for _ in range(3):  # ISIZE is mod 2^32; grow on -3 (rare, >4GB/multi)
        buf = np.empty(isize, dtype=np.uint8)
        n = lib.fnifti_inflate(p, buf.ctypes.data_as(ctypes.c_void_p),
                               ctypes.c_int64(buf.size))
        if n == -3:
            isize *= 4
            continue
        if n < 0:
            return None
        return buf[:n] if n != buf.size else buf
    return None
