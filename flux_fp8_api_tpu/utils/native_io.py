"""ctypes bridge to the C++ checkpoint data plane (native/stload.cpp).

Builds the shared object on first use with the system g++ (no pip deps); every entry
point degrades to the pure-Python mmap path in :mod:`.safetensors_io` when the
toolchain or .so is unavailable.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from pathlib import Path
from typing import Optional

import numpy as np

_REPO_ROOT = Path(__file__).resolve().parent.parent.parent
_SRC = _REPO_ROOT / "native" / "stload.cpp"
_SO = _REPO_ROOT / "native" / "libstload.so"
_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_tried = False


def _build() -> bool:
    try:
        subprocess.run(
            ["g++", "-O3", "-shared", "-fPIC", "-pthread", "-o", str(_SO), str(_SRC)],
            check=True,
            capture_output=True,
            timeout=120,
        )
        return True
    except Exception:
        return False


def get_lib() -> Optional[ctypes.CDLL]:
    """Load (building if needed) the native library; None if unavailable."""
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        # rebuild when the source is newer than the .so — a stale library would
        # otherwise silently serve old code (or, on ABI mismatch below, silently
        # disable the native path forever)
        stale = (
            _SO.exists()
            and _SRC.exists()
            and _SRC.stat().st_mtime > _SO.stat().st_mtime
        )
        if (not _SO.exists() or stale) and _SRC.exists():
            if not _build() and not _SO.exists():
                return None
        if not _SO.exists():
            return None
        try:
            lib = ctypes.CDLL(str(_SO))
            lib.stload_read.argtypes = [
                ctypes.c_char_p,
                ctypes.c_uint64,
                ctypes.c_uint64,
                ctypes.c_void_p,
                ctypes.c_int,
            ]
            lib.stload_read.restype = ctypes.c_int
            lib.stload_prefetch.argtypes = [ctypes.c_char_p]
            lib.stload_prefetch.restype = ctypes.c_int
            lib.stload_abi_version.restype = ctypes.c_int
            if lib.stload_abi_version() != 1:
                return None
            _lib = lib
            return _lib
        except OSError:
            return None


def parallel_read(path: str, offset: int, size: int, n_threads: int = 16) -> Optional[np.ndarray]:
    """Read a byte range into a fresh buffer with GIL-free parallel pread.

    Returns None when the native library is unavailable (callers fall back to mmap).
    """
    lib = get_lib()
    if lib is None:
        return None
    buf = np.empty(size, dtype=np.uint8)
    rc = lib.stload_read(
        str(path).encode(), offset, size, buf.ctypes.data_as(ctypes.c_void_p), n_threads
    )
    if rc != 0:
        raise OSError(-rc, os.strerror(-rc), path)
    return buf


def prefetch(path: str) -> bool:
    lib = get_lib()
    if lib is None:
        return False
    return lib.stload_prefetch(str(path).encode()) == 0
