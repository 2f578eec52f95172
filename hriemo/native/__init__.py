"""ctypes bindings for the C++ host runtime (native/feature_loader.cpp).

The shared library is built on first import with g++ (cached under
``native/build/``); everything degrades gracefully to the pure-Python path
when the toolchain or build is unavailable (``is_available()`` reports it).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from pathlib import Path

import numpy as np

_REPO = Path(__file__).resolve().parents[2]
_SRC = _REPO / "native" / "feature_loader.cpp"
_SO = _REPO / "native" / "build" / "libhriemo_loader.so"

_lib = None
_tried = False


def _build() -> bool:
    _SO.parent.mkdir(parents=True, exist_ok=True)
    cmd = ["g++", "-O3", "-std=c++17", "-shared", "-fPIC", "-pthread",
           str(_SRC), "-o", str(_SO)]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        return True
    except Exception as e:  # toolchain missing / compile error
        print(f"[native] build failed ({e}); using the Python loader")
        return False


def _load():
    global _lib, _tried
    if _tried:
        return _lib
    _tried = True
    if not _SO.exists() or _SO.stat().st_mtime < _SRC.stat().st_mtime:
        if not _build():
            return None
    try:
        lib = ctypes.CDLL(str(_SO))
        lib.hriemo_assemble.restype = ctypes.c_int
        lib.hriemo_assemble.argtypes = [
            ctypes.POINTER(ctypes.c_char_p), ctypes.c_int,
            ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_uint8),
            ctypes.c_longlong, ctypes.c_longlong, ctypes.c_longlong,
            ctypes.c_int,
        ]
        _lib = lib
    except OSError as e:
        print(f"[native] load failed ({e}); using the Python loader")
        _lib = None
    return _lib


def is_available() -> bool:
    return _load() is not None


def assemble_modality(paths: list[str], bucket_len: int, dim: int,
                      max_len: int = 0, n_threads: int = 0) -> tuple[np.ndarray, np.ndarray]:
    """Threaded batch assembly for one modality.

    Returns ``(hidden [n, bucket_len, dim] f32, pad_mask [n, bucket_len] bool)``
    with the same semantics as the Python loader (NaN-clean, center-crop with
    mask-reset quirk when ``max_len > 0``, True = PAD).
    """
    lib = _load()
    if lib is None:
        raise RuntimeError("native loader unavailable")
    n = len(paths)
    hidden = np.empty((n, bucket_len, dim), np.float32)
    pad = np.empty((n, bucket_len), np.uint8)
    c_paths = (ctypes.c_char_p * n)(*[p.encode() for p in paths])
    if n_threads <= 0:
        n_threads = min(8, os.cpu_count() or 1)
    failures = lib.hriemo_assemble(
        c_paths, n,
        hidden.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        pad.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        bucket_len, dim, max_len, n_threads,
    )
    if failures:
        raise IOError(f"native loader: {failures}/{n} feature files failed to load")
    return hidden, pad.astype(bool)
