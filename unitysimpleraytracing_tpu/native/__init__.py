"""Native runtime components (C++ via ctypes).

The compute path is JAX/XLA/Pallas; the host runtime around it keeps its hot
IO in C++ — the OBJ data loader (``ingest.cpp``) and the PNG scanline
unfilter (``image.cpp``) — built on demand with the system ``g++`` and
loaded through ``ctypes`` (no pybind11 in the image).  Every native entry
point has a pure-Python fallback, so the package works (slower) without a
toolchain.
"""
from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SRCS = [os.path.join(_DIR, "ingest.cpp"), os.path.join(_DIR, "image.cpp")]
_SRC = _SRCS[0]
_LIB = os.path.join(_DIR, "libingest.so")

_lock = threading.Lock()
_lib: ctypes.CDLL | None = None
_build_error: str | None = None


class _ObjMesh(ctypes.Structure):
    _fields_ = [
        ("pos", ctypes.POINTER(ctypes.c_float)),
        ("uv", ctypes.POINTER(ctypes.c_float)),
        ("nrm", ctypes.POINTER(ctypes.c_float)),
        ("n_tris", ctypes.c_long),
        ("has_uv", ctypes.c_int),
        ("has_nrm", ctypes.c_int),
    ]


def _build() -> str | None:
    """Compile ingest.cpp → libingest.so; returns an error string on failure."""
    if os.path.exists(_LIB) and all(
        os.path.getmtime(_LIB) >= os.path.getmtime(s) for s in _SRCS
    ):
        return None
    cmd = ["g++", "-O3", "-shared", "-fPIC", "-std=c++17", *_SRCS, "-o", _LIB]
    try:
        proc = subprocess.run(cmd, capture_output=True, text=True, timeout=120)
    except (OSError, subprocess.TimeoutExpired) as e:
        return f"native build failed: {e}"
    if proc.returncode != 0:
        return f"native build failed: {proc.stderr[-500:]}"
    return None


def _load() -> ctypes.CDLL | None:
    global _lib, _build_error
    with _lock:
        if _lib is not None or _build_error is not None:
            return _lib
        err = _build()
        if err is not None:
            _build_error = err
            return None
        lib = ctypes.CDLL(_LIB)
        lib.obj_load.restype = ctypes.POINTER(_ObjMesh)
        lib.obj_load.argtypes = [ctypes.c_char_p]
        lib.obj_free.argtypes = [ctypes.POINTER(_ObjMesh)]
        lib.obj_last_error.restype = ctypes.c_char_p
        lib.png_unfilter.restype = ctypes.c_long
        lib.png_unfilter.argtypes = [
            ctypes.POINTER(ctypes.c_ubyte), ctypes.c_long, ctypes.c_long,
            ctypes.c_long, ctypes.POINTER(ctypes.c_ubyte),
        ]
        _lib = lib
        return _lib


def available() -> bool:
    """True if the native library is (or can be) built and loaded."""
    return _load() is not None


def build_error() -> str | None:
    _load()
    return _build_error


def load_obj_native(path: str):
    """Parse an OBJ with the C++ loader.

    Returns (pos (T,3,3) f32, uv (T,3,2) f32, nrm (T,3,3) f32, has_nrm bool).
    Raises RuntimeError if the library is unavailable or parsing fails.
    """
    lib = _load()
    if lib is None:
        raise RuntimeError(_build_error or "native library unavailable")
    m = lib.obj_load(path.encode())
    if not m:
        raise RuntimeError(lib.obj_last_error().decode())
    try:
        T = m.contents.n_tris
        pos = np.ctypeslib.as_array(m.contents.pos, shape=(T, 3, 3)).copy()
        uv = np.ctypeslib.as_array(m.contents.uv, shape=(T, 3, 2)).copy()
        nrm = np.ctypeslib.as_array(m.contents.nrm, shape=(T, 3, 3)).copy()
        has_nrm = bool(m.contents.has_nrm)
    finally:
        lib.obj_free(m)
    return pos, uv, nrm, has_nrm


def png_unfilter_native(raw: bytes, h: int, stride: int, bpp: int) -> np.ndarray:
    """Unfilter PNG scanlines with the C++ fast path.

    ``raw`` is the zlib-decompressed stream (h rows of 1 filter byte +
    ``stride`` data bytes); returns (h, stride) uint8.  Raises RuntimeError
    if the library is unavailable or a filter type is invalid.
    """
    lib = _load()
    if lib is None:
        raise RuntimeError(_build_error or "native library unavailable")
    src = np.frombuffer(raw, np.uint8, h * (stride + 1))
    out = np.empty((h, stride), np.uint8)
    rc = lib.png_unfilter(
        src.ctypes.data_as(ctypes.POINTER(ctypes.c_ubyte)),
        h, stride, bpp,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_ubyte)),
    )
    if rc:
        raise RuntimeError(f"bad PNG filter type at row {rc - 1}")
    return out
