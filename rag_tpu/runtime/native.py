"""ctypes bindings for the native data runtime (librag_runtime.so).

Builds the shared library on first use (g++ -O3, zlib+pthread — both in
the base image). Falls back gracefully: callers should check
``native_available()`` and use the numpy/PIL readers otherwise.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional, Sequence

import numpy as np

_THIS_DIR = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_THIS_DIR, "rag_runtime.cpp")
_LIB = os.path.join(_THIS_DIR, "librag_runtime.so")
_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_build_error: Optional[str] = None


def _build() -> Optional[str]:
    cmd = ["g++", "-O3", "-fPIC", "-shared", "-std=c++17", _SRC,
           "-o", _LIB, "-lz", "-lpthread"]
    try:
        r = subprocess.run(cmd, capture_output=True, text=True, timeout=120)
    except Exception as e:  # pragma: no cover
        return str(e)
    return None if r.returncode == 0 else r.stderr


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _build_error
    with _lock:
        if _lib is not None:
            return _lib
        if _build_error is not None:
            return None
        if not os.path.exists(_LIB) or (
                os.path.getmtime(_LIB) < os.path.getmtime(_SRC)):
            err = _build()
            if err:
                _build_error = err
                return None
        lib = ctypes.CDLL(_LIB)
        c = ctypes.c_char_p
        i = ctypes.c_int
        ip = ctypes.POINTER(ctypes.c_int)
        fp = ctypes.POINTER(ctypes.c_float)
        lib.rag_png_info.argtypes = [c, ip, ip, ip, ip]
        lib.rag_png_read_f32.argtypes = [c, fp]
        lib.rag_pfm_info.argtypes = [c, ip, ip, ip]
        lib.rag_pfm_read.argtypes = [c, fp]
        lib.rag_loader_create.argtypes = [
            ctypes.POINTER(c), ctypes.POINTER(c), ctypes.POINTER(c),
            i, i, i, i, i, i, i, ctypes.c_uint]
        lib.rag_loader_create.restype = ctypes.c_void_p
        lib.rag_loader_next.argtypes = [ctypes.c_void_p, i, fp, fp, fp]
        lib.rag_loader_destroy.argtypes = [ctypes.c_void_p]
        _lib = lib
        return _lib


def native_available() -> bool:
    return _load() is not None


def read_png_native(path: str) -> np.ndarray:
    """PNG -> float32 HWC ([0,1] for 8-bit; /256 for 16-bit gray)."""
    lib = _load()
    assert lib is not None, _build_error
    w = ctypes.c_int(); h = ctypes.c_int()
    ch = ctypes.c_int(); bd = ctypes.c_int()
    rc = lib.rag_png_info(path.encode(), ctypes.byref(w), ctypes.byref(h),
                          ctypes.byref(ch), ctypes.byref(bd))
    if rc != 0:
        raise IOError(f"png decode failed: {path}")
    out = np.empty((h.value, w.value, ch.value), np.float32)
    rc = lib.rag_png_read_f32(
        path.encode(), out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)))
    if rc != 0:
        raise IOError(f"png read failed: {path}")
    return out[..., 0] if ch.value == 1 else out


def read_pfm_native(path: str) -> np.ndarray:
    lib = _load()
    assert lib is not None, _build_error
    w = ctypes.c_int(); h = ctypes.c_int(); ch = ctypes.c_int()
    rc = lib.rag_pfm_info(path.encode(), ctypes.byref(w), ctypes.byref(h),
                          ctypes.byref(ch))
    if rc != 0:
        raise IOError(f"pfm decode failed: {path}")
    out = np.empty((h.value, w.value, ch.value), np.float32)
    rc = lib.rag_pfm_read(
        path.encode(), out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)))
    if rc != 0:
        raise IOError(f"pfm read failed: {path}")
    return out[..., 0] if ch.value == 1 else out


class NativeStereoLoader:
    """Threaded native prefetcher yielding NHWC float32 batches.

    training=True: random (crop_w, crop_h) crops; else top/right zero-pad
    to (pad_w, pad_h) — the reference's protocols. Images come back
    ImageNet-normalized.
    """

    def __init__(self, entries: Sequence[Sequence[str]], training: bool,
                 crop=(384, 192), pad=(960, 480), n_threads: int = 4,
                 seed: int = 0):
        lib = _load()
        assert lib is not None, f"native runtime unavailable: {_build_error}"
        self._lib = lib
        self.training = training
        self.w = crop[0] if training else pad[0]
        self.h = crop[1] if training else pad[1]
        n = len(entries)
        mk = lambda idx: (ctypes.c_char_p * n)(
            *[e[idx].encode() for e in entries])
        self._keepalive = (mk(0), mk(1), mk(2))
        self._handle = lib.rag_loader_create(
            self._keepalive[0], self._keepalive[1], self._keepalive[2],
            n, crop[0], crop[1], int(training), pad[0], pad[1],
            n_threads, seed)
        assert self._handle

    def next_batch(self, batch: int):
        f = ctypes.POINTER(ctypes.c_float)
        left = np.empty((batch, self.h, self.w, 3), np.float32)
        right = np.empty((batch, self.h, self.w, 3), np.float32)
        disp = np.empty((batch, self.h, self.w), np.float32)
        rc = self._lib.rag_loader_next(
            self._handle, batch, left.ctypes.data_as(f),
            right.ctypes.data_as(f), disp.ctypes.data_as(f))
        if rc != batch:
            raise RuntimeError(f"loader returned {rc}")
        return {"left": left, "right": right, "disparity": disp}

    def close(self):
        if self._handle:
            self._lib.rag_loader_destroy(self._handle)
            self._handle = None

    def __del__(self):  # pragma: no cover
        try:
            self.close()
        except Exception:
            pass
