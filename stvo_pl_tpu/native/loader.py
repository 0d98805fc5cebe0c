"""ctypes binding + lazy build of the native stereo loader.

The shared library is compiled on first use with g++ (no pybind11 — plain C
ABI) and cached next to the source.  Falls back cleanly when a toolchain is
unavailable; `stvo_pl_tpu.utils.dataset` uses PIL in that case.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "stvo_loader.cpp")
_LIB = os.path.join(_HERE, "libstvo_loader.so")
_lock = threading.Lock()
_lib = None


class NativeUnavailable(RuntimeError):
    pass


def _build() -> str:
    cmd = ["g++", "-O3", "-march=native", "-shared", "-fPIC", "-std=c++17",
           _SRC, "-o", _LIB, "-lz", "-lpthread"]
    try:
        subprocess.run(cmd, check=True, capture_output=True, text=True)
    except (subprocess.CalledProcessError, FileNotFoundError) as e:
        detail = getattr(e, "stderr", str(e))
        raise NativeUnavailable(f"native loader build failed: {detail}")
    return _LIB


def get_lib():
    global _lib
    with _lock:
        if _lib is not None:
            return _lib
        if not os.path.exists(_LIB) or (
                os.path.getmtime(_LIB) < os.path.getmtime(_SRC)):
            _build()
        lib = ctypes.CDLL(_LIB)
        lib.stvo_loader_open.restype = ctypes.c_void_p
        lib.stvo_loader_open.argtypes = [
            ctypes.POINTER(ctypes.c_char_p), ctypes.POINTER(ctypes.c_char_p),
            ctypes.c_int, ctypes.c_int, ctypes.c_int,
            ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float),
            ctypes.c_int]
        lib.stvo_loader_next.restype = ctypes.c_int
        lib.stvo_loader_next.argtypes = [
            ctypes.c_void_p, ctypes.POINTER(ctypes.c_float),
            ctypes.POINTER(ctypes.c_float)]
        lib.stvo_loader_close.restype = None
        lib.stvo_loader_close.argtypes = [ctypes.c_void_p]
        lib.stvo_decode_image.restype = ctypes.c_int
        lib.stvo_decode_image.argtypes = [
            ctypes.c_char_p, ctypes.POINTER(ctypes.c_float), ctypes.c_int,
            ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int)]
        _lib = lib
        return _lib


def decode_image(path: str, max_hw: int = 4096 * 4096) -> np.ndarray:
    """Decode one PGM/PPM/PNG file to float32 grayscale via the C++ decoder."""
    lib = get_lib()
    buf = np.empty(max_hw, np.float32)
    w = ctypes.c_int()
    h = ctypes.c_int()
    ok = lib.stvo_decode_image(
        path.encode(), buf.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        max_hw, ctypes.byref(w), ctypes.byref(h))
    if not ok:
        raise IOError(f"native decode failed: {path}")
    return buf[:w.value * h.value].reshape(h.value, w.value).copy()


class PrefetchingLoader:
    """Threaded C++ loader: decode + (optional) rectify off the main thread.

    Equivalent role to the reference's per-frame imread+rectify
    (src/dataset.cpp:147-157) but overlapped with device compute.
    """

    def __init__(self, paths_l, paths_r, width, height,
                 map_l: np.ndarray | None = None,
                 map_r: np.ndarray | None = None, n_threads: int = 2):
        assert len(paths_l) == len(paths_r)
        self.lib = get_lib()
        self.n = len(paths_l)
        self.width = width
        self.height = height
        self._pl = (ctypes.c_char_p * self.n)(
            *[p.encode() for p in paths_l])
        self._pr = (ctypes.c_char_p * self.n)(
            *[p.encode() for p in paths_r])
        fp = ctypes.POINTER(ctypes.c_float)
        if map_l is not None:
            self._ml = np.ascontiguousarray(map_l, np.float32)
            self._mr = np.ascontiguousarray(map_r, np.float32)
            ml = self._ml.ctypes.data_as(fp)
            mr = self._mr.ctypes.data_as(fp)
        else:
            ml = mr = ctypes.cast(None, fp)
        self.handle = self.lib.stvo_loader_open(
            self._pl, self._pr, self.n, width, height, ml, mr, n_threads)

    def __iter__(self):
        fp = ctypes.POINTER(ctypes.c_float)
        for _ in range(self.n):
            out_l = np.empty((self.height, self.width), np.float32)
            out_r = np.empty((self.height, self.width), np.float32)
            ok = self.lib.stvo_loader_next(
                self.handle, out_l.ctypes.data_as(fp),
                out_r.ctypes.data_as(fp))
            if not ok:
                return
            yield out_l, out_r

    def close(self):
        if self.handle:
            self.lib.stvo_loader_close(self.handle)
            self.handle = None

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass
