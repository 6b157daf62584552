"""ctypes bindings + build for the native C++ data loader.

Compiles ``cistar_tpu/native/dataloader.cpp`` on first use (g++, cached under
``cistar_tpu/native/build/``) and exposes :class:`NativePngLoader`. Falls back
cleanly (raises ImportError) when a toolchain or libpng is unavailable —
callers use the PIL path in that case.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Sequence

import numpy as np

_SRC = os.path.join(os.path.dirname(__file__), "..", "native", "dataloader.cpp")
_BUILD_DIR = os.path.join(os.path.dirname(__file__), "..", "native", "build")
_LIB_PATH = os.path.join(_BUILD_DIR, "libcistar_loader.so")

_lib = None


def _build() -> str:
    os.makedirs(_BUILD_DIR, exist_ok=True)
    src = os.path.abspath(_SRC)
    out = os.path.abspath(_LIB_PATH)
    if (not os.path.exists(out)
            or os.path.getmtime(out) < os.path.getmtime(src)):
        cmd = ["g++", "-O3", "-march=native", "-shared", "-fPIC", src,
               "-lpng", "-lpthread", "-o", out]
        subprocess.run(cmd, check=True, capture_output=True)
    return out


def _get_lib():
    global _lib
    if _lib is None:
        path = _build()
        lib = ctypes.CDLL(path)
        lib.loader_create.restype = ctypes.c_void_p
        lib.loader_create.argtypes = [
            ctypes.POINTER(ctypes.c_char_p), ctypes.c_int, ctypes.c_int,
            ctypes.c_int, ctypes.c_int, ctypes.c_int]
        lib.loader_get_batch.restype = ctypes.c_int
        lib.loader_get_batch.argtypes = [
            ctypes.c_void_p, ctypes.POINTER(ctypes.c_int), ctypes.c_int,
            ctypes.POINTER(ctypes.c_float), ctypes.c_float, ctypes.c_float]
        lib.loader_size.restype = ctypes.c_int
        lib.loader_size.argtypes = [ctypes.c_void_p]
        lib.loader_destroy.argtypes = [ctypes.c_void_p]
        _lib = lib
    return _lib


class NativePngLoader:
    """Threaded native PNG→float32 NHWC batch loader.

    Produces ``(x/255 − mean)/std`` arrays, bilinear-resized to (h, w) with
    half-pixel centers and PIL-compatible grayscale conversion.
    """

    def __init__(self, paths: Sequence[str], size: int, channels: int = 1,
                 n_threads: int = 8, mean: float = 0.5, std: float = 0.5):
        lib = _get_lib()
        arr = (ctypes.c_char_p * len(paths))(
            *[p.encode() for p in paths])
        self._lib = lib
        self._handle = lib.loader_create(arr, len(paths), size, size,
                                         channels, n_threads)
        self.size, self.channels = size, channels
        self.mean, self.std = mean, std
        self.n = len(paths)

    def get_batch(self, indices: Sequence[int]) -> np.ndarray:
        bs = len(indices)
        out = np.empty((bs, self.size, self.size, self.channels), np.float32)
        idx = (ctypes.c_int * bs)(*[int(i) for i in indices])
        ok = self._lib.loader_get_batch(
            self._handle, idx, bs,
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            ctypes.c_float(self.mean), ctypes.c_float(self.std))
        if ok != bs:
            raise IOError(f"native loader decoded {ok}/{bs} images")
        return out

    def __len__(self) -> int:
        return self.n

    def __del__(self):
        try:
            if getattr(self, "_handle", None):
                self._lib.loader_destroy(self._handle)
        except Exception:
            pass
