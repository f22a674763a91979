"""ctypes bindings for the native prefetching dataloader.

The reference's input layer is C++ (`RawLogReader` etc. — SURVEY.md §3);
this binds `native/dataloader.cpp` (threaded PNG/JPEG/zlib decode into a
ring buffer) so host-side decode overlaps device compute.  Falls back
gracefully: `available()` is False when the shared library has not been
built (`make -C native`), and `datasets/tum.py` keeps a pure-Python path.
"""

from __future__ import annotations

import ctypes
import os

import numpy as np

_LIB = None


def _lib_path() -> str:
    here = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    return os.path.join(here, "native", "libifl_dataloader.so")


def _load():
    global _LIB
    if _LIB is not None:
        return _LIB
    path = _lib_path()
    if not os.path.exists(path):
        # Try an in-tree build if the toolchain is present.
        makefile = os.path.join(os.path.dirname(path), "Makefile")
        if os.path.exists(makefile):
            os.system(f"make -s -C {os.path.dirname(path)} >/dev/null 2>&1")
    if not os.path.exists(path):
        raise OSError(f"native dataloader not built: {path}")
    lib = ctypes.CDLL(path)
    lib.ifl_open_tum.restype = ctypes.c_void_p
    lib.ifl_open_tum.argtypes = [ctypes.c_char_p] + [ctypes.c_int] * 4
    lib.ifl_open_klg.restype = ctypes.c_void_p
    lib.ifl_open_klg.argtypes = [ctypes.c_char_p] + [ctypes.c_int] * 4
    for f in (lib.ifl_frame_count, lib.ifl_width, lib.ifl_height):
        f.restype = ctypes.c_int
        f.argtypes = [ctypes.c_void_p]
    lib.ifl_next.restype = ctypes.c_int
    lib.ifl_next.argtypes = [
        ctypes.c_void_p,
        ctypes.POINTER(ctypes.c_float),
        ctypes.POINTER(ctypes.c_uint8),
        ctypes.POINTER(ctypes.c_double),
    ]
    lib.ifl_close.argtypes = [ctypes.c_void_p]
    _LIB = lib
    return lib


def available() -> bool:
    try:
        _load()
        return True
    except OSError:
        return False


class NativeSequence:
    """Iterator over (depth_m f32[H,W], rgb u8[H,W,3], timestamp)."""

    def __init__(self, path: str, width: int = 640, height: int = 480,
                 queue_depth: int = 8, workers: int = 2):
        lib = _load()
        if path.endswith(".klg"):
            self._h = lib.ifl_open_klg(path.encode(), width, height,
                                       queue_depth, workers)
        else:
            self._h = lib.ifl_open_tum(path.encode(), width, height,
                                       queue_depth, workers)
        if not self._h:
            raise FileNotFoundError(f"cannot open sequence: {path}")
        self._lib = lib
        self.width = width
        self.height = height
        self.count = lib.ifl_frame_count(self._h)

    def __len__(self) -> int:
        return self.count

    def __iter__(self):
        depth = np.empty((self.height, self.width), np.float32)
        rgb = np.empty((self.height, self.width, 3), np.uint8)
        ts = ctypes.c_double()
        while True:
            r = self._lib.ifl_next(
                self._h,
                depth.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
                rgb.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
                ctypes.byref(ts),
            )
            if r == -1:
                return
            if r == -2:  # decode error: skip frame
                continue
            yield depth.copy(), rgb.copy(), float(ts.value)

    def close(self):
        if self._h:
            self._lib.ifl_close(self._h)
            self._h = None

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass
