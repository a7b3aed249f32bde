"""ctypes binding for the native host-RAM clustered-KV buffer.

The reference binds its C++ WaveBufferCPU via pybind11
(retroinfer_kernels/src/wave_buffer_cpu.cpp:822); pybind11 is not available
here, so the native side exports a C ABI and this wrapper uses ctypes. The
library is built on demand from native/wave_buffer.cpp (g++ only).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from pathlib import Path

import numpy as np

_NATIVE_DIR = Path(__file__).resolve().parent.parent.parent / "native"
_LIB_PATH = _NATIVE_DIR / "libwave_buffer.so"
_lib = None


def _load():
    global _lib
    if _lib is not None:
        return _lib
    if not _LIB_PATH.exists():
        subprocess.run(["make", "-C", str(_NATIVE_DIR)], check=True,
                       capture_output=True)
    lib = ctypes.CDLL(str(_LIB_PATH))
    lib.wave_create.restype = ctypes.c_void_p
    lib.wave_create.argtypes = [ctypes.c_int64, ctypes.c_int64, ctypes.c_int]
    lib.wave_destroy.argtypes = [ctypes.c_void_p]
    lib.wave_put.argtypes = [ctypes.c_void_p, ctypes.c_int64, ctypes.c_int64,
                             ctypes.c_char_p]
    lib.wave_gather.argtypes = [ctypes.c_void_p, ctypes.c_char_p,
                                ctypes.c_int64, ctypes.c_char_p]
    lib.wave_stats_gathered.restype = ctypes.c_int64
    lib.wave_stats_gathered.argtypes = [ctypes.c_void_p]
    _lib = lib
    return lib


class HostWaveBuffer:
    """Fixed-slot host store: `n_slots` clusters of `slot_bytes` each."""

    def __init__(self, n_slots: int, slot_bytes: int,
                 n_threads: int | None = None):
        lib = _load()
        if n_threads is None:
            n_threads = min(os.cpu_count() or 1, 8)
        self._lib = lib
        self._h = lib.wave_create(n_slots, slot_bytes, n_threads)
        self.n_slots = n_slots
        self.slot_bytes = slot_bytes

    def put(self, first_slot: int, data: np.ndarray):
        """Upload contiguous slots; data is [n, slot_bytes] uint8 (or any
        array whose row byte size equals slot_bytes)."""
        arr = np.ascontiguousarray(data).view(np.uint8).reshape(data.shape[0], -1)
        assert arr.shape[1] == self.slot_bytes, (arr.shape, self.slot_bytes)
        self._lib.wave_put(self._h, first_slot, arr.shape[0],
                           arr.ctypes.data_as(ctypes.c_char_p))

    def gather(self, slot_ids: np.ndarray, out: np.ndarray | None = None
               ) -> np.ndarray:
        """Parallel gather of slots into a contiguous [n, slot_bytes] array."""
        ids = np.ascontiguousarray(slot_ids, np.int64)
        if out is None:
            out = np.empty((len(ids), self.slot_bytes), np.uint8)
        self._lib.wave_gather(self._h, ids.ctypes.data_as(ctypes.c_char_p),
                              len(ids), out.ctypes.data_as(ctypes.c_char_p))
        return out

    @property
    def gathered_slots(self) -> int:
        return int(self._lib.wave_stats_gathered(self._h))

    def __del__(self):
        if getattr(self, "_h", None):
            try:
                self._lib.wave_destroy(self._h)
            except Exception:
                pass
            self._h = None
