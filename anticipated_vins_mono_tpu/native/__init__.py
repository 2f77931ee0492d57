"""Native (C++) runtime components with build-on-demand ctypes bindings.

The reference's runtime is entirely C++ (SURVEY.md §2); the compute path of
this framework is JAX/XLA, and the host runtime pieces around it — dataset
ingest, IMU/frame measurement alignment, descriptor matching — are provided
natively here (src/avm_native.cc) with pure-Python fallbacks when no
compiler is available.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_SRC = os.path.join(os.path.dirname(__file__), "src", "avm_native.cc")
_LIB = os.path.join(os.path.dirname(__file__), "src", "libavm_native.so")
_lock = threading.Lock()
_lib = None
_build_failed = False


def _build() -> bool:
    cmd = ["g++", "-O3", "-std=c++17", "-shared", "-fPIC", _SRC, "-o", _LIB]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        return True
    except Exception:
        return False


def get_lib():
    """Load (building if needed) the native library, or None."""
    global _lib, _build_failed
    with _lock:
        if _lib is not None:
            return _lib
        if _build_failed:
            return None
        if not os.path.exists(_LIB) or (
                os.path.getmtime(_LIB) < os.path.getmtime(_SRC)):
            if not _build():
                _build_failed = True
                return None
        lib = ctypes.CDLL(_LIB)
        lib.avm_load_euroc_csv.restype = ctypes.c_int
        lib.avm_aligner_create.restype = ctypes.c_void_p
        lib.avm_aligner_frame_batch.restype = ctypes.c_int
        _lib = lib
        return _lib


def available() -> bool:
    return get_lib() is not None


# ----------------------------------------------------------------------------
# High-level wrappers
# ----------------------------------------------------------------------------


def load_euroc_csv(path: str, max_rows: int = 400000):
    """Native CSV load → dict like utils.euroc.load_gt_csv (or None)."""
    lib = get_lib()
    if lib is None:
        return None
    buf = np.zeros((max_rows, 17))
    n = lib.avm_load_euroc_csv(
        path.encode(), buf.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        max_rows)
    if n < 0:
        raise FileNotFoundError(path)
    raw = buf[:n]
    return {"t": raw[:, 0], "p": raw[:, 1:4], "q": raw[:, 4:8],
            "v": raw[:, 8:11], "bg": raw[:, 11:14], "ba": raw[:, 14:17]}


class MeasurementAligner:
    """Native IMU/frame aligner (estimator_node getMeasurements parity)."""

    def __init__(self):
        self._lib = get_lib()
        if self._lib is None:
            raise RuntimeError("native library unavailable")
        self._h = ctypes.c_void_p(self._lib.avm_aligner_create())

    def __del__(self):
        try:
            if getattr(self, "_h", None):
                self._lib.avm_aligner_destroy(self._h)
        except Exception:
            pass

    def push_imu(self, t: float, acc, gyr):
        a = np.ascontiguousarray(acc, dtype=np.float64)
        w = np.ascontiguousarray(gyr, dtype=np.float64)
        self._lib.avm_aligner_push_imu(
            self._h, ctypes.c_double(t),
            a.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
            w.ctypes.data_as(ctypes.POINTER(ctypes.c_double)))

    def frame_batch(self, t_frame: float, max_n: int = 256):
        """Returns (dts [n], acc [n,3], gyr [n,3], acc0 [3], gyr0 [3]) or
        None if IMU data hasn't caught up to t_frame yet."""
        dts = np.zeros(max_n)
        acc = np.zeros((max_n, 3))
        gyr = np.zeros((max_n, 3))
        acc0 = np.zeros(3)
        gyr0 = np.zeros(3)
        P = ctypes.POINTER(ctypes.c_double)
        n = self._lib.avm_aligner_frame_batch(
            self._h, ctypes.c_double(t_frame),
            dts.ctypes.data_as(P), acc.ctypes.data_as(P),
            gyr.ctypes.data_as(P), acc0.ctypes.data_as(P),
            gyr0.ctypes.data_as(P), max_n)
        if n < 0:
            return None
        return dts[:n], acc[:n], gyr[:n], acc0, gyr0


def pack_descriptors(desc_bool: np.ndarray) -> np.ndarray:
    """bool [N,256] → packed uint64 [N,4]."""
    bits = np.packbits(desc_bool.astype(np.uint8), axis=1, bitorder="little")
    return bits.view(np.uint64)


def hamming_all_pairs(d1: np.ndarray, d2: np.ndarray):
    """Native all-pairs Hamming over packed [N,4] uint64 (or None)."""
    lib = get_lib()
    if lib is None:
        return None
    n1, n2 = len(d1), len(d2)
    out = np.zeros((n1, n2), np.int32)
    lib.avm_hamming_all_pairs(
        np.ascontiguousarray(d1).ctypes.data_as(ctypes.POINTER(ctypes.c_uint64)),
        n1,
        np.ascontiguousarray(d2).ctypes.data_as(ctypes.POINTER(ctypes.c_uint64)),
        n2, out.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)))
    return out
