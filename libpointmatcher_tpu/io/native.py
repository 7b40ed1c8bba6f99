"""ctypes bridge to the native IO accelerator (native/pm_native.cpp).

Builds the shared library on first use (one g++ invocation, cached next to
the source); every entry point degrades gracefully to the numpy/Python path
when the toolchain or library is unavailable, so the package works without
a compiler."""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional

import numpy as np

_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_tried = False

_NATIVE_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    "native",
)
_SO = os.path.join(_NATIVE_DIR, "libpm_native.so")
_SRC = os.path.join(_NATIVE_DIR, "pm_native.cpp")


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        if os.environ.get("PMTPU_NO_NATIVE"):
            return None  # force the pure-Python parsers (testing/debug)
        try:
            if not os.path.exists(_SO) or (
                os.path.exists(_SRC)
                and os.path.getmtime(_SRC) > os.path.getmtime(_SO)
            ):
                subprocess.run(
                    ["g++", "-O3", "-fPIC", "-shared", "-o", _SO, _SRC],
                    check=True,
                    capture_output=True,
                    timeout=120,
                )
            lib = ctypes.CDLL(_SO)
            lib.pm_parse_floats.restype = ctypes.c_long
            lib.pm_parse_floats.argtypes = [
                ctypes.c_char_p, ctypes.c_long,
                ctypes.POINTER(ctypes.c_float), ctypes.c_long,
            ]
            lib.pm_parse_doubles.restype = ctypes.c_long
            lib.pm_parse_doubles.argtypes = [
                ctypes.c_char_p, ctypes.c_long,
                ctypes.POINTER(ctypes.c_double), ctypes.c_long,
            ]
            lib.pm_parse_doubles_n.restype = ctypes.c_long
            lib.pm_parse_doubles_n.argtypes = [
                ctypes.c_char_p, ctypes.c_long,
                ctypes.POINTER(ctypes.c_double), ctypes.c_long,
                ctypes.POINTER(ctypes.c_long),
            ]
            lib.pm_format_floats.restype = ctypes.c_long
            lib.pm_format_floats.argtypes = [
                ctypes.POINTER(ctypes.c_float), ctypes.c_long, ctypes.c_long,
                ctypes.c_char_p, ctypes.c_long,
            ]
            lib.pm_covariance_greedy.restype = ctypes.c_long
            lib.pm_covariance_greedy.argtypes = [
                ctypes.POINTER(ctypes.c_double), ctypes.c_long, ctypes.c_long,
                ctypes.POINTER(ctypes.c_long),
            ]
            dptr = ctypes.POINTER(ctypes.c_double)
            lib.pm_kdtree_build.restype = ctypes.c_void_p
            lib.pm_kdtree_build.argtypes = [dptr, ctypes.c_long]
            lib.pm_kdtree_free.restype = None
            lib.pm_kdtree_free.argtypes = [ctypes.c_void_p]
            lib.pm_kdtree_knn.restype = None
            lib.pm_kdtree_knn.argtypes = [
                ctypes.c_void_p, dptr, ctypes.c_long, ctypes.c_long,
                ctypes.POINTER(ctypes.c_long),
            ]
            lib.pm_cpu_normals.restype = None
            lib.pm_cpu_normals.argtypes = [
                ctypes.c_void_p, dptr, ctypes.c_long, ctypes.c_long, dptr,
            ]
            lib.pm_icp_cpu_register.restype = None
            lib.pm_icp_cpu_register.argtypes = [
                ctypes.c_void_p, dptr, dptr, dptr, ctypes.c_long,
                ctypes.c_long, ctypes.c_double, dptr,
            ]
            lib.pm_icp_cpu_register_conv.restype = ctypes.c_long
            lib.pm_icp_cpu_register_conv.argtypes = [
                ctypes.c_void_p, dptr, dptr, dptr, ctypes.c_long,
                ctypes.c_long, ctypes.c_double, ctypes.c_double,
                ctypes.c_double, ctypes.c_long, dptr,
            ]
            _lib = lib
        except Exception:
            _lib = None
        return _lib


def available() -> bool:
    return _load() is not None


def parse_floats(text: bytes) -> Optional[np.ndarray]:
    """Tokenize an ASCII numeric block → float64 array, or None when the
    native path is unavailable or the block contains non-numeric tokens."""
    lib = _load()
    if lib is None:
        return None
    cap = max(len(text) // 2 + 16, 64)
    out = np.empty(cap, np.float64)
    n = lib.pm_parse_doubles(
        text, len(text),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_double)), cap,
    )
    if n < 0:
        return None
    return out[:n]


def parse_floats_n(text: bytes, want: int):
    """Parse exactly ``want`` numbers from the head of ``text``.

    → (values float64 [n], consumed_bytes) or None when unavailable."""
    lib = _load()
    if lib is None:
        return None
    out = np.empty(want, np.float64)
    consumed = ctypes.c_long(0)
    n = lib.pm_parse_doubles_n(
        text, len(text),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_double)), want,
        ctypes.byref(consumed),
    )
    return out[:n], int(consumed.value)


def covariance_greedy(mag: np.ndarray, nb: int) -> Optional[np.ndarray]:
    """CovarianceSampling's sequential greedy pick (compiled; see
    native/pm_native.cpp::pm_covariance_greedy). ``mag`` is [n, 6]; returns
    the ``nb`` selected row indices in pick order, or None when the native
    library is unavailable."""
    lib = _load()
    if lib is None:
        return None
    mag = np.ascontiguousarray(mag, np.float64)
    out = np.empty(nb, np.int64)
    got = lib.pm_covariance_greedy(
        mag.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        mag.shape[0], nb,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_long)),
    )
    return out[:got]


class CpuBaseline:
    """Compiled single-thread CPU ICP baseline (native/pm_native.cpp:
    kd-tree 1-NN + trim + point-to-plane solve) — the benchmark's stand-in
    for the reference's compiled loop. ``None``-safe: use
    :func:`cpu_baseline` to construct."""

    def __init__(self, lib, ref_pts: np.ndarray):
        self._lib = lib
        self._ref = np.ascontiguousarray(ref_pts, np.float64)
        ptr = self._ref.ctypes.data_as(ctypes.POINTER(ctypes.c_double))
        self._h = lib.pm_kdtree_build(ptr, len(self._ref))
        self._normals = None

    def __del__(self):
        try:
            if getattr(self, "_h", None):
                self._lib.pm_kdtree_free(self._h)
        except Exception:
            pass

    def compute_normals(self, k: int = 10) -> np.ndarray:
        out = np.empty_like(self._ref)
        self._lib.pm_cpu_normals(
            self._h,
            self._ref.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
            len(self._ref), k,
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        )
        self._normals = out
        return out

    def register(self, src_pts: np.ndarray, iterations: int,
                 trim: float = 0.85, T_init=None) -> np.ndarray:
        if self._normals is None:
            self.compute_normals()
        src = np.ascontiguousarray(src_pts, np.float64)
        T = np.ascontiguousarray(
            np.eye(4) if T_init is None else T_init, np.float64
        )
        dp = ctypes.POINTER(ctypes.c_double)
        self._lib.pm_icp_cpu_register(
            self._h,
            self._ref.ctypes.data_as(dp),
            self._normals.ctypes.data_as(dp),
            src.ctypes.data_as(dp), len(src), iterations, trim,
            T.ctypes.data_as(dp),
        )
        return T

    def register_conv(self, src_pts: np.ndarray, max_iterations: int = 40,
                      trim: float = 0.85, rot_thresh: float = 0.001,
                      trans_thresh: float = 0.001, smooth: int = 3,
                      T_init=None):
        """Convergence-stopped registration: same per-iteration work as
        :meth:`register`, stopping by the reference Differential checker
        semantics (TransformationCheckersImpl.cpp:85-158) at the same
        default thresholds the engine uses. → (T, iterations_run)."""
        if self._normals is None:
            self.compute_normals()
        src = np.ascontiguousarray(src_pts, np.float64)
        T = np.ascontiguousarray(
            np.eye(4) if T_init is None else T_init, np.float64
        )
        dp = ctypes.POINTER(ctypes.c_double)
        it = self._lib.pm_icp_cpu_register_conv(
            self._h,
            self._ref.ctypes.data_as(dp),
            self._normals.ctypes.data_as(dp),
            src.ctypes.data_as(dp), len(src), max_iterations, trim,
            rot_thresh, trans_thresh, smooth,
            T.ctypes.data_as(dp),
        )
        return T, int(it)


def cpu_baseline(ref_pts: np.ndarray) -> Optional[CpuBaseline]:
    """Build the compiled CPU baseline over a reference cloud, or None
    when the native library is unavailable."""
    lib = _load()
    if lib is None:
        return None
    return CpuBaseline(lib, ref_pts)


def format_floats(values: np.ndarray) -> Optional[bytes]:
    """Format a float32 [rows, cols] table as ASCII rows, or None."""
    lib = _load()
    if lib is None:
        return None
    values = np.ascontiguousarray(values, np.float32)
    rows, cols = values.shape
    cap = rows * cols * 20 + rows * 2 + 64
    buf = ctypes.create_string_buffer(cap)
    w = lib.pm_format_floats(
        values.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        rows, cols, buf, cap,
    )
    if w < 0:
        return None
    return buf.raw[:w]
