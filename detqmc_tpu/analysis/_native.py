"""ctypes bindings for the native OpenMP mrpt core (native/mrpt).

The reference's mrpt family is OpenMP C++ (SURVEY.md §3 "mrpt family");
this module builds/loads the equivalent shared library on demand (no
pybind11 in this image — plain C ABI via ctypes) and exposes it to
analysis/mrpt.py. Everything degrades gracefully to the NumPy path when
no compiler or prebuilt library is available.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional

import numpy as np

_SRC_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))), "native", "mrpt")
_LIB_PATH = os.path.join(_SRC_DIR, "libmrpt_core.so")

_lib: Optional[ctypes.CDLL] = None
_tried = False

_f64p = np.ctypeslib.ndpointer(np.float64, flags="C_CONTIGUOUS")


def _build() -> bool:
    src = os.path.join(_SRC_DIR, "mrpt_core.cpp")
    if not os.path.exists(src):
        return False
    # compile to a private temp file and rename into place: concurrent
    # pytest-xdist workers may race on the build, and dlopen of a
    # half-written .so must never happen (rename is atomic on POSIX)
    import tempfile

    fd, tmp = tempfile.mkstemp(suffix=".so", dir=_SRC_DIR)
    os.close(fd)
    try:
        subprocess.run(
            ["g++", "-O3", "-march=native", "-fopenmp", "-shared", "-fPIC",
             src, "-o", tmp],
            check=True, capture_output=True, timeout=120)
        os.rename(tmp, _LIB_PATH)
        return True
    except (OSError, subprocess.SubprocessError):
        try:
            os.unlink(tmp)
        except OSError:
            pass
        return False


def get_lib() -> Optional[ctypes.CDLL]:
    """Load (building if needed) the native core; None when unavailable."""
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    if not os.path.exists(_LIB_PATH) and not _build():
        return None
    try:
        lib = ctypes.CDLL(_LIB_PATH)
    except OSError:
        return None
    lib.fs_solve.restype = ctypes.c_int
    lib.fs_solve.argtypes = [
        _f64p, ctypes.c_int64, _f64p, _f64p, ctypes.c_int, _f64p,
        ctypes.c_double, ctypes.c_int]
    lib.fs_log_weights.restype = None
    lib.fs_log_weights.argtypes = [
        _f64p, ctypes.c_int64, _f64p, _f64p, _f64p, ctypes.c_int,
        ctypes.c_double, _f64p]
    lib.fs_curve.restype = None
    lib.fs_curve.argtypes = [
        _f64p, ctypes.c_int64, _f64p, _f64p, _f64p, ctypes.c_int,
        _f64p, ctypes.c_int, _f64p, ctypes.c_int, _f64p]
    _lib = lib
    return _lib


def fs_solve(a, r, log_n, f, tol, max_iter) -> Optional[int]:
    lib = get_lib()
    if lib is None:
        return None
    a = np.ascontiguousarray(a, np.float64)
    r = np.ascontiguousarray(r, np.float64)
    log_n = np.ascontiguousarray(log_n, np.float64)
    assert f.dtype == np.float64 and f.flags.c_contiguous
    return int(lib.fs_solve(a, a.size, r, log_n, len(r), f,
                            float(tol), int(max_iter)))


def fs_log_weights(a, r, log_n, f, r_target) -> Optional[np.ndarray]:
    lib = get_lib()
    if lib is None:
        return None
    a = np.ascontiguousarray(a, np.float64)
    r = np.ascontiguousarray(r, np.float64)
    log_n = np.ascontiguousarray(log_n, np.float64)
    f = np.ascontiguousarray(f, np.float64)
    out = np.empty(a.size, np.float64)
    lib.fs_log_weights(a, a.size, r, log_n, f, len(r),
                       float(r_target), out)
    return out


def fs_curve(a, r, log_n, f, r_targets, obs) -> Optional[np.ndarray]:
    """obs: (M, S) -> (T, M) reweighted expectations."""
    lib = get_lib()
    if lib is None:
        return None
    a = np.ascontiguousarray(a, np.float64)
    r = np.ascontiguousarray(r, np.float64)
    log_n = np.ascontiguousarray(log_n, np.float64)
    f = np.ascontiguousarray(f, np.float64)
    r_targets = np.ascontiguousarray(r_targets, np.float64)
    obs = np.ascontiguousarray(obs, np.float64)
    M, S = obs.shape
    assert S == a.size
    out = np.empty((r_targets.size, M), np.float64)
    lib.fs_curve(a, S, r, log_n, f, len(r), r_targets, r_targets.size,
                 obs, M, out)
    return out
