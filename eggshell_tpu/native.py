"""ctypes bindings for the native C++ components (native/box_lcp.cc).

The reference's production box-LCP lives in C++
(toolkit/lcp.{h,cc}: MURTY/COTTLE_DANTZIG with an incrementally
maintained Cholesky factor); here the equivalent native solver is built
on demand with g++ and loaded via ctypes — no pybind11 dependency.

Falls back with a clear error if no compiler is available; the pure
NumPy oracle (eggshell_tpu.oracle.lcp_oracle) covers that case.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional, Tuple

import numpy as np

_LIB: Optional[ctypes.CDLL] = None


def _native_dir() -> str:
    return os.path.join(os.path.dirname(os.path.dirname(__file__)), "native")


def _load() -> ctypes.CDLL:
    global _LIB
    if _LIB is not None:
        return _LIB
    d = _native_dir()
    so = os.path.join(d, "libeggshell_native.so")
    src = os.path.join(d, "box_lcp.cc")
    if not os.path.exists(so) or (
        os.path.exists(src) and os.path.getmtime(src) > os.path.getmtime(so)
    ):
        # build to a per-process temp file then rename atomically so
        # concurrent test workers cannot race on a half-written .so
        tmp = f"{so}.build.{os.getpid()}"
        subprocess.run(
            ["g++", "-O3", "-fPIC", "-shared", "-std=c++17", "-o", tmp, src],
            check=True, cwd=d,
        )
        os.replace(tmp, so)
    lib = ctypes.CDLL(so)
    dp = ctypes.POINTER(ctypes.c_double)
    ip = ctypes.POINTER(ctypes.c_int)
    lib.egg_solve_box_lcp.restype = ctypes.c_int
    lib.egg_solve_box_lcp.argtypes = [
        ctypes.c_int, dp, dp, dp, dp, dp, dp, ip, ctypes.c_int,
        ctypes.c_double,
    ]
    lib.egg_solve_box_lcp_alg.restype = ctypes.c_int
    lib.egg_solve_box_lcp_alg.argtypes = [
        ctypes.c_int, dp, dp, dp, dp, dp, dp, ip, ctypes.c_int,
        ctypes.c_double, ctypes.c_int,
    ]
    lib.egg_solve_box_lcp_stats.restype = ctypes.c_int
    lib.egg_solve_box_lcp_stats.argtypes = [
        ctypes.c_int, dp, dp, dp, dp, dp, dp, ip, ctypes.c_int,
        ctypes.c_double, ctypes.c_int, dp, ip,
    ]
    lib.egg_solve_box_lcp_schur.restype = ctypes.c_int
    lib.egg_solve_box_lcp_schur.argtypes = [
        ctypes.c_int, dp, dp, dp, dp, dp, dp, ctypes.c_int,
        ctypes.c_double, ctypes.c_int, ctypes.c_double,
    ]
    lib.egg_solve_box_lcp_batch.restype = None
    lib.egg_solve_box_lcp_batch.argtypes = [
        ctypes.c_int, ctypes.c_int, dp, dp, dp, dp, dp, dp, ip,
        ctypes.c_int, ctypes.c_double,
    ]
    _LIB = lib
    return lib


def _dp(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_double))


_ALGORITHMS = {"murty": 0, "cottle_dantzig": 1}


def solve_box_lcp(
    A, b, lo, hi, max_iterations: int = 1000, tol: float = 1e-10,
    algorithm: str = "murty", return_info: bool = False,
):
    """Native principal-pivot box LCP (ref toolkit/lcp.h:135-144 MURTY /
    COTTLE_DANTZIG modes).  Returns (x, w, converged); when the budget
    is exhausted, (x, w) is the best-so-far iterate by KKT goodness (the
    reference's fallback, eggshell/lcp.cc:107-137).  With
    return_info=True the third element is a dict with the structured
    failure record {converged, iterations, goodness, fallback_used}
    (the lcp_debug.log analog, ref eggshell/lcp.cc:257-268)."""
    lib = _load()
    A = np.ascontiguousarray(A, dtype=np.float64)
    n = A.shape[0]
    b = np.ascontiguousarray(b, dtype=np.float64)
    # the native hi clamp is finite; replace inf with a huge bound
    lo = np.where(np.isinf(lo), -1e300, np.asarray(lo, float)).copy()
    hi = np.where(np.isinf(hi), 1e300, np.asarray(hi, float)).copy()
    x = np.zeros(n)
    w = np.zeros(n)
    side = np.zeros(n, dtype=np.int32)
    goodness = ctypes.c_double(0.0)
    iters = ctypes.c_int(0)
    ok = lib.egg_solve_box_lcp_stats(
        n, _dp(A), _dp(b), _dp(lo), _dp(hi), _dp(x), _dp(w),
        side.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
        max_iterations, tol, _ALGORITHMS[algorithm],
        ctypes.byref(goodness), ctypes.byref(iters),
    )
    if not return_info:
        return x, w, bool(ok)
    info = {
        "converged": bool(ok),
        "iterations": int(iters.value),
        "goodness": float(goodness.value),
        "fallback_used": not bool(ok),
    }
    return x, w, info


def solve_box_lcp_schur(
    A, b, lo, hi, max_iterations: int = 1000, tol: float = 1e-10,
    algorithm: str = "murty",
) -> Tuple[np.ndarray, np.ndarray, bool]:
    """Schur-complement fast path: unbounded variables (lo=-inf, hi=+inf)
    are eliminated exactly before pivoting (ref toolkit/lcp.h:157-159,
    SolveLCP_BoxSchur test toolkit/lcp.cc:1078).  Returns (x, w, ok)."""
    lib = _load()
    A = np.ascontiguousarray(A, dtype=np.float64)
    n = A.shape[0]
    b = np.ascontiguousarray(b, dtype=np.float64)
    lo = np.where(np.isinf(lo), -1e300, np.asarray(lo, float)).copy()
    hi = np.where(np.isinf(hi), 1e300, np.asarray(hi, float)).copy()
    x = np.zeros(n)
    w = np.zeros(n)
    ok = lib.egg_solve_box_lcp_schur(
        n, _dp(A), _dp(b), _dp(lo), _dp(hi), _dp(x), _dp(w),
        max_iterations, tol, _ALGORITHMS[algorithm], 1e250,
    )
    if ok < 0:
        raise np.linalg.LinAlgError("singular unbounded block in Schur LCP")
    return x, w, bool(ok)


def solve_box_lcp_batch(
    A, b, lo, hi, max_iterations: int = 1000, tol: float = 1e-10
):
    """Batched native solves: A (B, n, n), b/lo/hi (B, n).
    Returns (x, w, status)."""
    lib = _load()
    A = np.ascontiguousarray(A, dtype=np.float64)
    B, n, _ = A.shape
    b = np.ascontiguousarray(b, dtype=np.float64)
    lo = np.where(np.isinf(lo), -1e300, np.asarray(lo, float)).copy()
    hi = np.where(np.isinf(hi), 1e300, np.asarray(hi, float)).copy()
    x = np.zeros((B, n))
    w = np.zeros((B, n))
    status = np.zeros(B, dtype=np.int32)
    lib.egg_solve_box_lcp_batch(
        B, n, _dp(A), _dp(b), _dp(lo), _dp(hi), _dp(x), _dp(w),
        status.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
        max_iterations, tol,
    )
    return x, w, status.astype(bool)
