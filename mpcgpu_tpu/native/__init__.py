"""Native (C++) runtime components.

``btd_ldl``: CPU block-tridiagonal LDL^T direct solver — the framework's
qdldl-equivalent host-side baseline (reference include/qdldl/sqp.cuh), exposed
through ctypes and built on demand with g++.
"""

from __future__ import annotations

import ctypes
import subprocess
from pathlib import Path

import numpy as np

_DIR = Path(__file__).resolve().parent
_SO = _DIR / "libbtd_ldl.so"
_SRC = _DIR / "btd_ldl.cpp"

_lib = None


def _build() -> None:
    subprocess.run(
        ["g++", "-O3", "-march=native", "-shared", "-fPIC", str(_SRC), "-o", str(_SO)],
        check=True,
    )


def _load():
    global _lib
    if _lib is not None:
        return _lib
    if not _SO.exists() or _SO.stat().st_mtime < _SRC.stat().st_mtime:
        _build()
    lib = ctypes.CDLL(str(_SO))
    lib.btd_ldl_solve.restype = ctypes.c_int
    lib.btd_ldl_solve.argtypes = [
        ctypes.c_int,
        ctypes.c_int,
        np.ctypeslib.ndpointer(np.float64, flags="C_CONTIGUOUS"),
        np.ctypeslib.ndpointer(np.float64, flags="C_CONTIGUOUS"),
        np.ctypeslib.ndpointer(np.float64, flags="C_CONTIGUOUS"),
        np.ctypeslib.ndpointer(np.float64, flags="C_CONTIGUOUS"),
    ]
    _lib = lib
    return lib


def btd_ldl_solve_cpu(S: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Solve S x = b on the CPU for a BTD matrix in (N, 3, n, n) layout.

    Mirrors the reference's host-side qdldl role (D2H values -> factor ->
    solve -> H2D, qdldl/sqp.cuh:268-273); used as a numerical cross-check of
    the on-device solvers.
    """
    S = np.asarray(S, np.float64)
    b = np.ascontiguousarray(np.asarray(b, np.float64))
    N, _, n, _ = S.shape
    theta = np.ascontiguousarray(S[:, 1])
    phi = np.ascontiguousarray(S[1:, 0]) if N > 1 else np.zeros((0, n, n))
    x = np.zeros((N, n), np.float64)
    rc = _load().btd_ldl_solve(n, N, theta, phi, b, x)
    if rc != 0:
        raise RuntimeError("btd_ldl_solve: singular diagonal block")
    return x
