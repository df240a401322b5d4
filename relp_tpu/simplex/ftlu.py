"""ctypes bindings for the native Forrest–Tomlin LU engine (native/ftlu.cpp).

The reference maintains its basis inverse as a sparse ``PBQ = LU``
factorization with Markowitz pivoting and Forrest–Tomlin-style spike
updates (src/algorithm/two_phase/tableau/inverse_maintenance/carry/
lower_upper/mod.rs:35-391).  This module exposes the native C++
re-implementation of that design to the host simplex/crossover engines
(simplex/lu_host.py): ``ftran``/``btran`` solves plus a true FT column
update — numerically stable over thousands of degenerate pivots where
product-form etas compound error.

Built on demand with g++ (plain C ABI, no pybind11 in this image); callers
fall back to the SuperLU + product-form-eta engine when the build fails.
"""

from __future__ import annotations

import ctypes
import subprocess
import threading
from pathlib import Path
from typing import Optional

import numpy as np

_REPO = Path(__file__).resolve().parent.parent.parent
_SRC = _REPO / "native" / "ftlu.cpp"
_SO = _REPO / "native" / "_build" / "libftlu.so"

_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_lib_failed = False

_P_I32 = ctypes.POINTER(ctypes.c_int32)
_P_F64 = ctypes.POINTER(ctypes.c_double)


def _build() -> bool:
    _SO.parent.mkdir(parents=True, exist_ok=True)
    cmd = [
        "g++", "-O3", "-shared", "-fPIC", "-std=c++17",
        str(_SRC), "-o", str(_SO),
    ]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=180)
        return True
    except Exception:
        return False


def load() -> Optional[ctypes.CDLL]:
    """The shared library, built on first use; None when unavailable."""
    global _lib, _lib_failed
    with _lock:
        if _lib is not None or _lib_failed:
            return _lib
        if not _SRC.exists():
            _lib_failed = True
            return None
        if not _SO.exists() or _SO.stat().st_mtime < _SRC.stat().st_mtime:
            if not _build():
                _lib_failed = True
                return None
        try:
            lib = ctypes.CDLL(str(_SO))
        except OSError:
            _lib_failed = True
            return None
        lib.ftlu_create.restype = ctypes.c_void_p
        lib.ftlu_create.argtypes = [ctypes.c_int32, _P_I32, _P_I32, _P_F64]
        lib.ftlu_ok.restype = ctypes.c_int32
        lib.ftlu_ok.argtypes = [ctypes.c_void_p]
        lib.ftlu_ftran.argtypes = [ctypes.c_void_p, _P_F64]
        lib.ftlu_btran.argtypes = [ctypes.c_void_p, _P_F64]
        lib.ftlu_update.restype = ctypes.c_int32
        lib.ftlu_update.argtypes = [
            ctypes.c_void_p, ctypes.c_int32, ctypes.c_int32, _P_I32, _P_F64,
        ]
        lib.ftlu_nupdates.restype = ctypes.c_int32
        lib.ftlu_nupdates.argtypes = [ctypes.c_void_p]
        lib.ftlu_fill.restype = ctypes.c_int64
        lib.ftlu_fill.argtypes = [ctypes.c_void_p]
        lib.ftlu_free.argtypes = [ctypes.c_void_p]
        _lib = lib
        return _lib


class FtLU:
    """Sparse LU of an m×m CSC matrix with Forrest–Tomlin column updates.

    Same surface as lu_host's product-form engine (``ftran``/``btran``)
    plus :meth:`update`, which replaces basis column ``slot`` with a new
    matrix column and restores U's triangularity with one row eta.
    """

    def __init__(self, B_csc):
        lib = load()
        if lib is None:
            raise RuntimeError("native ftlu unavailable")
        B = B_csc.tocsc()
        B.sort_indices()
        m = B.shape[0]
        indptr = np.ascontiguousarray(B.indptr, np.int32)
        indices = np.ascontiguousarray(B.indices, np.int32)
        data = np.ascontiguousarray(B.data, np.float64)
        self._lib = lib
        self._m = m
        self._h = lib.ftlu_create(
            m,
            indptr.ctypes.data_as(_P_I32),
            indices.ctypes.data_as(_P_I32),
            data.ctypes.data_as(_P_F64),
        )
        if not lib.ftlu_ok(self._h):
            lib.ftlu_free(self._h)
            self._h = None
            raise RuntimeError("ftlu: singular basis matrix")
        self.unstable = False  # set when an update reports loss of accuracy

    def __del__(self):  # pragma: no cover - destructor timing
        h = getattr(self, "_h", None)
        if h is not None:
            self._lib.ftlu_free(h)
            self._h = None

    def ftran(self, v: np.ndarray) -> np.ndarray:
        w = np.ascontiguousarray(v, np.float64).copy()
        self._lib.ftlu_ftran(self._h, w.ctypes.data_as(_P_F64))
        return w

    def btran(self, v: np.ndarray) -> np.ndarray:
        w = np.ascontiguousarray(v, np.float64).copy()
        self._lib.ftlu_btran(self._h, w.ctypes.data_as(_P_F64))
        return w

    def update(self, slot: int, col_rows: np.ndarray, col_vals: np.ndarray) -> int:
        """Basis column ``slot`` := sparse column (rows, vals).

        Returns 0 on success, 1 when the update succeeded but accuracy is
        degraded (refactorize soon), -1 on a structurally bad column.
        """
        rows = np.ascontiguousarray(col_rows, np.int32)
        vals = np.ascontiguousarray(col_vals, np.float64)
        rc = self._lib.ftlu_update(
            self._h, int(slot), len(rows),
            rows.ctypes.data_as(_P_I32), vals.ctypes.data_as(_P_F64),
        )
        if rc == 1:
            self.unstable = True
        return int(rc)

    @property
    def nupdates(self) -> int:
        return int(self._lib.ftlu_nupdates(self._h))

    @property
    def fill(self) -> int:
        return int(self._lib.ftlu_fill(self._h))


def available() -> bool:
    return load() is not None
