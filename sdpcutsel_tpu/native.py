"""ctypes bindings for the native C++ helpers (native/*.cpp).

Host-side runtime components implemented in C++ (the reference's equivalents
were third-party native code — chompack for chordal decomposition, CPLEX's
file readers for IO; SURVEY.md section 2.1):

  * chordal_decompose — MCS + fill-in + maximal cliques (bit-identical to
    the pure-Python fallback in qcqp/chordal.py).
  * boxqp_parse — fast BoxQP .in reader for the suite data loader.

The shared library is built with `make -C native` (g++); all callers fall
back to pure Python transparently when it is absent, so the package never
hard-requires a compiler.
"""

from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_LIB_PATH = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "native", "libsdpcutsel_native.so",
)
_lib = None
_tried = False


def _load(build_if_missing: bool = True):
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    if not os.path.exists(_LIB_PATH) and build_if_missing:
        try:
            subprocess.run(
                ["make", "-C", os.path.dirname(_LIB_PATH)],
                check=True, capture_output=True, timeout=120,
            )
        except Exception:
            return None
    try:
        lib = ctypes.CDLL(_LIB_PATH)
    except OSError:
        return None
    lib.chordal_decompose.restype = ctypes.c_int
    lib.chordal_decompose.argtypes = [
        ctypes.c_int, ctypes.c_int,
        np.ctypeslib.ndpointer(np.int32, flags="C"),
        np.ctypeslib.ndpointer(np.int32, flags="C"),
        np.ctypeslib.ndpointer(np.int32, flags="C"), ctypes.c_int,
        np.ctypeslib.ndpointer(np.int32, flags="C"),
        ctypes.POINTER(ctypes.c_int),
    ]
    lib.boxqp_parse.restype = ctypes.c_int
    lib.boxqp_parse.argtypes = [
        ctypes.c_char_p,
        np.ctypeslib.ndpointer(np.float64, flags="C"),
        np.ctypeslib.ndpointer(np.float64, flags="C"),
        ctypes.c_int,
    ]
    _lib = lib
    return _lib


def have_native() -> bool:
    return _load() is not None


def chordal_decompose_native(n: int, edges):
    """Returns (cliques list[tuple], nfill) or None if the library is absent."""
    lib = _load()
    if lib is None:
        return None
    edges = list(edges)
    ei = np.asarray([e[0] for e in edges], np.int32)
    ej = np.asarray([e[1] for e in edges], np.int32)
    if ei.size == 0:
        ei = np.zeros(0, np.int32)
        ej = np.zeros(0, np.int32)
    cap = max(n * n, 16)
    data = np.zeros(cap, np.int32)
    off = np.zeros(n + 2, np.int32)
    nfill = ctypes.c_int(0)
    k = lib.chordal_decompose(n, len(edges), ei, ej, data, cap, off,
                              ctypes.byref(nfill))
    if k < 0:
        return None
    cliques = [tuple(int(v) for v in data[off[i]:off[i + 1]]) for i in range(k)]
    return cliques, int(nfill.value)


def boxqp_parse_native(path: str, nmax: int = 1024):
    """Returns (Q (n,n), c (n,)) float64 or None if the library is absent."""
    lib = _load()
    if lib is None:
        return None
    c = np.zeros(nmax, np.float64)
    Q = np.zeros(nmax * nmax, np.float64)
    n = lib.boxqp_parse(path.encode(), c, Q, nmax)
    if n < 0:
        raise IOError(f"native boxqp_parse failed ({n}) for {path}")
    return Q[: n * n].reshape(n, n), c[:n]
