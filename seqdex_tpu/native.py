"""ctypes loader for the native scene-builder (`native/scene_builder.cpp`).

Builds lazily with `make -C native` on first use when a compiler is present;
every entry point has a numpy fallback, so the package works without the
shared library (and the fallback doubles as the reference implementation in
tests).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional

import numpy as np

_LIB: Optional[ctypes.CDLL] = None
_TRIED = False

_NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "native")
_SO = os.path.join(_NATIVE_DIR, "libscene_builder.so")


def _load() -> Optional[ctypes.CDLL]:
    global _LIB, _TRIED
    if _LIB is not None or _TRIED:
        return _LIB
    _TRIED = True
    if not os.path.exists(_SO):
        try:
            subprocess.run(
                ["make", "-C", _NATIVE_DIR],
                check=True, capture_output=True, timeout=120,
            )
        except Exception:
            return None
    try:
        lib = ctypes.CDLL(_SO)
    except OSError:
        return None
    lib.build_pair_mask.restype = None
    lib.build_pair_mask.argtypes = [ctypes.c_int64, ctypes.c_int64] + [
        ctypes.POINTER(ctypes.c_int32)
    ] * 8 + [ctypes.POINTER(ctypes.c_uint8)]
    lib.stl_bounds.restype = ctypes.c_int32
    lib.stl_bounds.argtypes = [
        ctypes.c_char_p,
        ctypes.POINTER(ctypes.c_double),
        ctypes.POINTER(ctypes.c_double),
    ]
    _LIB = lib
    return _LIB


def _i32p(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_int32))


def build_pair_mask(
    pt_entry, pt_owner_kind, pt_owner, pt_group,
    col_entry, col_owner_kind, col_owner, col_group,
) -> np.ndarray:
    """(P, C) bool pair mask; native when available, vectorized numpy else."""
    P, C = len(pt_entry), len(col_entry)
    args = [
        np.ascontiguousarray(np.asarray(a, dtype=np.int32))
        for a in (pt_entry, pt_owner_kind, pt_owner, pt_group,
                  col_entry, col_owner_kind, col_owner, col_group)
    ]
    lib = _load()
    if lib is not None and P * C > 0:
        out = np.empty((P, C), dtype=np.uint8)
        lib.build_pair_mask(
            P, C, *[_i32p(a) for a in args],
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        )
        return out.astype(bool)
    # numpy fallback (vectorized)
    pe, pk, po, pg, ce, ck, co, cg = args
    same_entry = pe[:, None] == ce[None, :]
    same_owner = (pk[:, None] == ck[None, :]) & (po[:, None] == co[None, :])
    same_group = (pg[:, None] >= 0) & (cg[None, :] >= 0) & (pg[:, None] == cg[None, :])
    return ~(same_entry | same_owner | same_group)


def stl_bounds(path: str):
    """(half, center) of a binary STL, or None."""
    lib = _load()
    if lib is None:
        return None
    half = np.zeros(3)
    center = np.zeros(3)
    rc = lib.stl_bounds(
        path.encode(),
        half.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        center.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
    )
    if rc != 0:
        return None
    return half, center
