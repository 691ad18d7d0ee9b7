"""Native (C++) host-side runtime components.

The reference's native layer is all third-party (ATen, the ODE C library,
SDL — SURVEY.md §2.2).  Here the device compute path is XLA/Pallas; this
package holds the first-party C++ pieces for the host side of the runtime,
compiled on demand with the system toolchain and bound via ctypes (no
pybind11 in the environment):

* ``sap_pairs`` — sweep-and-prune broadphase (replaces ODE's hash space
  for the eager/OO path and scene-build pair pruning).

Everything degrades gracefully: if no C++ toolchain is available the pure
NumPy fallbacks are used automatically (``NATIVE_AVAILABLE`` reports which
path is active).
"""
from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_SRC = os.path.join(os.path.dirname(__file__), "..", "..", "csrc",
                    "broadphase.cpp")


def _lib_cache_path():
    """Per-user 0700 cache dir for the compiled .so.  A fixed path in the
    world-writable temp dir would let another local user pre-plant a
    malicious library (ADVICE r1, medium)."""
    base = os.environ.get("XDG_CACHE_HOME",
                          os.path.join(os.path.expanduser("~"), ".cache"))
    d = os.path.join(base, "lcp_physics_tpu")
    os.makedirs(d, mode=0o700, exist_ok=True)
    try:
        st = os.stat(d)
        if st.st_uid != os.getuid() or (st.st_mode & 0o022):
            raise PermissionError(
                f"refusing to use cache dir {d}: not owned by the current "
                "user or writable by others")
    except AttributeError:  # non-POSIX: skip ownership check
        pass
    return os.path.join(d, "broadphase.so")


_LIB_CACHE = None  # resolved lazily in _build_and_load

_lib = None
NATIVE_AVAILABLE = False


def _build_and_load():
    global _lib, NATIVE_AVAILABLE, _LIB_CACHE
    if _lib is not None:
        return _lib
    src = os.path.abspath(_SRC)
    if not os.path.exists(src):
        return None
    try:
        if _LIB_CACHE is None:
            _LIB_CACHE = _lib_cache_path()
        if (not os.path.exists(_LIB_CACHE)
                or os.path.getmtime(_LIB_CACHE) < os.path.getmtime(src)):
            subprocess.run(
                ["g++", "-O3", "-shared", "-fPIC", "-std=c++17",
                 src, "-o", _LIB_CACHE],
                check=True, capture_output=True)
        lib = ctypes.CDLL(_LIB_CACHE)
        lib.sap_pairs.restype = ctypes.c_int64
        lib.sap_pairs.argtypes = [
            ctypes.POINTER(ctypes.c_float), ctypes.c_int64,
            ctypes.POINTER(ctypes.c_uint8),
            ctypes.POINTER(ctypes.c_int32), ctypes.c_int64]
        _lib = lib
        NATIVE_AVAILABLE = True
    except Exception:
        _lib = None
    return _lib


def sap_pairs(aabbs, mask=None, cap=None):
    """Overlapping AABB pairs via native sweep-and-prune.

    aabbs: (N, 4) float array [minx, miny, maxx, maxy].
    mask: optional (N,) bool of active bodies.
    Returns an (K, 2) int32 array of pairs with i < j.
    """
    aabbs = np.ascontiguousarray(np.asarray(aabbs, np.float32))
    n = aabbs.shape[0]
    if cap is None:
        cap = max(4 * n, 64)
    lib = _build_and_load()
    if lib is None:
        return _sap_pairs_numpy(aabbs, mask)
    mask_arr = None
    mask_ptr = ctypes.POINTER(ctypes.c_uint8)()
    if mask is not None:
        mask_arr = np.ascontiguousarray(np.asarray(mask, np.uint8))
        mask_ptr = mask_arr.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8))
    out = np.empty((cap, 2), np.int32)
    count = lib.sap_pairs(
        aabbs.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), n, mask_ptr,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)), cap)
    if count > cap:  # retry with exact capacity
        out = np.empty((count, 2), np.int32)
        count = lib.sap_pairs(
            aabbs.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), n,
            mask_ptr, out.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            count)
    pairs = out[:count]
    # canonical ordering for deterministic output
    return pairs[np.lexsort((pairs[:, 1], pairs[:, 0]))]


def _sap_pairs_numpy(aabbs, mask=None):
    """Pure NumPy all-pairs fallback (same output contract)."""
    n = aabbs.shape[0]
    iu, ju = np.triu_indices(n, k=1)
    lo_i, hi_i = aabbs[iu, :2], aabbs[iu, 2:]
    lo_j, hi_j = aabbs[ju, :2], aabbs[ju, 2:]
    ok = np.all((lo_i <= hi_j) & (lo_j <= hi_i), axis=-1)
    if mask is not None:
        mask = np.asarray(mask, bool)
        ok &= mask[iu] & mask[ju]
    return np.stack([iu[ok], ju[ok]], axis=-1).astype(np.int32)
