"""Fast scatter-add: np.bincount-based replacement for np.add.at.

np.add.at is an order of magnitude slower than bincount for dense integer
targets; all engine counter accumulation goes through fast_add_at. Weights
go through float64 bincount, exact for counts below 2^53 (counter values
here are bounded by reads x readlen x small factors, far below that).
"""

import ctypes

import numpy as np

_NATIVE = None
_NATIVE_TRIED = False


def _native():
    global _NATIVE, _NATIVE_TRIED
    if not _NATIVE_TRIED:
        _NATIVE_TRIED = True
        from . import native_rowpile
        lib = native_rowpile._load()
        if lib is not None and hasattr(lib, "scatter_add_i64"):
            lib.scatter_add_i64.restype = None
            lib.scatter_add1_i64.restype = None
            _NATIVE = lib
    return _NATIVE


def fast_add_at(arr, idx, val=1):
    """arr[idx] += val with np.add.at semantics (duplicate indices sum)."""
    if isinstance(idx, tuple):
        if len(idx) == 1:
            flat = np.asarray(idx[0])
        else:
            flat = np.ravel_multi_index(tuple(np.asarray(i) for i in idx),
                                        arr.shape)
    else:
        flat = np.asarray(idx)
    n = arr.size
    lib = _native()
    val_is_int = (np.isscalar(val) and float(val) == int(val)) or (
        not np.isscalar(val) and np.asarray(val).dtype.kind in "biu")
    if (lib is not None and arr.dtype == np.int64
            and arr.flags.c_contiguous and val_is_int):
        out_p = arr.ctypes.data_as(ctypes.c_void_p)
        flat64 = np.ascontiguousarray(flat, dtype=np.int64)
        if np.isscalar(val):
            lib.scatter_add1_i64(out_p,
                                 flat64.ctypes.data_as(ctypes.c_void_p),
                                 ctypes.c_int64(len(flat64)),
                                 ctypes.c_int64(int(val)))
        else:
            v = np.asarray(val)
            if v.dtype == bool:
                v = v.astype(np.int64)
            v64 = np.ascontiguousarray(np.broadcast_to(v, flat64.shape),
                                       dtype=np.int64)
            lib.scatter_add_i64(out_p,
                                flat64.ctypes.data_as(ctypes.c_void_p),
                                v64.ctypes.data_as(ctypes.c_void_p),
                                ctypes.c_int64(len(flat64)))
        return
    if np.isscalar(val):
        cnt = np.bincount(flat, minlength=n)
        if val != 1:
            cnt = cnt * val
        arr += cnt.reshape(arr.shape).astype(arr.dtype, copy=False)
    else:
        val = np.asarray(val)
        if val.dtype == bool:
            val = val.astype(np.int64)
        w = np.bincount(flat, weights=val.astype(np.float64), minlength=n)
        arr += w.reshape(arr.shape).astype(arr.dtype)
