"""Fast scatter-add: np.bincount-based replacement for np.add.at.

np.add.at is an order of magnitude slower than bincount for dense integer
targets; all engine counter accumulation goes through fast_add_at. Weights
go through float64 bincount, exact for counts below 2^53 (counter values
here are bounded by reads x readlen x small factors, far below that).
"""

import numpy as np


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
