"""Prefix-sum helpers.

Historical note: this environment's page faults on fresh mmap regions are
~0.5-1 ms/page, which made every big numpy temporary (including cumsum
outputs) look catastrophically slow.  The real fix is the mallopt tuning in
``raywin/__init__`` (keep big allocations on the reusable brk heap); with
that in place numpy's native accumulate is fast, and these helpers are thin
wrappers kept as a single seam in case a platform needs polars/blocked
implementations again.
"""

from __future__ import annotations

import numpy as np


def cumsum1d(a: np.ndarray, dtype=None) -> np.ndarray:
    a = np.asarray(a)
    if a.dtype == bool:
        a = a.astype(np.int64 if dtype is None else dtype)
    elif dtype is not None and a.dtype != dtype:
        a = a.astype(dtype)
    return np.cumsum(a)


def cumsum_rows(m: np.ndarray) -> np.ndarray:
    """Per-row (axis=1) cumulative sum of a 2-D array."""
    return np.cumsum(m, axis=1)


def cumsum_cols(m: np.ndarray) -> np.ndarray:
    """Per-column (axis=0) cumulative sum of a 2-D array."""
    return np.cumsum(m, axis=0)
