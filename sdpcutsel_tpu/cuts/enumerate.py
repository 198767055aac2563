"""Candidate subset enumeration: static index tables.

The reference enumerates all C(n,k) index subsets per round in Python loops
(SURVEY.md section 3.1).  Under XLA the candidate set must be a static array,
so we precompute the full combinations table once per (n, k) on host (numpy)
and keep it device-resident for every round; at n=125, k=3 this is a
(317750, 3) int32 table (~3.8 MB) — negligible HBM.

For the sparse/QCQP path the table is instead the union of clique subsets
(qcqp/chordal.py) padded to a common k.
"""

from __future__ import annotations

import functools
import math

import numpy as np


@functools.lru_cache(maxsize=64)
def combinations_table(n: int, k: int) -> np.ndarray:
    """All C(n, k) sorted index subsets as an (C, k) int32 array.

    Vectorized construction (no Python-level itertools loop): recursively
    builds T(n, k) by prefixing each first index i with T over the remaining
    suffix range.
    """
    if k == 1:
        return np.arange(n, dtype=np.int32)[:, None]
    blocks = []
    for i in range(n - k + 1):
        rest = combinations_table(n - i - 1, k - 1) + np.int32(i + 1)
        first = np.full((rest.shape[0], 1), i, dtype=np.int32)
        blocks.append(np.concatenate([first, rest], axis=1))
    return np.concatenate(blocks, axis=0)


def num_candidates(n: int, k: int) -> int:
    return math.comb(n, k)
