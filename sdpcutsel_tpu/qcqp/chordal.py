"""Chordal decomposition of the QCQP sparsity graph (SURVEY.md section 0.7).

The reference used chompack/cvxopt (native C) for this one-time host-side
preprocessing; here it is a self-contained implementation:

  1. Maximum Cardinality Search (MCS) gives an elimination order (perfect if
     the graph is already chordal).
  2. Fill-in along that order yields a chordal extension.
  3. Maximal cliques of the chordal graph are read off the elimination
     process (v + higher neighbors, keeping only maximal sets).
  4. Candidate cut supports = all size-<=kmax subsets of the cliques,
     deduplicated, padded to a fixed-width int32 table for the device.

The optional C++ fast path (native/chordal.cpp via ctypes) accelerates MCS +
fill for large graphs; results are identical.
"""

from __future__ import annotations

import itertools

import numpy as np


def _mcs_order(n: int, adj: list[set]) -> list[int]:
    """Maximum cardinality search; returns elimination order (reversed MCS)."""
    weight = [0] * n
    visited = [False] * n
    order = []
    for _ in range(n):
        v = max((w, -i, i) for i, w in enumerate(weight) if not visited[i])[2]
        visited[v] = True
        order.append(v)
        for u in adj[v]:
            if not visited[u]:
                weight[u] += 1
    return order[::-1]  # eliminate in reverse MCS order


def chordal_decomposition(n: int, edges, use_native: bool = True):
    """edges: iterable of (i, j) pairs.  Returns (cliques, nfill) where
    cliques is a list of sorted tuples (maximal cliques of the chordal
    extension) and nfill the NUMBER of fill-in edges added — a count on both
    backends (the C++ fast path, native/chordal.cpp, does not export the
    edge list).  Callers needing the explicit edges use
    ``chordal_fill_edges`` (Python path only)."""
    edges = list(edges)
    if use_native:
        from ..native import chordal_decompose_native

        out = chordal_decompose_native(n, edges)
        if out is not None:
            return out
    cliques, fill = _chordal_python(n, edges)
    return cliques, len(fill)


def chordal_fill_edges(n: int, edges) -> list[tuple[int, int]]:
    """Explicit fill-in edge list of the chordal extension (Python path)."""
    _, fill = _chordal_python(n, list(edges))
    return fill


def _chordal_python(n: int, edges):
    adj = [set() for _ in range(n)]
    for i, j in edges:
        if i == j:
            continue
        adj[i].add(j)
        adj[j].add(i)

    order = _mcs_order(n, adj)
    pos = {v: idx for idx, v in enumerate(order)}

    fill = []
    work = [set(s) for s in adj]
    cliques = []
    for idx, v in enumerate(order):
        higher = {u for u in work[v] if pos[u] > idx}
        cliques.append(tuple(sorted([v] + list(higher))))
        # make higher neighbors a clique (fill-in)
        for a, b in itertools.combinations(sorted(higher), 2):
            if b not in work[a]:
                work[a].add(b)
                work[b].add(a)
                fill.append((a, b))

    # keep only maximal cliques
    cliques.sort(key=len, reverse=True)
    maximal = []
    seen: list[frozenset] = []
    for c in cliques:
        fs = frozenset(c)
        if not any(fs <= s for s in seen):
            maximal.append(tuple(sorted(c)))
            seen.append(fs)
    return maximal, fill


def clique_candidates(cliques, kmax: int, n: int | None = None) -> np.ndarray:
    """All distinct index subsets of size 2..kmax inside the cliques, padded
    to width kmax (pad repeats the last index, which zero-weights padded rows
    naturally in features since Q/X gathers become duplicated symmetric
    entries — cut generation handles duplicates because u u^T stays valid).

    Returns an int32 (C, kmax) table sorted lexicographically (deterministic
    across runs/shards).
    """
    subs = set()
    for c in cliques:
        for k in range(2, min(kmax, len(c)) + 1):
            for s in itertools.combinations(c, k):
                subs.add(s)
    rows = []
    for s in sorted(subs):
        row = list(s) + [s[-1]] * (kmax - len(s))
        rows.append(row)
    if not rows:
        return np.zeros((0, kmax), dtype=np.int32)
    return np.asarray(rows, dtype=np.int32)
