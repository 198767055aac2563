import numpy as np
import pytest

from sdpcutsel_tpu.instances.qcqp import generate_qcqp, load_or_generate_qcqp
from sdpcutsel_tpu.qcqp.chordal import (
    chordal_decomposition, chordal_fill_edges, clique_candidates, _mcs_order,
)


def test_generate_qcqp_deterministic():
    a = generate_qcqp(15, 30, 3, 1)
    b = load_or_generate_qcqp("qcqp015-30-3-1")
    np.testing.assert_array_equal(a.Q0, b.Q0)
    assert a.m == 3
    # constraints feasible at x0=0.25
    x0 = np.full(15, 0.25)
    for Qi, ci, bi in zip(a.Qs, a.cs, a.bs):
        assert 0.5 * x0 @ Qi @ x0 + ci @ x0 <= bi


def test_chordal_on_cycle():
    # 4-cycle needs one fill edge; cliques become two triangles
    edges = [(0, 1), (1, 2), (2, 3), (0, 3)]
    cliques, nfill = chordal_decomposition(4, edges)
    assert nfill == 1
    # explicit fill edge list (Python path) agrees with the count
    assert len(chordal_fill_edges(4, edges)) == 1
    assert all(len(c) == 3 for c in cliques)
    assert len(cliques) == 2
    # union of cliques covers all original edges
    cov = set()
    for c in cliques:
        for i in c:
            for j in c:
                if i < j:
                    cov.add((i, j))
    assert set(edges) <= cov


def test_chordal_on_complete_graph():
    n = 5
    edges = [(i, j) for i in range(n) for j in range(i + 1, n)]
    cliques, nfill = chordal_decomposition(n, edges)
    assert nfill == 0
    assert cliques == [tuple(range(n))]


def test_chordal_on_tree():
    # trees are chordal; maximal cliques are the edges
    edges = [(0, 1), (1, 2), (1, 3), (3, 4)]
    cliques, nfill = chordal_decomposition(5, edges)
    assert nfill == 0
    assert sorted(cliques) == sorted([(0, 1), (1, 2), (1, 3), (3, 4)])


def test_clique_candidates_padding():
    cands = clique_candidates([(0, 1, 2), (2, 3)], kmax=3)
    # subsets: from (0,1,2): 3 pairs + 1 triple; from (2,3): 1 pair -> 5
    assert cands.shape == (5, 3)
    rows = {tuple(r) for r in cands.tolist()}
    assert (2, 3, 3) in rows       # padded pair
    assert (0, 1, 2) in rows


def test_qcqp_sparsity_graph():
    inst = generate_qcqp(10, 20, 2, 1)
    edges = inst.sparsity_graph()
    assert all(i < j for i, j in edges)
    cliques, _ = chordal_decomposition(inst.n, edges)
    cands = clique_candidates(cliques, kmax=4)
    assert cands.shape[0] > 0
    assert cands.max() < inst.n
