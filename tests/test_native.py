"""Native C++ helpers vs pure-Python fallbacks (bit-identical outputs)."""

import numpy as np
import pytest

from sdpcutsel_tpu.native import (
    boxqp_parse_native, chordal_decompose_native, have_native,
)

pytestmark = pytest.mark.skipif(
    not have_native(), reason="native library unavailable (no compiler?)"
)


def test_chordal_native_matches_python():
    from sdpcutsel_tpu.qcqp.chordal import chordal_decomposition
    from sdpcutsel_tpu.instances.qcqp import generate_qcqp

    for n, d, seed in [(10, 30, 1), (20, 20, 2), (15, 60, 3)]:
        inst = generate_qcqp(n, d, 2, seed)
        edges = inst.sparsity_graph()
        py_cl, py_nfill = chordal_decomposition(n, edges, use_native=False)
        nat = chordal_decompose_native(n, edges)
        assert nat is not None
        nat_cl, nat_fill = nat
        assert nat_cl == py_cl
        assert nat_fill == py_nfill


def test_chordal_native_cycle():
    nat = chordal_decompose_native(4, [(0, 1), (1, 2), (2, 3), (0, 3)])
    cliques, nfill = nat
    assert nfill == 1
    assert sorted(len(c) for c in cliques) == [3, 3]


def test_boxqp_parse_native_roundtrip(tmp_path):
    from sdpcutsel_tpu.instances.boxqp import (
        generate_spar, parse_boxqp, write_boxqp,
    )

    inst = generate_spar(25, 50, 3)
    p = str(tmp_path / "x.in")
    write_boxqp(inst, p)
    out = boxqp_parse_native(p)
    assert out is not None
    Q, c = out
    np.testing.assert_allclose(Q, inst.Q)
    np.testing.assert_allclose(c, inst.c)
    # and through the public parser (native path)
    back = parse_boxqp(p)
    np.testing.assert_allclose(back.Q, inst.Q)
