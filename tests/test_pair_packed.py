"""Tiered packed pair layout (ops/pair_packed.py): per-triple score
equivalence with the unpacked pair path, plus layout accounting."""

import numpy as np
import pytest

from sdpcutsel_tpu.ops.pair_packed import (
    build_packed_pair_layout, packed_consts_static, packed_score,
)
from sdpcutsel_tpu.ops.pair_score import (
    build_pair_layout, pair_consts_static, pair_score_jnp,
)


def _rand_problem(n, seed=0):
    import jax.numpy as jnp

    rng = np.random.default_rng(seed)
    Q = rng.standard_normal((n, n))
    Q = 0.5 * (Q + Q.T)
    x = rng.random(n)
    X = np.clip(np.outer(x, x) + 0.2 * rng.standard_normal((n, n)), 0, 1)
    X = 0.5 * (X + X.T)
    Ws = [rng.standard_normal(s) * 0.3 for s in
          ((15, 64), (64,), (64, 64), (64,), (64, 1), (1,))]
    return (jnp.asarray(Q, jnp.float32), jnp.asarray(x, jnp.float32),
            jnp.asarray(X, jnp.float32), [jnp.asarray(w, jnp.float32)
                                          for w in Ws])


def test_packed_layout_accounting():
    n = 125
    lay = build_packed_pair_layout(n)
    valid = lay["valid"]
    # every real triple appears exactly once among valid slots
    tab = lay["table"][valid]
    trips = {tuple(t) for t in tab}
    want = n * (n - 1) * (n - 2) // 6
    assert len(tab) == want and len(trips) == want
    # and the packing beats the plain pair layout's slot count by >= 1.9x
    _, _, _, pvalid = build_pair_layout(n)
    assert pvalid.shape[0] / valid.shape[0] >= 1.9


@pytest.mark.parametrize("n", [70, 125])
def test_packed_matches_pair_path(n):
    Q, x, X, Ws = _rand_problem(n)
    lay = build_packed_pair_layout(n)
    consts = packed_consts_static(Q, lay)
    nn_p, feas_p = packed_score(x, X, consts, *Ws, use_kernel=False)
    nn_p, feas_p = np.asarray(nn_p), np.asarray(feas_p)

    pi, pj, table, valid = build_pair_layout(n)
    pc = pair_consts_static(Q, pi, pj)
    nn_r, feas_r = pair_score_jnp(x, X, pc, *Ws)
    nn_r, feas_r = np.asarray(nn_r), np.asarray(feas_r)

    ref = {}
    for s in np.nonzero(valid)[0]:
        ref[tuple(table[s])] = (nn_r[s], feas_r[s])
    got_v = np.nonzero(lay["valid"])[0]
    assert len(got_v) == len(ref)
    errs_nn, errs_f = [], []
    for s in got_v:
        key = tuple(lay["table"][s])
        rn, rf = ref[key]
        errs_nn.append(abs(nn_p[s] - rn))
        errs_f.append(abs(feas_p[s] - rf))
    assert max(errs_f) < 2e-5, max(errs_f)
    assert max(errs_nn) < 2e-4, max(errs_nn)


def test_solver_packed_layout_matches_pair():
    """CutSolver with pair_layout="packed" closes the same bound sequence
    as the pair layout (same candidates, same scores — only slot order and
    padding differ; selection is score-driven with deterministic ties)."""
    import jax.numpy as jnp

    from sdpcutsel_tpu.config import (
        CutConfig, LPConfig, RunConfig, ScorerConfig,
    )
    from sdpcutsel_tpu.instances import generate_spar
    from sdpcutsel_tpu.loop import CutSolver

    inst = generate_spar(70, 100, 1)

    def run(mode):
        cfg = RunConfig(
            lp=LPConfig(max_iters=3000, tol=2e-6),
            cuts=CutConfig(k=3, sel_size=10, capacity=256,
                           pair_layout=mode),
            scorer=ScorerConfig(strategy="feasibility"),
        )
        s = CutSolver(inst, cfg)
        s.run(rounds=2)
        return np.asarray([h.bound for h in s.history])

    b_pair = run("on")
    b_packed = run("packed")
    np.testing.assert_allclose(b_packed, b_pair, rtol=2e-3, atol=2e-3)
