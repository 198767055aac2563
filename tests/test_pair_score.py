"""Pair-structured dense-k3 scoring (ops/pair_score.py) vs the generic
reference paths: identical score VALUES per triple, only the candidate order
differs (slot (p, l) vs lexicographic)."""

import jax.numpy as jnp
import numpy as np
import pytest

from sdpcutsel_tpu.cuts.enumerate import combinations_table
from sdpcutsel_tpu.instances.boxqp import generate_spar
from sdpcutsel_tpu.models.features import candidate_features, candidate_q_features
from sdpcutsel_tpu.models.scorer import MLPScorer, load_params
from sdpcutsel_tpu.ops.fused_score import mlp_params_for_kernel
from sdpcutsel_tpu.ops.jacobi import min_eig_from_parts
from sdpcutsel_tpu.ops.pair_score import (
    build_pair_layout, pair_consts_static, pair_score_fused, pair_score_jnp,
)


def _setup(n=23, seed=3):
    inst = generate_spar(n, 75, seed)
    Q = jnp.asarray(inst.Q, jnp.float32)
    rng = np.random.default_rng(seed)
    x = jnp.asarray(rng.random(n), jnp.float32)
    X = np.clip(np.outer(x, x) + 0.15 * rng.standard_normal((n, n)), 0, 1)
    X = jnp.asarray(0.5 * (X + X.T), jnp.float32)
    params, _ = load_params(3, (64, 64))
    W = [jnp.asarray(a) for a in mlp_params_for_kernel(params)]
    pi, pj, table_pl, valid = build_pair_layout(n)
    consts = pair_consts_static(Q, pi, pj)
    return inst, Q, x, X, params, W, table_pl, valid, consts


def _reference_scores(Q, x, X, triples, params, sweeps=5):
    """Reference nn/feas per triple via models/features + ops/jacobi."""
    triples = jnp.asarray(triples)
    triQ, scale = candidate_q_features(Q, triples)
    feats = candidate_features(triQ, x, X, triples)
    model = MLPScorer(hidden=(64, 64))
    nn = scale * jnp.maximum(model.apply(params, feats), 0.0)
    xr = x[triples]
    Xr = X[triples[:, :, None], triples[:, None, :]]
    feas = -min_eig_from_parts(xr, Xr, sweeps=sweeps)
    return np.asarray(nn), np.asarray(feas)


def test_layout_table_covers_all_triples():
    n = 17
    pi, pj, table, valid = build_pair_layout(n)
    got = {tuple(t) for t in np.asarray(table)[np.asarray(valid)]}
    want = {tuple(t) for t in combinations_table(n, 3).tolist()}
    assert got == want
    # every valid slot is a strictly increasing triple
    v = np.asarray(table)[np.asarray(valid)]
    assert (v[:, 0] < v[:, 1]).all() and (v[:, 1] < v[:, 2]).all()


def test_pair_score_jnp_matches_reference():
    inst, Q, x, X, params, W, table_pl, valid, consts = _setup()
    nn, feas = pair_score_jnp(x, X, consts, *W, sweeps=5)
    nn = np.asarray(nn)[valid]
    feas = np.asarray(feas)[valid]
    triples = table_pl[valid]
    nn_ref, feas_ref = _reference_scores(Q, x, X, triples, params)
    np.testing.assert_allclose(feas, feas_ref, atol=5e-5)
    np.testing.assert_allclose(nn, nn_ref, rtol=2e-4, atol=2e-4)


def test_pair_score_fused_matches_jnp():
    inst, Q, x, X, params, W, table_pl, valid, consts = _setup(n=19, seed=7)
    nn_j, feas_j = pair_score_jnp(x, X, consts, *W, sweeps=5)
    nn_f, feas_f = pair_score_fused(x, X, consts, *W, pairs_block=32,
                                    sweeps=5, interpret=True)
    v = np.asarray(valid)
    np.testing.assert_allclose(np.asarray(nn_f)[v], np.asarray(nn_j)[v],
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(feas_f)[v], np.asarray(feas_j)[v],
                               atol=1e-6)


def test_invalid_slots_are_finite():
    # padded slots must produce finite garbage (masked downstream), not NaN
    _, _, x, X, _, W, _, valid, consts = _setup(n=11, seed=1)
    nn, feas = pair_score_jnp(x, X, consts, *W)
    assert np.isfinite(np.asarray(nn)).all()
    assert np.isfinite(np.asarray(feas)).all()


@pytest.mark.parametrize("strategy", ["neural", "feasibility"])
def test_solver_pair_path_end_to_end(strategy):
    """CutSolver with the pair layout forced on (jnp path on CPU) closes the
    same gap as the generic table path — selection keys on score values,
    which are identical across the two candidate orders."""
    import dataclasses

    from sdpcutsel_tpu.config import (
        CutConfig, LPConfig, RunConfig, ScorerConfig,
    )
    from sdpcutsel_tpu.loop.solver import CutSolver

    inst = generate_spar(14, 100, 3)
    base = RunConfig(
        lp=LPConfig(max_iters=6000, tol=1e-5),
        cuts=CutConfig(k=3, sel_size=10, capacity=256, pair_layout="off"),
        scorer=ScorerConfig(strategy=strategy),
    )
    on = dataclasses.replace(
        base, cuts=dataclasses.replace(base.cuts, pair_layout="on"))

    h_off = CutSolver(inst, base).run(rounds=3)
    h_on = CutSolver(inst, on).run(rounds=3)
    assert h_on[0].cuts_added > 0
    # round-0 bound precedes any selection: must agree tightly
    np.testing.assert_allclose(h_on[0].bound, h_off[0].bound, rtol=1e-6)
    # later rounds may differ by tie-order only
    rel = abs(h_on[-1].bound - h_off[-1].bound) / (1 + abs(h_off[-1].bound))
    assert rel < 0.02, (h_on[-1].bound, h_off[-1].bound)
    bounds = [s.bound for s in h_on]
    assert all(b2 <= b1 + 1e-9 for b1, b2 in zip(bounds, bounds[1:]))
