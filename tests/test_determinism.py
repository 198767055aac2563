"""Determinism under fixed seeds (SURVEY.md section 4 property tests)."""

import numpy as np

from sdpcutsel_tpu.config import CutConfig, LPConfig, RunConfig, ScorerConfig
from sdpcutsel_tpu.instances import generate_spar
from sdpcutsel_tpu.loop import CutSolver


def _run(strategy, seed):
    inst = generate_spar(12, 100, 3)
    cfg = RunConfig(
        lp=LPConfig(max_iters=6000, tol=2e-6),
        cuts=CutConfig(k=3, sel_size=8, capacity=128),
        scorer=ScorerConfig(strategy=strategy),
        seed=seed,
    )
    s = CutSolver(inst, cfg)
    s.run(rounds=3)
    return np.asarray([h.bound for h in s.history]), np.asarray(s.pool.idx)


def test_same_seed_identical():
    b1, idx1 = _run("random", seed=7)
    b2, idx2 = _run("random", seed=7)
    np.testing.assert_array_equal(b1, b2)
    np.testing.assert_array_equal(idx1, idx2)


def test_deterministic_strategy_ignores_seed():
    b1, idx1 = _run("feasibility", seed=1)
    b2, idx2 = _run("feasibility", seed=2)
    np.testing.assert_array_equal(b1, b2)
    np.testing.assert_array_equal(idx1, idx2)
