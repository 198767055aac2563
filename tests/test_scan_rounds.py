"""run_scan (all rounds in one dispatch) vs the per-round loop: same
certified bounds, same cut counts — only the dispatch structure differs."""

import dataclasses

import numpy as np

from sdpcutsel_tpu.config import CutConfig, LPConfig, LoopConfig, RunConfig, ScorerConfig
from sdpcutsel_tpu.instances.boxqp import generate_spar
from sdpcutsel_tpu.loop.solver import CutSolver


def _cfg(**loop_kw):
    return RunConfig(
        lp=LPConfig(max_iters=4000, tol=1e-5),
        cuts=CutConfig(k=3, sel_size=10, capacity=256),
        scorer=ScorerConfig(strategy="feasibility"),
        loop=LoopConfig(**loop_kw),
    )


def test_scan_matches_per_round():
    inst = generate_spar(12, 100, 3)
    h_loop = CutSolver(inst, _cfg()).run(rounds=4)
    h_scan = CutSolver(inst, _cfg(use_scan=True)).run(rounds=4)
    assert len(h_scan) == 4
    for a, b in zip(h_loop, h_scan):
        np.testing.assert_allclose(b.bound, a.bound, rtol=1e-6, atol=1e-6)
        assert b.cuts_added == a.cuts_added
        assert b.cuts_active == a.cuts_active
    bounds = [s.bound for s in h_scan]
    assert all(b2 <= b1 + 1e-9 for b1, b2 in zip(bounds, bounds[1:]))


def test_scan_with_steer_and_neural():
    inst = generate_spar(12, 100, 3)
    cfg = dataclasses.replace(
        _cfg(use_scan=True, steer_eps=1e-3, steer_iters=50),
        scorer=ScorerConfig(strategy="neural"),
    )
    h = CutSolver(inst, cfg).run(rounds=3)
    assert len(h) == 3 and h[0].cuts_added > 0
    bounds = [s.bound for s in h]
    assert all(b2 <= b1 + 1e-9 for b1, b2 in zip(bounds, bounds[1:]))
