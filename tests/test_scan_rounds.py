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


def test_qcqp_scan_matches_per_round():
    """QCQP scan mode (one dispatch, dense constraint rows inside the scan
    body) certifies the same bounds as the per-round loop."""
    from sdpcutsel_tpu.instances.qcqp import generate_qcqp
    from sdpcutsel_tpu.qcqp.solver import CutSolverQCQP

    inst = generate_qcqp(12, 30, 3, 1)
    cfg = RunConfig(
        lp=LPConfig(max_iters=3000, tol=1e-5),
        cuts=CutConfig(k=4, sel_size=8, capacity=256, purge=False),
        scorer=ScorerConfig(strategy="feasibility"),
        loop=LoopConfig(polish_iters=0),
    )
    cfg_scan = dataclasses.replace(cfg, loop=LoopConfig(use_scan=True,
                                                        polish_iters=0))
    h_loop = CutSolverQCQP(inst, cfg).run(rounds=4)
    h_scan = CutSolverQCQP(inst, cfg_scan).run(rounds=4)
    assert len(h_scan) == 4
    for a, b in zip(h_loop, h_scan):
        # rtol reflects f32 fusion-order noise: the dense constraint-row
        # einsum compiles differently standalone vs inside the scan body
        # (measured ~3e-5 relative); the certificates are independently
        # valid either way
        np.testing.assert_allclose(b.bound, a.bound, rtol=1e-4)
        assert b.cuts_added == a.cuts_added
        assert b.cuts_active == a.cuts_active
    bounds = [s.bound for s in h_scan]
    assert all(b2 <= b1 + 1e-9 for b1, b2 in zip(bounds, bounds[1:]))


def test_qcqp_scan_with_purge_and_neural():
    from sdpcutsel_tpu.instances.qcqp import generate_qcqp
    from sdpcutsel_tpu.qcqp.solver import CutSolverQCQP

    # seed 1: instance with actual violated clique candidates (seed 2's
    # relaxation is already candidate-tight — both paths add 0 cuts there)
    inst = generate_qcqp(12, 30, 3, 1)
    cfg = RunConfig(
        lp=LPConfig(max_iters=2000, tol=1e-5),
        cuts=CutConfig(k=4, sel_size=8, capacity=256, purge=True),
        scorer=ScorerConfig(strategy="neural"),
        loop=LoopConfig(use_scan=True, polish_iters=2000),
    )
    h = CutSolverQCQP(inst, cfg).run(rounds=3)
    assert len(h) == 3 and h[0].cuts_added > 0
    bounds = [s.bound for s in h]
    assert all(b2 <= b1 + 1e-9 for b1, b2 in zip(bounds, bounds[1:]))
