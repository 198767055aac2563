"""Every selection strategy (SURVEY.md section 0.4) runs end-to-end and
improves the bound on an instance with a real SDP gap."""

import pytest

from sdpcutsel_tpu.config import CutConfig, LPConfig, RunConfig, ScorerConfig
from sdpcutsel_tpu.instances import generate_spar
from sdpcutsel_tpu.loop import CutSolver

STRATEGIES = [
    "feasibility", "neural", "random", "combined", "optimality", "triangle",
]


@pytest.mark.parametrize("strategy", STRATEGIES)
def test_strategy_improves_bound(strategy):
    inst = generate_spar(12, 100, 3)
    cfg = RunConfig(
        lp=LPConfig(max_iters=6000, tol=1e-5),
        cuts=CutConfig(k=3, sel_size=10, capacity=128),
        scorer=ScorerConfig(strategy=strategy),
    )
    s = CutSolver(inst, cfg)
    hist = s.run(rounds=2)
    assert hist[0].cuts_added > 0
    bounds = [h.bound for h in hist]
    assert bounds[-1] < bounds[0] - 1e-4
    # certified bound sequence is monotone by construction
    assert all(b2 <= b1 + 1e-9 for b1, b2 in zip(bounds, bounds[1:]))


def test_unknown_strategy_raises():
    inst = generate_spar(10, 100, 1)
    cfg = RunConfig(scorer=ScorerConfig(strategy="nope"))
    with pytest.raises(ValueError, match="unknown strategy"):
        CutSolver(inst, cfg)
