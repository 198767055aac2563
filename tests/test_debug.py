"""Debug mode + profiler harness (SURVEY.md sections 5.1, 5.2)."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sdpcutsel_tpu.config import (
    CutConfig, LPConfig, RunConfig, ScorerConfig,
)
from sdpcutsel_tpu.instances import generate_spar
from sdpcutsel_tpu.loop import CutSolver


def test_debug_mode_clean_run():
    """With debug=True a healthy solve passes all chex round asserts (and
    jax NaN-checking stays silent)."""
    inst = generate_spar(10, 100, 1)
    cfg = RunConfig(
        lp=LPConfig(max_iters=2000, tol=1e-5),
        cuts=CutConfig(k=3, sel_size=4, capacity=64),
        scorer=ScorerConfig(strategy="feasibility"),
        debug=True,
    )
    try:
        solver = CutSolver(inst, cfg)
        hist = solver.run(rounds=2)
        assert len(hist) == 2
    finally:
        jax.config.update("jax_debug_nans", False)


def test_check_round_state_catches_nan():
    from sdpcutsel_tpu.relax.cutbuffer import empty_pool
    from sdpcutsel_tpu.utils.debug import check_round_state

    n = 6
    x = jnp.zeros((n,))
    X = jnp.zeros((n, n))
    pool = empty_pool(8, 3)
    check_round_state(x, X, pool, 1.0)  # clean state passes

    with pytest.raises(AssertionError):
        check_round_state(x.at[0].set(jnp.nan), X, pool, 1.0)
    with pytest.raises(AssertionError):
        check_round_state(x, X, pool, float("nan"))


def test_trace_emits_profile(tmp_path):
    """utils.profiling.trace produces an XProf/Perfetto dump directory."""
    from sdpcutsel_tpu.utils.profiling import trace

    logdir = str(tmp_path / "trace")
    with trace(logdir):
        jax.block_until_ready(jax.jit(lambda a: a @ a)(jnp.ones((64, 64))))
    files = [os.path.join(r, f) for r, _, fs in os.walk(logdir) for f in fs]
    assert files, "no trace files written"

    # no-op path: nothing written, no error
    with trace(None):
        pass


def test_cli_debug_and_trace_flags(tmp_path):
    """CLI smoke: solve with --debug --trace produces a result record and a
    trace dump (uses the generated-data dir so nothing touches data/)."""
    from sdpcutsel_tpu.cli import main

    logdir = str(tmp_path / "tr")
    try:
        rc = main([
            "solve", "spar010-100-2", "--data-dir", str(tmp_path / "d"),
            "--strategy", "feasibility", "--rounds", "2",
            "--lp-max-iters", "1500", "--sel-size", "4", "--cpu",
            "--debug", "--trace", logdir,
            "--set", "cuts.capacity=64",
        ])
    finally:
        jax.config.update("jax_debug_nans", False)
    assert rc == 0
    files = [os.path.join(r, f) for r, _, fs in os.walk(logdir) for f in fs]
    assert files, "no trace files written by --trace"
