"""Pallas fused scoring kernel vs the reference jnp path (interpret mode)."""

import jax
import jax.numpy as jnp
import numpy as np

from sdpcutsel_tpu.config import ScorerConfig
from sdpcutsel_tpu.cuts.eigen import feasibility_scores_from_point
from sdpcutsel_tpu.cuts.enumerate import combinations_table
from sdpcutsel_tpu.models.features import candidate_features, candidate_q_features
from sdpcutsel_tpu.models.scorer import MLPScorer, load_params
from sdpcutsel_tpu.ops.fused_score import (
    fused_score, fused_score_k3, mlp_params_for_kernel,
)
from sdpcutsel_tpu.parallel.sharding import pad_table


def test_fused_score_matches_jnp_path():
    n, k, block = 16, 3, 1024
    rng = np.random.default_rng(0)
    Q = jnp.asarray(rng.standard_normal((n, n)).astype(np.float32))
    Q = 0.5 * (Q + Q.T)
    x = jnp.asarray(rng.random(n), jnp.float32)
    X = jnp.asarray(
        np.clip(np.outer(x, x) + 0.3 * rng.standard_normal((n, n)), 0, 1),
        jnp.float32,
    )
    X = 0.5 * (X + X.T)

    tbl_np = combinations_table(n, k)          # (560, 3)
    tbl_pad, valid = pad_table(tbl_np, block)  # pad 560 -> 1024
    table = jnp.asarray(tbl_pad)

    cfg = ScorerConfig()
    params, _ = load_params(k, tuple(cfg.hidden))
    triQ, scale = candidate_q_features(Q, table)
    W1, b1, W2, b2, W3, b3 = mlp_params_for_kernel(params)

    nn, feas = fused_score_k3(
        x, X, table, triQ, scale, W1, b1, W2, b2, W3, b3,
        block=block, interpret=True,
    )

    # reference jnp path
    feas_ref = feasibility_scores_from_point(x, X, table)
    model = MLPScorer(hidden=tuple(cfg.hidden))
    feats = candidate_features(triQ, x, X, table)
    nn_ref = scale * jnp.maximum(model.apply(params, feats), 0.0)

    np.testing.assert_allclose(np.asarray(feas), np.asarray(feas_ref),
                               atol=2e-4)
    np.testing.assert_allclose(np.asarray(nn), np.asarray(nn_ref),
                               rtol=2e-4, atol=2e-5)


import pytest  # noqa: E402


@pytest.mark.parametrize("k", [2, 3, 4, 5])
def test_fused_score_generic_k(k):
    """Generic-k kernel vs the jnp reference path (interpret mode)."""
    n, block = 14, 1024
    rng = np.random.default_rng(k)
    Q = jnp.asarray(rng.standard_normal((n, n)).astype(np.float32))
    Q = 0.5 * (Q + Q.T)
    x = jnp.asarray(rng.random(n), jnp.float32)
    X = jnp.asarray(
        np.clip(np.outer(x, x) + 0.3 * rng.standard_normal((n, n)), 0, 1),
        jnp.float32,
    )
    X = 0.5 * (X + X.T)

    tbl_np = combinations_table(n, k)[:900]
    if k >= 4:
        # QCQP-style padded supports: repeat the last index in some rows
        tbl_np = tbl_np.copy()
        tbl_np[::7, -1] = tbl_np[::7, -2]
    tbl_pad, valid = pad_table(tbl_np, block)
    table = jnp.asarray(tbl_pad)

    cfg = ScorerConfig()
    params, _ = load_params(k, tuple(cfg.hidden))
    triQ, scale = candidate_q_features(Q, table)
    W = mlp_params_for_kernel(params)

    nn, feas = fused_score(
        x, X, table, triQ, scale, *W, block=block, sweeps=7, interpret=True,
    )

    feas_ref = feasibility_scores_from_point(x, X, table)
    model = MLPScorer(hidden=tuple(cfg.hidden))
    feats = candidate_features(triQ, x, X, table)
    nn_ref = scale * jnp.maximum(model.apply(params, feats), 0.0)

    np.testing.assert_allclose(np.asarray(feas), np.asarray(feas_ref),
                               atol=5e-4)
    np.testing.assert_allclose(np.asarray(nn), np.asarray(nn_ref),
                               rtol=2e-4, atol=2e-5)


def test_fused_and_neural_gating_masks_agree():
    """ADVICE r3: the QCQP solver's fused branch gates neural selection with
    `feas > viol_tol` from the kernel's feasibility output, while the CPU
    path gates inside models.scorer.neural_score_fn(combined=True).  Both
    must produce the SAME gate on a shared input, or TPU and CPU runs would
    silently rank different candidate sets (qcqp/solver.py:105-120 vs
    models/scorer.py neural_score_fn)."""
    from sdpcutsel_tpu.models.scorer import neural_score_fn

    n, k, block = 12, 4, 1024
    viol_tol = 1e-4  # CutConfig.viol_tol default, used by both branches
    rng = np.random.default_rng(7)
    Q = jnp.asarray(rng.standard_normal((n, n)).astype(np.float32))
    Q = 0.5 * (Q + Q.T)
    x = jnp.asarray(rng.random(n), jnp.float32)
    X = jnp.asarray(
        np.clip(np.outer(x, x) + 0.3 * rng.standard_normal((n, n)), 0, 1),
        jnp.float32,
    )
    X = 0.5 * (X + X.T)
    tbl_np = combinations_table(n, k)[:400]
    tbl_pad, valid = pad_table(tbl_np, block)
    table = jnp.asarray(tbl_pad)

    cfg = ScorerConfig()
    params, _ = load_params(k, tuple(cfg.hidden))
    triQ, scale = candidate_q_features(Q, table)
    W = mlp_params_for_kernel(params)
    nn, feas = fused_score(
        x, X, table, triQ, scale, *W, block=block, sweeps=7, interpret=True,
    )
    fused_gated = jnp.where(feas > viol_tol, nn, -jnp.inf)  # solver branch

    fn = neural_score_fn(Q, table, cfg, combined=True, gate_tol=viol_tol)
    ref_gated = fn(x, X, jax.random.PRNGKey(0))

    fused_mask = np.isfinite(np.asarray(fused_gated))[valid]
    ref_mask = np.isfinite(np.asarray(ref_gated))[valid]
    # identical gate except candidates within kernel f32 noise of the
    # threshold: allow disagreement only where |feas - tol| is tiny
    feas_ref = np.asarray(feasibility_scores_from_point(x, X, table))[valid]
    near = np.abs(feas_ref - viol_tol) < 5e-4
    disagree = fused_mask != ref_mask
    assert not np.any(disagree & ~near), (
        f"gates disagree on {np.sum(disagree & ~near)} candidates away from "
        "the threshold")
    sel = fused_mask & ref_mask
    np.testing.assert_allclose(
        np.asarray(fused_gated)[valid][sel], np.asarray(ref_gated)[valid][sel],
        rtol=2e-4, atol=2e-5)
