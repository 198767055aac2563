"""Flax MLP cut scorers — the NN-estimated optimality strategy (headline).

One small dense MLP per submatrix dimension k (SURVEY.md section 0.6: "a few
hidden layers, ~tens of units", trained offline, shipped in-repo).  At solve
time the entire candidate batch is scored in one matmul pass (the stage the
TPU build turns into fused MXU work).

Weights ship as flax msgpack artifacts under models/artifacts/mlp_k{k}.msgpack
(trained by models/train.py); absent an artifact the scorer falls back to a
deterministic random init (useful for tests; quality then ~ random strategy).
"""

from __future__ import annotations

import os
from typing import Sequence

import flax.linen as nn
import flax.serialization
import jax
import jax.numpy as jnp

from ..config import ScorerConfig
from .features import candidate_features, candidate_q_features, feature_dim

_ARTIFACT_DIR = os.path.join(os.path.dirname(__file__), "artifacts")


class MLPScorer(nn.Module):
    """feats (B, d) -> predicted scale-normalized improvement (B,)."""

    hidden: Sequence[int] = (64, 64)

    @nn.compact
    def __call__(self, x):
        for h in self.hidden:
            x = nn.relu(nn.Dense(h)(x))
        x = nn.Dense(1)(x)
        return jnp.squeeze(x, -1)


def artifact_path(k: int) -> str:
    return os.path.join(_ARTIFACT_DIR, f"mlp_k{k}.msgpack")


def init_params(k: int, hidden=(64, 64), seed: int = 0):
    model = MLPScorer(hidden=tuple(hidden))
    feats = jnp.zeros((1, feature_dim(k)))
    return model.init(jax.random.PRNGKey(seed), feats)


def save_params(params, path: str):
    os.makedirs(os.path.dirname(path), exist_ok=True)
    with open(path, "wb") as f:
        f.write(flax.serialization.to_bytes(params))


def load_params(k: int, hidden=(64, 64), path: str | None = None, seed: int = 0):
    """Load the trained artifact for dimension k, or deterministic init."""
    template = init_params(k, hidden, seed)
    path = path or artifact_path(k)
    if os.path.exists(path):
        with open(path, "rb") as f:
            return flax.serialization.from_bytes(template, f.read()), True
    return template, False


def make_fused_scorer(Q, table, cfg: ScorerConfig):
    """Fused Pallas scorer for k=3 on TPU: one kernel pass returns BOTH the
    NN improvement estimate and the feasibility violation for every
    candidate (ops/fused_score.py).  The table must be padded to a multiple
    of 1024 rows (parallel.sharding.pad_table).  Returns
    score(x, X) -> (nn_scores, feas_scores)."""
    import jax.numpy as jnp

    from ..ops.fused_score import fused_score_k3, mlp_params_for_kernel

    k = int(table.shape[1])
    assert k == 3, "fused scorer is the k=3 specialization"
    params, _ = load_params(k, tuple(cfg.hidden), cfg.weights_path, cfg.seed)
    triQ, scale = candidate_q_features(Q, table)
    W = [jnp.asarray(a) for a in mlp_params_for_kernel(params)]

    def score(x, X):
        return fused_score_k3(x, X, table, triQ, scale, *W,
                              block=1024, sweeps=5)

    return score


def neural_score_fn(Q, table, cfg: ScorerConfig, combined: bool = False,
                    gate_tol: float = 0.0):
    """Build the jitted all-candidates scorer for one instance.

    score(rho) = scale(rho) * MLP(features(rho))  — the estimated bound
    improvement of cutting on rho.  With combined=True, candidates whose
    Z(rho) is not violated (feasibility score <= gate_tol) are masked out so
    the neural ranking only spends selections on violated candidates.
    Pass gate_tol = CutConfig.viol_tol to gate at the same threshold the cut
    generator uses (a candidate below it cannot emit a cut at all, so
    selecting it wastes the slot and can stall the loop once its cut is in
    the pool — see qcqp/solver.py).
    """
    k = int(table.shape[1])
    params, _ = load_params(k, tuple(cfg.hidden), cfg.weights_path, cfg.seed)
    model = MLPScorer(hidden=tuple(cfg.hidden))
    triQ, scale = candidate_q_features(Q, table)

    @jax.jit
    def score(x, X, key):
        feats = candidate_features(triQ, x, X, table)
        pred = model.apply(params, feats)
        s = scale * jnp.maximum(pred, 0.0)
        if combined:
            from ..cuts.assemble import assemble_Z
            from ..cuts.eigen import feasibility_scores

            viol = feasibility_scores(assemble_Z(x, X, table))
            s = jnp.where(viol > gate_tol, s, -jnp.inf)
        return s

    return score
