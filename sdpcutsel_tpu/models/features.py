"""Feature parametrization for the NN cut scorer.

SURVEY.md section 0.4: the net ingests a *normalized parametrization of
(Q_rho, x*_rho, X*_rho)* — the objective submatrix rescaled to a canonical
range plus the current relaxation point.  Concretely, per candidate rho of
size k:

    scale  = max |(Q_rho)_ij|          (0-safe; all-zero blocks score 0)
    Qhat   = Q_rho / scale             entries in [-1, 1]
    feats  = [ tri(Qhat) | x*_rho | tri(X*_rho) ]   (k(k+1)/2 + k + k(k+1)/2)

k=2 -> 8 features, k=3 -> 15, k=4 -> 24, k=5 -> 35.  The model predicts the
SCALE-NORMALIZED improvement; the score used for ranking is scale * pred
(objective improvements are 1-homogeneous in Q, so normalization is lossless).
"""

from __future__ import annotations

import functools

import jax.numpy as jnp
import numpy as np


@functools.lru_cache(maxsize=16)
def tri_indices(k: int):
    # numpy (not jnp) so the cache never retains arrays created inside a jax
    # trace (an lru-cached device constant leaks out of shard_map/vmap traces)
    iu = np.triu_indices(k)
    return iu[0], iu[1]


def feature_dim(k: int) -> int:
    return k * (k + 1) + k


def candidate_q_features(Q, table):
    """Per-candidate objective features, static per instance.

    Returns (triQ: (T, k(k+1)/2), scale: (T,)).
    """
    i0, i1 = tri_indices(table.shape[1])
    Qr = Q[table[:, :, None], table[:, None, :]]       # (T, k, k)
    scale = jnp.max(jnp.abs(Qr), axis=(1, 2))
    safe = jnp.maximum(scale, 1e-12)
    triQ = (Qr / safe[:, None, None])[:, i0, i1]
    return triQ, scale


def candidate_features(triQ, x, X, table):
    """Assemble the full feature batch for the current point: (T, d)."""
    i0, i1 = tri_indices(table.shape[1])
    xr = x[table]                                      # (T, k)
    Xr = X[table[:, :, None], table[:, None, :]]       # (T, k, k)
    triX = Xr[:, i0, i1]
    return jnp.concatenate([triQ, xr, triX], axis=1)
