"""Batched assembly of the moment submatrices Z(rho).

Z(rho) = [[1, x_rho^T], [x_rho, X_rho_rho]]  — SURVEY.md section 0.3.
One fused gather produces the whole (T, k+1, k+1) batch.
"""

from __future__ import annotations

import jax.numpy as jnp


def assemble_Z(x, X, idx):
    """x: (n,), X: (n, n), idx: (T, k) -> Z: (T, k+1, k+1)."""
    T, k = idx.shape
    xr = x[idx]                                   # (T, k)
    Xr = X[idx[:, :, None], idx[:, None, :]]      # (T, k, k)
    top = jnp.concatenate(
        [jnp.ones((T, 1, 1), dtype=x.dtype), xr[:, None, :]], axis=2
    )                                             # (T, 1, k+1)
    bot = jnp.concatenate([xr[:, :, None], Xr], axis=2)  # (T, k, k+1)
    return jnp.concatenate([top, bot], axis=1)
