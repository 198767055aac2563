"""Eigenvector -> linear cut coefficients.

For a selected subset rho with Z(rho) eigenpair (lambda < 0, v = (v0, u)),
the valid cut violated at the current point is  v' Z(rho) v >= 0, i.e.

    2*v0*(u . x_rho) + <u u^T, X_rho_rho>  >=  -v0^2        (SURVEY.md 0.3)

One cut per negative eigenvalue of each selected candidate (reference
behavior).  Rows are normalized to unit l2 norm to match the preconditioning
convention of the LP operator.  All shapes static: S selected candidates emit
exactly S*(k+1) rows with a validity mask.
"""

from __future__ import annotations

import jax.numpy as jnp


def cuts_from_selected(idx_sel, w, V, viol_tol: float, sel_valid=None):
    """idx_sel: (S, k) supports; w: (S, k+1) eigvals; V: (S, k+1, k+1)
    eigvecs (columns).  sel_valid: optional (S,) mask of genuinely selected
    rows (for padded selections).

    Returns (idx: (S*(k+1), k), lin, quad, rhs, valid) ready for
    relax.append_cuts.
    """
    S, k1 = w.shape
    k = k1 - 1
    # per eigenpair j of candidate s: v = V[s, :, j]
    v0 = V[:, 0, :]                  # (S, k+1)
    u = V[:, 1:, :]                  # (S, k, k+1)
    lin = 2.0 * v0[:, None, :] * u   # (S, k, k+1)
    quad = u[:, :, None, :] * u[:, None, :, :]   # (S, k, k, k+1)
    rhs = -(v0 ** 2)                 # (S, k+1)

    nrm = jnp.sqrt(
        jnp.sum(lin**2, axis=1) + jnp.sum(quad**2, axis=(1, 2))
    ) + 1e-30                        # (S, k+1)
    lin = lin / nrm[:, None, :]
    quad = quad / nrm[:, None, None, :]
    rhs = rhs / nrm

    valid = w < -viol_tol            # (S, k+1)
    if sel_valid is not None:
        valid = valid & sel_valid[:, None]

    # flatten (S, k+1) eigenpairs -> rows
    idx_rows = jnp.repeat(idx_sel, k1, axis=0)               # (S*(k+1), k)
    lin_rows = jnp.moveaxis(lin, 2, 1).reshape(S * k1, k)
    quad_rows = jnp.moveaxis(quad, 3, 1).reshape(S * k1, k, k)
    rhs_rows = rhs.reshape(S * k1)
    valid_rows = valid.reshape(S * k1)
    return idx_rows, lin_rows, quad_rows, rhs_rows, valid_rows
