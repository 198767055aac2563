"""Triangle (RLT-3) inequalities — the reference paper's comparison baseline
(SURVEY.md section 0.3: "triangle/RLT-3 inequalities appear in the paper only
as a comparison baseline").

For a triple rho = (i, j, l) with x in [0,1]^n and X the lifted x x^T, the
four triangle inequalities of the boolean-quadric/QPB polytope are valid for
conv{(x, x x^T) : x in [0,1]^n}:

    T0:  x_i + x_j + x_l - X_ij - X_il - X_jl <= 1
    T1:  X_ij + X_il - X_jl <= x_i
    T2:  X_ij + X_jl - X_il <= x_j
    T3:  X_il + X_jl - X_ij <= x_l

(Validity of T1 at X = x x^T:  lhs - rhs = -(x_i-x_j)(x_i-x_l) + x_i(x_i-1),
whose maximum over x_j, x_l in [0,1] is x_i(1-x_i) + x_i(x_i-1) = 0; T0 is
multilinear in x so its maximum is at a binary vertex where it equals 1.)

Unlike eigenvalue cuts these have CONSTANT coefficients per (triple, type) —
no eigendecomposition — so generation is a pure gather + top-k over the
4 * C(n,3) candidate inequalities, scored by violation at the current LP
point.  Rows are emitted in the shared CutPool form
``lin . x_rho + <quad, X_rho_rho> >= rhs`` (relax/cutbuffer.py), unit-l2
normalized like every other cut row.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from ..ops.topk import masked_topk

# Static coefficient patterns per type, in "lin . x + <quad, X> >= rhs" form
# (the <= inequalities above negated).  quad is symmetric with off-diagonal
# weight split across both entries so the summed coefficient on X_ab is 1.
_LIN = np.array(
    [
        [-1.0, -1.0, -1.0],   # T0: -x_i - x_j - x_l + Xij + Xil + Xjl >= -1
        [1.0, 0.0, 0.0],      # T1:  x_i - Xij - Xil + Xjl >= 0
        [0.0, 1.0, 0.0],      # T2:  x_j - Xij - Xjl + Xil >= 0
        [0.0, 0.0, 1.0],      # T3:  x_l - Xil - Xjl + Xij >= 0
    ],
    dtype=np.float32,
)


def _sym(ij, il, jl):
    h = 0.5
    return np.array(
        [
            [0.0, h * ij, h * il],
            [h * ij, 0.0, h * jl],
            [h * il, h * jl, 0.0],
        ],
        dtype=np.float32,
    )


_QUAD = np.stack(
    [
        _sym(1.0, 1.0, 1.0),      # T0
        _sym(-1.0, -1.0, 1.0),    # T1
        _sym(-1.0, 1.0, -1.0),    # T2
        _sym(1.0, -1.0, -1.0),    # T3
    ]
)
_RHS = np.array([-1.0, 0.0, 0.0, 0.0], dtype=np.float32)

# unit-l2 row normalization (matches cuts/generate.py convention)
_NRM = np.sqrt((_LIN**2).sum(1) + (_QUAD**2).sum((1, 2)))
_LIN_N = _LIN / _NRM[:, None]
_QUAD_N = _QUAD / _NRM[:, None, None]
_RHS_N = _RHS / _NRM

# public aliases (numpy) — the CPU replica shares the exact same rows so
# triangle parity compares selection/LP behavior, not coefficient conventions
TRIANGLE_LIN, TRIANGLE_QUAD, TRIANGLE_RHS = _LIN_N, _QUAD_N, _RHS_N


def triangle_violations(x, X, table):
    """Violation of each of the 4 triangle inequalities at (x, X) for every
    triple in ``table`` (T, 3).  Returns (T, 4); positive = violated."""
    i, j, l = table[:, 0], table[:, 1], table[:, 2]
    xi, xj, xl = x[i], x[j], x[l]
    Xij, Xil, Xjl = X[i, j], X[i, l], X[j, l]
    v0 = xi + xj + xl - Xij - Xil - Xjl - 1.0
    v1 = Xij + Xil - Xjl - xi
    v2 = Xij + Xjl - Xil - xj
    v3 = Xil + Xjl - Xij - xl
    return jnp.stack([v0, v1, v2, v3], axis=1)


def triangle_scores(x, X, table):
    """Per-triple score = max violation over the 4 types (used when a single
    score per candidate triple is wanted, e.g. for strategy comparison)."""
    return jnp.max(triangle_violations(x, X, table), axis=1)


def triangle_select_and_generate(
    x, X, table, sel_size: int, viol_tol: float, table_mask=None
):
    """Top-``sel_size`` most-violated triangle inequalities over all
    (triple, type) candidates -> cut rows.

    Returns (idx: (S,3), lin, quad, rhs, valid) for relax.append_cuts.
    ``table_mask``: optional (T,) bool for padded candidate tables.
    """
    viol = triangle_violations(x, X, table)           # (T, 4)
    if table_mask is not None:
        viol = jnp.where(table_mask[:, None], viol, -jnp.inf)
    flat = viol.reshape(-1)                           # (T*4,)
    vals, sel, finite = masked_topk(flat, sel_size)
    tri = sel // 4                                    # (S,)
    typ = sel % 4
    idx = table[tri]                                  # (S, 3)
    lin = jnp.asarray(_LIN_N, x.dtype)[typ]           # (S, 3)
    quad = jnp.asarray(_QUAD_N, x.dtype)[typ]         # (S, 3, 3)
    rhs = jnp.asarray(_RHS_N, x.dtype)[typ]           # (S,)
    valid = finite & (vals > viol_tol)
    return idx, lin, quad, rhs, valid
