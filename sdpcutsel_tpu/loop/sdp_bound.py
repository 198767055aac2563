"""SDP relaxation bound via full-dimensional eigenvector cuts.

The reference's headline metric is % of the (initial McCormick bound - SDP
bound) gap closed (SURVEY.md section 0.5), which needs the SDP relaxation
value  max 1/2<Q,X> + c'x  s.t. McCormick, Z = [[1,x'],[x,X]] >= 0.  The
reference obtained it from an external SDP solver; the TPU-native route reuses
our own machinery: a cutting-plane loop whose single candidate is the FULL
index set — each round eigendecomposes the (n+1)x(n+1) moment matrix at the LP
optimum and adds one dense cut per negative eigenvalue.  This outer
polyhedral approximation converges to the SDP bound from above (classical
Krein-Milman/outer-approximation argument); we stop at lambda_min(Z) >= -tol,
so the reported value is a certified UPPER bound on the true SDP value within
the LP dual tolerance.

The same CutPool machinery is reused with kmax = n (cut support = everything).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..config import LPConfig
from ..cuts.assemble import assemble_Z
from ..cuts.generate import cuts_from_selected
from ..instances.boxqp import BoxQPInstance
from ..lp.pdhg import dual_bound_f64, init_state, solve_lp
from ..relax.cutbuffer import append_cuts, cut_residuals, empty_pool, purge_pool


def sdp_relaxation_bound(
    inst: BoxQPInstance,
    lp_cfg: LPConfig | None = None,
    max_rounds: int = 120,
    eig_tol: float = 1e-4,
    capacity: int = 1024,
    dtype=jnp.float32,
    verbose: bool = False,
):
    """Returns (sdp_bound, initial_mccormick_bound, history list)."""
    lp_cfg = lp_cfg or LPConfig()
    n = inst.n
    Q = jnp.asarray(inst.Q, dtype)
    c = jnp.asarray(inst.c, dtype)
    full = jnp.arange(n, dtype=jnp.int32)[None, :]   # single candidate (1, n)

    pool = empty_pool(capacity, n, dtype)
    state = init_state(n, capacity, 0, dtype)

    @jax.jit
    def gen_cuts(x, X):
        Z = assemble_Z(x, X, full)          # (1, n+1, n+1)
        w, V = jnp.linalg.eigh(Z)
        rows = cuts_from_selected(full, w, V, eig_tol)
        return rows, w[0, 0]

    history = []
    bound0 = None
    for r in range(max_rounds):
        state, info = solve_lp(Q, c, pool, state, lp_cfg)
        bound = dual_bound_f64(inst.Q, inst.c, pool, state)
        if bound0 is None:
            bound0 = bound
        (idx_r, lin_r, quad_r, rhs_r, valid_r), lam_min = gen_cuts(
            state.x, state.X
        )
        lam_min = float(lam_min)
        history.append({"round": r, "bound": bound, "lam_min": lam_min})
        if verbose:
            print(f"[sdp_bound] round {r}: bound={bound:.6f} "
                  f"lam_min={lam_min:.2e} cuts={int(pool.count)}")
        if lam_min >= -eig_tol:
            break
        slack = cut_residuals(state.x, state.X, pool)
        pool, yC = purge_pool(pool, state.yC, slack, slack_tol=1e-5)
        state = state._replace(yC=yC)
        pool = append_cuts(pool, idx_r, lin_r, quad_r, rhs_r, valid_r)

    return history[-1]["bound"], bound0, history


def gap_closed(bound0: float, sdp: float, bounds) -> np.ndarray:
    """% of (bound0 - sdp) gap closed per round, clipped to [0, 1]."""
    denom = max(bound0 - sdp, 1e-12)
    return np.clip((bound0 - np.asarray(bounds)) / denom, 0.0, 1.0)
