"""SDP relaxation bound via full-dimensional eigenvector cuts.

The reference's headline metric is % of the (initial McCormick bound - SDP
bound) gap closed (SURVEY.md section 0.5), which needs the SDP relaxation
value  max 1/2<Q,X> + c'x  s.t. McCormick, Z = [[1,x'],[x,X]] >= 0.  The
reference obtained it from an external SDP solver; the TPU-native route
reuses our own machinery: a cutting-plane loop whose single candidate is the
FULL index set — each round eigendecomposes the (n+1)x(n+1) moment matrix at
the LP optimum and adds one dense cut per negative eigenvalue.  This outer
polyhedral approximation converges to the SDP bound from above; we stop at
lambda_min(Z) >= -tol, so the reported value is a certified UPPER bound on
the true SDP value within the LP dual tolerance.

Representation matters: a full-dimensional cut touches EVERY entry of X, so
the sparse-support CutPool (per-row gathers) is pure overhead — cuts here go
into a fixed-capacity DenseRows block (v' Z v >= 0 expands to
<u u', X> + 2 v0 u'x >= -v0^2, i.e. one dense (n, n) coefficient matrix per
cut) whose matvec is a single einsum on the MXU.  Zero rows are inert, so
the preallocated buffer is mask-free.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..config import LPConfig
from ..instances.boxqp import BoxQPInstance
from ..lp.pdhg import dual_bound_f64, init_state, solve_lp
from ..relax.cutbuffer import empty_pool
from ..relax.denserows import DenseRows


def _empty_dense_cuts(n: int, capacity: int, dtype):
    return DenseRows(
        G=jnp.zeros((capacity, n, n), dtype=dtype),
        g=jnp.zeros((capacity, n), dtype=dtype),
        h=jnp.zeros((capacity,), dtype=dtype),
    )


@jax.jit
def _gen_dense_cuts(x, X, dense: DenseRows, count, eig_tol):
    """Eigendecompose Z at (x, X); append one unit-norm dense row per
    negative eigenvalue at positions count.. (scatter, drop on overflow)."""
    n = x.shape[0]
    Z = jnp.concatenate(
        [jnp.concatenate([jnp.ones((1, 1), x.dtype), x[None, :]], axis=1),
         jnp.concatenate([x[:, None], X], axis=1)], axis=0
    )
    w, V = jnp.linalg.eigh(Z)            # ascending; columns are eigvecs
    v0 = V[0, :]                          # (n+1,)
    U = V[1:, :]                          # (n, n+1)
    # cut j: <u_j u_j', X> + 2 v0_j u_j' x >= -v0_j^2
    G = U.T[:, :, None] * U.T[:, None, :]            # (n+1, n, n)
    g = 2.0 * v0[:, None] * U.T                      # (n+1, n)
    h = -(v0 ** 2)                                   # (n+1,)
    nrm = jnp.sqrt(jnp.sum(G**2, axis=(1, 2)) + jnp.sum(g**2, axis=1)) + 1e-30
    G, g, h = G / nrm[:, None, None], g / nrm[:, None], h / nrm
    valid = w < -eig_tol
    dest = count + jnp.cumsum(valid.astype(jnp.int32)) - 1
    dest = jnp.where(valid, dest, dense.h.shape[0])  # drop invalid/overflow
    new = DenseRows(
        G=dense.G.at[dest].set(G, mode="drop"),
        g=dense.g.at[dest].set(g, mode="drop"),
        h=dense.h.at[dest].set(h, mode="drop"),
    )
    ncut = jnp.sum(valid.astype(jnp.int32))
    return new, jnp.minimum(count + ncut, dense.h.shape[0]), w[0]


def sdp_relaxation_bound(
    inst,
    lp_cfg: LPConfig | None = None,
    max_rounds: int = 120,
    eig_tol: float = 1e-4,
    capacity: int = 1024,
    dtype=jnp.float32,
    verbose: bool = False,
    stall_tol: float = 5e-5,
    stall_rounds: int = 5,
    with_point: bool = False,
):
    """Returns (sdp_bound, initial_relaxation_bound, history list); with
    with_point=True additionally the final LP point (x, X) as f64 numpy —
    the input to ``sdp_lower_bound``'s independent validation.

    Accepts a BoxQP instance (Q, c) or a QCQP instance (Q0, c0, constraint
    rows become a DenseRows prefix of the eigencut buffer)."""
    lp_cfg = lp_cfg or LPConfig()
    n = inst.n
    is_qcqp = hasattr(inst, "Q0")
    Qnp = inst.Q0 if is_qcqp else inst.Q
    cnp = inst.c0 if is_qcqp else inst.c
    Q = jnp.asarray(Qnp, dtype)
    c = jnp.asarray(cnp, dtype)

    pool = empty_pool(1, 1, dtype)          # no sparse cuts in this loop
    dense = _empty_dense_cuts(n, capacity, dtype)
    count = jnp.zeros((), jnp.int32)
    if is_qcqp and inst.m > 0:
        from ..relax.denserows import dense_from_qcqp

        qrows = dense_from_qcqp(inst.Qs, inst.cs, inst.bs, dtype)
        m = qrows.h.shape[0]
        dense = DenseRows(
            G=dense.G.at[:m].set(qrows.G),
            g=dense.g.at[:m].set(qrows.g),
            h=dense.h.at[:m].set(qrows.h),
        )
        count = jnp.asarray(m, jnp.int32)
    state = init_state(n, 1, capacity, dtype)

    history = []
    bound0 = None
    for r in range(max_rounds):
        state, info = solve_lp(Q, c, pool, state, lp_cfg, dense=dense)
        bound = dual_bound_f64(Qnp, cnp, pool, state, dense=dense)
        if bound0 is None:
            bound0 = bound
        dense, count, lam_min = _gen_dense_cuts(
            state.x, state.X, dense, count, eig_tol
        )
        lam_min = float(lam_min)
        history.append({"round": r, "bound": bound, "lam_min": lam_min})
        if verbose:
            print(f"[sdp_bound] round {r}: bound={bound:.6f} "
                  f"lam_min={lam_min:.2e} cuts={int(count)}")
        if lam_min >= -eig_tol:
            break
        # stall-based early stop: the bound is a monotone certified upper
        # bound, and on larger n it stabilizes long before lam_min clears
        # the tolerance — the remaining rounds change the gap denominator by <0.01%
        if len(history) > stall_rounds:
            prev = history[-1 - stall_rounds]["bound"]
            if abs(prev - bound) <= stall_tol * (1.0 + abs(bound)):
                break

    if with_point:
        point = (np.asarray(state.x, np.float64), np.asarray(state.X, np.float64))
        return history[-1]["bound"], bound0, history, point
    return history[-1]["bound"], bound0, history


def sdp_lower_bound(Q, c, x, X, gamma: float = 0.2,
                    repair_iters: int = 30) -> float:
    """Independent f64 LOWER bound on the SDP relaxation value from a
    constructed feasible point (VERDICT round-1 item 6: the eigencut loop's
    stall-stop yields a certified UPPER bound that could in principle stop
    too high, silently shrinking every gap-closed denominator — this
    certificate bounds that error from the other side).

    Construction: (1) repair the final LP point (x*, X*) to exact McCormick
    feasibility (entrywise clip of X into [max(0, x_i+x_j-1), min(x_i, x_j)]
    — the box is symmetric, so symmetry survives); (2) take the strictly
    PSD-interior McCormick point x0 = 0.5*1, X0 = 0.25*11' + gamma*I; (3)
    lambda_min of Z(alpha) = (1-alpha) Z* + alpha Z0 is concave in alpha, so
    bisection finds the smallest alpha with Z(alpha) PSD; the affine
    combination stays McCormick-feasible, and its objective is a valid lower
    bound on the SDP max.

    The raw LP point can sit far outside the PSD cone (the eigencut loop
    only separates along low-dimensional submatrices), forcing a large
    anchor blend that craters the objective.  So we ALSO run alternating
    projections on X with x held fixed — Schur: Z ⪰ 0 iff M = X - xx' ⪰ 0,
    alternate eigenvalue-clipping M into the PSD cone with clipping X back
    into the McCormick box — and certify the blend from each iterate; every
    blend is a valid lower bound regardless of projection convergence, so
    the returned max is too."""
    Q = np.asarray(Q, np.float64)
    c = np.asarray(c, np.float64)
    n = c.shape[0]
    x = np.clip(np.asarray(x, np.float64), 0.0, 1.0)
    X = 0.5 * (X + X.T)
    lo = np.maximum(0.0, x[:, None] + x[None, :] - 1.0)
    hi = np.minimum(x[:, None], x[None, :])
    X = np.clip(np.asarray(X, np.float64), lo, hi)

    def Zof(xv, Xv):
        Z = np.empty((n + 1, n + 1))
        Z[0, 0] = 1.0
        Z[0, 1:] = xv
        Z[1:, 0] = xv
        Z[1:, 1:] = Xv
        return Z

    x0 = np.full(n, 0.5)
    X0 = np.full((n, n), 0.25) + gamma * np.eye(n)
    Z0 = Zof(x0, X0)
    assert np.linalg.eigvalsh(Z0)[0] > 0, "interior anchor must be PSD"

    def blend_bound(xv, Xv):
        Zs = Zof(xv, Xv)

        def lam(alpha):
            return np.linalg.eigvalsh((1 - alpha) * Zs + alpha * Z0)[0]

        if lam(0.0) >= 0.0:
            alpha = 0.0
        else:
            a, b = 0.0, 1.0  # lam(1) > 0
            for _ in range(60):
                mid = 0.5 * (a + b)
                if lam(mid) >= 0.0:
                    b = mid
                else:
                    a = mid
            alpha = min(b + 1e-9, 1.0)
        xa = (1 - alpha) * xv + alpha * x0
        Xa = (1 - alpha) * Xv + alpha * X0
        return float(0.5 * np.sum(Q * Xa) + c @ xa)

    best = blend_bound(x, X)
    Xr = X
    for it in range(repair_iters):
        M = Xr - np.outer(x, x)
        w, V = np.linalg.eigh(M)
        if w[0] >= -1e-12:
            best = max(best, blend_bound(x, Xr))
            break
        M = (V * np.maximum(w, 0.0)) @ V.T
        Xr = np.clip(np.outer(x, x) + M, lo, hi)
        Xr = 0.5 * (Xr + Xr.T)
        # certify intermediate iterates sparsely (each blend costs ~60 eighs)
        if it % 10 == 9:
            best = max(best, blend_bound(x, Xr))
    else:
        best = max(best, blend_bound(x, Xr))
    return best


def validate_sdp_bound(inst, lp_cfg: LPConfig | None = None,
                       max_rounds: int = 120, **kw):
    """Sandwich the SDP value: (upper, lower, rel_width) where upper is the
    eigencut-loop certificate and lower the independent feasible-point bound.
    rel_width bounds the error the stall-based early stop can introduce into
    the gap-closed denominator."""
    if hasattr(inst, "Q0"):
        raise ValueError(
            "validate_sdp_bound is BoxQP-only: the constructed feasible "
            "point ignores QCQP constraint rows, so it would not be a valid "
            "lower bound there")
    ub, _, _, (x, X) = sdp_relaxation_bound(
        inst, lp_cfg, max_rounds=max_rounds, with_point=True, **kw)
    lb = sdp_lower_bound(inst.Q, inst.c, x, X)
    rel = (ub - lb) / (1.0 + abs(ub))
    return ub, lb, rel


def gap_closed(bound0: float, sdp: float, bounds) -> np.ndarray:
    """% of (bound0 - sdp) gap closed per round, clipped to [0, 1]."""
    denom = max(bound0 - sdp, 1e-12)
    return np.clip((bound0 - np.asarray(bounds)) / denom, 0.0, 1.0)
