"""Best-known feasible solutions for BoxQP instances — the analogue of the
reference's known-optima table (SURVEY.md §2.1 R8: the reference data dir
ships known optimal values next to the spar*.in files; our instances are
regenerated deterministically, so their optima must be computed, not
transcribed).

For  max f(x) = 1/2 x'Qx + c'x  over [0,1]^n,  multi-start cyclic coordinate
ascent is exact per step: holding x_{-i} fixed, f is quadratic in x_i with
second derivative Q_ii, so the coordinate maximizer over [0, 1] is closed
form (interior stationary point when concave, else the better endpoint).
Each pass is O(n^2); convergence to a coordinate-wise local max is monotone.
These are LOWER bounds on the true optimum — together with the certified
upper bounds from the cutting loop they bracket it; "gap to best known" is
the standard report when exact optima are unavailable.
"""

from __future__ import annotations

import numpy as np


def _coordinate_ascent(Q, c, x, max_passes=400, tol=1e-12):
    n = c.shape[0]
    g = Q @ x + c          # gradient; maintained incrementally
    f = 0.5 * x @ (g + c)  # 0.5 x'Qx + c'x
    d = np.diag(Q).copy()
    for _ in range(max_passes):
        improved = 0.0
        for i in range(n):
            xi = x[i]
            gi = g[i]
            # f(x + t e_i) = f + gi t + 0.5 d_i t^2, t in [-xi, 1-xi]
            if d[i] < 0.0:
                t = np.clip(-gi / d[i], -xi, 1.0 - xi)
            else:
                # convex in x_i: best endpoint
                t_lo, t_hi = -xi, 1.0 - xi
                t = t_lo if (gi * t_lo + 0.5 * d[i] * t_lo * t_lo
                             >= gi * t_hi + 0.5 * d[i] * t_hi * t_hi) else t_hi
            if t != 0.0:
                gain = gi * t + 0.5 * d[i] * t * t
                if gain > 0.0:
                    x[i] = xi + t
                    g += Q[:, i] * t
                    f += gain
                    improved += gain
        if improved <= tol * (1.0 + abs(f)):
            break
    return x, f


def best_known_solution(Q, c, starts: int = 24, seed: int = 0):
    """Multi-start coordinate ascent; returns (x_best, f_best).

    Deterministic: fixed Philox seed; starts include the box center, the
    rounded gradient sign point, and random corners/interiors.
    """
    Q = np.asarray(Q, np.float64)
    c = np.asarray(c, np.float64)
    n = c.shape[0]
    rng = np.random.default_rng(np.random.Philox(seed))
    inits = [np.full(n, 0.5), (c > 0).astype(np.float64)]
    while len(inits) < starts:
        if len(inits) % 2:
            inits.append(rng.random(n))
        else:
            inits.append((rng.random(n) > 0.5).astype(np.float64))
    best_x, best_f = None, -np.inf
    for x0 in inits:
        x, f = _coordinate_ascent(Q, c, x0.copy())
        if f > best_f:
            best_x, best_f = x, f
    return best_x, float(best_f)
