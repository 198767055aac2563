"""Pair-structured dense-k3 candidate scoring — the round-3 fast path.

The generic fused kernel (ops/fused_score.py) treats the candidate table as
arbitrary (i, j, l) rows and pays ~3x128xn^2 one-hot-matmul MACs per 128
candidates just to GATHER (x_rho, X_rho) — ~90% of its arithmetic.  For the
dense exhaustive BoxQP table (all C(n,3) triples, SURVEY.md section 0.4) the
candidates have product structure: fix the pair (i, j), and the third index l
sweeps a contiguous range.  Mapping that structure onto the VPU registers
directly:

    sublanes = (i, j) pairs          (P = C(n,2) of them, blocked)
    lanes    = the third index l     (n <= 128 -> one 128-lane vector per pair)

turns every gather into a row slice: the candidate data for a whole
128-candidate lane vector is {x_i, x_j, X_ii, X_ij, X_jj} (per-pair scalars,
broadcast over lanes) plus {x, diag X, X[i, :], X[j, :]} (lane vectors) — and
the same for Q.  The per-candidate arithmetic drops from ~47k MACs (one-hot
gathers) to ~6k (Jacobi + MLP), at the price of lane padding: the padded slot
count is C(n,2) * 128 ~ 3.1x C(n,3) at n = 125.

Layouts are lane-major end to end — feature planes, Jacobi tiles, and outputs
all live as (pairs, 128) tiles, so the Pallas kernel performs ZERO
lane<->sublane relayouts.  The MLP (a (B, 15) @ (15, 64) @ (64, 64) @ (64, 1)
chain) runs OUTSIDE the kernel as plain XLA matmuls over the kernel's
feature-plane output: XLA drives the MXU at high efficiency on a (15, B)
contraction, and the feature planes round-trip HBM once (~60 MB at n = 125).
The kernel fuses what XLA cannot: plane assembly + the 5-sweep struct-of-
arrays Jacobi (ops/jacobi.py), whose 10-array loop carry would otherwise
round-trip HBM every sweep.

Score semantics are IDENTICAL to ops/fused_score.py / models/features.py:
  feats = [tri(Q_rho)/scale | x_rho | tri(X_rho)],  scale = max |(Q_rho)_ab|,
  nn = scale * relu(MLP(feats)),  feas = -lambda_min(Z(rho)).
Only the candidate ORDER differs: slot (p, l) of the (P_pad * 128,) output is
the triple (pi[p], pj[p], l), with a validity mask for l <= j, l >= n, and
padded pairs.  build_pair_layout returns the matching table + mask, which the
solver swaps in for the lexicographic table when this path is active.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .jacobi import _jacobi_sweeps

_LANES = 128


@functools.lru_cache(maxsize=8)
def build_pair_layout(n: int, pairs_block: int = 128):
    """Static layout for dense k=3 over n <= 128 variables (numpy).

    Returns (pi, pj, table, valid):
      pi, pj : (P_pad,) int32 — the (i, j) of each pair row (padded rows
               repeat (0, 1); their slots are masked invalid)
      table  : (P_pad * 128, 3) int32 — slot s = p * 128 + l is the triple
               (pi[p], pj[p], min(l, n-1)); aligned with the score outputs
      valid  : (P_pad * 128,) bool — l > j, l < n, p < P
    """
    assert 3 <= n <= _LANES, f"pair layout requires 3 <= n <= 128, got {n}"
    iu, ju = np.triu_indices(n, k=1)
    P = iu.shape[0]
    P_pad = -(-P // pairs_block) * pairs_block
    pi = np.zeros(P_pad, np.int32)
    pj = np.ones(P_pad, np.int32)
    pi[:P] = iu
    pj[:P] = ju
    ll = np.arange(_LANES, dtype=np.int32)
    table = np.empty((P_pad, _LANES, 3), np.int32)
    table[:, :, 0] = pi[:, None]
    table[:, :, 1] = pj[:, None]
    table[:, :, 2] = np.minimum(ll, n - 1)[None, :]
    valid = (ll[None, :] > pj[:, None]) & (ll[None, :] < n)
    valid[P:] = False
    return pi, pj, table.reshape(-1, 3), valid.reshape(-1)


def _pad_sq(A, n_pad: int):
    n = A.shape[0]
    return jnp.pad(jnp.asarray(A), ((0, n_pad - n), (0, n_pad - n)))


def pair_consts_static(Q, pi, pj):
    """Per-instance constants for the pair path (jit-safe pytree).

    Qri/Qrj: (P_pad, 128) rows of zero-padded Q; qd: (1, 128) diag;
    qsc: (P_pad, 4) per-pair scalars [Q_ii, Q_ij, Q_jj, 0-pad].
    """
    Qp = _pad_sq(Q, _LANES)
    pi = jnp.asarray(pi)
    pj = jnp.asarray(pj)
    qsc = jnp.stack(
        [Qp[pi, pi], Qp[pi, pj], Qp[pj, pj], jnp.zeros_like(Qp[pi, pi])],
        axis=1,
    )
    return {
        "pi": pi, "pj": pj,
        "Qri": Qp[pi], "Qrj": Qp[pj], "qd": jnp.diag(Qp)[None, :],
        "qsc": qsc,
    }


def _planes(xp, xd, qd, Xri, Xrj, Qri, Qrj, psc, qsc):
    """Assemble the 15 feature planes + the scale plane, all (P, 128).

    psc: (P, 5) = [x_i, x_j, X_ii, X_ij, X_jj]; qsc: (P, 4) = [Q_ii, Q_ij,
    Q_jj, _].  Returns (feats list of 15 planes in models/features.py order,
    scale plane, Z-entry dict for the Jacobi).
    """
    xi, xj = psc[:, 0:1], psc[:, 1:2]
    Xii, Xij, Xjj = psc[:, 2:3], psc[:, 3:4], psc[:, 4:5]
    Qii, Qij, Qjj = qsc[:, 0:1], qsc[:, 1:2], qsc[:, 2:3]
    ones = jnp.ones_like(Xri)

    scale = jnp.maximum(jnp.abs(Qri), jnp.abs(Qrj))
    scale = jnp.maximum(scale, jnp.abs(qd))
    scale = jnp.maximum(
        scale,
        jnp.maximum(jnp.abs(Qii), jnp.maximum(jnp.abs(Qij), jnp.abs(Qjj))),
    )
    inv = 1.0 / jnp.maximum(scale, 1e-12)

    feats = [
        Qii * inv, Qij * inv, Qri * inv,           # tri(Qhat): ii, ij, il
        Qjj * inv, Qrj * inv, qd * inv,            #            jj, jl, ll
        xi * ones, xj * ones, xp * ones,           # x_rho: i, j, l
        Xii * ones, Xij * ones, Xri,               # tri(X): ii, ij, il
        Xjj * ones, Xrj, xd * ones,                #         jj, jl, ll
    ]
    z = {
        (0, 0): ones,
        (0, 1): xi * ones, (0, 2): xj * ones, (0, 3): xp * ones,
        (1, 1): Xii * ones, (1, 2): Xij * ones, (1, 3): Xri,
        (2, 2): Xjj * ones, (2, 3): Xrj, (3, 3): xd * ones,
    }
    return feats, scale, z


def _feas_from_z(z, sweeps: int):
    a, _ = _jacobi_sweeps(z, 4, sweeps)
    lam = a[(0, 0)]
    for i in range(1, 4):
        lam = jnp.minimum(lam, a[(i, i)])
    return -lam


def _mlp(feats_fB, scale_flat, W1, b1, W2, b2, W3, b3):
    """feats_fB: (15, B) lane-major feature matrix -> (B,) nn scores."""
    h = jnp.maximum(
        jnp.dot(W1.T, feats_fB, preferred_element_type=jnp.float32)
        + b1[:, None], 0.0)
    h = jnp.maximum(
        jnp.dot(W2.T, h, preferred_element_type=jnp.float32)
        + b2[:, None], 0.0)
    out = (jnp.dot(W3.T, h, preferred_element_type=jnp.float32)
           + b3[:, None])[0]
    return scale_flat * jnp.maximum(out, 0.0)


def _round_inputs(x, X, pi, pj):
    """Per-round gathered pieces from the current LP point."""
    n = x.shape[0]
    Xp = _pad_sq(X, _LANES)
    xp = jnp.pad(x, (0, _LANES - n))[None, :]
    psc = jnp.stack([xp[0, pi], xp[0, pj], Xp[pi, pi], Xp[pi, pj],
                     Xp[pj, pj]], axis=1)
    return xp, jnp.diag(Xp)[None, :], Xp[pi], Xp[pj], psc


@functools.partial(jax.jit, static_argnames=("sweeps",))
def pair_score_jnp(x, X, consts, W1, b1, W2, b2, W3, b3, sweeps: int = 5):
    """Pure-jnp pair-layout scoring (reference + CPU path).

    Returns (nn, feas), each (P_pad * 128,) in slot order (see module doc).
    """
    xp, xd, Xri, Xrj, psc = _round_inputs(x, X, consts["pi"], consts["pj"])
    feats, scale, z = _planes(xp, xd, consts["qd"], Xri, Xrj,
                              consts["Qri"], consts["Qrj"], psc,
                              consts["qsc"])
    feas = _feas_from_z(z, sweeps)
    feats_fB = jnp.stack([f.reshape(-1) for f in feats], axis=0)
    nn = _mlp(feats_fB, scale.reshape(-1), W1, b1, W2, b2, W3, b3)
    return nn, feas.reshape(-1)


def _pair_kernel(xp_ref, xd_ref, qd_ref, Xri_ref, Xrj_ref, Qri_ref, Qrj_ref,
                 psc_ref, qsc_ref, feats_ref, scale_ref, feas_ref,
                 *, sweeps: int):
    feats, scale, z = _planes(
        xp_ref[0, :][None, :], xd_ref[0, :][None, :], qd_ref[0, :][None, :],
        Xri_ref[:], Xrj_ref[:], Qri_ref[:], Qrj_ref[:],
        psc_ref[:], qsc_ref[:],
    )
    for f, plane in enumerate(feats):
        feats_ref[f, :, :] = plane
    scale_ref[:] = scale
    # fully unrolled sweeps: the 10-plane working set stays in VMEM/registers
    # (a lax.fori_loop carry would be fine too; unrolling lets Mosaic keep
    # rotations in registers across sweeps)
    for _ in range(sweeps):
        from .jacobi import _one_sweep

        z, _ = _one_sweep(z, None, 4, False)
    lam = z[(0, 0)]
    for i in range(1, 4):
        lam = jnp.minimum(lam, z[(i, i)])
    feas_ref[:] = -lam


@functools.partial(
    jax.jit, static_argnames=("pairs_block", "sweeps", "interpret",
                              "skip_mlp")
)
def pair_score_fused(x, X, consts, W1, b1, W2, b2, W3, b3,
                     pairs_block: int = 128, sweeps: int = 5,
                     interpret: bool = False, skip_mlp: bool = False):
    """Pallas pair-layout scoring: fused plane assembly + Jacobi in one
    kernel (lane-major, zero relayouts), MLP as XLA matmuls over the
    kernel's feature-plane output.  Same outputs as pair_score_jnp.

    skip_mlp=True returns (scale, feas) with no MLP matmuls — a
    stage-isolation knob for the roofline bench (scripts/bench_roofline.py),
    NOT a production path."""
    pi = consts["pi"]
    P_pad = pi.shape[0]
    PB = pairs_block
    assert P_pad % PB == 0, f"P_pad={P_pad} not a multiple of {PB}"
    grid = (P_pad // PB,)
    xp, xd, Xri, Xrj, psc = _round_inputs(x, X, pi, consts["pj"])

    row = lambda i: (0, 0)
    pblk = lambda i: (i, 0)
    feats, scale, feas = pl.pallas_call(
        functools.partial(_pair_kernel, sweeps=sweeps),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, _LANES), row, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, _LANES), row, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, _LANES), row, memory_space=pltpu.VMEM),
            pl.BlockSpec((PB, _LANES), pblk, memory_space=pltpu.VMEM),
            pl.BlockSpec((PB, _LANES), pblk, memory_space=pltpu.VMEM),
            pl.BlockSpec((PB, _LANES), pblk, memory_space=pltpu.VMEM),
            pl.BlockSpec((PB, _LANES), pblk, memory_space=pltpu.VMEM),
            pl.BlockSpec((PB, 5), pblk, memory_space=pltpu.VMEM),
            pl.BlockSpec((PB, 4), pblk, memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((15, PB, _LANES), lambda i: (0, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((PB, _LANES), pblk, memory_space=pltpu.VMEM),
            pl.BlockSpec((PB, _LANES), pblk, memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((15, P_pad, _LANES), jnp.float32),
            jax.ShapeDtypeStruct((P_pad, _LANES), jnp.float32),
            jax.ShapeDtypeStruct((P_pad, _LANES), jnp.float32),
        ],
        interpret=interpret,
    )(xp, xd, consts["qd"], Xri, Xrj, consts["Qri"], consts["Qrj"],
      psc, consts["qsc"])
    if skip_mlp:
        return scale.reshape(-1), feas.reshape(-1)
    nn = _mlp(feats.reshape(15, -1), scale.reshape(-1),
              W1, b1, W2, b2, W3, b3)
    return nn, feas.reshape(-1)
