"""Pallas TPU kernel: a VMEM-resident block of PDHG iterations.

Why: one PDHG iteration is ~40 small XLA ops over (n, n) maps plus the
support-embedding matmuls (relax/cutbuffer.py).  Compiled as separate XLA
ops, every intermediate — including the (M*k, n) embedding products —
round-trips HBM, which measures at ~53 us/iteration at (M=2048, n=125)
against ~15 us of actual MXU/VPU work.  This kernel runs `iters` iterations
of the EXACT _one_iter update (lp/pdhg.py) plus the ergodic accumulation
inside one pallas_call with the full working set (embedding, cut metadata,
primal/dual state, accumulators) pinned in VMEM — zero HBM traffic between
iterations.

Layout choices (TPU tiling: (8, 128) f32 tiles, lanes = last dim):
  * Ek: (k, M, n_pad) one-hot support embedding, active-masked — each Ek[a]
    is an (M, n) matrix; every cut matmul contracts over M or n on the MXU.
  * per-cut scalars pack as COLUMNS of one (M, 128) array `cutmeta`
    (col 0 = rhs, 1 = active, 2..2+k = lin, 2+k.. = quad row-major): (M, 1)
    arrays lane-pad to (M, 128) anyway, so packing 2+k+k^2 quantities into
    one such array costs nothing and keeps every per-cut op sublane-major.
  * yC and its ergodic accumulator pack the same way (cols 0 / 1 of `yc2`).
  * n pads to 128 (n <= 128, same domain as ops/pair_score.py); an (n, n)
    0/1 mask input zeroes the McCormick dual updates in the padded region —
    every other padded entry stays zero by construction (padded cx/cX/x/X
    are zero and project to zero).

Semantics are IDENTICAL to running _one_iter `iters` times while summing
the iterates (tests/test_pdhg_kernel.py asserts it); only op fusion and f32
summation order differ.  _solve_impl calls this once per `check_every`
block inside its while_loop (LPConfig.use_kernel), keeping restart /
averaging / omega logic in jnp where it belongs — that runs per block, not
per iteration.

Scope: BoxQP path (no QCQP dense rows — callers gate on dense.h.size == 0),
n <= 128, any capacity M (multiple of 8).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..relax.mccormick import SA, SB

_NPAD = 128


def _kernel(tau_ref, sigma_ref, cx_ref, cX_ref, mask_ref, Ek_ref, meta_ref,
            x_ref, X_ref, yA_ref, yB_ref, yc_ref,
            ax_ref, aX_ref, aA_ref, aB_ref,
            xo_ref, Xo_ref, yAo_ref, yBo_ref, yco_ref,
            axo_ref, aXo_ref, aAo_ref, aBo_ref,
            *, k: int, iters: int):
    tau = tau_ref[0, 0]
    sigma = sigma_ref[0, 0]
    cx = cx_ref[:]                       # (1, n)
    cX = cX_ref[:]                       # (n, n)
    mask = mask_ref[:]                   # (n, n) 0/1 valid region
    ones_row = mask[0:1, :]              # (1, n) valid-lane indicator
    rhs = meta_ref[:, 0:1]               # (M, 1)
    act = meta_ref[:, 1:2]
    lin = [meta_ref[:, 2 + a:3 + a] for a in range(k)]
    quad = [[meta_ref[:, 2 + k + a * k + b:3 + k + a * k + b]
             for b in range(k)] for a in range(k)]
    Ek = [Ek_ref[a] for a in range(k)]   # (M, n) each

    def dotg(a, b, ca, cb):
        return jax.lax.dot_general(
            a, b, (((ca,), (cb,)), ((), ())),
            preferred_element_type=jnp.float32)

    def body(_, carry):
        x, X, yA, yB, yc, ax, aX, aA, aB, ayc = carry
        # ---- adjoint K^T y (mccormick.apply_KT + cut_adjoint_emb) ----------
        rowA = dotg(ones_row, yA, 1, 1)          # (1, n): sum_j yA[., j]
        rowB = dotg(ones_row, yB, 1, 1)
        colB = dotg(ones_row, yB, 1, 0)          # (1, n): sum_i yB[i, .]
        w = yc * act                              # (M, 1)
        gx = SA * rowA - SB * (rowB + colB)
        gX = -SA * yA + SB * yB
        for a in range(k):
            gx = gx + dotg(w * lin[a], Ek[a], 0, 0)          # (1, n)
            wq = quad[a][0] * Ek[0]
            for b in range(1, k):
                wq = wq + quad[a][b] * Ek[b]
            gX = gX + dotg(Ek[a], w * wq, 0, 0)              # (n, n)
        # ---- primal step + exact projection --------------------------------
        xn = jnp.clip(x - tau * (cx - gx), 0.0, 1.0)
        Xs = X - tau * (cX - gX)
        Xn = jnp.clip(0.5 * (Xs + Xs.T), 0.0, 1.0)
        xb = 2.0 * xn - x                                     # (1, n)
        Xb = 2.0 * Xn - X
        xb_col = xb.T                                         # (n, 1)
        # ---- K z_bar (mccormick.apply_K + cut_residuals_emb) ---------------
        kA = SA * (xb_col - Xb)
        kB = SB * (Xb - xb_col - xb)
        r = rhs * 0.0
        for a in range(k):
            xg = dotg(Ek[a], xb, 1, 1)                        # (M, 1)
            tmp = dotg(Ek[a], Xb, 1, 0)                       # (M, n)
            r = r + lin[a] * xg
            for b in range(k):
                Xg = jnp.sum(tmp * Ek[b], axis=1, keepdims=True)
                r = r + quad[a][b] * Xg
        # ---- dual ascent -----------------------------------------------------
        yA2 = jnp.maximum(yA - sigma * kA, 0.0) * mask
        yB2 = jnp.maximum(yB + sigma * (-SB - kB), 0.0) * mask
        yc2 = jnp.maximum(yc + sigma * (rhs * act - r), 0.0) * act
        return (xn, Xn, yA2, yB2, yc2,
                ax + xn, aX + Xn, aA + yA2, aB + yB2, ayc + yc2)

    init = (x_ref[:], X_ref[:], yA_ref[:], yB_ref[:], yc_ref[:, 0:1],
            ax_ref[:], aX_ref[:], aA_ref[:], aB_ref[:], yc_ref[:, 1:2])
    out = jax.lax.fori_loop(0, iters, body, init)
    xo_ref[:], Xo_ref[:], yAo_ref[:], yBo_ref[:] = out[0], out[1], out[2], out[3]
    yco_ref[:, 0:1] = out[4]
    axo_ref[:], aXo_ref[:], aAo_ref[:], aBo_ref[:] = out[5], out[6], out[7], out[8]
    yco_ref[:, 1:2] = out[9]


def pack_cutmeta(pool):
    """(M, 128) per-cut scalar pack: [rhs | active | lin(k) | quad(k*k)]."""
    M, k = pool.idx.shape
    cols = [pool.rhs[:, None], pool.active[:, None], pool.lin,
            pool.quad.reshape(M, k * k)]
    meta = jnp.concatenate(cols, axis=1)
    return jnp.pad(meta, ((0, 0), (0, 128 - meta.shape[1])))


def embedding_k(pool, n_pad: int = _NPAD):
    """(k, M, n_pad) active-masked one-hot embedding (support-position-major
    view of cutbuffer.support_embedding)."""
    iota = jnp.arange(n_pad, dtype=pool.idx.dtype)
    E = (pool.idx[:, :, None] == iota).astype(pool.lin.dtype)
    E = E * pool.active[:, None, None]
    return jnp.transpose(E, (1, 0, 2))


def pad_mask(n: int, dtype=jnp.float32):
    m = (jnp.arange(_NPAD) < n).astype(dtype)
    return m[:, None] * m[None, :]


@functools.partial(jax.jit, static_argnames=("iters", "interpret"))
def pdhg_block(cx, cX, Ek, meta, mask, x, X, yA, yB, yc2,
               ax, aX, aA, aB, tau, sigma,
               iters: int, interpret: bool = False):
    """Run `iters` PDHG iterations + ergodic accumulation in one kernel.

    Array arguments are pre-padded to n_pad = 128: cx/x/ax (1, 128),
    cX/X/yA/yB/acc (128, 128), Ek (k, M, 128), meta (M, 128) from
    pack_cutmeta, mask (128, 128) from pad_mask, yc2 (M, 2) columns
    [yC, acc_yC].  tau/sigma: scalars.  Returns the updated
    (x, X, yA, yB, yc2, ax, aX, aA, aB).
    """
    M = Ek.shape[1]
    k = Ek.shape[0]
    spec_v = pl.BlockSpec(memory_space=pltpu.VMEM)
    spec_s = pl.BlockSpec((1, 1), memory_space=pltpu.SMEM)
    yc_in = jnp.pad(yc2, ((0, 0), (0, 128 - yc2.shape[1])))
    outs = pl.pallas_call(
        functools.partial(_kernel, k=k, iters=iters),
        in_specs=[spec_s, spec_s] + [spec_v] * 14,
        out_specs=[spec_v] * 9,
        out_shape=[
            jax.ShapeDtypeStruct(x.shape, x.dtype),
            jax.ShapeDtypeStruct(X.shape, X.dtype),
            jax.ShapeDtypeStruct(yA.shape, yA.dtype),
            jax.ShapeDtypeStruct(yB.shape, yB.dtype),
            jax.ShapeDtypeStruct((M, 128), x.dtype),
            jax.ShapeDtypeStruct(x.shape, x.dtype),
            jax.ShapeDtypeStruct(X.shape, X.dtype),
            jax.ShapeDtypeStruct(yA.shape, yA.dtype),
            jax.ShapeDtypeStruct(yB.shape, yB.dtype),
        ],
        interpret=interpret,
    )(jnp.asarray(tau, x.dtype).reshape(1, 1),
      jnp.asarray(sigma, x.dtype).reshape(1, 1),
      cx, cX, mask, Ek, meta, x, X, yA, yB, yc_in, ax, aX, aA, aB)
    xo, Xo, yAo, yBo, yco, axo, aXo, aAo, aBo = outs
    return xo, Xo, yAo, yBo, yco[:, :2], axo, aXo, aAo, aBo
