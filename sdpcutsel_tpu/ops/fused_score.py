"""Pallas TPU kernel: fused candidate scoring (the framework's hot op).

One kernel pass over the candidate table computes, per candidate rho:
  * gather of (x_rho, X_rho_rho) — expressed as one-hot matmuls so the MXU
    does the "gather": M_a = onehot(idx_a) (128, n);  row_a = M_a @ X;
    X[rho_a, rho_b] = sum(row_a * M_b, axis=1).  TPU has no efficient
    per-lane VMEM gather; one-hot contraction is the idiomatic mapping.
  * feasibility score  -lambda_min(Z(rho))  via the struct-of-arrays Jacobi
    sweeps (ops/jacobi.py) on (S, 128) tiles — full 128-lane VPU use.
  * the NN improvement estimate: features [triQ | x_rho | tri X_rho] through
    the per-k MLP, matmuls on the MXU, times the per-candidate scale.

Generic in the subset size k (2, 3 for dense BoxQP; 4, 5 for the QCQP
clique-candidate path, where padded tables repeat the last index — the
one-hot gather and Jacobi handle duplicated supports transparently).  k is
derived from the static candidate-table shape.

VMEM discipline (the hard constraint — scoped VMEM is 16M):
  * per-candidate scalars live as (S, 128) tiles, never (B, 1) — a (B, 1)
    array lane-pads to 128x the size;
  * the one-hot gather runs over 128-candidate sub-chunks inside the kernel,
    so the only (cands, n) temporaries are (128, n) = 64K tiles; results
    accumulate into (k|t, S, 128) scratch. A flat (B, n) formulation at
    B=1024 allocates ~18M of stack and fails to compile;
  * features assemble into ONE (B, F_pad) scratch (separate (B, 1) concat
    operands would again lane-pad).

This is the fused "batched small-matrix eigendecomp + MLP matmul kernel"
called for by the north star (BASELINE.json).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .jacobi import _jacobi_sweeps

_LANES = 128


def _tri(k: int):
    """Upper-triangle index pairs in np.triu_indices order (row-major),
    matching models/features.py's feature layout."""
    return [(a, b) for a in range(k) for b in range(a, k)]


def _kernel(x_ref, X_ref, idx_ref, triQ_ref, scale_ref,
            W1_ref, b1_ref, W2_ref, b2_ref, W3_ref, b3_ref,
            nn_ref, feas_ref, feats_ref, xr_ref, Xrr_ref,
            *, n: int, B: int, k: int, sweeps: int):
    tri = _tri(k)
    t = len(tri)                      # k(k+1)/2
    F = 2 * t + k                     # feature width
    S = B // _LANES
    X = X_ref[:]                      # (n, n)
    xv = x_ref[0, :]                  # (n,)

    coln = jax.lax.broadcasted_iota(jnp.int32, (_LANES, n), dimension=1)
    for c in range(S):                # 128-candidate sub-chunks
        ids = idx_ref[:, c, :]        # (k, 128)
        rows = pl.ds(c * _LANES, _LANES)

        def mask(a):
            return (coln == ids[a, :][:, None]).astype(X.dtype)   # (128, n)

        for a in range(k):
            Ma = mask(a)
            va = jnp.sum(Ma * xv[None, :], axis=1)                # (128,)
            xr_ref[a, c, :] = va
            # feats column write: the reduction is sublane-major, matching
            # the (B, F) feature layout — no lane<->sublane relayout needed
            feats_ref[rows, t + a] = va
            # HIGHEST precision: the MXU's native bf16 multiply would
            # truncate the gathered X values (~4e-3 error) — these feed the
            # eigensolver, where viol_tol is 1e-4.
            ra = jnp.dot(Ma, X, preferred_element_type=jnp.float32,
                         precision=jax.lax.Precision.HIGHEST)
            for ti, (aa, bb) in enumerate(tri):
                if aa == a:
                    vt = jnp.sum(ra * mask(bb), axis=1)
                    Xrr_ref[ti, c, :] = vt
                    feats_ref[rows, t + k + ti] = vt

    xr = [xr_ref[a, :, :] for a in range(k)]          # (S, 128) each
    Xrr = {ab: Xrr_ref[ti, :, :] for ti, ab in enumerate(tri)}

    # ---- Jacobi lambda_min of Z = [[1, xr'], [xr, Xrr]] on (S, 128) tiles
    av = {(0, 0): jnp.ones_like(xr[0])}
    for a in range(k):
        av[(0, a + 1)] = xr[a]
    for (a, b) in tri:
        av[(a + 1, b + 1)] = Xrr[(a, b)]
    av, _ = _jacobi_sweeps(av, k + 1, sweeps)
    lam = av[(0, 0)]
    for i in range(1, k + 1):
        lam = jnp.minimum(lam, av[(i, i)])
    feas_ref[:] = -lam                                            # (S, 128)

    # ---- NN score: feats = [triQ(t) | xr(k) | triX(t)] -> MLP ----
    # (columns t..F-1 were filled inside the gather loop above)
    feats_ref[:, 0:t] = triQ_ref[:]
    feats = feats_ref[:, 0:F]                                      # (B, F)
    h = jnp.maximum(
        jnp.dot(feats, W1_ref[:], preferred_element_type=jnp.float32)
        + b1_ref[0, :][None, :], 0.0)
    h = jnp.maximum(
        jnp.dot(h, W2_ref[:], preferred_element_type=jnp.float32)
        + b2_ref[0, :][None, :], 0.0)
    out = (jnp.dot(h, W3_ref[:], preferred_element_type=jnp.float32)
           + b3_ref[0, :][None, :])                                # (B, 1)
    nn_ref[:] = scale_ref[:] * jnp.maximum(out, 0.0).reshape(S, _LANES)


@functools.partial(
    jax.jit, static_argnames=("block", "sweeps", "interpret")
)
def fused_score(x, X, table, triQ, scale, W1, b1, W2, b2, W3, b3,
                block: int = 1024, sweeps: int = 5,
                interpret: bool = False):
    """Score ALL candidates in one fused kernel pass, any k in 2..5.

    x: (n,), X: (n, n), table: (T, k) int32 with T % block == 0 (pad with
    candidate 0 via parallel.sharding.pad_table), triQ: (T, k(k+1)/2),
    scale: (T,); W*/b* = per-k MLP parameters (mlp_params_for_kernel).
    Returns (nn_scores: (T,), feas_scores: (T,)).
    """
    n = x.shape[0]
    T, k = table.shape
    t = k * (k + 1) // 2
    F = 2 * t + k
    assert W1.shape[0] == F, \
        f"MLP input width {W1.shape[0]} != feature width {F} for k={k}"
    H1, H2 = W1.shape[1], W2.shape[1]
    assert T % block == 0, f"pad T={T} to a multiple of block={block}"
    assert block % _LANES == 0 and (block // _LANES) % 8 == 0, \
        "block must be a multiple of 1024 (S divisible by 8)"
    S = block // _LANES
    grid = (T // block,)
    F_pad = max(8, ((F + 7) // 8) * 8)

    # (k, T//128, 128) support-position-major index layout (no lane padding)
    idxk = jnp.transpose(table, (1, 0)).reshape(k, T // _LANES, _LANES)

    kern = functools.partial(_kernel, n=n, B=block, k=k, sweeps=sweeps)
    nn, feas = pl.pallas_call(
        kern,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, n), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((n, n), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((k, S, _LANES), lambda i: (0, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block, t), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((S, _LANES), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((F, H1), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, H1), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((H1, H2), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, H2), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((H2, 1), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((S, _LANES), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((S, _LANES), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((T // _LANES, _LANES), x.dtype),
            jax.ShapeDtypeStruct((T // _LANES, _LANES), x.dtype),
        ],
        scratch_shapes=[
            pltpu.VMEM((block, F_pad), jnp.float32),
            pltpu.VMEM((k, S, _LANES), jnp.float32),
            pltpu.VMEM((t, S, _LANES), jnp.float32),
        ],
        interpret=interpret,
    )(
        x[None, :], X, idxk, triQ, scale.reshape(T // _LANES, _LANES),
        W1, b1[None, :], W2, b2[None, :], W3, b3[None, :],
    )
    return nn.reshape(T), feas.reshape(T)


def fused_score_k3(x, X, table, triQ, scale, W1, b1, W2, b2, W3, b3,
                   block: int = 1024, sweeps: int = 5,
                   interpret: bool = False):
    """Back-compat alias: the k=3 dense-BoxQP headline specialization."""
    return fused_score(x, X, table, triQ, scale, W1, b1, W2, b2, W3, b3,
                       block=block, sweeps=sweeps, interpret=interpret)


def mlp_params_for_kernel(params):
    """Extract (W1, b1, W2, b2, W3, b3) from the flax MLPScorer params."""
    p = params["params"]
    return (p["Dense_0"]["kernel"], p["Dense_0"]["bias"],
            p["Dense_1"]["kernel"], p["Dense_1"]["bias"],
            p["Dense_2"]["kernel"], p["Dense_2"]["bias"])
