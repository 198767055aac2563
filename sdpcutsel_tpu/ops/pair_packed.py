"""Tiered packed pair layout — round-5 answer to the padding question.

The pair layout (ops/pair_score.py) spends one full 128-lane row per (i, j)
pair, but the valid third-index range l in (j, n) narrows as j grows: at
n = 125 only 32% of lane slots are real candidates, and the kernel stage is
VPU-issue-bound on ALL slots (BASELINE roofline), so padding is the direct
throughput lever (VERDICT r4 weak #5 / next #8).

Per-row lane SHIFTS would remove all padding but need per-row gathers — the
measured 2x loss that killed the generic kernel.  The observation that
unlocks packing WITHOUT gathers: when j >= n-65, the whole valid range
l in (j, n) lies inside the fixed window [n-64, n), and when j >= n-33
inside [n-32, n).  Within such a tier the lane -> l map is a single STATIC
affine map shared by every row, so rows can carry 2 (or 4) pairs in 64- (or
32-) lane sub-blocks and every input is still assembled from plain row
slices and reshapes — zero per-element gathers:

    tier 0: j <  n-65   1 pair / row, l = lane                (as before)
    tier 1: j in [n-65, n-33)  2 pairs / row, l = n-64 + lane mod 64
    tier 2: j >= n-33   4 pairs / row, l = n-32 + lane mod 32

At n = 125 this packs 7,750 pair-rows into 3,869 rows (999k -> 495k slots,
2.02x).  Per-pair scalars become lane planes (repeat over the sub-block)
assembled outside the kernel; the in-kernel math (plane assembly + 5-sweep
struct-of-arrays Jacobi) and the XLA MLP stage are IDENTICAL per slot, so
the slot reduction converts ~1:1 into kernel+MLP time.

Slot order of all outputs: [tier0 | tier1 | tier2], each row-major; the
builder returns the matching candidate table + validity mask, so a solver
can swap this layout in exactly like build_pair_layout's.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .jacobi import _jacobi_sweeps, _one_sweep
from .pair_score import _mlp, _pad_sq

_LANES = 128


@functools.lru_cache(maxsize=8)
def build_packed_pair_layout(n: int, pairs_block: int = 128):
    """Static tiered layout (numpy).  Returns a dict with, per tier t:
      pairs_t : (R_t, k_t) int32 pair ids into the (iu, ju) enumeration,
                padded with -1 (invalid slots)
      and globally: pi, pj (all pairs), table (slots, 3), valid (slots,).
    k_t = 1, 2, 4 pairs per row; lane window per tier as in the module doc.
    """
    assert 66 <= n <= _LANES, (
        "tiered packing targets the large-n regime (lane windows assume "
        f"n >= 66); got {n} — use build_pair_layout below that")
    iu, ju = np.triu_indices(n, k=1)
    cut1, cut2 = max(0, n - 65), max(0, n - 33)

    def rows_for(mask, per_row, block):
        ids = np.nonzero(mask)[0].astype(np.int32)
        R = -(-max(len(ids), 1) // per_row)
        R = -(-R // block) * block
        out = np.full((R, per_row), -1, np.int32)
        out.ravel()[: len(ids)] = ids
        return out

    t0 = rows_for(ju < cut1, 1, pairs_block)
    t1 = rows_for((ju >= cut1) & (ju < cut2), 2, pairs_block)
    t2 = rows_for(ju >= cut2, 4, pairs_block)

    ll = np.arange(_LANES, dtype=np.int32)
    lmaps = [ll, (n - 64) + (ll % 64), (n - 32) + (ll % 32)]
    tables, valids = [], []
    for t, (rows, lmap) in enumerate(zip((t0, t1, t2), lmaps)):
        per = rows.shape[1]
        sub = _LANES // per
        pair_of_lane = rows[:, ll // sub]              # (R, 128) pair ids
        ok = pair_of_lane >= 0
        p = np.where(ok, pair_of_lane, 0)
        tab = np.stack([iu[p], ju[p],
                        np.broadcast_to(np.minimum(lmap, n - 1),
                                        p.shape)], axis=-1)
        valid = ok & (lmap[None, :] > ju[p]) & (lmap[None, :] < n)
        tables.append(tab.reshape(-1, 3))
        valids.append(valid.reshape(-1))
    return {
        "iu": iu.astype(np.int32), "ju": ju.astype(np.int32),
        "tiers": (t0, t1, t2), "lmaps": lmaps,
        "table": np.concatenate(tables, axis=0),
        "valid": np.concatenate(valids, axis=0),
    }


def _tier_consts(Qp, iu, ju, rows, lane_lo: int, width: int):
    """Per-instance packed constants for one tier (jit-safe arrays).

    Row slices only: Q rows restricted to the tier's lane window, packed
    per_row-wide; per-pair scalars as (R, 128) lane planes."""
    per = rows.shape[1]
    flat = jnp.asarray(np.maximum(rows.reshape(-1), 0))
    pi = jnp.asarray(iu)[flat]
    pj = jnp.asarray(ju)[flat]
    win = Qp[:, lane_lo:lane_lo + width]
    Qri = win[pi].reshape(-1, _LANES)
    Qrj = win[pj].reshape(-1, _LANES)

    def plane(v):                                   # (R*per,) -> (R, 128)
        return jnp.repeat(v.reshape(-1, per), width, axis=1)

    return {
        "rows": jnp.asarray(rows), "pi": pi, "pj": pj,
        "Qri": Qri, "Qrj": Qrj,
        "Qii": plane(Qp[pi, pi]), "Qij": plane(Qp[pi, pj]),
        "Qjj": plane(Qp[pj, pj]),
        "qd": jnp.tile(jnp.diag(Qp)[lane_lo:lane_lo + width],
                       _LANES // width)[None, :],
    }


def packed_consts_static(Q, layout):
    """All-tier per-instance constants (companion of pair_consts_static)."""
    Qp = _pad_sq(Q, _LANES)
    n = Q.shape[0]
    t0, t1, t2 = layout["tiers"]
    return {
        "n": n,
        "t0": _tier_consts(Qp, layout["iu"], layout["ju"], t0, 0, 128),
        "t1": _tier_consts(Qp, layout["iu"], layout["ju"], t1,
                           max(0, n - 64), 64),
        "t2": _tier_consts(Qp, layout["iu"], layout["ju"], t2,
                           max(0, n - 32), 32),
    }


def _tier_round_inputs(x, X, tc, lane_lo: int, width: int):
    """Per-round packed pieces for one tier from the current LP point."""
    Xp = _pad_sq(X, _LANES)
    xpad = jnp.pad(x, (0, _LANES - x.shape[0]))
    per = _LANES // width
    win = Xp[:, lane_lo:lane_lo + width]
    Xri = win[tc["pi"]].reshape(-1, _LANES)
    Xrj = win[tc["pj"]].reshape(-1, _LANES)

    def plane(v):
        return jnp.repeat(v.reshape(-1, per), width, axis=1)

    return {
        "Xri": Xri, "Xrj": Xrj,
        "xi": plane(xpad[tc["pi"]]), "xj": plane(xpad[tc["pj"]]),
        "Xii": plane(Xp[tc["pi"], tc["pi"]]),
        "Xij": plane(Xp[tc["pi"], tc["pj"]]),
        "Xjj": plane(Xp[tc["pj"], tc["pj"]]),
        "xl": jnp.tile(xpad[lane_lo:lane_lo + width], per)[None, :],
        "xd": jnp.tile(jnp.diag(Xp)[lane_lo:lane_lo + width], per)[None, :],
    }


def _planes_packed(ri, tc):
    """Feature planes + scale + Z entries, all (R, 128), from packed
    inputs (per-pair scalars already lane planes).  Same 15-feature order
    and score semantics as pair_score._planes."""
    ones = jnp.ones_like(ri["Xri"])
    xl = ri["xl"] * ones
    xd = ri["xd"] * ones
    qd = tc["qd"] * ones
    scale = jnp.maximum(jnp.abs(tc["Qri"]), jnp.abs(tc["Qrj"]))
    scale = jnp.maximum(scale, jnp.abs(qd))
    scale = jnp.maximum(scale, jnp.abs(tc["Qii"]))
    scale = jnp.maximum(scale, jnp.abs(tc["Qij"]))
    scale = jnp.maximum(scale, jnp.abs(tc["Qjj"]))
    inv = 1.0 / jnp.maximum(scale, 1e-12)
    feats = [
        tc["Qii"] * inv, tc["Qij"] * inv, tc["Qri"] * inv,
        tc["Qjj"] * inv, tc["Qrj"] * inv, qd * inv,
        ri["xi"], ri["xj"], xl,
        ri["Xii"], ri["Xij"], ri["Xri"],
        ri["Xjj"], ri["Xrj"], xd,
    ]
    z = {
        (0, 0): ones,
        (0, 1): ri["xi"], (0, 2): ri["xj"], (0, 3): xl,
        (1, 1): ri["Xii"], (1, 2): ri["Xij"], (1, 3): ri["Xri"],
        (2, 2): ri["Xjj"], (2, 3): ri["Xrj"], (3, 3): xd,
    }
    return feats, scale, z


_RI_KEYS = ("Xri", "Xrj", "xi", "xj", "Xii", "Xij", "Xjj", "xl", "xd")
_TC_KEYS = ("Qri", "Qrj", "Qii", "Qij", "Qjj", "qd")


def _packed_kernel(*refs, sweeps: int):
    ri = {k: refs[i][:] for i, k in enumerate(_RI_KEYS)}
    tc = {k: refs[len(_RI_KEYS) + i][:] for i, k in enumerate(_TC_KEYS)}
    feats_ref, scale_ref, feas_ref = refs[len(_RI_KEYS) + len(_TC_KEYS):]
    feats, scale, z = _planes_packed(ri, tc)
    for f, plane in enumerate(feats):
        feats_ref[f, :, :] = plane
    scale_ref[:] = scale
    for _ in range(sweeps):
        z, _ = _one_sweep(z, None, 4, False)
    lam = z[(0, 0)]
    for i in range(1, 4):
        lam = jnp.minimum(lam, z[(i, i)])
    feas_ref[:] = -lam


def _tier_score(x, X, tc, lane_lo, width, sweeps, pairs_block, interpret,
                use_kernel):
    ri = _tier_round_inputs(x, X, tc, lane_lo, width)
    R = ri["Xri"].shape[0]
    if not use_kernel:
        feats, scale, z = _planes_packed(ri, tc)
        a, _ = _jacobi_sweeps(z, 4, sweeps)
        lam = a[(0, 0)]
        for i in range(1, 4):
            lam = jnp.minimum(lam, a[(i, i)])
        return feats, scale, -lam
    PB = pairs_block
    grid = (R // PB,)
    row = lambda i: (0, 0)
    pblk = lambda i: (i, 0)
    spec_row = pl.BlockSpec((1, _LANES), row, memory_space=pltpu.VMEM)
    spec_blk = pl.BlockSpec((PB, _LANES), pblk, memory_space=pltpu.VMEM)
    in_specs = [spec_row if ri[k].shape[0] == 1 else spec_blk
                for k in _RI_KEYS]
    in_specs += [spec_row if tc[k].shape[0] == 1 else spec_blk
                 for k in _TC_KEYS]
    feats, scale, feas = pl.pallas_call(
        functools.partial(_packed_kernel, sweeps=sweeps),
        grid=grid,
        in_specs=in_specs,
        out_specs=[
            pl.BlockSpec((15, PB, _LANES), lambda i: (0, i, 0),
                         memory_space=pltpu.VMEM),
            spec_blk, spec_blk,
        ],
        out_shape=[
            jax.ShapeDtypeStruct((15, R, _LANES), jnp.float32),
            jax.ShapeDtypeStruct((R, _LANES), jnp.float32),
            jax.ShapeDtypeStruct((R, _LANES), jnp.float32),
        ],
        interpret=interpret,
    )(*[ri[k] for k in _RI_KEYS], *[tc[k] for k in _TC_KEYS])
    return [feats[f] for f in range(15)], scale, feas


@functools.partial(jax.jit, static_argnames=("n", "sweeps", "pairs_block",
                                             "interpret", "use_kernel"))
def _packed_score_impl(x, X, consts, W1, b1, W2, b2, W3, b3, n: int,
                       sweeps: int, pairs_block: int, interpret: bool,
                       use_kernel: bool):
    outs = []
    for key, lo, w in (("t0", 0, 128),
                       ("t1", max(0, n - 64), 64),
                       ("t2", max(0, n - 32), 32)):
        feats, scale, feas = _tier_score(
            x, X, consts[key], lo, w, sweeps, pairs_block, interpret,
            use_kernel)
        outs.append((feats, scale, feas))
    feats_fB = jnp.concatenate(
        [jnp.stack([f.reshape(-1) for f in feats], 0)
         for feats, _, _ in outs], axis=1)
    scale_flat = jnp.concatenate([s.reshape(-1) for _, s, _ in outs])
    feas = jnp.concatenate([f.reshape(-1) for _, _, f in outs])
    nn = _mlp(feats_fB, scale_flat, W1, b1, W2, b2, W3, b3)
    return nn, feas


def packed_score(x, X, consts, W1, b1, W2, b2, W3, b3, sweeps: int = 5,
                 pairs_block: int = 128, interpret: bool = False,
                 use_kernel: bool = True, n: int | None = None):
    """Tier-packed scoring.  Returns (nn, feas) in the layout's slot order
    ([tier0 | tier1 | tier2]); semantics per slot identical to
    pair_score_fused.  use_kernel=False runs the pure-jnp twin (CPU path /
    correctness reference).

    ``n`` must be a static Python int; it defaults to ``consts["n"]``,
    which only works when packed_score is NOT called under an outer jit
    that traced the consts pytree — such callers pass ``n`` explicitly
    (and may strip "n" from the dict)."""
    consts = dict(consts)
    n_in = consts.pop("n", None)
    if n is None:
        n = int(n_in)
    return _packed_score_impl(x, X, consts, W1, b1, W2, b2, W3, b3, n=n,
                              sweeps=sweeps, pairs_block=pairs_block,
                              interpret=interpret, use_kernel=use_kernel)
