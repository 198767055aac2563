"""Fully sharded cutting-plane round step: P1 (candidate axis) x P2 (instance
axis) on one mesh (SURVEY.md section 2.3).

One jitted shard_map over mesh ('data', 'cand'):
  * each 'data' row holds a shard of the instance batch (independent BoxQP
    problems, padded to a common n) — no collectives cross 'data';
  * within a row, the candidate table is sharded over 'cand'; the LP state is
    replicated over 'cand' (every chip re-solves its instances' LPs — the LP
    is tiny next to scoring, so replication beats communication);
  * the only collective: per-round all_gather of each shard's local top-k cut
    candidates over 'cand' (P5 consensus), after which every chip appends the
    IDENTICAL cut rows, keeping the replicated pool/LP state consistent by
    construction.

This is the step `__graft_entry__.dryrun_multichip` compiles over an
N-virtual-device mesh, and the scale-out path for the instance-batched suite
benchmark (BASELINE.json configs 4-5).
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..cuts.assemble import assemble_Z
from ..cuts.eigen import batched_eigh_small, feasibility_scores
from ..cuts.generate import cuts_from_selected
from ..lp.pdhg import PDHGState, _one_iter, estimate_norm
from ..relax.cutbuffer import CutPool, append_cuts
from ..relax.mccormick import SA, SB


class BatchedRoundState(NamedTuple):
    """Instance-batched solver state; leading axis = instance batch."""

    Q: jnp.ndarray        # (B, n, n)
    c: jnp.ndarray        # (B, n)
    pool: CutPool         # leaves with leading (B, ...)
    pdhg: PDHGState       # leaves with leading (B, ...)
    bound: jnp.ndarray    # (B,) last primal objective estimate (max form)


def init_batched_state(Qb, cb, capacity: int, kmax: int, dtype=jnp.float32):
    from ..lp.pdhg import init_state
    from ..relax.cutbuffer import empty_pool

    B, n = cb.shape
    pool = jax.tree.map(
        lambda a: jnp.broadcast_to(a, (B,) + a.shape), empty_pool(capacity, kmax, dtype)
    )
    st = jax.tree.map(
        lambda a: jnp.broadcast_to(a, (B,) + a.shape),
        init_state(n, capacity, 0, dtype)
    )
    return BatchedRoundState(
        Q=jnp.asarray(Qb, dtype), c=jnp.asarray(cb, dtype),
        pool=CutPool(*pool), pdhg=PDHGState(*st),
        bound=jnp.zeros((B,), dtype),
    )


def _single_instance_round(Q, c, pool, st, table_shard, valid_shard,
                           lp_iters: int, sel_size: int, viol_tol: float):
    """One instance's round on one device's candidate shard (inside shard_map,
    inside vmap over local instances)."""
    n = c.shape[0]
    dtype = c.dtype
    cx, cX = -c, -0.5 * Q

    normK = estimate_norm(pool, n, 20, dtype)
    eta = 0.9 / normK

    from ..relax.denserows import empty_dense

    dense = empty_dense(n, dtype)

    def body(_, s):
        return _one_iter(cx, cX, pool, dense, n, s, eta, eta)

    st = jax.lax.fori_loop(0, lp_iters, body, st)

    # local feasibility scoring over the candidate shard
    scores = feasibility_scores(assemble_Z(st.x, st.X, table_shard))
    neg = jnp.asarray(-jnp.inf, dtype)
    scores = jnp.where(valid_shard, scores, neg)
    lv, li = jax.lax.top_k(scores, sel_size)
    rows = table_shard[li]

    # P5: consensus on global winners over the candidate axis
    gv = jax.lax.all_gather(lv, "cand", tiled=True)
    gr = jax.lax.all_gather(rows, "cand", tiled=True)
    v, i = jax.lax.top_k(gv, sel_size)
    idx_sel = gr[i]
    sel_valid = v > viol_tol

    w, V = batched_eigh_small(assemble_Z(st.x, st.X, idx_sel))
    idx_r, lin_r, quad_r, rhs_r, valid_r = cuts_from_selected(
        idx_sel, w, V, viol_tol, sel_valid=sel_valid
    )
    pool = append_cuts(pool, idx_r, lin_r, quad_r, rhs_r, valid_r)
    bound = -(jnp.dot(cx, st.x) + jnp.sum(cX * st.X))
    return pool, st, bound


def make_sharded_round_step(mesh: Mesh, lp_iters: int = 50,
                            sel_size: int = 8, viol_tol: float = 1e-4):
    """Build the jitted sharded round step over the given mesh.

    Returns step(state: BatchedRoundState, table, valid) -> BatchedRoundState
    with shardings: state batched over 'data', table over 'cand'.
    """

    @functools.partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(
            BatchedRoundState(
                Q=P("data"), c=P("data"),
                pool=CutPool(*(P("data"),) * 6),
                pdhg=PDHGState(*(P("data"),) * 6),
                bound=P("data"),
            ),
            P("cand", None),
            P("cand"),
        ),
        out_specs=BatchedRoundState(
            Q=P("data"), c=P("data"),
            pool=CutPool(*(P("data"),) * 6),
            pdhg=PDHGState(*(P("data"),) * 6),
            bound=P("data"),
        ),
        check_vma=False,
    )
    def step(state: BatchedRoundState, table_shard, valid_shard):
        def per_instance(Q, c, pool, st):
            return _single_instance_round(
                Q, c, pool, st, table_shard, valid_shard,
                lp_iters, sel_size, viol_tol,
            )

        pool, st, bound = jax.vmap(per_instance)(
            state.Q, state.c, state.pool, state.pdhg
        )
        return BatchedRoundState(state.Q, state.c, pool, st, bound)

    def apply(state, table, valid):
        return jax.jit(step)(state, table, valid)

    return apply


def bucket_instances(instances):
    """Group instances by n for batched solving (SURVEY.md section 7:
    instance batching is per-size-bucket — XLA needs one static n per
    compiled program; padding across n would waste quadratic work).
    Returns {n: [instances]} with deterministic ordering."""
    buckets: dict[int, list] = {}
    for inst in instances:
        buckets.setdefault(inst.n, []).append(inst)
    return dict(sorted(buckets.items()))


def shard_batched_state(state: BatchedRoundState, mesh: Mesh):
    """Place a batched state with instance leaves sharded over 'data'."""
    sh = NamedSharding(mesh, P("data"))
    return jax.tree.map(lambda a: jax.device_put(a, sh), state)
