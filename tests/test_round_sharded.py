"""Sharded instance-batched round step on the 8-device virtual mesh."""

import jax.numpy as jnp
import numpy as np
import pytest

from sdpcutsel_tpu.cuts.enumerate import combinations_table
from sdpcutsel_tpu.instances import generate_spar
from sdpcutsel_tpu.parallel.mesh import make_mesh
from sdpcutsel_tpu.parallel.round import (
    init_batched_state, make_sharded_round_step, shard_batched_state,
)
from sdpcutsel_tpu.parallel.sharding import shard_candidates


@pytest.mark.parametrize("data,cand", [(2, 4), (4, 2), (1, 8)])
def test_sharded_round_runs_and_bounds_drop(data, cand):
    n, B = 12, 4
    mesh = make_mesh(data=data, cand=cand)
    insts = [generate_spar(n, 100, s + 1) for s in range(B)]
    Qb = jnp.asarray(np.stack([i.Q for i in insts]), jnp.float32)
    cb = jnp.asarray(np.stack([i.c for i in insts]), jnp.float32)

    state = init_batched_state(Qb, cb, capacity=64, kmax=3)
    state = shard_batched_state(state, mesh)
    table, valid = shard_candidates(combinations_table(n, 3), mesh)
    step = make_sharded_round_step(mesh, lp_iters=200, sel_size=4)

    state = step(state, table, valid)
    b1 = np.asarray(state.bound).copy()
    for _ in range(2):
        state = step(state, table, valid)
    b3 = np.asarray(state.bound)

    assert b1.shape == (B,)
    # LP bounds should not increase as cuts accumulate (primal estimates,
    # allow small solver noise)
    assert (b3 <= b1 + 1e-2 * (1 + np.abs(b1))).all()
    counts = np.asarray(state.pool.count)
    assert (counts > 0).any()


def test_mesh_layouts_agree():
    """Same batched solve on different mesh layouts gives identical cuts
    (deterministic global top-k regardless of sharding)."""
    n, B = 12, 2
    insts = [generate_spar(n, 100, s + 1) for s in range(B)]
    Qb = jnp.asarray(np.stack([i.Q for i in insts]), jnp.float32)
    cb = jnp.asarray(np.stack([i.c for i in insts]), jnp.float32)

    results = []
    for data, cand in [(1, 2), (2, 4), (1, 8)]:
        mesh = make_mesh(data=data, cand=cand)
        state = init_batched_state(Qb, cb, capacity=64, kmax=3)
        state = shard_batched_state(state, mesh)
        table, valid = shard_candidates(combinations_table(n, 3), mesh)
        step = make_sharded_round_step(mesh, lp_iters=150, sel_size=4)
        state = step(state, table, valid)
        results.append((np.asarray(state.pool.idx), np.asarray(state.pool.count)))

    for idx, cnt in results[1:]:
        np.testing.assert_array_equal(cnt, results[0][1])
        np.testing.assert_array_equal(idx, results[0][0])
