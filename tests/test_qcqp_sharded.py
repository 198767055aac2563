"""Sharded batched QCQP round (BASELINE config 5): clique-candidate table
sharded over 'cand', linearized quadratic constraint rows as a batched dense
block, k=4 supports through the generic scoring/eigh/cut machinery."""

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

from sdpcutsel_tpu.instances.qcqp import generate_qcqp_family
from sdpcutsel_tpu.parallel.mesh import make_mesh
from sdpcutsel_tpu.parallel.round import (
    certify_batched_f64, init_batched_state, make_sharded_round_step,
    shard_batched_state,
)
from sdpcutsel_tpu.parallel.sharding import shard_candidates
from sdpcutsel_tpu.qcqp.chordal import chordal_decomposition, clique_candidates
from sdpcutsel_tpu.relax.denserows import batched_dense_from_qcqp


def _family_setup(n=14, B=2, k=4, m=2, density=30, seed=1):
    fam = generate_qcqp_family(n, density, m, seed, B)
    g0 = fam[0].sparsity_graph()
    for inst in fam[1:]:
        assert inst.sparsity_graph() == g0, "family must share sparsity"
    cliques, _ = chordal_decomposition(n, g0)
    table_np = clique_candidates(cliques, k)
    assert table_np.shape[0] > 0
    return fam, table_np


def test_sharded_qcqp_bounds_monotone_and_certified():
    n, B, k, m = 14, 2, 4, 2
    fam, table_np = _family_setup(n=n, B=B, k=k, m=m)
    mesh = make_mesh(data=2, cand=4)

    Qb = jnp.asarray(np.stack([i.Q0 for i in fam]), jnp.float32)
    cb = jnp.asarray(np.stack([i.c0 for i in fam]), jnp.float32)
    state = init_batched_state(Qb, cb, capacity=64, kmax=k, m_dense=m)
    state = shard_batched_state(state, mesh)
    dense = jax.tree.map(
        lambda a: jax.device_put(a, NamedSharding(mesh, P("data"))),
        batched_dense_from_qcqp(fam),
    )
    table, valid = shard_candidates(table_np, mesh)
    step = make_sharded_round_step(mesh, lp_iters=600, sel_size=4,
                                   strategy="neural", kmax=k)

    state, _ = step(state, table, valid, dense)
    b1 = np.asarray(state.best_bound).copy()
    state, _ = step(state, table, valid, dense)
    b2 = np.asarray(state.best_bound)
    assert (b2 <= b1 + 1e-6).all()
    assert (np.asarray(state.pool.count) > 0).any()

    cert = certify_batched_f64(state, dense=dense)
    assert np.isfinite(cert).all()
    # f32 on-device certificate and f64 host recertification agree
    assert (np.abs(cert - b2) <= 1e-2 * (1 + np.abs(cert))).all()


def test_sharded_qcqp_matches_single_chip():
    """Sharded QCQP round reproduces CutSolverQCQP's certified bound under
    identical budgets (same LP solver, same neural selection)."""
    from sdpcutsel_tpu.config import (
        CutConfig, LPConfig, RunConfig, ScorerConfig,
    )
    from sdpcutsel_tpu.qcqp.solver import CutSolverQCQP

    n, k, m = 14, 4, 2
    fam, table_np = _family_setup(n=n, B=1, k=k, m=m)
    inst = fam[0]
    cfg = RunConfig(
        lp=LPConfig(max_iters=2000, tol=1e-6),
        cuts=CutConfig(k=k, sel_size=4, capacity=64),
        scorer=ScorerConfig(strategy="neural"),
    )
    single = CutSolverQCQP(inst, cfg)
    hist = single.run(rounds=2)

    mesh = make_mesh(data=1, cand=8)
    Qb = jnp.asarray(inst.Q0, jnp.float32)[None]
    cb = jnp.asarray(inst.c0, jnp.float32)[None]
    state = init_batched_state(Qb, cb, capacity=64, kmax=k, m_dense=m)
    state = shard_batched_state(state, mesh)
    dense = jax.tree.map(
        lambda a: jax.device_put(a, NamedSharding(mesh, P("data"))),
        batched_dense_from_qcqp([inst]),
    )
    table, valid = shard_candidates(table_np, mesh)
    step = make_sharded_round_step(mesh, cfg, kmax=k)
    for _ in range(2):
        state, _ = step(state, table, valid, dense)

    cert = certify_batched_f64(state, dense=dense)
    ref = hist[-1].bound
    assert abs(cert[0] - ref) <= 2e-3 * (1.0 + abs(ref))
