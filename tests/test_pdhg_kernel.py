"""pdhg_block (VMEM-resident iteration kernel, interpret mode) vs the jnp
_one_iter loop: identical state and ergodic accumulator after N iterations."""

import jax
import jax.numpy as jnp
import numpy as np

from sdpcutsel_tpu.lp.pdhg import PDHGState, _one_iter, init_state
from sdpcutsel_tpu.lp.pdhg_kernel import (
    embedding_k, pack_cutmeta, pad_mask, pdhg_block,
)
from sdpcutsel_tpu.relax.cutbuffer import CutPool, append_cuts, empty_pool
from sdpcutsel_tpu.relax.denserows import empty_dense


def _setup(n=21, M=64, k=3, seed=0):
    rng = np.random.default_rng(seed)
    Q = rng.standard_normal((n, n)).astype(np.float32)
    Q = 0.5 * (Q + Q.T)
    c = rng.standard_normal(n).astype(np.float32)
    cx = jnp.asarray(-c)
    cX = jnp.asarray(-0.5 * Q)
    pool = empty_pool(M, k, jnp.float32)
    m = M - 8  # leave some inactive rows
    lin = rng.standard_normal((m, k)).astype(np.float32)
    quad = rng.standard_normal((m, k, k)).astype(np.float32)
    quad = 0.5 * (quad + np.transpose(quad, (0, 2, 1)))
    pool = append_cuts(
        pool,
        jnp.asarray(rng.integers(0, n, (m, k)).astype(np.int32)),
        jnp.asarray(lin), jnp.asarray(quad),
        jnp.asarray(rng.standard_normal(m).astype(np.float32) * 0.1),
        jnp.ones((m,)),
    )
    st = init_state(n, M, 0, jnp.float32)
    # start from a non-trivial state
    st = st._replace(
        x=jnp.asarray(rng.random(n).astype(np.float32)),
        yA=jnp.asarray(0.1 * rng.random((n, n)).astype(np.float32)),
        yC=jnp.asarray(0.05 * rng.random(M).astype(np.float32)),
    )
    return cx, cX, pool, st


def test_pdhg_block_matches_one_iter_loop():
    n, M, iters = 21, 64, 7
    cx, cX, pool, st = _setup(n, M)
    tau, sigma = 0.013, 0.07

    # --- jnp reference: iterate + accumulate -------------------------------
    dense = empty_dense(n, jnp.float32)
    ref = st
    acc = jax.tree.map(jnp.zeros_like, st)
    for _ in range(iters):
        ref = _one_iter(cx, cX, pool, dense, n, ref, tau, sigma)
        acc = jax.tree.map(lambda a, b: a + b, acc, ref)

    # --- kernel (interpret mode) --------------------------------------------
    P = 128
    pad1 = lambda v: jnp.pad(v[None, :], ((0, 0), (0, P - n)))
    pad2 = lambda A: jnp.pad(A, ((0, P - A.shape[0]), (0, P - A.shape[1])))
    yc2 = jnp.stack([st.yC, jnp.zeros_like(st.yC)], axis=1)
    out = pdhg_block(
        pad1(cx), pad2(cX), embedding_k(pool), pack_cutmeta(pool),
        pad_mask(n), pad1(st.x), pad2(st.X), pad2(st.yA), pad2(st.yB), yc2,
        jnp.zeros((1, P)), jnp.zeros((P, P)), jnp.zeros((P, P)),
        jnp.zeros((P, P)), tau, sigma, iters=iters, interpret=True,
    )
    xo, Xo, yAo, yBo, yc2o, ax, aX, aA, aB = out

    tol = dict(rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(np.asarray(xo)[0, :n], np.asarray(ref.x), **tol)
    np.testing.assert_allclose(np.asarray(Xo)[:n, :n], np.asarray(ref.X), **tol)
    np.testing.assert_allclose(np.asarray(yAo)[:n, :n], np.asarray(ref.yA), **tol)
    np.testing.assert_allclose(np.asarray(yBo)[:n, :n], np.asarray(ref.yB), **tol)
    np.testing.assert_allclose(np.asarray(yc2o)[:, 0], np.asarray(ref.yC), **tol)
    # padded region stayed identically zero
    assert np.all(np.asarray(Xo)[n:, :] == 0) and np.all(np.asarray(Xo)[:, n:] == 0)
    assert np.all(np.asarray(yAo)[n:, :] == 0) and np.all(np.asarray(yAo)[:, n:] == 0)
    # ergodic accumulators
    np.testing.assert_allclose(np.asarray(ax)[0, :n], np.asarray(acc.x), **tol)
    np.testing.assert_allclose(np.asarray(aX)[:n, :n], np.asarray(acc.X), **tol)
    np.testing.assert_allclose(np.asarray(aA)[:n, :n], np.asarray(acc.yA), **tol)
    np.testing.assert_allclose(np.asarray(aB)[:n, :n], np.asarray(acc.yB), **tol)
    np.testing.assert_allclose(np.asarray(yc2o)[:, 1], np.asarray(acc.yC), **tol)


def test_solve_lp_kernel_path_matches_jnp():
    """solve_lp with use_kernel='on' (interpret mode on CPU) reaches the
    same solution as the jnp loop path."""
    import dataclasses

    from sdpcutsel_tpu.config import LPConfig
    from sdpcutsel_tpu.lp.pdhg import solve_lp
    from sdpcutsel_tpu.instances.boxqp import generate_spar

    inst = generate_spar(13, 100, 2)
    n, M = inst.n, 32
    cx, cX, pool, st = _setup(n, M, seed=4)
    cfg = LPConfig(max_iters=600, check_every=100, tol=1e-7)
    st_j, info_j = solve_lp(inst.Q, inst.c, pool, st, cfg)
    cfg_k = dataclasses.replace(cfg, use_kernel="on")
    st_k, info_k = solve_lp(inst.Q, inst.c, pool, st, cfg_k)
    np.testing.assert_allclose(np.asarray(st_k.x), np.asarray(st_j.x),
                               rtol=3e-5, atol=3e-5)
    np.testing.assert_allclose(np.asarray(st_k.X), np.asarray(st_j.X),
                               rtol=3e-5, atol=3e-5)
    np.testing.assert_allclose(float(info_k["dual_obj"]),
                               float(info_j["dual_obj"]), rtol=1e-4, atol=1e-4)
