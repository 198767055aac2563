import jax
import jax.numpy as jnp
import numpy as np

from sdpcutsel_tpu.cuts import (
    assemble_Z, batched_eigh_small, combinations_table, cuts_from_selected,
    feasibility_scores, num_candidates,
)
from sdpcutsel_tpu.ops.topk import masked_topk
from sdpcutsel_tpu.relax import append_cuts, cut_residuals, empty_pool, purge_pool


def test_combinations_table():
    t = combinations_table(6, 3)
    assert t.shape == (20, 3)
    assert num_candidates(6, 3) == 20
    # sorted rows, unique, all in range
    assert (np.diff(t, axis=1) > 0).all()
    assert len({tuple(r) for r in t.tolist()}) == 20
    # matches itertools
    import itertools

    expect = np.asarray(list(itertools.combinations(range(6), 3)))
    np.testing.assert_array_equal(t, expect)  # same lexicographic order


def test_assemble_Z():
    n = 5
    rng = np.random.default_rng(0)
    x = rng.random(n)
    X = rng.random((n, n))
    X = 0.5 * (X + X.T)
    idx = jnp.asarray(combinations_table(n, 3)[:4])
    Z = np.asarray(assemble_Z(jnp.asarray(x, jnp.float32),
                              jnp.asarray(X, jnp.float32), idx))
    for t, rho in enumerate(np.asarray(idx)):
        assert Z[t, 0, 0] == 1.0
        np.testing.assert_allclose(Z[t, 0, 1:], x[rho], rtol=1e-6)
        np.testing.assert_allclose(
            Z[t, 1:, 1:], X[np.ix_(rho, rho)], rtol=1e-6
        )


def test_feasibility_scores_psd_matrix_not_violated():
    # X = x x^T makes every Z(rho) PSD -> scores <= ~0
    n = 8
    x = jnp.asarray(np.random.default_rng(1).random(n), jnp.float32)
    X = jnp.outer(x, x)
    idx = jnp.asarray(combinations_table(n, 3))
    s = feasibility_scores(assemble_Z(x, X, idx))
    assert float(jnp.max(s)) <= 1e-5


def test_cut_validity_and_violation():
    """Generated cuts must be (a) violated at the generating point, and
    (b) satisfied at ANY point whose Z is PSD (validity)."""
    n = 8
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.random(n), jnp.float32)
    # McCormick-feasible but non-PSD X: clip of a noisy outer product
    X = jnp.asarray(
        np.clip(np.outer(x, x) + 0.3 * rng.standard_normal((n, n)), 0, 1),
        jnp.float32,
    )
    X = 0.5 * (X + X.T)
    idx = jnp.asarray(combinations_table(n, 3))
    Z = assemble_Z(x, X, idx)
    scores = feasibility_scores(Z)
    _, sel, valid = masked_topk(scores, 10)
    idx_sel = idx[sel]
    w, V = batched_eigh_small(assemble_Z(x, X, idx_sel))
    rows = cuts_from_selected(idx_sel, w, V, viol_tol=1e-4, sel_valid=valid)
    idx_r, lin_r, quad_r, rhs_r, valid_r = rows
    assert bool(jnp.any(valid_r)), "expected some violated cuts"

    pool = empty_pool(64, 3)
    pool = append_cuts(pool, idx_r, lin_r, quad_r, rhs_r, valid_r)
    nadded = int(pool.count)
    assert nadded == int(valid_r.sum())

    # violated at generating point: residual - rhs < 0 for active rows
    res = np.asarray(cut_residuals(x, X, pool))
    act = np.asarray(pool.active) > 0
    assert (res[act] < -1e-6).all()

    # valid for PSD-consistent points: X' = x'x'^T for random x'
    for _ in range(5):
        xp = jnp.asarray(rng.random(n), jnp.float32)
        Xp = jnp.outer(xp, xp)
        resp = np.asarray(cut_residuals(xp, Xp, pool))
        assert (resp[act] >= -1e-5).all()


def test_append_overflow_drops():
    pool = empty_pool(4, 2)
    idx = jnp.zeros((6, 2), jnp.int32)
    lin = jnp.ones((6, 2))
    quad = jnp.ones((6, 2, 2))
    rhs = jnp.zeros((6,))
    pool = append_cuts(pool, idx, lin, quad, rhs, jnp.ones(6))
    assert int(pool.count) == 4
    assert float(pool.active.sum()) == 4


def test_purge_keeps_binding():
    n = 4
    pool = empty_pool(8, 2)
    idx = jnp.asarray([[0, 1], [2, 3], [1, 2]], jnp.int32)
    lin = jnp.asarray([[1.0, 0], [1.0, 0], [1.0, 0]])
    quad = jnp.zeros((3, 2, 2))
    rhs = jnp.asarray([0.0, 0.0, 0.0])
    pool = append_cuts(pool, idx, lin, quad, rhs, jnp.ones(3))
    x = jnp.asarray([0.0, 1.0, 0.5, 0.2])  # slacks: 0.0, 0.5, 1.0
    X = jnp.zeros((n, n))
    slack = cut_residuals(x, X, pool)
    yC = jnp.zeros(8).at[1].set(0.7)  # cut 1 has dual weight
    pool2, yC2 = purge_pool(pool, yC, slack, slack_tol=1e-3)
    assert int(pool2.count) == 2  # cut 0 binding, cut 1 dual-backed, cut 2 gone
    kept_idx = np.asarray(pool2.idx)[np.asarray(pool2.active) > 0]
    assert {tuple(r) for r in kept_idx.tolist()} == {(0, 1), (2, 3)}


def test_diverse_topk_matches_topk_on_untied_scores():
    """With no ties and alpha far below score gaps, diverse_topk must pick
    exactly the top-k set (diversity only re-orders ties)."""
    import numpy as np

    from sdpcutsel_tpu.cuts.enumerate import combinations_table
    from sdpcutsel_tpu.ops.topk import diverse_topk, masked_topk

    n, k = 12, 3
    table = jnp.asarray(combinations_table(n, k))
    rng = np.random.default_rng(0)
    scores = jnp.asarray(rng.permutation(table.shape[0]).astype(np.float32))
    _, sel_ref, _ = masked_topk(scores, 8)
    _, sel_div, valid = diverse_topk(scores, table, 8, n, alpha=1e-4)
    assert bool(valid.all())
    assert set(np.asarray(sel_div).tolist()) == set(np.asarray(sel_ref).tolist())


def test_diverse_topk_spreads_tied_supports():
    """On fully tied scores, diverse selection must cover more distinct
    indices than lexicographic top_k (which clusters on low indices)."""
    import numpy as np

    from sdpcutsel_tpu.cuts.enumerate import combinations_table
    from sdpcutsel_tpu.ops.topk import diverse_topk, masked_topk

    n, k, S = 15, 3, 5
    tbl_np = combinations_table(n, k)
    table = jnp.asarray(tbl_np)
    scores = jnp.ones((table.shape[0],), jnp.float32)
    _, sel_ref, _ = masked_topk(scores, S)
    _, sel_div, _ = diverse_topk(scores, table, S, n, alpha=1e-4)
    cov_ref = len(set(tbl_np[np.asarray(sel_ref)].ravel().tolist()))
    cov_div = len(set(tbl_np[np.asarray(sel_div)].ravel().tolist()))
    # 5 disjoint triples exist in 15 vars; greedy diversity must find them
    assert cov_div == S * k
    assert cov_div > cov_ref
    # no candidate selected twice
    assert len(set(np.asarray(sel_div).tolist())) == S


def test_diverse_topk_respects_mask():
    import numpy as np

    from sdpcutsel_tpu.cuts.enumerate import combinations_table
    from sdpcutsel_tpu.ops.topk import diverse_topk

    n, k = 10, 3
    table = jnp.asarray(combinations_table(n, k))
    C = table.shape[0]
    scores = jnp.ones((C,), jnp.float32)
    mask = jnp.arange(C) < 3          # only 3 valid candidates, ask for 6
    vals, sel, valid = diverse_topk(scores, table, 6, n, alpha=1e-4,
                                    mask=mask)
    assert int(valid.sum()) == 3
    assert set(np.asarray(sel)[np.asarray(valid)].tolist()) == {0, 1, 2}


def test_support_embedding_matches_gather_scatter():
    """cut_residuals_emb / cut_adjoint_emb (dense-matmul form for the PDHG
    inner loop) agree with the gather/scatter forms on a random pool."""
    import jax.numpy as jnp
    import numpy as np

    from sdpcutsel_tpu.relax.cutbuffer import (
        cut_adjoint, cut_adjoint_emb, cut_residuals, cut_residuals_emb,
        empty_pool, support_embedding, CutPool,
    )

    rng = np.random.default_rng(0)
    n, M, k = 17, 64, 3
    idx = rng.integers(0, n, size=(M, k)).astype(np.int32)
    lin = rng.standard_normal((M, k)).astype(np.float32)
    quad = rng.standard_normal((M, k, k)).astype(np.float32)
    quad = 0.5 * (quad + np.transpose(quad, (0, 2, 1)))
    active = (rng.random(M) < 0.7).astype(np.float32)
    pool = CutPool(
        idx=jnp.asarray(idx), lin=jnp.asarray(lin), quad=jnp.asarray(quad),
        rhs=jnp.asarray(rng.standard_normal(M).astype(np.float32)),
        active=jnp.asarray(active), count=jnp.int32(int(active.sum())),
    )
    x = jnp.asarray(rng.random(n).astype(np.float32))
    X = rng.random((n, n)).astype(np.float32)
    X = jnp.asarray(0.5 * (X + X.T))
    yC = jnp.asarray(rng.random(M).astype(np.float32))

    E3 = support_embedding(pool, n)
    r_ref = np.asarray(cut_residuals(x, X, pool))
    r_emb = np.asarray(cut_residuals_emb(x, X, pool, E3))
    np.testing.assert_allclose(r_emb, r_ref, rtol=2e-5, atol=2e-5)

    gx_ref, gX_ref = cut_adjoint(yC, pool, n)
    gx_emb, gX_emb = cut_adjoint_emb(yC, pool, E3)
    np.testing.assert_allclose(np.asarray(gx_emb), np.asarray(gx_ref),
                               rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(np.asarray(gX_emb), np.asarray(gX_ref),
                               rtol=2e-5, atol=2e-5)
