"""Sharded scoring / global top-k on the 8-device virtual CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sdpcutsel_tpu.cuts import assemble_Z, combinations_table, feasibility_scores
from sdpcutsel_tpu.ops.topk import masked_topk
from sdpcutsel_tpu.parallel import (
    make_mesh, pad_table, shard_candidates, sharded_score_and_select,
)


@pytest.fixture(scope="module")
def point():
    n = 12
    rng = np.random.default_rng(3)
    x = rng.random(n).astype(np.float32)
    X = np.clip(np.outer(x, x) + 0.2 * rng.standard_normal((n, n)), 0, 1)
    X = (0.5 * (X + X.T)).astype(np.float32)
    return jnp.asarray(x), jnp.asarray(X)


def test_devices_available():
    assert len(jax.devices()) == 8


@pytest.mark.parametrize("cand", [2, 4, 8])
def test_sharded_topk_matches_single_device(point, cand):
    x, X = point
    n, k, sel = 12, 3, 16
    table_np = combinations_table(n, k)
    mesh = make_mesh(data=1, cand=cand)
    tbl, valid = shard_candidates(table_np, mesh)

    def local_score(x, X, tshard, vshard):
        return feasibility_scores(assemble_Z(x, X, tshard))

    step = sharded_score_and_select(local_score, mesh, sel)
    vals, rows, ok = step(x, X, tbl, valid)

    # single-device reference
    table = jnp.asarray(table_np)
    scores = feasibility_scores(assemble_Z(x, X, table))
    rv, ri, _ = masked_topk(scores, sel)
    np.testing.assert_allclose(np.asarray(vals), np.asarray(rv), rtol=1e-5)
    np.testing.assert_array_equal(np.asarray(rows), np.asarray(table)[np.asarray(ri)])


def test_pad_table():
    t = combinations_table(6, 3)  # 20 rows
    padded, valid = pad_table(t, 8)
    assert padded.shape[0] == 24 and valid.sum() == 20
    np.testing.assert_array_equal(padded[:20], t)
