import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sdpcutsel_tpu.ops.jacobi import (
    jacobi_eigh, jacobi_eigvals, jacobi_min_eigval, min_eig_from_parts,
)


@pytest.mark.parametrize("m", [3, 4, 5, 6])
def test_jacobi_eigvals_match_lapack(m):
    rng = np.random.default_rng(m)
    A = rng.standard_normal((512, m, m)).astype(np.float32)
    A = 0.5 * (A + np.swapaxes(A, 1, 2))
    w_ref = np.linalg.eigvalsh(A)
    w = np.asarray(jacobi_eigvals(jnp.asarray(A), sweeps=7))
    np.testing.assert_allclose(w, w_ref, atol=2e-4)


def test_jacobi_min_eigval():
    rng = np.random.default_rng(0)
    A = rng.standard_normal((256, 4, 4)).astype(np.float32)
    A = 0.5 * (A + np.swapaxes(A, 1, 2))
    ref = np.linalg.eigvalsh(A)[:, 0]
    out = np.asarray(jacobi_min_eigval(jnp.asarray(A), sweeps=7))
    np.testing.assert_allclose(out, ref, atol=2e-4)


def test_jacobi_eigh_reconstructs():
    rng = np.random.default_rng(1)
    A = rng.standard_normal((128, 4, 4)).astype(np.float32)
    A = 0.5 * (A + np.swapaxes(A, 1, 2))
    w, V = jacobi_eigh(jnp.asarray(A), sweeps=8)
    w, V = np.asarray(w), np.asarray(V)
    # A = V diag(w) V^T
    rec = np.einsum("tij,tj,tkj->tik", V, w, V)
    np.testing.assert_allclose(rec, A, atol=5e-4)
    # ascending
    assert (np.diff(w, axis=1) >= -1e-5).all()
    # orthonormal columns
    eye = np.einsum("tji,tjk->tik", V, V)
    np.testing.assert_allclose(eye, np.tile(np.eye(4), (128, 1, 1)), atol=5e-4)


def test_jacobi_equal_diagonal():
    """Regression: matrices with all-equal diagonal (every Z(rho) has unit
    diagonal at McCormick vertices) must still rotate — sign(tau=0) must be
    treated as +1 or the sweep freezes and returns the diagonal unchanged."""
    Z = np.array([[[1.0, 0.9545905, 0.97262883, 0.88993555],
                   [0.9545905, 1.0, 1.0, 0.5485146],
                   [0.97262883, 1.0, 1.0, 0.93775797],
                   [0.88993555, 0.5485146, 0.93775797, 1.0]]], np.float32)
    ref = np.linalg.eigvalsh(Z.astype(np.float64))[0]
    w = np.asarray(jacobi_eigvals(jnp.asarray(Z), sweeps=6))[0]
    np.testing.assert_allclose(w, ref, atol=1e-4)


def test_min_eig_from_parts_matches_assembled():
    from sdpcutsel_tpu.cuts.assemble import assemble_Z
    from sdpcutsel_tpu.cuts.enumerate import combinations_table

    n = 10
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.random(n), jnp.float32)
    X = jnp.asarray(
        np.clip(np.outer(x, x) + 0.3 * rng.standard_normal((n, n)), 0, 1),
        jnp.float32,
    )
    X = 0.5 * (X + X.T)
    tbl = jnp.asarray(combinations_table(n, 3))
    Z = assemble_Z(x, X, tbl)
    ref = np.linalg.eigvalsh(np.asarray(Z))[:, 0]
    out = np.asarray(min_eig_from_parts(x[tbl], X[tbl[:, :, None], tbl[:, None, :]]))
    np.testing.assert_allclose(out, ref, atol=2e-4)
