"""GCV parity: exact LOO identity + Nelder-Mead replica vs the oracle's
brute-force leave-one-out refits + scipy Nelder-Mead (interpolate.py:263-351).

Small problem so the oracle's O(npoints) refits per objective call stay fast.
"""

import numpy as np
import pytest
import jax.numpy as jnp

from volumetricinterp_tpu.ops.fit import fit_records
from volumetricinterp_tpu.ops.regparam import gcv_objective, nelder_mead_1d
from volumetricinterp_tpu.ops.solve import suff_stats
from tests.oracle import oracle_fit_record
from tests.oracle.ref_impl import oracle_gcv_param


@pytest.fixture(scope="module")
def small_problem():
    rng = np.random.default_rng(8)
    npts, nb = 60, 8
    A = rng.normal(size=(npts, nb))
    R = np.eye(nb) + 0.1 * np.ones((nb, nb))
    C_true = rng.normal(size=nb)
    b = A @ C_true + 0.3 * rng.normal(size=npts)
    W = np.full(npts, 1.0 / 0.09)
    return A, b, W, R


def test_gcv_objective_matches_brute_force(small_problem):
    """The rank-one-downdate identity gives the same objective values as
    physically deleting each point and refitting."""
    import scipy.linalg

    A, b, W, R = small_problem
    mask = np.ones_like(b)
    AtWA, AtWb, btWb, N = suff_stats(
        jnp.asarray(A), jnp.asarray(b), jnp.asarray(W), jnp.asarray(mask)
    )
    for a_log in [-3.0, -1.0, 0.5, 2.0]:
        ours = float(
            gcv_objective(
                a_log, AtWA, AtWb, jnp.asarray(R), jnp.asarray(A),
                jnp.asarray(b), jnp.asarray(W), jnp.asarray(mask),
            )
        )
        # brute force
        alpha = 10.0**a_log
        total = 0.0
        for i in range(len(b)):
            Ai = np.delete(A, i, 0)
            bi = np.delete(b, i, 0)
            Wi = np.delete(W, i, 0)
            X = np.einsum("ji,j,jk->ik", Ai, Wi, Ai) + alpha * R
            y = np.einsum("ji,j,j->i", Ai, Wi, bi)
            C = scipy.linalg.lstsq(X, y)[0]
            total += (A[i] @ C - b[i]) ** 2 * W[i]
        assert np.isclose(ours, total, rtol=1e-9), a_log


def test_nelder_mead_matches_scipy():
    """The 1-D NM replica follows scipy's trajectory on a representative
    objective (same minimizer to xatol)."""
    import scipy.optimize

    f_np = lambda x: np.cosh(0.3 * (np.asarray(x) - 2.2)) + 0.05 * np.sin(
        np.asarray(x)
    )
    sol = scipy.optimize.minimize(
        lambda x: f_np(x[0]), -20.0, method="Nelder-Mead"
    )
    f_j = lambda x: jnp.cosh(0.3 * (x - 2.2)) + 0.05 * jnp.sin(x)
    x, ok = nelder_mead_1d(f_j, jnp.float64(-20.0))
    assert bool(ok) == bool(sol.success)
    assert abs(float(x) - sol.x[0]) < 2e-4


def test_gcv_reg_param_matches_oracle(small_problem):
    A, b, W, R = small_problem
    ref = oracle_gcv_param(A, b, W, [R], 0)

    values = b[None]
    errors = (W ** -0.5)[None]
    C, dC, chi2, alphas = fit_records(
        jnp.asarray(values), jnp.asarray(errors), jnp.asarray(A),
        jnp.asarray(R)[None], method="gcv",
    )
    ours = float(alphas[0, 0])
    assert np.isfinite(ref) and np.isfinite(ours)
    # NM terminates at xatol=1e-4 in log10-alpha
    assert abs(np.log10(ours) - np.log10(ref)) < 5e-4
