"""High-order basis (BASELINE config 3: lmax=10, 12 radial functions) and
misc robustness tests."""

import numpy as np
import pytest
import jax.numpy as jnp

from volumetricinterp_tpu.config import Config
from volumetricinterp_tpu.models.sphharmlag import Model
from volumetricinterp_tpu.ops.fit import fit_records
from tests.oracle import oracle_basis

HI_CFG = """
[DEFAULT]
REGULARIZATION_LIST = 0thorder
REGULARIZATION_METHOD = chi2
[MODEL]
NAME = sphharmlag
MAXK = 12
MAXL = 10
CAP_LIM = 10
MAX_Z_INT = INF
LATCP = 78
LONCP = 262
[TPU]
QUAD_MODE = gauss
"""


@pytest.fixture(scope="module")
def hi_model():
    return Model(Config.from_text(HI_CFG))


def test_highorder_basis_matches_oracle(hi_model):
    """nbasis = 1200; nu up to 166 — the hardest accuracy regime (quirk #2
    ratios ~1e-40)."""
    rng = np.random.default_rng(5)
    lat = rng.uniform(74, 82, 50)
    lon = rng.uniform(252, 272, 50)
    alt = rng.uniform(1e5, 6e5, 50)
    assert hi_model.nbasis == 12 * 100
    A = np.asarray(hi_model.basis(lat, lon, alt))
    Aref = oracle_basis(12, 10, 10.0, 78.0, 262.0, lat, lon, alt)
    # scipy's own lpmv underflows to 0 for large negative m at nu ~ 166
    # (docs/PARITY_NOTES.md #2): compare where the oracle is nonzero,
    # sup-normalized per column
    for n in range(hi_model.nbasis):
        sup = np.max(np.abs(Aref[:, n]))
        if sup == 0.0:
            continue  # oracle column a victim of scipy underflow
        assert np.max(np.abs(A[:, n] - Aref[:, n])) < 2e-7 * sup, n


def test_highorder_regularized_fit_runs(hi_model):
    """Ill-conditioned lmax=10 solve completes with finite results when
    regularization is active (BASELINE config 3)."""
    rng = np.random.default_rng(6)
    npts = 1600
    lat = rng.uniform(74, 82, npts)
    lon = rng.uniform(252, 272, npts)
    alt = rng.uniform(1e5, 6e5, npts)
    A = np.asarray(hi_model.basis(lat, lon, alt))
    target = 4e11 * np.exp(-(((alt - 3e5) / 1.2e5) ** 2))
    C_true = np.linalg.lstsq(A, target, rcond=1e-8)[0]
    ne = A @ C_true
    noise = 2e10 + 0.05 * np.abs(ne)
    values = (ne + rng.normal(0, 1, npts) * noise)[None]
    errors = np.broadcast_to(1.2 * noise, (1, npts)).copy()
    psi = np.asarray(hi_model.eval_psi())

    C, dC, chi2, alphas = fit_records(
        jnp.asarray(values), jnp.asarray(errors), jnp.asarray(A),
        jnp.asarray(psi)[None], method="chi2", regparam_mode="fast",
    )
    assert np.isfinite(float(chi2[0]))
    # the fit must actually reproduce the field
    resid = A @ np.asarray(C[0]) - ne
    assert np.max(np.abs(resid)) < 0.25 * np.max(np.abs(ne))


def test_lambda_sweep_monotone_chi2():
    """chi2(alpha) non-decreasing over a lambda sweep (PSD 0thorder reg) —
    the property that makes the root search exact.  Uses a FRESH model:
    earlier tests widen the shared fixture's table domain, which perturbs
    the (cutoff-sensitive) sweep values on this underdetermined problem."""
    from volumetricinterp_tpu.ops.solve import cutoff_chi2, suff_stats

    hi_model = Model(Config.from_text(HI_CFG))
    rng = np.random.default_rng(7)
    npts = 800
    lat = rng.uniform(74, 82, npts)
    lon = rng.uniform(252, 272, npts)
    alt = rng.uniform(1e5, 6e5, npts)
    A = jnp.asarray(np.asarray(hi_model.basis(lat, lon, alt)))
    v = jnp.asarray(4e11 * np.exp(-(((alt - 3e5) / 1.2e5) ** 2)))
    W = jnp.full((npts,), 1e-21)
    AtWA, AtWb, btWb, _ = suff_stats(A, v, W, jnp.ones(npts))
    psi = jnp.asarray(np.asarray(hi_model.eval_psi()))
    vals = [
        float(cutoff_chi2(10.0**a, AtWA, AtWb, btWb, psi))
        for a in np.linspace(-40, 0, 15)
    ]
    # monotone modulo (a) cutoff-flip discontinuities (sub-cutoff
    # directions entering/leaving the retained set) and (b) the chi2~0
    # noise floor of this deliberately over-parameterized problem
    # (npts < nbasis: the unregularized residual is pure solver noise)
    floor = 1e-6 * max(vals)
    assert all(
        b >= a - abs(a) * 0.02 - floor for a, b in zip(vals, vals[1:])
    )
