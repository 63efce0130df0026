"""Equivalence of the chi2 regularization-search modes (ops/regparam.py).

The default 'exact' mode is the defect-corrected search (one cutoff-eigh
per iteration + O(nbasis) whitened inner solves); 'exact_grid' is the
round-1 faithful full grid scan.  Their contract is root equivalence at the
documented parity bars (docs/PARITY_NOTES.md #4/#7), including the
too-smooth and no-bracket outcome classes.
"""

import numpy as np
import pytest
import jax.numpy as jnp

from volumetricinterp_tpu.ops.regparam import (
    chi2_reg_param, chi2_reg_param_grid)
from volumetricinterp_tpu.ops.solve import chi2_from_eig, normalized_eigh


def _spd_with_spectrum(rng, n, log_range=12.0):
    """SPD matrix with a log-uniform spectrum over ``log_range`` decades —
    the conditioning regime of weighted normal matrices."""
    w = 10.0 ** (-log_range * rng.random(n))
    Q, _ = np.linalg.qr(rng.normal(size=(n, n)))
    return (Q * w) @ Q.T, w, Q


def test_chi2_from_eig_matches_cutoff_chi2():
    from volumetricinterp_tpu.ops.solve import cutoff_chi2

    rng = np.random.default_rng(42)
    n = 24
    X0, _, _ = _spd_with_spectrum(rng, n, log_range=20.0)
    B = rng.normal(size=(n, n))
    R = B @ B.T
    y = rng.normal(size=n)
    a = 1e-6
    AtWA, AtWb, btWb = jnp.asarray(X0), jnp.asarray(y), jnp.asarray(3.0)
    w, V, _ = normalized_eigh(AtWA + a * jnp.asarray(R))
    c1 = float(chi2_from_eig(w, V, AtWA, AtWb, btWb))
    c2 = float(cutoff_chi2(a, AtWA, AtWb, btWb, jnp.asarray(R)))
    assert np.isclose(c1, c2, rtol=1e-10)


@pytest.fixture(scope="module")
def fit_ensemble():
    """A batch of realistic sufficient-statistics tuples at a small basis
    size, spanning well-posed, too-smooth and no-bracket records."""
    rng = np.random.default_rng(7)
    from volumetricinterp_tpu.config import Config
    from volumetricinterp_tpu.models.sphharmlag import Model
    from volumetricinterp_tpu.ops.solve import suff_stats

    cfg = """
[DEFAULT]
REGULARIZATION_LIST = 0thorder
[MODEL]
NAME = sphharmlag
MAXK = 2
MAXL = 3
CAP_LIM = 10
MAX_Z_INT = INF
LATCP = 78
LONCP = 262
[TPU]
QUAD_MODE = gauss
"""
    model = Model(Config.from_text(cfg))
    npts = 400
    lat = rng.uniform(74.0, 82.0, npts)
    lon = rng.uniform(252.0, 272.0, npts)
    alt = rng.uniform(1.0e5, 6.0e5, npts)
    A = np.asarray(model.basis(lat, lon, alt))
    target = 4e11 * np.exp(-(((alt - 3e5) / 1.2e5) ** 2))
    C_true = np.linalg.lstsq(A, target, rcond=1e-10)[0]
    ne = A @ C_true
    psi = np.asarray(model.eval_psi())

    stats = []
    scenarios = [
        ("normal", 1.0), ("normal", 1.0), ("normal", 1.0),
        ("too_smooth", 300.0),   # enormous errors: chi2(1) < 0.6 N
        ("no_bracket", 0.001),   # tiny declared errors: chi2 >> N always
    ]
    for i, (kind, err_scale) in enumerate(scenarios):
        noise = (2e10 + 0.05 * np.abs(ne)) * err_scale
        v = ne + rng.normal(0, 1, npts) * (2e10 + 0.05 * np.abs(ne))
        e = 1.15 * noise
        mask = np.ones(npts)
        W = e ** -2.0
        st = suff_stats(jnp.asarray(A), jnp.asarray(v), jnp.asarray(W),
                        jnp.asarray(mask))
        stats.append((st, kind))
    return stats, jnp.asarray(psi)


def test_defect_matches_grid_scan(fit_ensemble):
    """The defect-corrected 'exact' search must reproduce the full-grid
    'exact_grid' roots (PSD regularizer -> monotone objective), including
    the too-smooth 0.0 and no-bracket NaN outcomes."""
    stats, R = fit_ensemble
    for (st, kind) in stats:
        AtWA, AtWb, btWb, N = st
        args = ((AtWA,), (AtWb,), (jnp.asarray(btWb),), N, (R,))
        a_h = float(chi2_reg_param(*args))       # log10(alpha)
        a_g = float(chi2_reg_param_grid(*args))  # log10(alpha)
        if kind == "too_smooth":
            assert a_h == -np.inf and a_g == -np.inf
        elif kind == "no_bracket":
            assert np.isnan(a_h) and np.isnan(a_g)
        else:
            # same unique root up to cutoff-retention noise: this basis is
            # deliberately cutoff-heavy (quirk #2 near-null cluster), so
            # chi2(alpha) is a fine-scale staircase of keep-flips near the
            # root and ANY two correct root-finders land ~1e-4..1e-3 apart
            # in log10(alpha) (docs/PARITY_NOTES.md #7/#8; same envelope
            # as test_fit.test_fit_records_match_oracle's alpha_tol)
            assert np.isfinite(a_h) and np.isfinite(a_g)
            assert abs(a_h - a_g) < 2e-3, (kind, a_h, a_g)
