"""Data-informed (target-profile) regularization via tau vectors.

The reference HINTS at this capability (sphharmlag.py:186 "...use the IRI
to inform the 0th order regularization", and the unused eval_tau at
:241-259) but never implements it.  Here the penalty
alpha (C'RC - 2 tau'C), tau = R @ C_target, pulls the fit toward a target
profile; the normal equations become (AtWA + alpha R) C = AtWb + alpha tau
and the DATA chi^2 keeps its chi2 ~ nu search semantics.
"""

import numpy as np
import pytest
import jax.numpy as jnp

from volumetricinterp_tpu.ops.fit import fit_records
from volumetricinterp_tpu.ops.solve import suff_stats
from volumetricinterp_tpu.ops import regparam


@pytest.fixture(scope="module")
def problem():
    rng = np.random.default_rng(21)
    npts, nb = 200, 24
    A = rng.normal(size=(npts, nb)) * (10.0 ** (-3.0 * rng.random(nb)))[None]
    C_true = rng.normal(size=nb)
    errors = np.full((1, npts), 0.5)
    values = (A @ C_true + 0.5 * rng.normal(size=npts))[None]
    R = np.eye(nb) + 0.05 * np.ones((nb, nb))  # PD regularizer
    C_target = rng.normal(size=nb) * 2.0
    tau = (R @ C_target)[None]  # [nreg, nb]
    return A, values, errors, R[None], tau, C_target


def test_zero_tau_matches_no_tau(problem):
    A, values, errors, R, tau, _ = problem
    base = fit_records(values, errors, A, R, method="chi2")
    zt = fit_records(values, errors, A, R, method="chi2",
                     reg_taus=np.zeros_like(tau))
    for a, b in zip(base, zt):
        assert np.allclose(np.asarray(a), np.asarray(b), rtol=1e-12,
                           equal_nan=True)


def test_large_alpha_pulls_to_target(problem):
    """manual mode with a dominant alpha: C -> C_target (PD regularizer)."""
    A, values, errors, R, tau, C_target = problem
    scale = float(np.abs(np.trace(
        np.einsum("pi,pj->ij", A / 0.25, A))) / A.shape[1])
    C, dC, chi2, rp = fit_records(values, errors, A, R, method="manual",
                                  manual_params=[1e6 * scale], reg_taus=tau)
    C = np.asarray(C)[0]
    assert np.max(np.abs(C - C_target)) < 1e-3 * np.abs(C_target).max()


def test_chi2_search_with_tau_hits_nu(problem):
    """The exact search still lands on chi2(data) ~ nu with the tau pull
    active, and selects a DIFFERENT alpha than without the pull (the
    target disagrees with the data, so the same smoothing strength costs
    more chi2)."""
    A, values, errors, R, tau, _ = problem
    C0, _, chi20, rp0 = fit_records(values, errors, A, R, method="chi2")
    Ct, _, chi2t, rpt = fit_records(values, errors, A, R, method="chi2",
                                    reg_taus=tau)
    npts = values.shape[1]
    nus = npts * np.asarray(regparam.SCALE_FACTORS)
    # chi2 lands on one of the nu rungs in both cases
    assert np.min(np.abs(float(chi2t[0]) - nus)) < 1e-2 * npts
    assert np.isfinite(float(rpt[0, 0]))
    assert not np.isclose(float(rpt[0, 0]), float(rp0[0, 0]), rtol=1e-2)


def test_fast_mode_matches_exact_with_tau(problem):
    """The whitened fast search with tau agrees with the exact search
    within the jitter-vs-cutoff envelope."""
    A, values, errors, R, tau, _ = problem
    _, _, _, rp_e = fit_records(values, errors, A, R, method="chi2",
                                reg_taus=tau)
    _, _, _, rp_f = fit_records(values, errors, A, R, method="chi2",
                                reg_taus=tau, regparam_mode="fast")
    assert abs(np.log10(float(rp_e[0, 0])) - np.log10(float(rp_f[0, 0]))) < 0.05


def test_profile_config_end_to_end(tmp_path, small_config_text):
    """REGULARIZATION_PROFILE=chapman,... drives a 0thorder fit toward the
    profile through the full Interpolate pipeline (config -> eval_tau ->
    batched fit), and the output coefficients stay finite."""
    import h5py
    from volumetricinterp_tpu.config import Config
    from volumetricinterp_tpu.interpolate import Interpolate
    from volumetricinterp_tpu.io.synth import write_synthetic_amisr
    from volumetricinterp_tpu.models.sphharmlag import Model

    raw = str(tmp_path / "synth.h5")
    out = str(tmp_path / "coef.h5")
    text = small_config_text.replace("test_input.h5", raw).replace(
        "test_output.h5", out)
    text = text.replace(
        "REGULARIZATION_LIST = 0thorder",
        "REGULARIZATION_LIST = 0thorder\n"
        "REGULARIZATION_PROFILE = chapman,1e11,300,50")
    cfg = Config.from_text(text)
    assert cfg.fit.regularization_profile.startswith("chapman")
    model = Model(cfg)
    write_synthetic_amisr(raw, nrec=3, seed=4, smooth_in_model=model)
    interp = Interpolate(cfg)
    taus = interp._reg_taus(["0thorder"], model.nbasis)
    assert taus.shape == (1, model.nbasis)
    assert np.abs(taus).max() > 0
    interp.calc_coeffs()
    interp.saveh5()
    with h5py.File(out) as f:
        C = f["Coeffs/C"][()]
    assert np.isfinite(C).all()
