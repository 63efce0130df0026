"""Jointly time-regularized fits (ops/timejoint.py): the time-penalty
coupling inside the solve that completes the reference's "Adapt model to
fit for time" TODO (reference models/sphharmlag.py:17).

CPU runs the identical code in native f64 — the oracle for the block-
tridiagonal Thomas solve."""

import numpy as np
import pytest

from volumetricinterp_tpu.config import Config
from volumetricinterp_tpu.models.sphharmlag import Model
from volumetricinterp_tpu.ops.timejoint import fit_time_coupled


@pytest.fixture(scope="module")
def day(small_config_text):
    model = Model(Config.from_text(small_config_text))
    rng = np.random.default_rng(23)
    npts, nrec = 300, 12
    lat = rng.uniform(74, 82, npts)
    lon = rng.uniform(252, 272, npts)
    alt = rng.uniform(1e5, 6e5, npts)
    A = np.asarray(model.basis(lat, lon, alt))
    target = 4e11 * np.exp(-(((alt - 3e5) / 1.2e5) ** 2))
    C_true = np.linalg.lstsq(A, target, rcond=1e-10)[0]
    values = np.zeros((nrec, npts))
    errors = np.zeros((nrec, npts))
    for r in range(nrec):
        ne = A @ C_true * (1.0 + 0.03 * r)
        noise = 2e10 + 0.05 * np.abs(ne)
        values[r] = ne + rng.normal(0, 1, npts) * noise
        errors[r] = 1.15 * noise
    psi = np.asarray(model.eval_psi())
    la = np.full((nrec, 1), -22.0)  # fixed plausible alpha for every record
    return values, errors, A, psi[None], la


def _indep_solve(values, errors, A, reg_mats, la, jitter_rel=1e-7):
    """Independent per-record jittered solve — the beta -> 0 limit (same
    global normalization scale and jitter as joint_time_solve)."""
    nb = A.shape[1]
    Xs, rhss = [], []
    for r in range(values.shape[0]):
        mask = np.isfinite(values[r])
        W = np.where(mask, errors[r], 1.0) ** -2.0 * mask
        b = np.where(mask, values[r], 0.0)
        Xs.append(np.einsum("pi,p,pj->ij", A, W, A))
        rhss.append(A.T @ (W * b))
    s = np.mean([np.trace(X) / nb for X in Xs])
    out = []
    for r, (X, rhs) in enumerate(zip(Xs, rhss)):
        Xn = X / s + (10.0 ** la[r, 0] / s) * reg_mats[0] \
            + jitter_rel * np.eye(nb)
        out.append(np.linalg.solve(Xn, rhs / s))
    return np.asarray(out)


def test_weak_coupling_matches_independent(day):
    """beta -> 0: the joint solve equals independent per-record solves
    (the spline-equivalence limit — no coupling, no smoothing)."""
    values, errors, A, reg_mats, la = day
    C_j, chi2 = fit_time_coupled(values, errors, A, reg_mats, la, 1e-12)
    C_i = _indep_solve(values, errors, A, reg_mats, la)
    # compare in the data-determined metric (W-weighted field residual)
    for r in range(values.shape[0]):
        W = errors[r] ** -2.0
        num = np.sqrt(np.sum(W * (A @ (C_j[r] - C_i[r])) ** 2))
        den = np.sqrt(np.sum(W * (A @ C_i[r]) ** 2))
        assert num / den < 1e-5
    assert np.all(np.isfinite(chi2))


def test_strong_coupling_pools_records(day):
    """beta -> inf: every record's coefficients converge to one vector."""
    values, errors, A, reg_mats, la = day
    C_j, _ = fit_time_coupled(values, errors, A, reg_mats, la, 1e6)
    spread = np.max(np.std(C_j, axis=0) / (np.abs(np.mean(C_j, axis=0))
                                           + 1e-30))
    assert spread < 1e-3


def test_coupling_monotonically_smooths(day):
    """Total first-difference energy decreases as beta grows."""
    values, errors, A, reg_mats, la = day
    tv = []
    for beta in (1e-12, 1e-4, 1e-1, 1e2):
        C_j, _ = fit_time_coupled(values, errors, A, reg_mats, la, beta)
        tv.append(float(np.sum((C_j[1:] - C_j[:-1]) ** 2)))
    assert all(a >= b * (1 - 1e-9) for a, b in zip(tv, tv[1:])), tv


def test_failed_record_carried_by_neighbors(day):
    """A record whose search failed (NaN alphas) is solved with alpha = 0
    and held by the coupling — no NaN gap in the joint product."""
    values, errors, A, reg_mats, la = day
    la = la.copy()
    la[5, 0] = np.nan
    values = values.copy()
    values[5] = np.nan  # the record also lost its data
    errors = errors.copy()
    errors[5] = np.nan
    C_j, chi2 = fit_time_coupled(values, errors, A, reg_mats, la, 1e-3)
    assert np.all(np.isfinite(C_j[5]))
    # with NO data, the filled record interpolates its neighbors
    mid = 0.5 * (C_j[4] + C_j[6])
    W = errors[4] ** -2.0
    num = np.sqrt(np.sum(W * (A @ (C_j[5] - mid)) ** 2))
    den = np.sqrt(np.sum(W * (A @ mid) ** 2))
    assert num / den < 0.05


def test_time_coupling_config_end_to_end(tmp_path, small_config_text):
    """[DEFAULT] TIME_COUPLING wires the joint solve into calc_coeffs and
    the saved file reflects the joint coefficients."""
    import h5py

    from volumetricinterp_tpu import Interpolate
    from volumetricinterp_tpu.io.synth import write_synthetic_amisr

    raw = str(tmp_path / "raw.h5")
    out = str(tmp_path / "coef.h5")
    model = Model(Config.from_text(small_config_text))
    write_synthetic_amisr(raw, nrec=5, seed=31, smooth_in_model=model)
    text = small_config_text.replace("test_input.h5", raw).replace(
        "test_output.h5", out)
    text = text.replace("[MODEL]", "TIME_COUPLING = 1e-4\n\n[MODEL]")
    interp = Interpolate(Config.from_text(text))
    interp.calc_coeffs()
    interp.saveh5()
    assert np.all(np.isfinite(interp.Coeffs))
    with h5py.File(out, "r") as f:
        np.testing.assert_allclose(f["Coeffs/C"][:], interp.Coeffs)
