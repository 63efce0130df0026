"""Time-dependent coefficients (ops/timesmooth.py): spline math, GCV
denoising, and the TIME_SMOOTHING -> /TimeFit -> Estimate('spline')
product path.  The reference has no equivalent (its time handling is the
TODO at reference models/sphharmlag.py:17; Estimate only selects /
linearly interpolates records, reference estimate.py:180-221)."""

import datetime as dt

import numpy as np
import pytest

from volumetricinterp_tpu.ops import timesmooth as ts


def _utc(t0s):
    return dt.datetime(1970, 1, 1) + dt.timedelta(seconds=float(t0s))


def test_bspline_partition_of_unity():
    knots = ts.make_knots(0.0, 10.0, 7)
    tq = np.linspace(0.0, 10.0, 301)  # includes both clamped ends
    B = ts.bspline_design(tq, knots)
    assert B.shape == (301, 7 + ts.DEGREE)
    np.testing.assert_allclose(B.sum(axis=1), 1.0, atol=1e-12)
    assert np.all(B >= -1e-15)
    # clamped ends: the first/last basis function carries the endpoint
    assert B[0, 0] == pytest.approx(1.0)
    assert B[-1, -1] == pytest.approx(1.0)


def test_spline_reproduces_cubic_exactly():
    """Cubic polynomials lie in the span of any cubic B-spline basis, so
    an (effectively) unpenalized fit must reproduce them to rounding."""
    rng = np.random.default_rng(3)
    t = np.sort(rng.uniform(0.0, 86400.0, 60)) + 1.47e9  # epoch-second scale
    coefs = rng.normal(size=(4, 5))
    tau = (t - t[0]) / (t[-1] - t[0])
    C = sum(c[None, :] * tau[:, None] ** p for p, c in enumerate(coefs))
    fitdict = ts.fit_time_spline(t, C, lam=1e-12, nseg=8)
    Chat = ts.eval_time_spline(fitdict, t)
    np.testing.assert_allclose(Chat, C, rtol=0, atol=1e-8)


def test_gcv_denoises_noisy_trajectory():
    rng = np.random.default_rng(7)
    n = 200
    t = np.linspace(0, 86400.0, n) + 1.47e9
    tau = np.linspace(0, 2 * np.pi, n)
    truth = np.stack([np.sin(tau), np.cos(2 * tau), 0.3 * tau], axis=1)
    noisy = truth + 0.25 * rng.normal(size=truth.shape)
    fitdict = ts.fit_time_spline(t, noisy, lam="gcv")
    smooth = ts.eval_time_spline(fitdict, t)
    mse_raw = np.mean((noisy - truth) ** 2)
    mse_fit = np.mean((smooth - truth) ** 2)
    assert mse_fit < 0.35 * mse_raw  # GCV must remove most of the noise
    assert np.isfinite(fitdict["lam"]) and fitdict["lam"] > 0


def test_spline_handles_nan_records():
    rng = np.random.default_rng(9)
    t = np.linspace(0, 3600.0, 40) + 1.47e9
    C = np.outer(np.linspace(0, 1, 40), rng.normal(size=3))
    C[7] = np.nan  # one failed record must not poison the trajectory
    fitdict = ts.fit_time_spline(t, C, lam=1e-9, nseg=4)
    Chat = ts.eval_time_spline(fitdict, t)
    assert np.all(np.isfinite(Chat))
    good = np.ones(40, bool)
    good[7] = False
    np.testing.assert_allclose(Chat[good], C[good], atol=1e-7)


def test_eval_out_of_range_raises():
    fitdict = ts.fit_time_spline(
        np.linspace(0, 100.0, 12), np.zeros((12, 2)), lam=1.0, nseg=2)
    with pytest.raises(ValueError, match="out of range"):
        ts.eval_time_spline(fitdict, 101.0)
    with pytest.raises(ValueError, match="out of range"):
        ts.eval_time_spline(fitdict, [-0.5, 50.0])


@pytest.fixture(scope="module")
def spline_workspace(tmp_path_factory, small_config_text):
    from volumetricinterp_tpu import Interpolate
    from volumetricinterp_tpu.config import Config
    from volumetricinterp_tpu.io.synth import write_synthetic_amisr
    from volumetricinterp_tpu.models.sphharmlag import Model

    tmp = tmp_path_factory.mktemp("timesmooth")
    raw = str(tmp / "synth.h5")
    out = str(tmp / "coef.h5")
    cfg0 = Config.from_text(small_config_text)
    write_synthetic_amisr(raw, nrec=8, seed=4,
                          smooth_in_model=Model(cfg0))
    text = small_config_text.replace("test_input.h5", raw).replace(
        "test_output.h5", out)
    text = text.replace("REGULARIZATION_METHOD = chi2",
                        "REGULARIZATION_METHOD = chi2\nTIME_SMOOTHING = gcv")
    interp = Interpolate(Config.from_text(text))
    interp.calc_coeffs()
    interp.saveh5()
    return dict(out=out, interp=interp)


def test_fit_writes_timefit_and_estimate_evaluates(spline_workspace):
    from volumetricinterp_tpu import Estimate

    interp = spline_workspace["interp"]
    assert interp.timefit is not None

    est = Estimate(spline_workspace["out"], timeinterp="spline")
    assert est.timefit is not None
    np.testing.assert_allclose(est.timefit["S"], interp.timefit["S"])

    mt = np.mean(est.time, axis=1)
    # mid-window time BETWEEN records: spline evaluates continuously
    tq = _utc(0.5 * (mt[2] + mt[3]))
    C, dC = est.get_C(tq)
    assert C.shape == (est.Coeffs.shape[1],)
    assert np.all(np.isfinite(C))
    assert dC.shape == est.Covariance.shape[1:]
    # the smoothed trajectory stays near the per-record coefficients
    # (synthetic day: same smooth truth in every record)
    ref_scale = np.abs(est.Coeffs[2]).max()
    assert np.abs(C - est.Coeffs[2]).max() < 0.5 * ref_scale

    # full field evaluation through the spline path
    val = est(tq, 78.0, -98.0, 300e3, check_hull=False)
    assert np.isfinite(float(val))

    with pytest.raises(ValueError, match="out of range"):
        est.get_C(_utc(mt[-1] + 1e6))


def test_estimate_spline_requires_payload(tmp_path, small_config_text,
                                          spline_workspace):
    """A file written WITHOUT TIME_SMOOTHING must fail loudly on
    timeinterp='spline' and keep working on the default path."""
    import h5py
    import shutil

    from volumetricinterp_tpu import Estimate

    bare = str(tmp_path / "bare.h5")
    shutil.copy(spline_workspace["out"], bare)
    with h5py.File(bare, "r+") as f:
        del f["TimeFit"]
    with pytest.raises(ValueError, match="TimeFit"):
        Estimate(bare, timeinterp="spline")
    est = Estimate(bare)  # default nearest-record path unaffected
    mt = np.mean(est.time, axis=1)
    C, _ = est.get_C(_utc(mt[1]))
    assert np.all(np.isfinite(C))
