"""End-to-end parity: synthetic file -> Interpolate -> coefficient file ->
Estimate -> field values, against the oracle's serial reference pipeline
(SURVEY.md section 4, items 2-3)."""

import datetime as dt

import numpy as np
import pytest

from volumetricinterp_tpu import Estimate, Interpolate
from volumetricinterp_tpu.config import Config
from volumetricinterp_tpu.io.amisr import read_datafile
from volumetricinterp_tpu.io.synth import write_synthetic_amisr
from volumetricinterp_tpu.models.sphharmlag import Model
from volumetricinterp_tpu.utils.hull import check_hull_reference
from tests.oracle import oracle_fit_record


def _utc(ts):
    """Naive-UTC datetime from a unix stamp (the package API's
    convention; utcfromtimestamp is deprecated)."""
    return dt.datetime(1970, 1, 1) + dt.timedelta(seconds=float(ts))


@pytest.fixture(scope="module")
def workspace(tmp_path_factory, small_config_text):
    """Synthetic file + config wired to tmp paths, plus a full fit run."""
    tmp = tmp_path_factory.mktemp("e2e")
    raw = str(tmp / "synth.h5")
    out = str(tmp / "coef.h5")

    cfg0 = Config.from_text(small_config_text)
    model = Model(cfg0)
    write_synthetic_amisr(raw, nrec=5, seed=11, smooth_in_model=model,
                          nan_frac=0.04, bad_frac=0.02)

    text = small_config_text.replace("test_input.h5", raw).replace(
        "test_output.h5", out
    )
    interp = Interpolate(Config.from_text(text))
    interp.calc_coeffs()
    interp.saveh5()
    return dict(raw=raw, out=out, text=text, interp=interp)


def test_fit_matches_oracle_pipeline(workspace):
    interp = workspace["interp"]
    utime, lat, lon, alt, value, error = read_datafile(
        workspace["raw"], "dens", [1e10, 1e13], [0.1, 10.0], [1, 2, 3, 4]
    )
    A = np.asarray(interp.model.basis(lat, lon, alt))
    psi = np.asarray(interp.model.eval_psi())

    n_ok = 0
    for r in range(value.shape[0]):
        C_ref, dC_ref, c2_ref, p_ref = oracle_fit_record(
            value[r], error[r], A, [psi], method="chi2"
        )
        if np.isnan(p_ref[0]):
            assert np.all(np.isnan(interp.Coeffs[r]))
            continue
        n_ok += 1
        # Parity is asserted in the DATA-DETERMINED metric: the W-weighted
        # field residual.  Eigendirections straddling the lstsq cutoff have
        # negligible weighted footprint but visible raw amplitude, and their
        # retention is implementation-arbitrary — the reference's own output
        # flips them across LAPACK builds (docs/PARITY_NOTES.md #7).
        mask = np.isfinite(value[r])
        sw = 1.0 / error[r][mask]
        y1 = (A @ interp.Coeffs[r])[mask] * sw
        y2 = (A @ C_ref)[mask] * sw
        # 2e-2: records whose chi2=nu root lands where the cutoff solve is
        # discontinuous carry O(10%) alpha noise in ANY implementation;
        # tight-parity bars for stable roots live in test_fit.py.
        assert np.linalg.norm(y1 - y2) < 2e-2 * np.linalg.norm(y2), r
        assert np.isclose(interp.chi_sq[r], c2_ref, rtol=1e-4), r
        assert np.isclose(
            np.log10(interp.reg_params[r, 0]), np.log10(p_ref[0]), atol=0.1
        ), r
    assert n_ok >= 3  # most records must actually fit


def test_estimate_round_trip(workspace):
    """Estimate reloads the file, reconstructs the model from the embedded
    config, and reproduces A @ C at interior points."""
    est = Estimate(workspace["out"])
    interp = workspace["interp"]

    # config text round trip (interpolate.py:699-708 <-> estimate.py:41-50)
    assert est.config.raw_text == workspace["text"]
    assert est.model.nbasis == interp.model.nbasis

    r = int(np.argmax(np.isfinite(interp.chi_sq)))
    t_mid = _utc(np.mean(interp.time[r]))

    lat = np.linspace(74.5, 76.5, 8)
    lon = np.full(8, 265.0)
    alt = np.full(8, 300e3)
    P = est(t_mid, lat, lon, alt, check_hull=False)
    A = np.asarray(est.model.basis(lat, lon, alt))
    expected = A @ interp.Coeffs[r]
    assert np.allclose(P, expected, rtol=1e-8)


def test_estimate_hull_masking(workspace):
    est = Estimate(workspace["out"])
    r = int(np.argmax(np.isfinite(est.chi2)))
    t_mid = _utc(np.mean(est.time[r]))
    # far outside the FoV -> NaN; inside -> finite
    lat = np.array([74.9, 40.0])
    lon = np.array([265.0, 100.0])
    alt = np.array([300e3, 300e3])
    P = est(t_mid, lat, lon, alt, check_hull=True)
    assert np.isfinite(P[0])
    assert np.isnan(P[1])


def test_check_hull_matches_reference_semantics(workspace):
    """Half-space test == per-point qhull vertex comparison
    (estimate.py:153-178)."""
    est = Estimate(workspace["out"])
    rng = np.random.default_rng(4)
    lat = rng.uniform(72.0, 80.0, 60)
    lon = rng.uniform(258.0, 272.0, 60)
    alt = rng.uniform(1e5, 9e5, 60)
    fast = est.check_hull(lat, lon, alt)
    ref = check_hull_reference(est.hull_vert, lat, lon, alt)
    # boundary-grazing points may differ by qhull's internal tolerance;
    # demand exact agreement away from the boundary
    from volumetricinterp_tpu.utils.hull import hull_equations
    from volumetricinterp_tpu import coords

    eqs = hull_equations(est.hull_vert)
    x, y, z = coords.np_geodetic2ecef(lat, lon, alt)
    P = np.stack([x, y, z], -1)
    d = (P @ eqs[:, :3].T + eqs[None, :, 3]).max(axis=1)
    clear = np.abs(d) > 1.0  # more than 1 m from the boundary
    np.testing.assert_array_equal(fast[clear], ref[clear])
    assert fast[clear].sum() > 5  # the test actually covers interior points


def test_estimate_time_selection(workspace):
    est = Estimate(workspace["out"], timetol=60.0)
    mt = np.mean(est.time, axis=1)
    # nearest-record selection
    t = _utc(mt[2] + 5.0)
    C, dC = est.get_C(t)
    np.testing.assert_array_equal(C, est.Coeffs[2])
    # out of tolerance -> ValueError (estimate.py:218-219)
    t_far = _utc(mt[-1] + 1e5)
    with pytest.raises(ValueError):
        est.get_C(t_far)


def test_estimate_time_interp(workspace):
    est = Estimate(workspace["out"], timeinterp=True)
    mt = np.mean(est.time, axis=1)
    tq = mt[1] + 0.25 * (mt[2] - mt[1])
    C, dC = est.get_C(_utc(tq))
    expected = 0.75 * est.Coeffs[1] + 0.25 * est.Coeffs[2]
    np.testing.assert_allclose(np.asarray(C), expected, rtol=1e-12)


def test_estimate_gradients_and_errors(workspace):
    """calcgrad/calcerr implemented for real (docs/PARITY_NOTES.md #5)."""
    est = Estimate(workspace["out"])
    r = int(np.argmax(np.isfinite(est.chi2)))
    t_mid = _utc(np.mean(est.time[r]))
    lat = np.linspace(74.6, 75.4, 5)
    lon = np.full(5, 265.0)
    alt = np.full(5, 300e3)
    P, dP, err, graderr = est(
        t_mid, lat, lon, alt, calcgrad=True, calcerr=True, check_hull=False
    )
    assert dP.shape == (5, 3)
    assert err.shape == (5,)
    assert graderr.shape == (5, 3)
    assert np.all(np.isfinite(dP)) and np.all(np.isfinite(err))
    # error = sqrt(a' dC a)
    A = np.asarray(est.model.basis(lat, lon, alt))
    C, dC = est.get_C(t_mid)
    np.testing.assert_allclose(
        err, np.sqrt(np.einsum("pi,ij,pj->p", A, np.asarray(dC), A)),
        rtol=1e-8,
    )


def test_grid_eval_fast_path_matches_f64(workspace):
    """float32 fused grid evaluation vs the float64 basis path."""
    est = Estimate(workspace["out"])
    r = int(np.argmax(np.isfinite(est.chi2)))
    t_mid = _utc(np.mean(est.time[r]))
    glat, glon, galt = np.meshgrid(
        np.linspace(73.5, 77.0, 12), np.linspace(260.0, 270.0, 12),
        np.linspace(150e3, 500e3, 6),
    )
    fast = est.grid_eval(t_mid, glat, glon, galt, check_hull=False)
    slow = est(t_mid, glat, glon, galt, check_hull=False)
    scale = np.nanmax(np.abs(slow))
    assert np.nanmax(np.abs(fast - slow)) < 5e-5 * scale


def test_evaluate_records_keogram(workspace):
    """Multi-record grid products share the compiled fast path."""
    est = Estimate(workspace["out"])
    ok = np.isfinite(est.chi2)
    mts = np.mean(est.time, axis=1)[ok][:3]
    times = [_utc(t) for t in mts]
    glat, glon, galt = np.meshgrid(
        np.linspace(74.0, 76.5, 10), np.linspace(262.0, 268.0, 10),
        np.array([250e3, 300e3]),
    )
    vols = est.evaluate_records(times, glat, glon, galt)
    assert vols.shape == (3,) + glat.shape
    assert np.isfinite(vols).any()
    # matches per-record grid_eval
    one = est.grid_eval(times[1], glat, glon, galt)
    np.testing.assert_allclose(
        vols[1], one, rtol=0, atol=1e-6 * np.nanmax(np.abs(one)), equal_nan=True
    )


def test_cli_validate_main(workspace, tmp_path):
    """The standalone validate console entry (reference run_validate.py)."""
    import volumetricinterp_tpu.cli as cli

    png = str(tmp_path / "vmain.png")
    text = workspace["text"] + f"\n"
    text = text.replace("test_fig.png", png)
    cfg = str(tmp_path / "c.ini")
    with open(cfg, "w") as f:
        f.write(text)
    cli.validate_main([cfg])


def test_multiparam_single_pass(workspace, tmp_path):
    """Several parameters fitted in one pass with shared design/reg
    matrices; each gets its own coefficient file."""
    out = str(tmp_path / "multi.h5")
    text = workspace["text"].replace(workspace["out"], out)
    interp = Interpolate(Config.from_text(text))
    # 'temp_N2' with N2 absent from IonMass routes to the electron index
    # -1 (interpolate.py:627-629); a species key like 'temp_e' raises
    # KeyError in the reference too (mass_dict has no 'e')
    res = interp.calc_coeffs_multiparam(["dens", "temp_N2"])
    assert set(res) == {"dens", "temp_N2"}
    import os as _os

    root, ext = _os.path.splitext(out)
    for prm in ("dens", "temp_N2"):
        fn = f"{root}.{prm}{ext}"
        assert _os.path.exists(fn)
        est = Estimate(fn)
        assert est.Coeffs.shape == res[prm][1].shape
    # densities fit well; electron temperatures are constant-ish in the
    # synthetic file, so both should produce some finite records
    assert np.isfinite(res["dens"][3]).sum() >= 3


def test_evaluate_records_grid_cache_invalidation(workspace):
    """The prepared-grid cache (round 5: device grid + hull mask + band
    cached per Estimate instance) must MISS when the grid content
    changes — a stale hit would evaluate the wrong coordinates."""
    est = Estimate(workspace["out"])
    ok = np.isfinite(est.chi2)
    mts = np.mean(est.time, axis=1)[ok][:2]
    times = [_utc(t) for t in mts]
    glat, glon, galt = np.meshgrid(
        np.linspace(74.0, 76.5, 9), np.linspace(262.0, 268.0, 9),
        np.array([250e3, 300e3]),
    )
    a = est.evaluate_records(times, glat, glon, galt)
    a2 = est.evaluate_records(times, glat, glon, galt)  # cache hit
    np.testing.assert_array_equal(a, a2)
    # shift one interior altitude: same shape, different content
    galt2 = galt.copy()
    galt2[4, 4, 1] = 280e3
    b = est.evaluate_records(times, glat, glon, galt2)
    fresh = Estimate(workspace["out"])
    b_ref = fresh.evaluate_records(times, glat, glon, galt2)
    np.testing.assert_allclose(b, b_ref, equal_nan=True)
    assert not np.array_equal(a, b)
    # hull-mask upgrade path: first call without hull, then with
    est3 = Estimate(workspace["out"])
    c_nohull = est3.evaluate_records(times, glat, glon, galt,
                                     check_hull=False)
    c_hull = est3.evaluate_records(times, glat, glon, galt)
    assert np.isnan(c_hull).sum() >= np.isnan(c_nohull).sum()


def test_point_bucket_padding_is_exact(workspace, tmp_path):
    """POINT_BUCKET pads the point axis with fully-masked points: the
    padded fit must match the unpadded one inside the summation-order
    envelope (zero-weight rows contribute exact zeros, but a different
    point count changes XLA's reduction tree — the same ~1e-4 chi2
    envelope as any two BLAS orders, PARITY_NOTES #7/#8)."""
    out = str(tmp_path / "nopad.h5")
    text = workspace["text"].replace(workspace["out"], out)
    text += "\nPOINT_BUCKET = 0\n" if "[TPU]" in text else \
        "\n[TPU]\nPOINT_BUCKET = 0\n"
    interp0 = Interpolate(Config.from_text(text))
    assert interp0.config.tpu.point_bucket == 0
    interp0.calc_coeffs()
    ref = workspace["interp"]  # fitted with the default bucket (480)
    assert ref.config.tpu.point_bucket == 480
    np.testing.assert_allclose(interp0.chi_sq, ref.chi_sq, rtol=1e-4,
                               equal_nan=True)
    np.testing.assert_allclose(interp0.Coeffs, ref.Coeffs, rtol=0,
                               atol=1e-4 * np.nanmax(np.abs(ref.Coeffs)),
                               equal_nan=True)
