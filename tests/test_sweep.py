"""Leave-one-beam-out CV sweep: statistics identity vs brute-force beam
deletion, and end-to-end order/alpha selection."""

import numpy as np
import pytest

from volumetricinterp_tpu.config import Config
from volumetricinterp_tpu.io.amisr import beam_index, read_datafile
from volumetricinterp_tpu.io.synth import write_synthetic_amisr
from volumetricinterp_tpu.models.sphharmlag import Model
from volumetricinterp_tpu.sweep import lobo_cv, order_sweep


@pytest.fixture(scope="module")
def sweep_data(tmp_path_factory, small_config_text):
    tmp = tmp_path_factory.mktemp("sweep")
    fn = str(tmp / "synth.h5")
    model = Model(Config.from_text(small_config_text))
    write_synthetic_amisr(fn, nrec=3, seed=31, smooth_in_model=model,
                          nan_frac=0.03, bad_frac=0.0)
    utime, lat, lon, alt, values, errors = read_datafile(
        fn, "dens", [1e10, 1e13], [0.1, 10.0], [1, 2, 3, 4]
    )
    bidx = beam_index(fn)
    assert bidx.shape == lat.shape
    A = np.asarray(model.basis(lat, lon, alt))
    psi = np.asarray(model.eval_psi())
    return dict(model=model, A=A, values=values, errors=errors, bidx=bidx,
                psi=psi, lat=lat, lon=lon, alt=alt)


def test_lobo_matches_brute_force(sweep_data):
    """The per-beam statistics identity equals physically deleting the beam
    and refitting with scipy."""
    import scipy.linalg

    d = sweep_data
    A, values, errors, bidx, psi = d["A"], d["values"], d["errors"], d["bidx"], d["psi"]
    log_alphas = [-25.0, -23.0]
    scores, per = lobo_cv(values, errors, A, bidx, psi, log_alphas)
    assert scores.shape == (2,)

    r, b = 1, 2
    for ai, la in enumerate(log_alphas):
        alpha = 10.0**la
        v, e = values[r], errors[r]
        fin = np.isfinite(v)
        train = fin & (bidx != b)
        test = fin & (bidx == b)
        At, bt, Wt = A[train], v[train], e[train] ** -2.0
        X = np.einsum("ji,j,jk->ik", At, Wt, At) + alpha * psi
        y = np.einsum("ji,j,j->i", At, Wt, bt)
        C = scipy.linalg.lstsq(X, y)[0]
        resid = A[test] @ C - v[test]
        expected = np.sum(resid**2 * e[test] ** -2.0)
        assert np.isclose(per[r, b, ai], expected, rtol=1e-7), (ai, la)


def test_order_sweep_selects(sweep_data, small_config_text):
    d = sweep_data
    res = order_sweep(
        Config.from_text(small_config_text),
        d["values"], d["errors"], d["lat"], d["lon"], d["alt"], d["bidx"],
        orders=[(2, 2), (2, 3)],
        log10_alphas=[-26.0, -24.0, -22.0],
    )
    assert res["scores"].shape == (2, 3)
    assert np.all(np.isfinite(res["scores"]))
    assert res["best_order"] in [(2, 2), (2, 3)]
