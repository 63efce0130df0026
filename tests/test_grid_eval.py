"""Fused grid evaluator: XLA path, Pallas kernel (interpret mode on CPU),
domain-restricted refit correctness."""

import numpy as np
import pytest
import jax.numpy as jnp
from jax.experimental.pallas import tpu as pltpu

from volumetricinterp_tpu import coords
from volumetricinterp_tpu.config import Config
from volumetricinterp_tpu.models.sphharmlag import Model
from volumetricinterp_tpu.ops.grid_eval import GridEvaluator


@pytest.fixture(scope="module")
def model(small_config_text):
    # default production order for the hot path
    text = small_config_text.replace("MAXK = 2", "MAXK = 4").replace(
        "MAXL = 3", "MAXL = 6"
    )
    return Model(Config.from_text(text))


@pytest.fixture(scope="module")
def points(model):
    rng = np.random.default_rng(9)
    n = 8192
    lat = rng.uniform(74, 82, n)
    lon = rng.uniform(252, 272, n)
    alt = rng.uniform(1e5, 6e5, n)
    z, t, p = coords.np_geodetic_to_cap(lat, lon, alt, model.latcp, model.loncp)
    C = rng.normal(size=model.nbasis) * 1e11
    truth = np.asarray(model.basis(lat, lon, alt)) @ C
    return lat, lon, alt, (t.min(), t.max()), C, truth


def test_xla_f32_matches_f64(model, points):
    lat, lon, alt, trange, C, truth = points
    ev = GridEvaluator(model, trange, impl="xla")
    out = np.asarray(ev(C, lat, lon, alt))
    scale = np.max(np.abs(truth))
    assert np.max(np.abs(out - truth)) < 5e-5 * scale


def test_xla_f64_matches_basis_path(model, points):
    lat, lon, alt, trange, C, truth = points
    ev = GridEvaluator(model, trange, impl="xla", dtype=jnp.float64, tol=1e-13)
    out = np.asarray(ev(C, lat, lon, alt))
    scale = np.max(np.abs(truth))
    assert np.max(np.abs(out - truth)) < 1e-9 * scale


def test_pallas_interpret_matches_xla(model, points):
    """Both f32 paths sit within the f32-theta-resolution envelope of the
    f64 truth (the kernel fuses its own f32 coordinate transform, so it is
    not bit-identical to the XLA path)."""
    lat, lon, alt, trange, C, truth = points
    ev_x = GridEvaluator(model, trange, impl="xla")
    ev_p = GridEvaluator(model, trange, impl="pallas")
    out_x = np.asarray(ev_x(C, lat, lon, alt))
    with pltpu.force_tpu_interpret_mode():
        out_p = np.asarray(ev_p(C, lat, lon, alt))
    scale = np.max(np.abs(truth))
    assert np.max(np.abs(out_p - truth)) < 5e-5 * scale
    assert np.max(np.abs(out_p - out_x)) < 5e-5 * scale


def test_domain_refit_is_small(model, points):
    """The band refit must cut the Chebyshev degree well below the full
    table's (the 5x flop reduction the kernel relies on)."""
    lat, lon, alt, trange, C, truth = points
    ev = GridEvaluator(model, trange, impl="xla")
    assert ev.degree < model.tables.degree / 3
    assert ev.degree >= 8


def test_shape_preservation(model, points):
    lat, lon, alt, trange, C, truth = points
    ev = GridEvaluator(model, trange, impl="xla")
    out = ev(C, lat[:60].reshape(3, 4, 5), lon[:60].reshape(3, 4, 5),
             alt[:60].reshape(3, 4, 5))
    assert out.shape == (3, 4, 5)


def test_batched_records_matches_single(model, points):
    """eval_records (one dispatch for many coefficient vectors) vs per-
    record calls, XLA and Pallas-interpret."""
    lat, lon, alt, trange, C, truth = points
    rng = np.random.default_rng(21)
    Cs = rng.normal(size=(3, model.nbasis)) * 1e11

    ev_x = GridEvaluator(model, trange, impl="xla")
    batched = np.asarray(ev_x.eval_records(Cs, lat[:4096], lon[:4096], alt[:4096]))
    singles = np.stack(
        [np.asarray(ev_x(c, lat[:4096], lon[:4096], alt[:4096])) for c in Cs]
    )
    scale = np.max(np.abs(singles))
    assert np.max(np.abs(batched - singles)) < 1e-6 * scale

    ev_p = GridEvaluator(model, trange, impl="pallas")
    with pltpu.force_tpu_interpret_mode():
        batched_p = np.asarray(
            ev_p.eval_records(Cs, lat[:4096], lon[:4096], alt[:4096])
        )
        singles_p = np.stack(
            [np.asarray(ev_p(c, lat[:4096], lon[:4096], alt[:4096])) for c in Cs]
        )
    assert np.max(np.abs(batched_p - singles_p)) < 1e-6 * scale


def test_out_of_band_points_are_nan(model, points):
    """The f32 fast path NaNs points outside its fitted colatitude band
    instead of extrapolating Chebyshev garbage."""
    lat, lon, alt, trange, C, truth = points
    ev = GridEvaluator(model, trange, impl="xla")
    # 40 degrees south of the FoV: colatitude far outside the band
    out = np.asarray(ev(C, np.array([40.0, lat[0]]), np.array([262.0, lon[0]]),
                        np.array([3e5, alt[0]])))
    assert np.isnan(out[0])
    assert np.isfinite(out[1])

    ev_p = GridEvaluator(model, trange, impl="pallas")
    with pltpu.force_tpu_interpret_mode():
        out_p = np.asarray(
            ev_p(C, np.array([40.0, lat[0]]), np.array([262.0, lon[0]]),
                 np.array([3e5, alt[0]]))
        )
    assert np.isnan(out_p[0])
    assert np.isfinite(out_p[1])
