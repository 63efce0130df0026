"""Mesh-sharded fit == single-device fit, on 8 virtual CPU devices
(SURVEY.md section 4, item 4)."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from volumetricinterp_tpu.config import Config
from volumetricinterp_tpu.models.sphharmlag import Model
from volumetricinterp_tpu.ops.fit import fit_records
from volumetricinterp_tpu.ops.grid_eval import GridEvaluator
from volumetricinterp_tpu.parallel import (
    fit_records_sharded,
    grid_eval_sharded,
    make_mesh,
)


@pytest.fixture(scope="module")
def problem(small_config_text):
    model = Model(Config.from_text(small_config_text))
    rng = np.random.default_rng(17)
    npts, nrec = 437, 10  # deliberately not divisible by mesh sizes
    lat = rng.uniform(74, 82, npts)
    lon = rng.uniform(252, 272, npts)
    alt = rng.uniform(1e5, 6e5, npts)
    A = np.asarray(model.basis(lat, lon, alt))
    target = 4e11 * np.exp(-((alt - 3e5) / 1.2e5) ** 2)
    C_true = np.linalg.lstsq(A, target, rcond=1e-10)[0]
    values = np.zeros((nrec, npts))
    errors = np.zeros((nrec, npts))
    for r in range(nrec):
        ne = A @ C_true * (1.0 + 0.02 * r)
        noise = 2e10 + 0.05 * np.abs(ne)
        values[r] = ne + rng.normal(0, 1, npts) * noise
        errors[r] = 1.15 * noise
        drop = rng.random(npts) < 0.05
        values[r, drop] = np.nan
        errors[r, drop] = np.nan
    psi = np.asarray(model.eval_psi())
    return model, A, values, errors, psi


def test_devices_available():
    assert len(jax.devices()) >= 8


@pytest.mark.parametrize("mesh_shape", [
    (4, 2),  # records x points: the production topology
    pytest.param((2, 4), marks=pytest.mark.slow),
    pytest.param((8, 1), marks=pytest.mark.slow),
    (1, 8),  # pure point sharding: deepest psum_x coverage
])
def test_sharded_fit_matches_single_device(problem, mesh_shape):
    model, A, values, errors, psi = problem
    mesh = make_mesh(*mesh_shape)
    reg_mats = jnp.asarray(psi)[None]

    # fast mode: smooth objective (no cutoff discontinuities) -> sharded
    # results match single-device at reduction-noise level
    C1, dC1, c21, a1 = (np.asarray(q) for q in fit_records(
        jnp.asarray(values), jnp.asarray(errors), jnp.asarray(A), reg_mats,
        method="chi2", regparam_mode="fast",
    ))
    C2, dC2, c22, a2 = (np.asarray(q) for q in fit_records_sharded(
        values, errors, A, reg_mats, mesh, method="chi2",
        regparam_mode="fast",
    ))
    assert C2.shape == C1.shape
    np.testing.assert_allclose(a2, a1, rtol=1e-6)
    # the FINAL solve replicates gelsd's eps-level cutoff, whose retention
    # decisions are reduction-order sensitive: chi2/fields carry ~1e-4
    # noise between ANY two summation orders on this ill-conditioned basis
    np.testing.assert_allclose(c22, c21, rtol=1e-3)
    for r in range(values.shape[0]):
        f1 = A @ C1[r]
        f2 = A @ C2[r]
        m = np.isfinite(values[r])
        sw = 1.0 / errors[r][m]
        assert np.linalg.norm((f2 - f1)[m] * sw) < 1e-3 * np.linalg.norm(
            f1[m] * sw
        ), r

    # exact mode: the gelsd eps-cutoff makes retention decisions that are
    # reduction-order sensitive (docs/PARITY_NOTES.md #7) -> looser bars
    _, _, c2e1, ae1 = (np.asarray(q) for q in fit_records(
        jnp.asarray(values), jnp.asarray(errors), jnp.asarray(A), reg_mats,
        method="chi2", regparam_mode="exact",
    ))
    _, _, c2e2, ae2 = (np.asarray(q) for q in fit_records_sharded(
        values, errors, A, reg_mats, mesh, method="chi2",
        regparam_mode="exact",
    ))
    np.testing.assert_allclose(ae2, ae1, rtol=2e-2)
    np.testing.assert_allclose(c2e2, c2e1, rtol=1e-3)


def test_sharded_fit_manual_method(problem):
    model, A, values, errors, psi = problem
    mesh = make_mesh(2, 4)
    reg_mats = jnp.asarray(psi)[None]
    manual = jnp.asarray([1e-23])
    C1, _, c21, _ = fit_records(
        jnp.asarray(values), jnp.asarray(errors), jnp.asarray(A), reg_mats,
        method="manual", manual_params=manual,
    )
    C2, _, c22, _ = fit_records_sharded(
        values, errors, A, reg_mats, mesh, method="manual",
        manual_params=manual,
    )
    # final solve uses the eps-cutoff: reduction order can flip marginal
    # directions; chi2 noise floor ~1e-4 on this basis
    np.testing.assert_allclose(np.asarray(c22), np.asarray(c21), rtol=1e-3)


def test_sharded_grid_eval_matches_local(problem):
    model, A, values, errors, psi = problem
    mesh = make_mesh(4, 2)
    rng = np.random.default_rng(3)
    C = rng.normal(size=model.nbasis) * 1e11

    glat, glon, galt = np.meshgrid(
        np.linspace(74.5, 81.0, 23), np.linspace(254.0, 270.0, 17),
        np.linspace(1.5e5, 5e5, 5),
    )
    from volumetricinterp_tpu import coords

    z, t, p = coords.np_geodetic_to_cap(
        glat.ravel(), glon.ravel(), galt.ravel(), model.latcp, model.loncp
    )
    ev = GridEvaluator(model, (t.min(), t.max()), impl="xla")
    local = np.asarray(ev(C, glat, glon, galt))
    sharded = np.asarray(grid_eval_sharded(ev, C, glat, glon, galt, mesh))
    scale = np.max(np.abs(local))
    assert np.max(np.abs(sharded - local)) < 1e-6 * scale
