"""radbasfun (Gaussian RBF) model parity vs a direct numpy oracle."""

import numpy as np
import pytest

from volumetricinterp_tpu.config import Config
from volumetricinterp_tpu.models.radbasfun import Model
from tests.oracle.ref_impl import oracle_geodetic2ecef

CFG = """
[DEFAULT]
[MODEL]
NAME = radbasfun
LATCP = 78
LONCP = 262
EPS = 100000.0
LATRANGE = 74,80
LONRANGE = 260,285
ALTRANGE = 100,600
NUMGRIDPNT = 4
"""


@pytest.fixture(scope="module")
def model():
    return Model(Config.from_text(CFG))


def _oracle_centers():
    lat, lon, alt = np.meshgrid(
        np.linspace(74, 80, 4), np.linspace(260, 285, 4),
        np.linspace(100, 600, 4) * 1000.0,
    )
    X, Y, Z = oracle_geodetic2ecef(lat.flatten(), lon.flatten(), alt.flatten())
    return np.stack([X, Y, Z], axis=-1)


def test_centers_match_reference_meshgrid_order(model):
    """Center layout parity with radbasfun.py:55-60 (meshgrid 'xy' order)."""
    centers = np.asarray(model.centers)
    ref = _oracle_centers()
    assert centers.shape == ref.shape == (64, 3)
    np.testing.assert_allclose(centers, ref, atol=1e-6)


def test_basis_matches_oracle(model, rng):
    lat = rng.uniform(74, 80, 100)
    lon = rng.uniform(260, 285, 100)
    alt = rng.uniform(1e5, 6e5, 100)
    A = np.asarray(model.basis(lat, lon, alt))
    x, y, z = oracle_geodetic2ecef(lat, lon, alt)
    R = np.stack([x, y, z], -1)
    ref = np.exp(
        -np.sum((R[:, None, :] - _oracle_centers()[None]) ** 2, -1) / 1e10
    )
    assert A.shape == ref.shape
    assert np.max(np.abs(A - ref)) < 1e-10


def test_no_regularization_supported(model):
    assert model.eval_reg_matricies == {}


def test_basis_shape_preservation(model):
    lat = np.full((2, 3), 77.0)
    lon = np.full((2, 3), 265.0)
    alt = np.full((2, 3), 3e5)
    A = model.basis(lat, lon, alt)
    assert A.shape == (2, 3, model.nbasis)


def test_grad_basis_finite_differences(model):
    lat = np.array([77.0, 78.0])
    lon = np.array([265.0, 270.0])
    alt = np.array([3e5, 4e5])
    G = np.asarray(model.grad_basis(lat, lon, alt))  # [pts, 3, nb]
    assert G.shape == (2, 3, model.nbasis)
    # FD in ECEF space through the pure RBF form
    from volumetricinterp_tpu import coords
    import jax.numpy as jnp

    x, y, z = coords.np_geodetic2ecef(lat, lon, alt)
    R = np.stack([x, y, z], -1)
    h = 1.0
    for c in range(3):
        Rp = R.copy(); Rp[:, c] += h
        Rm = R.copy(); Rm[:, c] -= h
        fd = (
            np.asarray(model.design_from_ecef(jnp.asarray(Rp)))
            - np.asarray(model.design_from_ecef(jnp.asarray(Rm)))
        ) / (2 * h)
        assert np.max(np.abs(G[:, c, :] - fd)) < 1e-9


def test_fit_with_rbf_model(model, rng):
    """radbasfun works through the full fit path (no regularization:
    REGULARIZATION_LIST empty, reference radbasfun.py:62)."""
    import jax.numpy as jnp
    from volumetricinterp_tpu.ops.fit import fit_records

    lat = rng.uniform(74.5, 79.5, 300)
    lon = rng.uniform(262, 283, 300)
    alt = rng.uniform(1.5e5, 5.5e5, 300)
    A = np.asarray(model.basis(lat, lon, alt))
    C_true = rng.normal(size=model.nbasis) * 1e11
    ne = A @ C_true
    noise = 1e9 + 0.01 * np.abs(ne)
    values = (ne + rng.normal(0, 1, ne.size) * noise)[None]
    errors = np.broadcast_to(noise, (1, ne.size)).copy()

    C, dC, chi2, _ = fit_records(
        jnp.asarray(values), jnp.asarray(errors), jnp.asarray(A),
        jnp.zeros((0, model.nbasis, model.nbasis)), method="chi2",
    )
    resid = A @ np.asarray(C[0]) - ne
    assert np.max(np.abs(resid)) < 0.2 * np.max(np.abs(ne))


def test_rbf_grid_eval_fast_path(model):
    """RBF fused f32 grid evaluator vs the f64 basis path.

    Own RNG (the session rng's state depends on test order).  The
    evaluator recentres coordinates before squaring (f32 resolution)."""
    from volumetricinterp_tpu.ops.grid_eval import grid_eval

    rng = np.random.default_rng(99)
    lat = rng.uniform(74.5, 79.5, 500)
    lon = rng.uniform(262, 283, 500)
    alt = rng.uniform(1.5e5, 5.5e5, 500)
    C = rng.normal(size=model.nbasis) * 1e11
    fast = np.asarray(grid_eval(model, C, lat, lon, alt))
    truth = np.asarray(model.basis(lat, lon, alt)) @ C
    scale = np.max(np.abs(truth))
    assert np.max(np.abs(fast - truth)) < 5e-5 * scale
