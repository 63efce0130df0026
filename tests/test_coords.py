"""Coordinate transform parity vs the numpy oracle (SURVEY.md section 7.1)."""

import numpy as np

from volumetricinterp_tpu import coords
from tests.oracle import oracle_geodetic2ecef, oracle_transform


def test_geodetic2ecef_matches_oracle(rng):
    lat = rng.uniform(-85, 85, 200)
    lon = rng.uniform(-180, 180, 200)
    alt = rng.uniform(0, 8e5, 200)
    x, y, z = (np.asarray(v) for v in coords.geodetic2ecef(lat, lon, alt))
    xr, yr, zr = oracle_geodetic2ecef(lat, lon, alt)
    assert np.max(np.abs(x - xr)) < 1e-6
    assert np.max(np.abs(y - yr)) < 1e-6
    assert np.max(np.abs(z - zr)) < 1e-6


def test_ecef2geodetic_roundtrip(rng):
    lat = rng.uniform(-85, 85, 200)
    lon = rng.uniform(-179, 179, 200)
    alt = rng.uniform(0, 8e5, 200)
    x, y, z = coords.geodetic2ecef(lat, lon, alt)
    la, lo, al = (np.asarray(v) for v in coords.ecef2geodetic(x, y, z))
    assert np.max(np.abs(la - lat)) < 1e-9
    assert np.max(np.abs(((lo - lon + 180) % 360) - 180)) < 1e-9
    assert np.max(np.abs(al - alt)) < 1e-5


def test_cap_transform_matches_oracle(rng):
    lat = rng.uniform(74, 82, 300)
    lon = rng.uniform(250, 280, 300)
    alt = rng.uniform(1e5, 6e5, 300)
    z, t, p = (np.asarray(v) for v in coords.geodetic_to_cap(lat, lon, alt, 78.0, 262.0))
    zr, tr, pr = oracle_transform(lat, lon, alt, 78.0, 262.0)
    assert np.max(np.abs(z - zr)) < 1e-9
    assert np.max(np.abs(t - tr)) < 1e-12
    assert np.max(np.abs(p - pr)) < 1e-12


def test_cap_transform_shapes():
    """Multidimensional inputs flow through element-wise; the reference's
    +theta0 rotation quirk maps the cap center to colatitude 2*theta0
    (docs/PARITY_NOTES.md #1), NOT to the pole."""
    lat = np.full((4, 5), 78.0)
    lon = np.full((4, 5), 262.0)
    alt = np.full((4, 5), 0.0)
    z, t, p = coords.geodetic_to_cap(lat, lon, alt, 78.0, 262.0)
    assert z.shape == (4, 5)
    x0, y0, z0 = (np.asarray(v) for v in coords.geodetic2ecef(78.0, 262.0, 0.0))
    theta0 = np.arccos(z0 / np.sqrt(x0**2 + y0**2 + z0**2))
    assert np.allclose(np.asarray(t), 2.0 * theta0, atol=1e-12)
