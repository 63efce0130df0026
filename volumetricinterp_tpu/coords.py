"""Geodetic coordinate transforms in pure JAX.

Replaces the reference's pymap3d calls (interpolate.py:422,
models/sphharmlag.py:345,351, models/radbasfun.py:57,253, validate.py:75)
with closed-form WGS-84 transforms that are jit/vmap-able on device, and the
per-point Python Rodrigues-rotation list comprehension
(models/sphharmlag.py:349-353) with a single vectorized rotation.

All functions accept arrays of any shape and are dtype-polymorphic
(float64 under the package default x64 mode).
"""

from __future__ import annotations

import jax.numpy as jnp

from .constants import RE, WGS84_A, WGS84_B, WGS84_E2, WGS84_EP2


def geodetic2ecef(gdlat, gdlon, gdalt):
    """Geodetic (deg, deg, m) -> ECEF (m).  WGS-84.

    Mirrors pymap3d.geodetic2ecef as used at interpolate.py:422.
    """
    lat = jnp.deg2rad(jnp.asarray(gdlat))
    lon = jnp.deg2rad(jnp.asarray(gdlon))
    alt = jnp.asarray(gdalt)
    sin_lat = jnp.sin(lat)
    cos_lat = jnp.cos(lat)
    n = WGS84_A / jnp.sqrt(1.0 - WGS84_E2 * sin_lat**2)  # prime vertical
    x = (n + alt) * cos_lat * jnp.cos(lon)
    y = (n + alt) * cos_lat * jnp.sin(lon)
    z = (n * (1.0 - WGS84_E2) + alt) * sin_lat
    return x, y, z


def ecef2geodetic(x, y, z):
    """ECEF (m) -> geodetic (deg, deg, m).  WGS-84, Bowring/Zhu closed form.

    Mirrors pymap3d.ecef2geodetic as used at validate.py:75 (plot support
    only); agrees with the iterative solution to sub-micrometre level for
    all points of interest (|alt| < 1e6 m).
    """
    x = jnp.asarray(x)
    y = jnp.asarray(y)
    z = jnp.asarray(z)
    p = jnp.sqrt(x**2 + y**2)
    # Bowring seed, then fixed-point refinement (machine precision in <=5
    # iterations for |alt| < 1e6 m; fixed trip count keeps the trace static)
    theta = jnp.arctan2(z * WGS84_A, p * WGS84_B)
    st, ct = jnp.sin(theta), jnp.cos(theta)
    lat = jnp.arctan2(
        z + WGS84_EP2 * WGS84_B * st**3, p - WGS84_E2 * WGS84_A * ct**3
    )
    for _ in range(5):
        sin_lat = jnp.sin(lat)
        n = WGS84_A / jnp.sqrt(1.0 - WGS84_E2 * sin_lat**2)
        lat = jnp.arctan2(z + WGS84_E2 * n * sin_lat, p)
    sin_lat = jnp.sin(lat)
    cos_lat = jnp.cos(lat)
    n = WGS84_A / jnp.sqrt(1.0 - WGS84_E2 * sin_lat**2)
    # altitude: p-based form away from the poles, z-based form near them
    alt = jnp.where(
        jnp.abs(cos_lat) > 1e-6,
        p / jnp.where(jnp.abs(cos_lat) < 1e-12, 1.0, cos_lat) - n,
        z / jnp.where(jnp.abs(sin_lat) < 1e-12, 1.0, sin_lat)
        - n * (1.0 - WGS84_E2),
    )
    lon = jnp.arctan2(y, x)
    return jnp.rad2deg(lat), jnp.rad2deg(lon), alt


def cap_rotation_axis_angle(latcp, loncp):
    """Rotation (axis k, angle theta0) taking the cap center to the pole.

    Semantics of models/sphharmlag.py:345-349: theta0 is the geocentric
    colatitude of the geodetic cap-center point at 0 altitude; the axis is
    horizontal, 90 deg east of the center's ECEF longitude.
    """
    x0, y0, z0 = geodetic2ecef(latcp, loncp, 0.0)
    r0 = jnp.sqrt(x0**2 + y0**2 + z0**2)
    theta0 = jnp.arccos(z0 / r0)
    phi0 = jnp.arctan2(y0, x0)
    k = jnp.stack(
        [jnp.cos(phi0 + jnp.pi / 2.0), jnp.sin(phi0 + jnp.pi / 2.0),
         jnp.zeros_like(phi0)]
    )
    return k, theta0


def rodrigues_rotate(k, theta, vx, vy, vz):
    """Rotate vectors (vx,vy,vz) by angle theta about unit axis k.

    Vectorized replacement for the per-point list comprehension at
    models/sphharmlag.py:353:  v' = v cos(t) + (k x v) sin(t) + k (k.v)(1-cos t)
    """
    ct = jnp.cos(theta)
    st = jnp.sin(theta)
    kx, ky, kz = k[0], k[1], k[2]
    cx = ky * vz - kz * vy
    cy = kz * vx - kx * vz
    cz = kx * vy - ky * vx
    kdv = kx * vx + ky * vy + kz * vz
    rx = vx * ct + cx * st + kx * kdv * (1.0 - ct)
    ry = vy * ct + cy * st + ky * kdv * (1.0 - ct)
    rz = vz * ct + cz * st + kz * kdv * (1.0 - ct)
    return rx, ry, rz


def geodetic_to_cap(gdlat, gdlon, gdalt, latcp, loncp):
    """Geodetic -> pole-centred cap coordinates (z, theta, phi).

    Full transform of models/sphharmlag.py:324-359: geodetic2ecef, Rodrigues
    rotation by +theta0 about the horizontal axis (which maps the cap center
    to colatitude 2*theta0 — a reference quirk reproduced verbatim, see
    docs/PARITY_NOTES.md #1), spherical conversion, and the radial stretch
    z = 100 (r/RE - 1).
    """
    k, theta0 = cap_rotation_axis_angle(latcp, loncp)
    x, y, z = geodetic2ecef(gdlat, gdlon, gdalt)
    rx, ry, rz = rodrigues_rotate(k, theta0, x, y, z)
    r = jnp.sqrt(rx**2 + ry**2 + rz**2)
    t = jnp.arccos(rz / r)
    p = jnp.arctan2(ry, rx)
    return 100.0 * (r / RE - 1.0), t, p


# ---------------------------------------------------------------------------
# Host (numpy) replicas — exact float64 transcendentals.
#
# TPU float64 trig is only float32-accurate (measured sin error ~3e-8 on
# v5e), which would contaminate theta and hence P_nu by ~nu * 3e-8 ~ 3e-6
# relative.  The fit and float64-Estimate paths therefore run the coordinate
# transform on host (the geometry is host data anyway, computed once per
# file); only the float32 fast path transforms on device.
# ---------------------------------------------------------------------------


def np_geodetic2ecef(gdlat, gdlon, gdalt):
    import numpy as np

    lat = np.deg2rad(np.asarray(gdlat, dtype=np.float64))
    lon = np.deg2rad(np.asarray(gdlon, dtype=np.float64))
    alt = np.asarray(gdalt, dtype=np.float64)
    sin_lat = np.sin(lat)
    n = WGS84_A / np.sqrt(1.0 - WGS84_E2 * sin_lat**2)
    x = (n + alt) * np.cos(lat) * np.cos(lon)
    y = (n + alt) * np.cos(lat) * np.sin(lon)
    z = (n * (1.0 - WGS84_E2) + alt) * sin_lat
    return x, y, z


def np_geodetic_to_cap(gdlat, gdlon, gdalt, latcp, loncp):
    import numpy as np

    x0, y0, z0 = np_geodetic2ecef(latcp, loncp, 0.0)
    r0 = np.sqrt(x0**2 + y0**2 + z0**2)
    theta0 = np.arccos(z0 / r0)
    phi0 = np.arctan2(y0, x0)
    k = np.array(
        [np.cos(phi0 + np.pi / 2.0), np.sin(phi0 + np.pi / 2.0), 0.0]
    )
    x, y, z = np_geodetic2ecef(gdlat, gdlon, gdalt)
    ct, st = np.cos(theta0), np.sin(theta0)
    cx = k[1] * z - k[2] * y
    cy = k[2] * x - k[0] * z
    cz = k[0] * y - k[1] * x
    kdv = k[0] * x + k[1] * y + k[2] * z
    rx = x * ct + cx * st + k[0] * kdv * (1.0 - ct)
    ry = y * ct + cy * st + k[1] * kdv * (1.0 - ct)
    rz = z * ct + cz * st + k[2] * kdv * (1.0 - ct)
    r = np.sqrt(rx**2 + ry**2 + rz**2)
    t = np.arccos(rz / r)
    p = np.arctan2(ry, rx)
    return 100.0 * (r / RE - 1.0), t, p
