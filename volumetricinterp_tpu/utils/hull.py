"""Field-of-view convex hull: host construction, jittable point tests.

The reference builds the hull once (interpolate.py:409-426) but tests
points by RECONSTRUCTING a convex hull per query point and comparing vertex
sets (estimate.py:153-178, self-described "horribly inefficient": one qhull
build per grid point).  Since the hull vertices are stored in the output
file, the mathematically identical test "point inside or on the hull" is a
half-space check  max_f (n_f . x - b_f) <= eps  against the hull's facet
equations — computed once on host, evaluated on device as one matmul over
all query points.

Equivalence: adding an interior-or-boundary point to a point set leaves the
qhull vertex list unchanged; adding an exterior point makes it a vertex.
The reference's vertex-set comparison therefore equals the half-space test
up to qhull's internal tolerance; we match with a relative epsilon.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from .. import coords


def compute_hull_vertices(lat, lon, alt):
    """ECEF hull vertices of the data cloud (interpolate.py:409-426)."""
    from scipy.spatial import ConvexHull

    x, y, z = coords.np_geodetic2ecef(lat, lon, alt)
    R = np.stack([x, y, z], axis=-1)
    ch = ConvexHull(R)
    return R[ch.vertices]


def hull_equations(hull_vert):
    """Facet equations [nfacet, 4] of the hull spanned by hull_vert
    (normal . x + offset <= 0 inside).  Host-side, one qhull build total."""
    from scipy.spatial import ConvexHull

    ch = ConvexHull(np.asarray(hull_vert))
    return ch.equations


def check_hull(hull_eqs, gdlat, gdlon, gdalt, tol=1e-8):
    """Jittable inside-hull mask for geodetic query points.

    hull_eqs: [nfacet, 4] from hull_equations().  Returns boolean array of
    gdlat's shape.  tol is relative to the hull scale (metres here).
    """
    gdlat = jnp.asarray(gdlat)
    shape = gdlat.shape
    x, y, z = coords.geodetic2ecef(
        gdlat.ravel(), jnp.asarray(gdlon).ravel(), jnp.asarray(gdalt).ravel()
    )
    P = jnp.stack([x, y, z], axis=-1)  # [npts, 3]
    eqs = jnp.asarray(hull_eqs)
    d = P @ eqs[:, :3].T + eqs[None, :, 3]  # [npts, nfacet]
    scale = jnp.max(jnp.abs(eqs[:, 3]))
    inside = jnp.max(d, axis=-1) <= tol * scale
    return inside.reshape(shape)


def np_check_hull(hull_eqs, gdlat, gdlon, gdalt, tol=1e-8):
    """HOST numpy mirror of check_hull (same half-space test, exact f64
    WGS-84 transform) — used by Estimate's float64 point API so a single
    hull mask costs no device round trip.

    CHUNKED over points: the dense [npts, nfacet] distance matrix is
    ~37 GB at keogram scale (33.5M points x ~140 facets, f64) — one
    33.5M-point mask measured 935 s in page-cache churn when formed
    whole (round 4, keogram-leg profile); 256k-point chunks keep the
    intermediate ~300 MB and the same mask costs seconds."""
    gdlat = np.asarray(gdlat)
    shape = gdlat.shape
    x, y, z = coords.np_geodetic2ecef(
        gdlat.ravel().astype(np.float64),
        np.asarray(gdlon, np.float64).ravel(),
        np.asarray(gdalt, np.float64).ravel(),
    )
    P = np.stack([x, y, z], axis=-1)
    eqs = np.asarray(hull_eqs)
    nT = eqs[:, :3].T
    b = eqs[None, :, 3]
    thr = tol * np.max(np.abs(eqs[:, 3]))
    n = P.shape[0]
    inside = np.empty(n, dtype=bool)
    step = 1 << 18
    for s in range(0, n, step):
        d = P[s:s + step] @ nT + b
        inside[s:s + step] = np.max(d, axis=-1) <= thr
    return inside.reshape(shape)


def check_hull_reference(hull_vert, gdlat, gdlon, gdalt):
    """Host-side replica of the reference's per-point vertex-set comparison
    (estimate.py:153-178) — the parity oracle for check_hull()."""
    from scipy.spatial import ConvexHull

    hull = ConvexHull(hull_vert)
    lat = np.asarray(gdlat).ravel()
    lon = np.asarray(gdlon).ravel()
    alt = np.asarray(gdalt).ravel()
    x, y, z = coords.np_geodetic2ecef(lat, lon, alt)
    out = []
    for xi, yi, zi in zip(x, y, z):
        pnts = np.append(hull_vert, np.array([[xi, yi, zi]]), axis=0)
        new_hull = ConvexHull(pnts)
        out.append(np.array_equal(hull.vertices, new_hull.vertices))
    return np.array(out).reshape(np.asarray(gdalt).shape)
