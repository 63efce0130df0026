"""Gaussian radial-basis-function model, TPU-native.

Re-design of the reference's alternative model (models/radbasfun.py):
basis_n(R) = exp(-||R - c_n||^2 / eps^2) on ECEF coordinates, with centers on
a NUMGRIDPNT^3 lat/lon/alt meshgrid (reference :55-60, numpy meshgrid 'xy'
indexing preserved for center-order parity).  Supports no regularization
(eval_reg_matricies = {}, reference :62).

The design matrix is a single pairwise-squared-distance computation, which is
expressed as one matmul plus norms so XLA tiles it onto the MXU:
||R - c||^2 = ||R||^2 - 2 R.c + ||c||^2.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from ..config import Config
from .. import coords


class Model:
    def __init__(self, config_file):
        if isinstance(config_file, Config):
            cfg = config_file
        else:
            cfg = Config.from_file(config_file)
        self.config = cfg

        self.latcp = cfg.model.latcp
        self.loncp = cfg.model.loncp
        self.eps = cfg.model.eps
        self.latrange = cfg.model.latrange
        self.lonrange = cfg.model.lonrange
        self.altrange = cfg.model.altrange
        self.numgridpnt = cfg.model.numgridpnt

        # center grid: meshgrid order matches reference radbasfun.py:55-60
        lat, lon, alt = np.meshgrid(
            np.linspace(self.latrange[0], self.latrange[1], self.numgridpnt),
            np.linspace(self.lonrange[0], self.lonrange[1], self.numgridpnt),
            np.linspace(self.altrange[0], self.altrange[1], self.numgridpnt) * 1000.0,
        )
        X, Y, Z = coords.np_geodetic2ecef(lat.flatten(), lon.flatten(), alt.flatten())
        self._centers_np = np.stack([X, Y, Z], axis=-1)  # [nbasis, 3] host f64
        self.centers = jnp.asarray(self._centers_np)  # [nbasis, 3]
        self.nbasis = self.centers.shape[0]

        self.eval_reg_matricies = {}
        self.eval_reg_matrices = self.eval_reg_matricies

    def transform_coords(self, lat, lon, alt):
        """Geodetic -> ECEF, reference radbasfun.py:232-256 (returns [3, npts])."""
        x, y, z = coords.geodetic2ecef(lat, lon, alt)
        return jnp.stack([x, y, z])

    def design_from_ecef(self, R):
        """A[npoints, nbasis] from ECEF points R[npoints, 3].  jit-safe."""
        r2 = jnp.sum(R * R, axis=-1, keepdims=True)  # [pts, 1]
        c2 = jnp.sum(self.centers * self.centers, axis=-1)[None, :]  # [1, nb]
        cross = R @ self.centers.T  # [pts, nb] — MXU
        d2 = r2 - 2.0 * cross + c2
        # clamp tiny negative rounding before exp
        d2 = jnp.maximum(d2, 0.0)
        return jnp.exp(-d2 / self.eps**2)

    def _ecef_for(self, gdlat, gdlon, gdalt):
        """ECEF points [npts, 3]; host float64 transform when eager (exact
        trig — see coords.py; returned as numpy), device transform when
        traced."""
        try:
            lat = np.asarray(gdlat, dtype=np.float64).ravel()
            lon = np.asarray(gdlon, dtype=np.float64).ravel()
            alt = np.asarray(gdalt, dtype=np.float64).ravel()
            x, y, z = coords.np_geodetic2ecef(lat, lon, alt)
            return np.stack([x, y, z], axis=-1)
        except Exception:
            x, y, z = coords.geodetic2ecef(
                jnp.asarray(gdlat).ravel(),
                jnp.asarray(gdlon).ravel(),
                jnp.asarray(gdalt).ravel(),
            )
            return jnp.stack([x, y, z], axis=-1)

    def _design_np(self, R):
        """HOST float64 design matrix (concrete points) — same expression
        as design_from_ecef in true f64; this TPU's device "f64" is
        f32-grade (ops/xprec.py receipts)."""
        c = self._centers_np
        d2 = np.maximum(
            np.sum(R * R, axis=-1, keepdims=True)
            - 2.0 * (R @ c.T)
            + np.sum(c * c, axis=-1)[None, :],
            0.0,
        )
        return np.exp(-d2 / self.eps**2)

    def basis(self, gdlat, gdlon, gdalt):
        """A[..., nbasis] at geodetic points (reference radbasfun.py:83-112).
        Concrete inputs evaluate on HOST in exact float64 (numpy result);
        traced inputs use the on-device MXU matmul form."""
        shape = np.shape(gdlat)
        R = self._ecef_for(gdlat, gdlon, gdalt)
        if isinstance(R, np.ndarray):
            return self._design_np(R).reshape(shape + (self.nbasis,))
        A = self.design_from_ecef(R)
        return A.reshape(shape + (self.nbasis,))

    def grad_basis(self, gdlat, gdlon, gdalt):
        """Gradient of each RBF in ECEF components: [..., 3, nbasis].

        grad_n = -2 (R - c_n) / eps^2 * basis_n.  (The reference's version
        is commented out, radbasfun.py:115-152; implemented for real here.)
        Concrete inputs evaluate on HOST in exact float64 (see basis).
        """
        shape = np.shape(gdlat)
        R = self._ecef_for(gdlat, gdlon, gdalt)  # [pts, 3]
        if isinstance(R, np.ndarray):
            A = self._design_np(R)
            diff = R[:, :, None] - self._centers_np.T[None, :, :]
            G = -2.0 / self.eps**2 * diff * A[:, None, :]
            return G.reshape(shape + (3, self.nbasis))
        A = self.design_from_ecef(R)  # [pts, nb]
        diff = R[:, :, None] - self.centers.T[None, :, :]  # [pts, 3, nb]
        G = -2.0 / self.eps**2 * diff * A[:, None, :]
        return G.reshape(shape + (3, self.nbasis))
