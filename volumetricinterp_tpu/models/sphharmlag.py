"""Spherical-cap-harmonic x weighted-Laguerre basis model, TPU-native.

Re-design of the reference's default model (models/sphharmlag.py): the 3-D
basis is

    B_n(z, theta, phi) = e^{-z/2} L_k(z) * K_vm trig(|m| phi) * P_nu(l)^m(cos theta)

with n -> (k, l, m) per the index map at models/sphharmlag.py:79-99, the
Thebault nu(l) approximation at :101-115, and the cap coordinate transform at
:324-359.  SIGNED m is passed to the Legendre function exactly as the
reference does at :141 (P_nu^{-|m|} is recovered through the Gamma-ratio
connection; see special.lpmv_host for why this matters numerically).

TPU-first structure
-------------------
* All per-basis static quantities (k, l, m, nu, K_vm, Gamma-ratio scales)
  are precomputed index/scale ARRAYS, so the reference's n-loop over scipy
  special functions (:138-144) becomes one gather-and-multiply.
* P_nu^m evaluation happens through host-built Chebyshev tables evaluated on
  device as a single matmul (tables.py) — float64 for the fit path; the
  dense-grid float32 Pallas kernel reuses the same tables (ops/grid_eval.py).
* Regularization matrices exploit separability (tex:310-315): three small
  1-D integral tables combined by outer products, instead of the reference's
  O(nbasis^2) adaptive triple quadratures (:188-239).  Mode 'quad' computes
  the 1-D tables with host scipy.integrate.quad and is numerically IDENTICAL
  to the reference (same integrands, same adaptive rule — including its
  pathological behaviour on the divergent curvature z-integral, see
  docs/PARITY_NOTES.md); mode 'gauss' uses fixed Gauss rules.
"""

from __future__ import annotations

import math

import numpy as np
import jax.numpy as jnp

from ..config import Config
from ..constants import RE
from .. import coords, special
from ..tables import build_legendre_tables, nu_of_l
from ..quadrature import (
    composite_legendre,
    gauss_laguerre,
    gauss_legendre,
    geometric_panels,
)


class Model:
    """Drop-in Model class fulfilling the reference plugin contract."""

    def __init__(self, config_file):
        if isinstance(config_file, Config):
            cfg = config_file
        else:
            cfg = Config.from_file(config_file)
        self.config = cfg

        self.maxk = cfg.model.maxk
        self.maxl = cfg.model.maxl
        self.latcp = cfg.model.latcp
        self.loncp = cfg.model.loncp
        self.cap_lim = cfg.model.cap_lim * np.pi / 180.0  # radians
        self.max_z_int = cfg.model.max_z_int
        self.nbasis = self.maxk * self.maxl**2

        self._quad_mode = cfg.tpu.quad_mode
        self._build_index_tables()
        # Default theta domain for the Legendre tables.  NOTE a reference
        # quirk (docs/PARITY_NOTES.md #1): transform_coord rotates by +theta0
        # (sphharmlag.py:353), which maps the cap CENTER to colatitude
        # 2*theta0 rather than to the pole, so data colatitudes cluster
        # around 2*theta0 — far outside cap_lim.  We reproduce the rotation
        # verbatim and size the table domain accordingly; basis() widens it
        # adaptively if points fall beyond.
        x0, y0, z0 = coords.np_geodetic2ecef(self.latcp, self.loncp, 0.0)
        theta0 = float(np.arccos(z0 / np.sqrt(x0**2 + y0**2 + z0**2)))
        default_domain = min(
            2.0 * theta0 + cfg.tpu.table_domain_factor * self.cap_lim,
            np.pi * 0.95,
        )
        self.tables = build_legendre_tables(
            self.maxl,
            self.cap_lim,
            theta_max=default_domain,
            tol=cfg.tpu.table_tol,
        )

        # reference attribute name kept verbatim (sphharmlag.py:62), with a
        # correctly-spelled alias
        self.eval_reg_matricies = {
            "curvature": self.eval_omega,
            "0thorder": self.eval_psi,
        }
        self.eval_reg_matrices = self.eval_reg_matricies

        # jitted design-matrix entry (retraces per input shape; eager
        # execution would remote-compile every op through the TPU tunnel).
        # The Chebyshev table and its domain are ARGUMENTS, not closed-over
        # constants, so ensure_theta_domain() rebuilds stay visible.
        import jax as _jax

        self._design_jit = _jax.jit(self._design_core)
        self._grad_jit = _jax.jit(self._grad_core)

    # ------------------------------------------------------------------
    # static index / scale tables
    # ------------------------------------------------------------------

    def _build_index_tables(self):
        import scipy.special as sp

        n = np.arange(self.nbasis)
        k = n // (self.maxl**2)
        r = n % (self.maxl**2)
        l = np.floor(np.sqrt(r)).astype(np.int64)
        m = r - l * (l + 1)  # signed, in [-l, l]
        mbar = np.abs(m)
        nu = nu_of_l(l, self.cap_lim)

        # K_vm (sphharmlag.py:305-321), computed on host in log space
        kvm = np.sqrt(
            (2.0 * nu + 1.0)
            / (4.0 * np.pi)
            * np.exp(sp.gammaln(nu - mbar + 1.0) - sp.gammaln(nu + mbar + 1.0))
        )
        kvm = np.where(mbar != 0, kvm * np.sqrt(2.0), kvm)

        # P_nu^{-mbar} = (-1)^mbar G(nu-mbar+1)/G(nu+mbar+1) P_nu^{+mbar}
        def negm_scale(nu_arr):
            ratio = np.exp(
                sp.gammaln(nu_arr - mbar + 1.0) - sp.gammaln(nu_arr + mbar + 1.0)
            )
            return np.where(m < 0, ((-1.0) ** mbar) * ratio, 1.0)

        self._k = k
        self._l = l
        self._m = m
        self._mbar = mbar
        self._nu = nu
        self._kvm = kvm
        self._negm_scale = negm_scale(nu)  # for degree nu
        self._negm_scale_p1 = negm_scale(nu + 1.0)  # for degree nu + 1
        # table column per n, degree shifts -1 / 0 / +1
        pair = l * (l + 1) // 2 + mbar
        self._col_m1 = 3 * pair + 0
        self._col_0 = 3 * pair + 1
        self._col_p1 = 3 * pair + 2
        self._is_cos = (m >= 0).astype(np.float64)

        # static lookup tables, kept as HOST numpy: inside jit they become
        # baked-in constants (one transfer with the executable), and eager
        # per-array device puts through the tunnelled TPU cost seconds each
        self._d_k = k
        self._d_mbar = mbar
        self._d_col_0 = self._col_0
        self._d_col_p1 = self._col_p1
        self._d_scale = kvm * self._negm_scale  # Az * neg-m fold
        self._d_negm = self._negm_scale
        self._d_negm_p1 = self._negm_scale_p1
        self._d_kvm = kvm
        self._d_is_cos = self._is_cos
        self._d_m = m.astype(np.float64)
        self._d_nu = nu

    # ------------------------------------------------------------------
    # reference-parity helpers (sphharmlag.py:79-115, 263-321)
    # ------------------------------------------------------------------

    def basis_numbers(self, n):
        k = n // (self.maxl**2)
        r = n % (self.maxl**2)
        l = np.floor(np.sqrt(r))
        m = r - l * (l + 1)
        return k, l, m

    def nu(self, n):
        _, l, _ = self.basis_numbers(n)
        return (2 * l + 0.5) * np.pi / (2 * self.cap_lim) - 0.5

    def Az(self, v, m, phi):
        if m < 0:
            return self.Kvm(v, abs(m)) * jnp.sin(abs(m) * jnp.asarray(phi))
        return self.Kvm(v, abs(m)) * jnp.cos(abs(m) * jnp.asarray(phi))

    def dAz(self, v, m, phi):
        if m < 0:
            return abs(m) * self.Kvm(v, abs(m)) * jnp.cos(abs(m) * jnp.asarray(phi))
        return -1 * m * self.Kvm(v, abs(m)) * jnp.sin(abs(m) * jnp.asarray(phi))

    def Kvm(self, v, m):
        return special.kvm(v, int(m))

    def transform_coord(self, gdlat, gdlon, gdalt):
        """Geodetic -> (z, theta, phi) cap coordinates (sphharmlag.py:324-359)."""
        return coords.geodetic_to_cap(gdlat, gdlon, gdalt, self.latcp, self.loncp)

    # ------------------------------------------------------------------
    # design matrix
    # ------------------------------------------------------------------

    def ensure_theta_domain(self, theta_max_needed: float):
        """Rebuild the Legendre tables if a larger theta domain is needed."""
        margin = 1.05 * float(theta_max_needed)
        if margin > self.tables.theta_max:
            self.tables = build_legendre_tables(
                self.maxl,
                self.cap_lim,
                theta_max=min(margin, np.pi * 0.95),
                tol=self.config.tpu.table_tol,
            )

    def design_from_ztp(self, z, t, p, tables=None):
        """A[npoints, nbasis] from cap coordinates.  jit-safe.

        Core of the basis: one Chebyshev matmul for all Legendre functions,
        Laguerre recurrence for the radial part, trig gathers for phi.
        """
        tbl = self.tables if tables is None else tables
        return self._design_core(z, t, p, jnp.asarray(tbl.coef_np),
                                 tbl.theta_max)

    def _design_core(self, z, t, p, coef, theta_max):
        from ..tables import cheb_clenshaw

        z = jnp.asarray(z).ravel()
        t = jnp.asarray(t).ravel()
        p = jnp.asarray(p).ravel()

        if self.config.tpu.basis_impl == "series":
            # self-contained device path: hypergeometric series per (l, mbar)
            # pair (accuracy envelope in special.lpmv's docstring; the table
            # path is both faster and more accurate — this exists for
            # table-free validation)
            x = jnp.cos(t)
            cols = []
            for l in range(self.maxl):
                v = float(nu_of_l(l, self.cap_lim))
                for mbar in range(l + 1):
                    cols.append(special.lpmv(mbar, v, x))
            Ppairs = jnp.stack(cols, axis=-1)  # [pts, npairs]
            pair_n = self._l * (self._l + 1) // 2 + self._mbar
            Pn = Ppairs[:, pair_n] * self._d_negm[None, :]
        else:
            u = 2.0 * t / theta_max - 1.0
            P = cheb_clenshaw(u, coef)  # [pts, 3*npairs]
            Pn = P[:, self._d_col_0] * self._d_negm[None, :]  # [pts, nbasis]

        lag = special.laguerre_all(self.maxk - 1, z)  # [pts, maxk]
        radial = jnp.exp(-0.5 * z)[:, None] * lag

        mb = jnp.arange(self.maxl, dtype=z.dtype)
        cosm = jnp.cos(p[:, None] * mb[None, :])  # [pts, maxl]
        sinm = jnp.sin(p[:, None] * mb[None, :])
        trig = (
            cosm[:, self._d_mbar] * self._d_is_cos[None, :]
            + sinm[:, self._d_mbar] * (1.0 - self._d_is_cos)[None, :]
        )

        return radial[:, self._d_k] * (self._d_kvm[None, :] * trig) * Pn

    def _coords_for(self, gdlat, gdlon, gdalt):
        """(z, t, p) flat arrays.  Concrete (eager) inputs transform on HOST
        in exact float64 (returned as numpy) — TPU f64 trig is only
        f32-accurate and would contaminate theta by ~3e-8 rad (~nu*3e-8
        relative in P_nu).  Traced inputs fall back to the on-device
        transform."""
        try:
            lat = np.asarray(gdlat, dtype=np.float64).ravel()
            lon = np.asarray(gdlon, dtype=np.float64).ravel()
            alt = np.asarray(gdalt, dtype=np.float64).ravel()
        except Exception:  # tracer: stay on device
            return self.transform_coord(
                jnp.asarray(gdlat).ravel(),
                jnp.asarray(gdlon).ravel(),
                jnp.asarray(gdalt).ravel(),
            )
        z, t, p = coords.np_geodetic_to_cap(lat, lon, alt, self.latcp, self.loncp)
        tmax = float(np.max(t)) if t.size else 0.0
        if np.isfinite(tmax):
            self.ensure_theta_domain(tmax)
        return z, t, p

    def _design_np(self, z, t, p):
        """HOST float64 design matrix at concrete cap coordinates.

        Value-identical recurrences to _design_core, run in true f64: on
        this TPU, device "f64" elementwise arithmetic rounds at f32
        (ops/xprec.py receipts; isolated envelope measured in
        scripts/precision_probe.py), so concrete-input basis evaluation —
        the fit's design matrix and Estimate's point API — stays on host."""
        from ..tables import np_cheb_clenshaw

        tbl = self.tables
        u = 2.0 * t / tbl.theta_max - 1.0
        P = np_cheb_clenshaw(u, tbl.coef_np)
        Pn = P[:, self._d_col_0] * self._d_negm[None, :]

        lag = special.np_laguerre_all(self.maxk - 1, z)
        radial = np.exp(-0.5 * z)[:, None] * lag

        mb = np.arange(self.maxl, dtype=np.float64)
        cosm = np.cos(p[:, None] * mb[None, :])
        sinm = np.sin(p[:, None] * mb[None, :])
        trig = (
            cosm[:, self._d_mbar] * self._d_is_cos[None, :]
            + sinm[:, self._d_mbar] * (1.0 - self._d_is_cos)[None, :]
        )
        return radial[:, self._d_k] * (self._d_kvm[None, :] * trig) * Pn

    def _grad_np(self, z, t, p):
        """HOST float64 mirror of _grad_core (see _design_np)."""
        from ..tables import np_cheb_clenshaw

        x = np.cos(t)
        y = np.sin(t)
        e = np.exp(-0.5 * z)

        tbl = self.tables
        u = 2.0 * t / tbl.theta_max - 1.0
        P = np_cheb_clenshaw(u, tbl.coef_np)
        Pmv = P[:, self._d_col_0] * self._d_negm[None, :]
        Pmv1 = P[:, self._d_col_p1] * self._d_negm_p1[None, :]

        lag0 = special.np_laguerre_all(self.maxk - 1, z)
        lag1_tbl = special.np_laguerre_all(max(self.maxk - 2, 0), z, alpha=1.0)
        zero = np.zeros_like(z)[:, None]
        lag1_full = np.concatenate([zero, lag1_tbl], axis=-1)
        L0 = lag0[:, self._d_k]
        L1 = lag1_full[:, self._d_k]

        mb = np.arange(self.maxl, dtype=np.float64)
        cosm = np.cos(p[:, None] * mb[None, :])
        sinm = np.sin(p[:, None] * mb[None, :])
        trig = (
            cosm[:, self._d_mbar] * self._d_is_cos[None, :]
            + sinm[:, self._d_mbar] * (1.0 - self._d_is_cos)[None, :]
        )
        dtrig = (
            -self._d_m[None, :] * sinm[:, self._d_mbar] * self._d_is_cos[None, :]
            + self._d_mbar.astype(np.float64)[None, :]
            * cosm[:, self._d_mbar]
            * (1.0 - self._d_is_cos)[None, :]
        )
        A_az = self._d_kvm[None, :] * trig
        dA_az = self._d_kvm[None, :] * dtrig

        v = self._d_nu[None, :]
        msgn = self._d_m[None, :]
        denom = (y * (z / 100.0 + 1.0) * RE)[:, None]

        zhat = -0.5 * e[:, None] * (L0 + 2.0 * L1) * Pmv * A_az * 100.0 / RE
        that = (
            e[:, None]
            * L0
            * (-(v + 1.0) * x[:, None] * Pmv + (v - msgn + 1.0) * Pmv1)
            * A_az
            / denom
        )
        phat = e[:, None] * L0 * Pmv * dA_az / denom
        return np.stack([zhat, that, phat], axis=-2)  # [pts, 3, nbasis]

    def basis(self, gdlat, gdlon, gdalt):
        """A[..., nbasis] at geodetic points (reference sphharmlag.py:118-145).

        Shape-preserving over arbitrary input dimensionality, like the
        reference's reshape/transpose dance at :142-145.  Concrete inputs
        evaluate on HOST in exact float64 (numpy result; reference-grade
        fidelity regardless of backend — estimate.py:113-115 semantics);
        traced inputs use the on-device table path.
        """
        shape = np.shape(gdlat)
        z, t, p = self._coords_for(gdlat, gdlon, gdalt)
        if isinstance(z, np.ndarray) and self.config.tpu.basis_impl != "series":
            return self._design_np(z, t, p).reshape(shape + (self.nbasis,))
        A = self._design_jit(z, t, p, jnp.asarray(self.tables.coef_np),
                             self.tables.theta_max)
        return A.reshape(shape + (self.nbasis,))

    def grad_basis(self, gdlat, gdlon, gdalt):
        """Gradient of each basis function (reference sphharmlag.py:148-184).

        Returns shape [..., 3, nbasis] with components (z-hat, theta-hat,
        phi-hat) in cap coordinates — matching np.array(Ag).T for 1-D input.
        The reference's stale commented-out evaluation path (estimate.py:
        125-147) is implemented for real in Estimate via these gradients.
        Concrete inputs evaluate on HOST in exact float64 (see basis).
        """
        shape = np.shape(gdlat)
        z, t, p = self._coords_for(gdlat, gdlon, gdalt)
        if isinstance(z, np.ndarray) and self.config.tpu.basis_impl != "series":
            return self._grad_np(z, t, p).reshape(shape + (3, self.nbasis))
        G = self._grad_jit(z, t, p, jnp.asarray(self.tables.coef_np),
                           self.tables.theta_max)
        return G.reshape(shape + (3, self.nbasis))

    def _grad_core(self, z, t, p, coef, theta_max):
        from ..tables import cheb_clenshaw

        x = jnp.cos(t)
        y = jnp.sin(t)
        e = jnp.exp(-0.5 * z)

        u = 2.0 * t / theta_max - 1.0
        P = cheb_clenshaw(u, coef)
        Pmv = P[:, self._d_col_0] * self._d_negm[None, :]
        Pmv1 = P[:, self._d_col_p1] * self._d_negm_p1[None, :]

        lag0 = special.laguerre_all(self.maxk - 1, z)  # L_k
        # L^1_{k-1}: index k-1 of generalized table; L^1_{-1} = 0
        lag1_tbl = special.laguerre_all(max(self.maxk - 2, 0), z, alpha=1.0)
        zero = jnp.zeros_like(z)[:, None]
        lag1_full = jnp.concatenate([zero, lag1_tbl], axis=-1)  # index by k
        L0 = lag0[:, self._d_k]
        L1 = lag1_full[:, self._d_k]

        mb = jnp.arange(self.maxl, dtype=z.dtype)
        cosm = jnp.cos(p[:, None] * mb[None, :])
        sinm = jnp.sin(p[:, None] * mb[None, :])
        trig = (
            cosm[:, self._d_mbar] * self._d_is_cos[None, :]
            + sinm[:, self._d_mbar] * (1.0 - self._d_is_cos)[None, :]
        )
        dtrig = (
            -self._d_m[None, :] * sinm[:, self._d_mbar] * self._d_is_cos[None, :]
            + self._d_mbar.astype(z.dtype)[None, :]
            * cosm[:, self._d_mbar]
            * (1.0 - self._d_is_cos)[None, :]
        )
        A_az = self._d_kvm[None, :] * trig
        dA_az = self._d_kvm[None, :] * dtrig

        v = self._d_nu[None, :]
        msgn = self._d_m[None, :]
        denom = (y * (z / 100.0 + 1.0) * RE)[:, None]

        zhat = -0.5 * e[:, None] * (L0 + 2.0 * L1) * Pmv * A_az * 100.0 / RE
        that = (
            e[:, None]
            * L0
            * (-(v + 1.0) * x[:, None] * Pmv + (v - msgn + 1.0) * Pmv1)
            * A_az
            / denom
        )
        phat = e[:, None] * L0 * Pmv * dA_az / denom

        return jnp.stack([zhat, that, phat], axis=-2)  # [pts, 3, nbasis]

    def inverse_transform(self, gdlat, gdlon, gdalt, vec):
        """Rotate vectors from cap-frame spherical components back to ECEF.

        vec[..., 3]: (r-hat, theta-hat, phi-hat) components at the given
        geodetic points (e.g. grad_basis contractions; grad_basis' z-hat
        component already includes the 100/RE stretch factor, making it the
        physical d/dr component).  Returns ECEF (x, y, z) components.

        The reference's inverse_transform (sphharmlag.py:363-395) is stale
        (undefined `cc` module and `self.cp`); this is the working
        implementation of the same operation.
        """
        shape = np.shape(gdlat)
        z, t, p = self._coords_for(gdlat, gdlon, gdalt)
        vec = jnp.asarray(vec).reshape((-1, 3))

        st, ct = jnp.sin(t), jnp.cos(t)
        sp_, cp_ = jnp.sin(p), jnp.cos(p)
        rhat = jnp.stack([st * cp_, st * sp_, ct], axis=-1)
        that = jnp.stack([ct * cp_, ct * sp_, -st], axis=-1)
        phat = jnp.stack([-sp_, cp_, jnp.zeros_like(sp_)], axis=-1)
        v_rot = (
            vec[:, 0:1] * rhat + vec[:, 1:2] * that + vec[:, 2:3] * phat
        )  # cartesian, rotated frame

        # undo the +theta0 rotation (docs/PARITY_NOTES.md #1)
        k, theta0 = coords.cap_rotation_axis_angle(self.latcp, self.loncp)
        vx, vy, vz = coords.rodrigues_rotate(
            k, -theta0, v_rot[:, 0], v_rot[:, 1], v_rot[:, 2]
        )
        return jnp.stack([vx, vy, vz], axis=-1).reshape(shape + (3,))

    # ------------------------------------------------------------------
    # regularization matrices (separable 1-D integral tables)
    # ------------------------------------------------------------------

    def _signed_lpmv_host(self, m, v, x, reference_exact):
        """Host Legendre seed for integrand tables.

        reference_exact=True reproduces scipy.special.lpmv verbatim
        (including its negative-m underflow-to-zero at large nu, which the
        reference inherits at models/sphharmlag.py:205,231); otherwise the
        accurate Gamma-ratio path is used.
        """
        import scipy.special as sp

        if reference_exact:
            return sp.lpmv(m, v, x)
        return special.lpmv_host(m, v, x)

    def _horizontal_indices(self):
        """Unique horizontal index j = l*maxl + (m+l)? No — (l, m) pairs in
        basis order for one k-slab: j = l(l+1)+m in [0, maxl^2)."""
        l = self._l[: self.maxl**2]
        m = self._m[: self.maxl**2]
        nu = self._nu[: self.maxl**2]
        return l, m, nu

    def _iz_table(self, power: int) -> np.ndarray:
        """Iz[ki, kj] = int e^{-z} L_ki L_kj z^power dz over (0, max_z_int)."""
        import scipy.integrate
        import scipy.special as sp
        import warnings

        K = self.maxk
        iz = np.zeros((K, K))
        if self._quad_mode == "quad":
            for ki in range(K):
                for kj in range(ki, K):
                    f = lambda zz: (
                        np.exp(-zz)
                        * sp.eval_laguerre(ki, zz)
                        * sp.eval_laguerre(kj, zz)
                        * zz**power
                    )
                    with warnings.catch_warnings():
                        warnings.simplefilter("ignore")
                        val = scipy.integrate.quad(f, 0.0, self.max_z_int)[0]
                    iz[ki, kj] = iz[kj, ki] = val
            return iz
        # gauss mode
        if math.isinf(self.max_z_int):
            zq, wq = gauss_laguerre(2 * K + 8)  # weight e^{-z} folded in
            lagv = np.stack(
                [np.polynomial.laguerre.lagval(zq, np.eye(K)[k]) for k in range(K)]
            )
            zp = zq.astype(np.float64) ** power
            iz = np.einsum("q,iq,jq,q->ij", wq, lagv, lagv, zp)
        else:
            zq, wq = gauss_legendre(128, 0.0, self.max_z_int)
            lagv = np.stack(
                [np.polynomial.laguerre.lagval(zq, np.eye(K)[k]) for k in range(K)]
            )
            iz = np.einsum(
                "q,iq,jq,q->ij", wq * np.exp(-zq), lagv, lagv, zq**power
            )
        return iz

    def _az_host(self, v, m, phi):
        import scipy.special as sp

        kv = np.sqrt(
            (2.0 * v + 1.0)
            / (4.0 * np.pi)
            * np.exp(sp.gammaln(v - abs(m) + 1.0) - sp.gammaln(v + abs(m) + 1.0))
        )
        if m != 0:
            kv = kv * np.sqrt(2.0)
        return kv * (np.sin(abs(m) * phi) if m < 0 else np.cos(abs(m) * phi))

    def _ip_table(self) -> np.ndarray:
        """Ip[j, j'] = int_0^{2pi} Az_i Az_j dphi (analytic in gauss mode)."""
        import scipy.integrate

        l, m, nu = self._horizontal_indices()
        J = self.maxl**2
        ip = np.zeros((J, J))
        if self._quad_mode == "quad":
            for i in range(J):
                for j in range(i, J):
                    f = lambda pp: self._az_host(nu[i], m[i], pp) * self._az_host(
                        nu[j], m[j], pp
                    )
                    val = scipy.integrate.quad(f, 0.0, 2.0 * np.pi)[0]
                    ip[i, j] = ip[j, i] = val
            return ip
        # analytic: orthogonality of cos/sin over the full period
        import scipy.special as sp

        kv = np.sqrt(
            (2.0 * nu + 1.0)
            / (4.0 * np.pi)
            * np.exp(sp.gammaln(nu - np.abs(m) + 1.0) - sp.gammaln(nu + np.abs(m) + 1.0))
        )
        kv = np.where(m != 0, kv * np.sqrt(2.0), kv)
        same = (m[:, None] == m[None, :]).astype(np.float64)
        fac = np.where(m == 0, 2.0 * np.pi, np.pi)
        ip = same * kv[:, None] * kv[None, :] * fac[None, :]
        return ip

    def _omega_t_integrand_host(self, theta, l, m, nu, reference_exact):
        """The Legendre combination of the curvature theta-integrand for one
        (l, m): -nu(nu cos^2 + nu + 1) P_nu^m + nu(nu+m) cos P_{nu-1}^m
        + nu(nu-m+1) cos P_{nu+1}^m   (models/sphharmlag.py:205)."""
        x = np.cos(theta)
        P0 = self._signed_lpmv_host(m, nu, x, reference_exact)
        Pm = self._signed_lpmv_host(m, nu - 1.0, x, reference_exact)
        Pp = self._signed_lpmv_host(m, nu + 1.0, x, reference_exact)
        return (
            -nu * (nu * x**2 + nu + 1.0) * P0
            + nu * (nu + m) * x * Pm
            + nu * (nu - m + 1.0) * x * Pp
        )

    def _it_table(self, kind: str) -> np.ndarray:
        """It[j, j'] theta-integral table.  kind in {'omega', 'psi'}."""
        import scipy.integrate

        l, m, nu = self._horizontal_indices()
        J = self.maxl**2
        it = np.zeros((J, J))
        ref_exact = self._quad_mode == "quad"

        if self._quad_mode == "quad":
            for i in range(J):
                for j in range(i, J):
                    if kind == "psi":
                        f = lambda tt: (
                            self._signed_lpmv_host(m[i], nu[i], np.cos(tt), True)
                            * self._signed_lpmv_host(m[j], nu[j], np.cos(tt), True)
                            * np.sin(tt)
                        )
                    else:
                        f = lambda tt: (
                            self._omega_t_integrand_host(tt, l[i], m[i], nu[i], True)
                            * self._omega_t_integrand_host(tt, l[j], m[j], nu[j], True)
                            / np.sin(tt) ** 3
                        )
                    val = scipy.integrate.quad(f, 0.0, self.cap_lim)[0]
                    it[i, j] = it[j, i] = val
            return it

        # gauss mode: composite rules; values from accurate host seeds
        if kind == "psi":
            tq, wq = composite_legendre(
                geometric_panels(0.0, self.cap_lim, n_panels=3), 64
            )
            vals = np.stack(
                [
                    self._signed_lpmv_host(m[i], nu[i], np.cos(tq), False)
                    for i in range(J)
                ]
            )
            it = np.einsum("q,iq,jq->ij", wq * np.sin(tq), vals, vals)
        else:
            tq, wq = composite_legendre(
                geometric_panels(0.0, self.cap_lim, n_panels=8), 64
            )
            vals = np.stack(
                [
                    self._omega_t_integrand_host(tq, l[i], m[i], nu[i], False)
                    for i in range(J)
                ]
            )
            it = np.einsum("q,iq,jq->ij", wq / np.sin(tq) ** 3, vals, vals)
        return it

    def _assemble(self, iz: np.ndarray, ih: np.ndarray) -> np.ndarray:
        """Omega/Psi[n, n'] = Iz[k, k'] * Ih[j, j'] via outer gathers.

        Returns HOST numpy: every consumer either splits the matrix into
        host expansions (the fit) or jnp.asarray's it inside jit — an
        eager device put here costs a pointless tunnel round trip (and a
        recovering remote worker once turned it into a 700 s stall,
        measured in a round-4 verify drive)."""
        k = self._k
        j = self._l * (self._l + 1) + self._m
        return iz[np.ix_(k, k)] * ih[np.ix_(j, j)]

    def eval_omega(self):
        """Curvature regularization matrix (reference sphharmlag.py:188-212)."""
        iz = self._iz_table(power=-2)
        it = self._it_table("omega")
        ip = self._ip_table()
        return self._assemble(iz, it * ip)

    def eval_psi(self):
        """0th-order regularization matrix (reference sphharmlag.py:215-239)."""
        iz = self._iz_table(power=2)
        it = self._it_table("psi")
        ip = self._ip_table()
        return self._assemble(iz, it * ip)

    def eval_tau(self, reg_func):
        """Tau vector for data-informed 0th-order regularization
        (reference sphharmlag.py:241-259; unused by the default pipeline).

        'quad' mode reproduces the reference's adaptive
        scipy.integrate.quad per-integral values; 'gauss' mode evaluates
        the same separable integrals on fixed Gauss-Laguerre /
        Gauss-Legendre nodes (table-driven, no adaptive quadrature) with
        the azimuth integral in closed form (int_0^2pi of the cos/sin
        harmonic is 2pi for m = 0 and exactly 0 otherwise)."""
        import scipy.integrate
        import scipy.special as sp

        if self._quad_mode == "quad":
            tau = np.zeros((self.nbasis, 1))
            for n in range(self.nbasis):
                k, l, m = int(self._k[n]), int(self._l[n]), int(self._m[n])
                v = float(self._nu[n])
                z_int = lambda zz: (
                    np.exp(-0.5 * zz) * sp.eval_laguerre(k, zz)
                    * reg_func(zz) * zz**2
                )
                t_int = lambda tt: sp.lpmv(m, v, np.cos(tt)) * np.sin(tt)
                p_int = lambda pp: self._az_host(v, m, pp)
                Iz = scipy.integrate.quad(z_int, 0.0, self.max_z_int)
                It = scipy.integrate.quad(t_int, 0.0, self.cap_lim)
                Ip = scipy.integrate.quad(p_int, 0.0, 2.0 * np.pi)
                tau[n] = Iz[0] * It[0] * Ip[0]
            return jnp.asarray(tau)

        # gauss mode: z-integral on Gauss-Laguerre (weight e^{-z} folded,
        # integrand carries the residual e^{+z/2}) or mapped Legendre for
        # finite MAX_Z_INT; theta on Gauss-Legendre over [0, cap_lim]
        K = self.maxk
        if math.isinf(self.max_z_int):
            # generous node count: reg_func need not be polynomial-like
            zq, wz = gauss_laguerre(8 * K + 48)
            fz = np.exp(0.5 * zq) * reg_func(zq) * zq**2
        else:
            xq, wl = np.polynomial.legendre.leggauss(8 * K + 32)
            zq = 0.5 * self.max_z_int * (xq + 1.0)
            wz = 0.5 * self.max_z_int * wl * np.exp(-zq)
            fz = np.exp(0.5 * zq) * reg_func(zq) * zq**2
        lagv = np.stack(
            [np.polynomial.laguerre.lagval(zq, np.eye(K)[k]) for k in range(K)]
        )
        iz = lagv @ (wz * fz)  # [K]

        tq, wt = np.polynomial.legendre.leggauss(96)
        tq = 0.5 * self.cap_lim * (tq + 1.0)
        wt = 0.5 * self.cap_lim * wt
        tau = np.zeros((self.nbasis, 1))
        for n in range(self.nbasis):
            k, m = int(self._k[n]), int(self._m[n])
            if m != 0:
                continue  # azimuth integral vanishes exactly
            v = float(self._nu[n])
            it = float(np.sum(wt * sp.lpmv(m, v, np.cos(tq)) * np.sin(tq)))
            # closed-form azimuth integral: az(nu, 0, .) is the constant
            # normalization factor, so int_0^2pi = 2 pi az(nu, 0, 0)
            tau[n] = iz[k] * it * 2.0 * np.pi * float(self._az_host(v, 0, 0.0))
        return jnp.asarray(tau)
