"""Independent NumPy/SciPy oracle of the reference pipeline's MATH.

Implemented from the algorithm specification
(algorithm_docs/amisr_fit_documentation.tex) and the behavioural notes in
SURVEY.md — vectorized numpy, no JAX — to serve as the parity target for the
TPU implementation.  Semantics reproduced:

* basis: B_n = e^{-z/2} L_k(z) K_vm trig(|m| phi) P_nu^m(cos theta), with
  SIGNED m passed to scipy.special.lpmv (the reference convention).
* coordinate transform: WGS84 geodetic->ECEF, Rodrigues rotation of the cap
  center to the pole, z = 100 (r/RE - 1).
* eval_C: X = A'WA + sum(alpha R); scipy.linalg.lstsq min-norm solve;
  covariance pinv(X) A'WA pinv(X).
* chi2 regularization-parameter search: scale-factor ladder, downward
  bracket scan on log10(alpha), brentq root of chi2(alpha) - nu.
* gcv: brute-force leave-one-out refits minimized by scipy Nelder-Mead
  from log10(alpha) = -20.
* omega/psi: separable triple quadratures per basis-function pair with
  scipy.integrate.quad.
"""

from __future__ import annotations

import warnings

import numpy as np
import scipy.integrate
import scipy.linalg
import scipy.optimize
import scipy.special as sp

RE = 6371.2 * 1000.0
WGS84_A = 6378137.0
WGS84_B = 6356752.314245179
WGS84_E2 = 1.0 - (WGS84_B / WGS84_A) ** 2


def oracle_geodetic2ecef(lat, lon, alt):
    lat = np.deg2rad(np.asarray(lat, dtype=float))
    lon = np.deg2rad(np.asarray(lon, dtype=float))
    n = WGS84_A / np.sqrt(1.0 - WGS84_E2 * np.sin(lat) ** 2)
    x = (n + alt) * np.cos(lat) * np.cos(lon)
    y = (n + alt) * np.cos(lat) * np.sin(lon)
    z = (n * (1.0 - WGS84_E2) + alt) * np.sin(lat)
    return x, y, z


def oracle_transform(lat, lon, alt, latcp, loncp):
    x0, y0, z0 = oracle_geodetic2ecef(latcp, loncp, 0.0)
    theta0 = np.arccos(z0 / np.sqrt(x0**2 + y0**2 + z0**2))
    phi0 = np.arctan2(y0, x0)
    k = np.array([np.cos(phi0 + np.pi / 2.0), np.sin(phi0 + np.pi / 2.0), 0.0])

    x, y, z = oracle_geodetic2ecef(lat, lon, alt)
    R = np.stack([x, y, z], axis=-1)  # [npts, 3]
    kxR = np.cross(k, R)
    kdR = R @ k
    Rr = (
        R * np.cos(theta0)
        + kxR * np.sin(theta0)
        + np.outer(kdR, k) * (1.0 - np.cos(theta0))
    )
    r = np.linalg.norm(Rr, axis=-1)
    t = np.arccos(Rr[:, 2] / r)
    p = np.arctan2(Rr[:, 1], Rr[:, 0])
    return 100.0 * (r / RE - 1.0), t, p


def _basis_indices(maxk, maxl):
    n = np.arange(maxk * maxl**2)
    k = n // maxl**2
    r = n % maxl**2
    l = np.floor(np.sqrt(r)).astype(int)
    m = r - l * (l + 1)
    return k, l, m


def _nu(l, cap_lim_rad):
    return (2 * l + 0.5) * np.pi / (2 * cap_lim_rad) - 0.5


def _kvm(v, mbar):
    kv = np.sqrt((2 * v + 1) / (4 * np.pi) * sp.gamma(v - mbar + 1) / sp.gamma(v + mbar + 1))
    return kv * np.sqrt(2.0) if mbar != 0 else kv


def _az(v, m, phi):
    return _kvm(v, abs(m)) * (np.sin(abs(m) * phi) if m < 0 else np.cos(abs(m) * phi))


def oracle_basis(maxk, maxl, cap_lim_deg, latcp, loncp, lat, lon, alt):
    """Design matrix [npts, nbasis] with reference semantics."""
    cap = np.deg2rad(cap_lim_deg)
    z, t, p = oracle_transform(
        np.asarray(lat).ravel(), np.asarray(lon).ravel(), np.asarray(alt).ravel(),
        latcp, loncp,
    )
    ks, ls, ms = _basis_indices(maxk, maxl)
    cols = []
    for k, l, m in zip(ks, ls, ms):
        v = _nu(l, cap)
        cols.append(
            np.exp(-0.5 * z)
            * sp.eval_laguerre(k, z)
            * _az(v, m, p)
            * sp.lpmv(m, v, np.cos(t))
        )
    return np.stack(cols, axis=-1)


def oracle_eval_C(A, b, W, reg_mats, reg_params, calccov=False):
    AWA = np.einsum("ji,j,jk->ik", A, W, A)
    X = AWA.copy()
    y = np.einsum("ji,j,j->i", A, W, b)
    for R, a in zip(reg_mats, reg_params):
        X = X + a * R
    C = np.squeeze(scipy.linalg.lstsq(X, y)[0])
    if calccov:
        H = scipy.linalg.pinv(X)
        dC = np.einsum("ij,jk,kl->il", H, AWA, H)
        return C, dC
    return C


def _chi2_of(alpha_log, A, b, W, reg_mats, which):
    params = [10.0**alpha_log if i == which else 0.0 for i in range(len(reg_mats))]
    C = oracle_eval_C(A, b, W, reg_mats, params)
    val = A @ C
    return np.sum((val - b) ** 2 * W)


def oracle_chi2_param(A, b, W, reg_mats, which):
    """chi2-nu search for reg matrix index `which`; others held at zero."""
    N = len(b)
    for sf in [0.6, 0.7, 0.8, 0.9, 1.0]:
        nu = N * sf
        f = lambda a: _chi2_of(a, A, b, W, reg_mats, which) - nu
        alpha0, val0, alpha = 0.0, 1.0, 0.0
        val = f(alpha)
        if val < 0:
            return 0.0
        bracket = False
        while val0 * val > 0:
            bracket = True
            val0, alpha0 = val, alpha
            alpha = alpha - 1.0
            val = f(alpha)
            if alpha < -100.0:
                bracket = False
                break
        if bracket:
            sol = scipy.optimize.brentq(f, alpha, alpha0, disp=True)
            return 10.0**sol
    return np.nan


def oracle_gcv_param(A0, b0, W0, reg_mats, which):
    def obj(alpha_log):
        # scipy passes a shape-(1,) array; ndim>0 -> float is deprecated
        a_log = float(np.asarray(alpha_log).reshape(-1)[0])
        params = [
            10.0 ** a_log if i == which else 0.0
            for i in range(len(reg_mats))
        ]
        residuals = []
        for i in range(len(b0)):
            A = np.delete(A0, i, 0)
            b = np.delete(b0, i, 0)
            W = np.delete(W0, i, 0)
            C = oracle_eval_C(A, b, W, reg_mats, params)
            val = float(A0[i] @ C)
            residuals.append((val - b0[i]) ** 2 * W0[i])
        return sum(residuals)

    sol = scipy.optimize.minimize(obj, -20.0, method="Nelder-Mead")
    if not sol.success:
        return np.nan
    return 10.0 ** sol.x[0]


def oracle_fit_record(values, errors, A, reg_mats, method="chi2",
                      manual=None):
    """One record of the reference fit loop, NaN handling included."""
    finite = np.isfinite(values)
    A0 = A[finite]
    b = values[finite]
    W = errors[finite] ** (-2)

    params = []
    for i in range(len(reg_mats)):
        if method == "chi2":
            try:
                params.append(oracle_chi2_param(A0, b, W, reg_mats, i))
            except ValueError:
                params.append(np.nan)
        elif method == "gcv":
            params.append(oracle_gcv_param(A0, b, W, reg_mats, i))
        elif method == "manual":
            params.append(manual[i])
    nb = A.shape[1]
    if any(np.isnan(params)):
        return np.full(nb, np.nan), np.full((nb, nb), np.nan), np.nan, params
    C, dC = oracle_eval_C(A0, b, W, reg_mats, params, calccov=True)
    c2 = np.sum((A0 @ C - b) ** 2 * W)
    return C, dC, c2, params


def _omega_pair(ni, nj, maxk, maxl, cap, max_z):
    ks, ls, ms = _basis_indices(maxk, maxl)
    ki, li, mi = ks[ni], ls[ni], ms[ni]
    kj, lj, mj = ks[nj], ls[nj], ms[nj]
    vi, vj = _nu(li, cap), _nu(lj, cap)

    def combo(t, v, m):
        x = np.cos(t)
        return (
            -v * (v * x**2 + v + 1) * sp.lpmv(m, v, x)
            + v * (v + m) * x * sp.lpmv(m, v - 1, x)
            + v * (v - m + 1) * x * sp.lpmv(m, v + 1, x)
        )

    z_int = lambda z: np.exp(-z) * sp.eval_laguerre(ki, z) * sp.eval_laguerre(kj, z) / z**2
    t_int = lambda t: combo(t, vi, mi) * combo(t, vj, mj) / np.sin(t) ** 3
    p_int = lambda p: _az(vi, mi, p) * _az(vj, mj, p)
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        Iz = scipy.integrate.quad(z_int, 0.0, max_z)[0]
        It = scipy.integrate.quad(t_int, 0.0, cap)[0]
        Ip = scipy.integrate.quad(p_int, 0.0, 2 * np.pi)[0]
    return Iz * It * Ip


def _psi_pair(ni, nj, maxk, maxl, cap, max_z):
    ks, ls, ms = _basis_indices(maxk, maxl)
    ki, li, mi = ks[ni], ls[ni], ms[ni]
    kj, lj, mj = ks[nj], ls[nj], ms[nj]
    vi, vj = _nu(li, cap), _nu(lj, cap)
    z_int = lambda z: np.exp(-z) * sp.eval_laguerre(ki, z) * sp.eval_laguerre(kj, z) * z**2
    t_int = lambda t: sp.lpmv(mi, vi, np.cos(t)) * sp.lpmv(mj, vj, np.cos(t)) * np.sin(t)
    p_int = lambda p: _az(vi, mi, p) * _az(vj, mj, p)
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        Iz = scipy.integrate.quad(z_int, 0.0, max_z)[0]
        It = scipy.integrate.quad(t_int, 0.0, cap)[0]
        Ip = scipy.integrate.quad(p_int, 0.0, 2 * np.pi)[0]
    return Iz * It * Ip


def _pair_matrix(pair_fn, maxk, maxl, cap_lim_deg, max_z):
    cap = np.deg2rad(cap_lim_deg)
    nb = maxk * maxl**2
    M = np.zeros((nb, nb))
    for ni in range(nb):
        for nj in range(ni, nb):
            v = pair_fn(ni, nj, maxk, maxl, cap, max_z)
            M[ni, nj] = M[nj, ni] = v
    return M


def oracle_omega(maxk, maxl, cap_lim_deg, max_z=np.inf):
    return _pair_matrix(_omega_pair, maxk, maxl, cap_lim_deg, max_z)


def oracle_psi(maxk, maxl, cap_lim_deg, max_z=np.inf):
    return _pair_matrix(_psi_pair, maxk, maxl, cap_lim_deg, max_z)
