"""Pallas TPU kernel for the fused dense-grid evaluation.

Mirrors GridEvaluator._clenshaw_trig_radial (ops/grid_eval.py) tile-by-tile,
plus two kernel-only optimizations:

* the geodetic -> cap coordinate transform (WGS-84 ECEF, Rodrigues rotation,
  z-stretch; coords.py) is fused into the kernel, so the only HBM traffic is
  lat/lon/alt in and the field value out;
* the Chebyshev evaluation precomputes the T_d(u) rows once per tile by
  recurrence and then reduces each pair with single-fma dot steps at that
  pair's EXACT required degree (GridEvaluator.pair_degree) — ~3x fewer VPU
  ops than per-pair Clenshaw at the worst-case bucket degree, which
  measured as 63% of kernel time;
* cos(phi)/sin(phi) come directly from the rotated coordinates
  (rx/rho, ry/rho) instead of atan2(phi) + sin/cos, and m=0 pairs skip
  their identically-zero sin branch.

Point tiles are native (8, LANES) float32 tiles; pairs live on a leading
batch axis so the small npairs dimension never touches the MXU and there is
no 128-lane padding waste.  Accuracy is ~4e-5..1e-4 relative-to-sup against
the float64 XLA path (set by f32 theta resolution: d(theta) ~ 1e-7 rad x
d(P)/d(theta) ~ nu) — measured ~100x MORE accurate than the f32 XLA
fallback path, whose TPU trig carries the full f32 transcendental error.
Measured 3.2e9 points/s/chip at nbasis=144 on v5e (was 1.73e9 with the
round-1 bucketed-Clenshaw kernel).
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..constants import RE, WGS84_A, WGS84_E2

import os as _os

SUB = 8  # sublanes per point tile
LANES = int(_os.environ.get("VITPU_GRID_LANES", "1024"))  # lanes per tile
# (env-overridable for throughput sweeps: scripts/grid_lanes_sweep.py)
TILE = SUB * LANES  # points per grid step


_PI = np.float32(np.pi)
_PI_2 = np.float32(np.pi / 2.0)
_PI_4 = np.float32(np.pi / 4.0)
_TAN_3PI_8 = np.float32(2.414213562373095)
_TAN_PI_8 = np.float32(0.4142135623730950)


def _atanf(x):
    """float32 arctan (Cephes atanf scheme, ~1e-7 rad); Mosaic has no
    atan/atan2/acos lowerings."""
    sign = jnp.where(x < 0.0, np.float32(-1.0), np.float32(1.0))
    ax = jnp.abs(x)
    big = ax > _TAN_3PI_8
    mid = ax > _TAN_PI_8
    ax_safe = jnp.maximum(ax, np.float32(1e-30))
    x1 = jnp.where(
        big, -1.0 / ax_safe, jnp.where(mid, (ax - 1.0) / (ax + 1.0), ax)
    )
    z = x1 * x1
    y = (
        (
            (np.float32(8.05374449538e-2) * z - np.float32(1.38776856032e-1))
            * z
            + np.float32(1.99777106478e-1)
        )
        * z
        - np.float32(3.33329491539e-1)
    ) * z * x1 + x1
    y = y + jnp.where(big, _PI_2, jnp.where(mid, _PI_4, np.float32(0.0)))
    return sign * y


def _atan2f(y, x):
    x_safe = jnp.where(x == 0.0, np.float32(1.0), x)
    ang = _atanf(y / x_safe)
    ang = jnp.where(
        x < 0.0, ang + jnp.where(y >= 0.0, _PI, -_PI), ang
    )
    ang = jnp.where(
        x == 0.0,
        jnp.where(y > 0.0, _PI_2, jnp.where(y < 0.0, -_PI_2, np.float32(0.0))),
        ang,
    )
    return ang


def _kernel(lat_ref, lon_ref, alt_ref, coef_ref, ceff_ref,
            out_ref, *, pair_deg, maxl, maxk, mbar_pair,
            theta_lo, theta_hi, kx, ky, ct0, st0):
    """One (record, point-tile) grid step.

    ceff_ref: SMEM block [1, 2, npairs, maxk] — the current record's
    effective coefficients (cos/sin branches); the grid's record axis
    selects the row, so a whole day of records runs as one dispatch."""
    deg2rad = np.float32(np.pi / 180.0)
    latr = lat_ref[0] * deg2rad  # [SUB, LANES]
    lonr = lon_ref[0] * deg2rad
    alt = alt_ref[0]

    # WGS-84 geodetic -> ECEF (coords.geodetic2ecef)
    sla = jnp.sin(latr)
    cla = jnp.cos(latr)
    nrad = np.float32(WGS84_A) / jnp.sqrt(1.0 - np.float32(WGS84_E2) * sla * sla)
    rho = (nrad + alt) * cla
    x = rho * jnp.cos(lonr)
    y = rho * jnp.sin(lonr)
    zz = (nrad * np.float32(1.0 - WGS84_E2) + alt) * sla

    # Rodrigues rotation by +theta0 about k = (kx, ky, 0)
    # (the reference's quirk rotation, docs/PARITY_NOTES.md #1)
    kdv = kx * x + ky * y
    omc = 1.0 - ct0
    rx = x * ct0 + ky * zz * st0 + kx * kdv * omc
    ry = y * ct0 - kx * zz * st0 + ky * kdv * omc
    rz = zz * ct0 + (kx * y - ky * x) * st0

    r = jnp.sqrt(rx * rx + ry * ry + rz * rz)
    # acos(q) = atan2(sqrt(1-q^2), q), with the hand-rolled atan2 above
    q = rz / r
    tt = _atan2f(jnp.sqrt(jnp.maximum(1.0 - q * q, np.float32(0.0))), q)
    zt = np.float32(100.0) * (r * np.float32(1.0 / RE) - 1.0)

    half = (theta_hi - theta_lo) * 0.5
    u_raw = (tt - (theta_lo + half)) * (1.0 / half)
    # points outside the fitted colatitude band get NaN, not extrapolated
    # garbage (the float64 path widens its tables adaptively instead)
    oob = jnp.abs(u_raw) > np.float32(1.0 + 1e-4)
    u = jnp.clip(u_raw, -1.0, 1.0)[None]  # [1, SUB, LANES]
    two_u = 2.0 * u

    # trig rows (Chebyshev recurrence from cos/sin of phi, taken directly
    # from the rotated coordinates: phi itself is never needed)
    rho_h = jnp.sqrt(jnp.maximum(rx * rx + ry * ry, np.float32(1e-30)))
    cos1 = rx / rho_h
    sin1 = ry / rho_h
    # phi itself is never needed: cos/sin come from the rotated coords
    cosm = [jnp.ones_like(cos1), cos1]
    sinm = [jnp.zeros_like(cos1), sin1]
    for m in range(2, maxl):
        cosm.append(2.0 * cos1 * cosm[-1] - cosm[-2])
        sinm.append(2.0 * cos1 * sinm[-1] - sinm[-2])

    # radial Laguerre rows (forward recurrence)
    lag = [jnp.ones_like(zt)]
    if maxk > 1:
        lag.append(1.0 - zt)
        for kk in range(1, maxk - 1):
            lag.append(
                ((2.0 * kk + 1.0 - zt) * lag[kk] - kk * lag[kk - 1])
                * (1.0 / (kk + 1.0))
            )

    # Chebyshev rows once per tile, then per-pair single-fma dot reduction
    # at each pair's exact required degree
    u2 = u[0]
    two_u2 = two_u[0]
    dmax = max(pair_deg)
    T = [jnp.ones_like(u2), u2]
    for d in range(2, dmax):
        T.append(two_u2 * T[-1] - T[-2])

    acc = jnp.zeros((SUB, LANES), jnp.float32)
    for j in range(len(pair_deg)):
        P = coef_ref[0, j] * T[0]
        for d in range(1, pair_deg[j]):
            P = P + coef_ref[d, j] * T[d]
        rc = ceff_ref[0, 0, j, 0] * lag[0]
        for kk in range(1, maxk):
            rc = rc + ceff_ref[0, 0, j, kk] * lag[kk]
        mb = mbar_pair[j]
        if mb == 0:
            acc = acc + P * rc  # the sin branch is identically zero
        else:
            rs = ceff_ref[0, 1, j, 0] * lag[0]
            for kk in range(1, maxk):
                rs = rs + ceff_ref[0, 1, j, kk] * lag[kk]
            acc = acc + P * (cosm[mb] * rc + sinm[mb] * rs)

    out = acc * jnp.exp(-0.5 * zt)
    out_ref[0, 0] = jnp.where(oob, np.float32(np.nan), out)


def eval_latlonalt_pallas(lat, lon, alt, ceff, ev):
    """Flat-array single-record evaluation (geodetic inputs).

    ceff: [2, npairs_pad, maxk] from GridEvaluator.fold_coeffs."""
    return eval_records_latlonalt_pallas(lat, lon, alt, ceff[None], ev)[0]


def eval_records_latlonalt_pallas(lat, lon, alt, ceff_all, ev):
    """Batched multi-record evaluation: the SAME point set evaluated with
    nrec coefficient vectors in one dispatch (keogram/volume products).

    ceff_all: [nrec, 2, npairs_pad, maxk]; returns [nrec, npoints]."""
    n = lat.shape[0]
    nrec = ceff_all.shape[0]
    ntiles = max((n + TILE - 1) // TILE, 1)
    npad = ntiles * TILE

    def pad(x):
        return jnp.pad(x.astype(jnp.float32), (0, npad - n)).reshape(
            ntiles, SUB, LANES
        )

    latp, lonp, altp = pad(lat), pad(lon), pad(alt)

    npairs = ev.npairs
    pair_deg = tuple(max(int(d), 1) for d in np.asarray(ev.pair_degree))
    coef4 = np.ascontiguousarray(
        ev._coef[:npairs].T)[:, :, None, None].astype(np.float32)
    mbar_perm = tuple(int(m) for m in np.asarray(ev._mbar_pair))
    ceff_p = ceff_all[:, :, :npairs]  # [nrec, 2, npairs, maxk]

    from .. import coords as _coords

    # rotation constants computed on HOST (static scalars; this runs under
    # jit where jnp values would be tracers)
    x0, y0, z0 = _coords.np_geodetic2ecef(ev.model.latcp, ev.model.loncp, 0.0)
    th0 = float(np.arccos(z0 / np.sqrt(x0**2 + y0**2 + z0**2)))
    phi0 = float(np.arctan2(y0, x0))
    k_np = np.array([np.cos(phi0 + np.pi / 2.0), np.sin(phi0 + np.pi / 2.0)])

    kern = functools.partial(
        _kernel,
        pair_deg=pair_deg,
        maxl=max(ev.maxl, 2),
        maxk=ev.maxk,
        mbar_pair=mbar_perm,
        theta_lo=np.float32(ev.theta_lo),
        theta_hi=np.float32(ev.theta_hi),
        kx=np.float32(k_np[0]),
        ky=np.float32(k_np[1]),
        ct0=np.float32(np.cos(th0)),
        st0=np.float32(np.sin(th0)),
    )

    # np.int32 literals: under jax_enable_x64 a bare python 0 becomes an
    # int64 constant in the index map, which Mosaic refuses to lower
    zero = np.int32(0)
    point_spec = pl.BlockSpec((1, SUB, LANES), lambda r, i: (i, zero, zero),
                              memory_space=pltpu.VMEM)
    vmem = pl.BlockSpec(memory_space=pltpu.VMEM)
    ceff_spec = pl.BlockSpec(
        (1,) + ceff_p.shape[1:], lambda r, i: (r, zero, zero, zero),
        memory_space=pltpu.SMEM,
    )

    avg_deg = float(np.mean(pair_deg))
    # x64 disabled inside the kernel trace (see zero note above)
    with jax.enable_x64(False):
        out = pl.pallas_call(
            kern,
            grid=(nrec, ntiles),
            in_specs=[point_spec, point_spec, point_spec, vmem, ceff_spec],
            out_specs=pl.BlockSpec(
                (1, 1, SUB, LANES), lambda r, i: (r, i, zero, zero),
                memory_space=pltpu.VMEM,
            ),
            out_shape=jax.ShapeDtypeStruct((nrec, ntiles, SUB, LANES),
                                           jnp.float32),
            cost_estimate=pl.CostEstimate(
                flops=int(4 * avg_deg * npairs * npad * nrec),
                bytes_accessed=4 * 4 * npad * nrec,
                transcendentals=10 * npad * nrec,
            ),
        )(latp, lonp, altp, jnp.asarray(coef4),
          jnp.asarray(ceff_p, dtype=jnp.float32))

    return out.reshape(nrec, npad)[:, :n]
