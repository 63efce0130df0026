"""Pallas TPU kernel for the fused dense-grid evaluation.

Mirrors GridEvaluator._clenshaw_trig_radial (ops/grid_eval.py) tile-by-tile:
points live on the LANE axis (128-wide vector lanes), the Legendre pair
functions on the SUBLANE axis, so the vectorized Clenshaw recurrence runs as
[npairs_pad, TILE] fused multiply-adds on the VPU with no MXU padding waste
on the small npairs dimension.  Per-point cost ~ 4 * D * npairs_pad flops
plus a handful of transcendentals — VPU-bound by design, with the point
stream double-buffered through VMEM by the Pallas grid pipeline.

Inputs are float32; accuracy is ~1e-5 relative against the float64 XLA path
(set by f32 theta resolution: d(theta) ~ 1e-7 rad x d(P)/d(theta) ~ nu).
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TILE = 2048  # points per grid step (16 lanes x 128)


def _kernel(z_ref, t_ref, p_ref, coef_ref, sel_ref, ceff_c_ref, ceff_s_ref,
            out_ref, *, degree, maxl, maxk, npairs_pad, theta_lo, theta_hi):
    zt = z_ref[0, :]  # [TILE]
    tt = t_ref[0, :]
    pt = p_ref[0, :]

    half = (theta_hi - theta_lo) * 0.5
    u = (tt - (theta_lo + half)) * (1.0 / half)
    u = jnp.clip(u, -1.0, 1.0)[None, :]  # [1, TILE]
    two_u = 2.0 * u

    # vectorized Clenshaw over all pairs: b [npairs_pad, TILE]
    b1 = jnp.zeros((npairs_pad, TILE), jnp.float32)
    b2 = jnp.zeros((npairs_pad, TILE), jnp.float32)
    for k in range(degree - 1, 0, -1):
        ck = coef_ref[:, k][:, None]  # [npairs_pad, 1]
        b1, b2 = two_u * b1 - b2 + ck, b1
    P = u * b1 - b2 + coef_ref[:, 0][:, None]  # [npairs_pad, TILE]

    # trig rows [maxl, TILE]
    m = jax.lax.broadcasted_iota(jnp.float32, (maxl, TILE), 0)
    mp = m * pt[None, :]
    cosm = jnp.cos(mp)
    sinm = jnp.sin(mp)
    cos_p = jnp.dot(sel_ref[:], cosm, preferred_element_type=jnp.float32)
    sin_p = jnp.dot(sel_ref[:], sinm, preferred_element_type=jnp.float32)

    # radial Laguerre rows [maxk, TILE] by forward recurrence
    rows = [jnp.ones((TILE,), jnp.float32)]
    if maxk > 1:
        rows.append(1.0 - zt)
        for kk in range(1, maxk - 1):
            rows.append(
                ((2.0 * kk + 1.0 - zt) * rows[kk] - kk * rows[kk - 1])
                * (1.0 / (kk + 1.0))
            )
    lag = jnp.stack(rows, axis=0)  # [maxk, TILE]

    Rc = jnp.dot(ceff_c_ref[:], lag, preferred_element_type=jnp.float32)
    Rs = jnp.dot(ceff_s_ref[:], lag, preferred_element_type=jnp.float32)

    acc = jnp.sum(P * (cos_p * Rc + sin_p * Rs), axis=0)  # [TILE]
    out_ref[0, :] = acc * jnp.exp(-0.5 * zt)


def eval_ztp_pallas(z, t, p, ceff, ev):
    """Flat-array evaluation through the kernel.  ceff: [2, npairs_pad, maxk]
    from GridEvaluator.fold_coeffs; ev: the GridEvaluator (static config)."""
    n = z.shape[0]
    ntiles = max((n + TILE - 1) // TILE, 1)
    npad = ntiles * TILE

    def pad(x):
        return jnp.pad(x.astype(jnp.float32), (0, npad - n)).reshape(ntiles, TILE)

    zp, tp_, pp = pad(z), pad(t), pad(p)

    kern = functools.partial(
        _kernel,
        degree=ev.degree,
        maxl=ev.maxl,
        maxk=ev.maxk,
        npairs_pad=ev.npairs_pad,
        theta_lo=float(ev.theta_lo),
        theta_hi=float(ev.theta_hi),
    )

    point_spec = pl.BlockSpec((1, TILE), lambda i: (i, 0),
                              memory_space=pltpu.VMEM)
    table_spec = pl.BlockSpec(memory_space=pltpu.VMEM)

    out = pl.pallas_call(
        kern,
        grid=(ntiles,),
        in_specs=[point_spec, point_spec, point_spec,
                  table_spec, table_spec, table_spec, table_spec],
        out_specs=pl.BlockSpec((1, TILE), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((ntiles, TILE), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=4 * ev.degree * ev.npairs_pad * npad,
            bytes_accessed=4 * 4 * npad,
            transcendentals=(2 * ev.maxl + 2) * npad,
        ),
    )(zp, tp_, pp, ev._coef, ev._sel.T,
      ceff[0].astype(jnp.float32), ceff[1].astype(jnp.float32))

    return out.reshape(npad)[:n]
