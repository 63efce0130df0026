"""Pallas TPU kernel for the fused dense-grid evaluation.

Mirrors GridEvaluator._clenshaw_trig_radial (ops/grid_eval.py) tile-by-tile.
Point tiles are native (8, LANES) float32 tiles; the vectorized Clenshaw
recurrence runs over a [npairs_pad, 8, LANES] block (pairs on the leading
axis, unrolled by Mosaic), so the small npairs dimension never touches the
MXU and there is no 128-lane padding waste.  Per-point cost ~
4 * D * npairs_pad VPU flops plus a handful of transcendentals; the point
stream is double-buffered through VMEM by the Pallas grid pipeline.

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

SUB = 8  # sublanes per point tile
LANES = 1024  # lanes per point tile
TILE = SUB * LANES  # points per grid step


def _kernel(z_ref, t_ref, p_ref, coef_ref, ceff_c_ref, ceff_s_ref, out_ref,
            *, degree, maxl, maxk, npairs, npairs_pad, mbar_pair,
            theta_lo, theta_hi):
    zt = z_ref[0]  # [SUB, LANES]
    tt = t_ref[0]
    pt = p_ref[0]

    half = (theta_hi - theta_lo) * 0.5
    u = (tt - (theta_lo + half)) * (1.0 / half)
    u = jnp.clip(u, -1.0, 1.0)[None]  # [1, SUB, LANES]
    two_u = 2.0 * u

    # vectorized Clenshaw over all pairs: b [npairs_pad, SUB, LANES]
    b1 = jnp.zeros((npairs_pad, SUB, LANES), jnp.float32)
    b2 = jnp.zeros_like(b1)
    for k in range(degree - 1, 0, -1):
        ck = coef_ref[k]  # [npairs_pad, 1, 1]
        b1, b2 = two_u * b1 - b2 + ck, b1
    P = u * b1 - b2 + coef_ref[0]  # [npairs_pad, SUB, LANES]

    # trig per pair, gathered by static mbar (rows unrolled, maxl small)
    cos1 = jnp.cos(pt)
    sin1 = jnp.sin(pt)
    cosm = [jnp.ones_like(pt), cos1]
    sinm = [jnp.zeros_like(pt), sin1]
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

    # accumulate sum_j P_j (cos_j Rc_j + sin_j Rs_j); scalars from SMEM
    acc = jnp.zeros((SUB, LANES), jnp.float32)
    for j in range(npairs):
        rc = ceff_c_ref[j, 0] * lag[0]
        rs = ceff_s_ref[j, 0] * lag[0]
        for kk in range(1, maxk):
            rc = rc + ceff_c_ref[j, kk] * lag[kk]
            rs = rs + ceff_s_ref[j, kk] * lag[kk]
        mb = mbar_pair[j]
        acc = acc + P[j] * (cosm[mb] * rc + sinm[mb] * rs)

    out_ref[0] = acc * jnp.exp(-0.5 * zt)


def eval_ztp_pallas(z, t, p, ceff, ev):
    """Flat-array evaluation through the kernel.  ceff: [2, npairs_pad, maxk]
    from GridEvaluator.fold_coeffs; ev: the GridEvaluator (static config)."""
    n = z.shape[0]
    ntiles = max((n + TILE - 1) // TILE, 1)
    npad = ntiles * TILE

    def pad(x):
        return jnp.pad(x.astype(jnp.float32), (0, npad - n)).reshape(
            ntiles, SUB, LANES
        )

    zp, tp_, pp = pad(z), pad(t), pad(p)

    # coefficient table as [D, npairs_pad, 1, 1] for broadcast slicing
    coef4 = ev._coef.T.astype(jnp.float32)[:, :, None, None]

    kern = functools.partial(
        _kernel,
        degree=ev.degree,
        maxl=max(ev.maxl, 2),
        maxk=ev.maxk,
        npairs=ev.npairs,
        npairs_pad=ev.npairs_pad,
        mbar_pair=tuple(int(m) for m in ev._mbar_pair),
        theta_lo=float(ev.theta_lo),
        theta_hi=float(ev.theta_hi),
    )

    # np.int32 literals: under jax_enable_x64 a bare python 0 becomes an
    # int64 constant in the index map, which Mosaic refuses to lower
    zero = np.int32(0)
    point_spec = pl.BlockSpec((1, SUB, LANES), lambda i: (i, zero, zero),
                              memory_space=pltpu.VMEM)
    vmem = pl.BlockSpec(memory_space=pltpu.VMEM)
    smem = pl.BlockSpec(memory_space=pltpu.SMEM)

    # x64 disabled inside the kernel trace: with jax_enable_x64 on, literal
    # indices in block index maps become int64, which Mosaic cannot lower
    with jax.enable_x64(False):
        out = pl.pallas_call(
            kern,
            grid=(ntiles,),
            in_specs=[point_spec, point_spec, point_spec, vmem, smem, smem],
            out_specs=pl.BlockSpec((1, SUB, LANES), lambda i: (i, zero, zero),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((ntiles, SUB, LANES), jnp.float32),
            cost_estimate=pl.CostEstimate(
                flops=4 * ev.degree * ev.npairs_pad * npad,
                bytes_accessed=4 * 4 * npad,
                transcendentals=4 * npad,
            ),
        )(zp, tp_, pp, jnp.asarray(coef4),
          ceff[0].astype(jnp.float32), ceff[1].astype(jnp.float32))

    return out.reshape(npad)[:n]
