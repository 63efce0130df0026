"""Mesh-sharded batched fit and grid evaluation.

Structure (SURVEY.md sections 2, 5.7-5.8):

1. **Sufficient-statistics stage** — shard_map over ('records', 'points'):
   each device reduces its point shard of the weighted normal equations and
   psum's the [nbasis, nbasis] partials over the 'points' axis (the only
   communication in the whole fit; nbasis is tiny so this rides ICI in
   microseconds).
2. **Solve stage** — the per-record regularization search + solve runs from
   the statistics alone (ops/fit.fit_from_stats), records sharded over the
   whole mesh, zero communication.

Grid evaluation is a pure map: points shard across every device, no
collectives (SURVEY.md section 5.7).

GCV needs per-point leave-one-out quantities and is currently supported on
the records axis only (points replicated); chi2/manual support both axes.
"""

from __future__ import annotations

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..ops.fit import fit_from_stats, record_stats


def _pad_to(x, n, axis, fill):
    pad = n - x.shape[axis]
    if pad <= 0:
        return x
    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, pad)
    return jnp.pad(x, widths, constant_values=fill)


def fit_records_sharded(values, errors, A, reg_mats, mesh: Mesh,
                        method: str = "chi2", manual_params=None,
                        regparam_mode: str = "exact"):
    """Sharded batched fit.  values/errors: [nrec, npoints]; A: [npoints, nb].

    Returns (C, dC, chi2, reg_params) with the original nrec (padding record
    and point shards is handled internally with NaN/zero masking).
    """
    nrec, npts = values.shape
    nb = A.shape[1]
    r_ax = mesh.shape["records"]
    p_ax = mesh.shape["points"]

    # records padded to a multiple of the FULL device count so stage 2 can
    # shard them over both axes; points to the points-axis size
    nrec_p = -(-nrec // (r_ax * p_ax)) * (r_ax * p_ax)
    npts_p = -(-npts // p_ax) * p_ax

    # pad records with NaN (fully masked) and points with NaN data + zero
    # basis rows: both contribute nothing to the statistics
    v = _pad_to(_pad_to(jnp.asarray(values), nrec_p, 0, jnp.nan),
                npts_p, 1, jnp.nan)
    e = _pad_to(_pad_to(jnp.asarray(errors), nrec_p, 0, jnp.nan),
                npts_p, 1, jnp.nan)
    Ap = _pad_to(jnp.asarray(A), npts_p, 0, 0.0)

    if method == "gcv":
        C, dC, chi2, alphas = _gcv_stage(
            v, e, Ap, reg_mats, mesh, regparam_mode)
        return C[:nrec], dC[:nrec], chi2[:nrec], alphas[:nrec]

    C, dC, chi2, alphas = _stats_then_solve(
        v, e, Ap, reg_mats, mesh, method, manual_params, regparam_mode)
    return C[:nrec], dC[:nrec], chi2[:nrec], alphas[:nrec]


def _gcv_stage(v, e, Ap, reg_mats, mesh: Mesh, regparam_mode):
    """Point-sharded GCV fit (SURVEY.md 5.7): each device holds a point
    shard, the psum'd full statistics drive the solve, and every
    leave-one-out objective evaluation reduces ONE scalar over the points
    axis (ops/regparam.gcv_objective's axis_name path) — so GCV now runs on
    every mesh shape, not just records-only."""
    from ..ops import regparam
    from ..ops.solve import final_solve, suff_stats

    nreg = reg_mats.shape[0]

    @partial(
        shard_map,
        mesh=mesh,
        in_specs=(P("records", "points"), P("records", "points"),
                  P("points", None), P()),
        out_specs=(P("records"), P("records"), P("records"), P("records")),
        check_vma=False,
    )
    def stage(v_blk, e_blk, A_blk, regs):
        def one(vv, ee):
            mask = jnp.isfinite(vv).astype(A_blk.dtype)
            W = jnp.where(mask > 0, ee, 1.0) ** (-2)
            b = jnp.where(mask > 0, vv, 0.0)
            Wm = jnp.where(mask > 0, W, 0.0)
            AtWA, AtWb, btWb, N = suff_stats(A_blk, b, W, mask)
            AtWA = jax.lax.psum(AtWA, "points")
            AtWb = jax.lax.psum(AtWb, "points")
            btWb = jax.lax.psum(btWb, "points")
            alphas = jnp.stack([
                regparam.gcv_reg_param(
                    AtWA, AtWb, regs[i], A_blk, b, Wm, mask,
                    axis_name="points",
                    regparam_mode=("fast" if regparam_mode == "fast"
                                   else "exact"),
                )
                for i in range(nreg)
            ])
            C, dC, chi2 = final_solve(AtWA, AtWb, btWb, regs, alphas)
            bad = jnp.any(jnp.isnan(alphas))
            nb = A_blk.shape[1]
            C = jnp.where(bad, jnp.full((nb,), jnp.nan, C.dtype), C)
            dC = jnp.where(bad, jnp.full((nb, nb), jnp.nan, dC.dtype), dC)
            chi2 = jnp.where(bad, jnp.nan, chi2)
            return C, dC, chi2, alphas

        return jax.vmap(one)(v_blk, e_blk)

    return stage(v, e, Ap, reg_mats)


def _stats_then_solve(v, e, Ap, reg_mats, mesh: Mesh, method, manual_params,
                      regparam_mode):
    """The two sharded stages on already-padded (global or local) arrays:
    point-sharded psum-reduced statistics, then the per-record solve with
    records sharded over the whole mesh.  Shared by the single-process
    (fit_records_sharded) and multi-process (parallel/distributed.py)
    paths."""

    # stage 1: point-sharded, psum-reduced sufficient statistics
    @partial(
        shard_map,
        mesh=mesh,
        in_specs=(P("records", "points"), P("records", "points"),
                  P("points", None)),
        out_specs=(P("records"), P("records"), P("records"), P("records")),
    )
    def stats_stage(v_blk, e_blk, A_blk):
        AtWA, AtWb, btWb, N = jax.vmap(
            lambda vv, ee: record_stats(vv, ee, A_blk)
        )(v_blk, e_blk)
        AtWA = jax.lax.psum(AtWA, "points")
        AtWb = jax.lax.psum(AtWb, "points")
        btWb = jax.lax.psum(btWb, "points")
        N = jax.lax.psum(N, "points")
        return AtWA, AtWb, btWb, N

    AtWA, AtWb, btWb, N = stats_stage(v, e, Ap)

    # stage 2: records resharded over the whole mesh, no communication
    sh2 = NamedSharding(mesh, P(("records", "points")))
    AtWA, AtWb, btWb, N = (
        jax.device_put(x, sh2) for x in (AtWA, AtWb, btWb, N)
    )
    solve = jax.jit(
        jax.vmap(
            partial(fit_from_stats, reg_mats=reg_mats, method=method,
                    manual_params=manual_params, regparam_mode=regparam_mode)
        ),
        out_shardings=sh2,
    )
    return solve(AtWA, AtWb, btWb, N)


def grid_eval_sharded(evaluator, C, gdlat, gdlon, gdalt, mesh: Mesh):
    """Dense-grid evaluation with points sharded over every mesh device
    (pure map, zero communication)."""
    gdlat = jnp.asarray(gdlat)
    shape = gdlat.shape
    n = int(np.prod(shape))
    ndev = mesh.devices.size
    n_p = -(-n // ndev) * ndev

    flat = lambda x: _pad_to(
        jnp.asarray(x, dtype=evaluator.dtype).ravel(), n_p, 0, 0.0
    )
    lat, lon, alt = flat(gdlat), flat(gdlon), flat(gdalt)
    ceff = evaluator.fold_coeffs(C)

    sh = NamedSharding(mesh, P(("records", "points")))
    ev = jax.jit(
        evaluator._eval_flat,
        in_shardings=(None, sh, sh, sh),
        out_shardings=sh,
    )
    out = ev(ceff, lat, lon, alt)
    return out[:n].reshape(shape)
