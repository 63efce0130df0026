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

from ..ops.fit import fit_from_stats, fit_one_record, record_stats


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
        # LOO identity needs all points of a record on one device
        f = partial(fit_one_record, A=Ap, reg_mats=reg_mats, method=method,
                    manual_params=manual_params)
        fitted = jax.jit(
            jax.vmap(f),
            in_shardings=(
                NamedSharding(mesh, P(("records", "points"))),
            ) * 2,
        )(v, e)
        C, dC, chi2, alphas = fitted
        return C[:nrec], dC[:nrec], chi2[:nrec], alphas[:nrec]

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
    C, dC, chi2, alphas = solve(AtWA, AtWb, btWb, N)
    return C[:nrec], dC[:nrec], chi2[:nrec], alphas[:nrec]


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
