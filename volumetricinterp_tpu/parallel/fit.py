"""Mesh-sharded batched fit and grid evaluation.

Structure (SURVEY.md sections 2, 5.7-5.8):

1. **Sufficient-statistics stage** — shard_map over ('records', 'points'):
   each device reduces its point shard of the weighted normal equations and
   combines the [nbasis, nbasis] partials over the 'points' axis (the only
   communication in the whole fit; nbasis is tiny so this rides ICI in
   microseconds).  On TPU the statistics are f32 EXPANSIONS (ops/xprec.py —
   the hardware has no f64) and the cross-device reduction is the exact
   all_gather + two_sum cascade (xprec.psum_x), not a rounding psum.
2. **Solve stage** — the per-record regularization search + solve runs from
   the statistics alone (ops/fit.fit_from_stats_x), records sharded over
   the whole mesh, zero communication.

Grid evaluation is a pure map: points shard across every device, no
collectives (SURVEY.md section 5.7).

GCV runs point-sharded through the scalar-psum objective
(ops/regparam.gcv_objective); chi2/manual support both axes.
"""

from __future__ import annotations

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..ops import xprec
from ..ops.fit import fit_from_stats_x, prepare_fit_inputs
from ..ops.solve import suff_stats_x
from ..ops.xprec import stack_x, unstack_x


def _pad_to(x, n, axis, fill):
    pad = n - x.shape[axis]
    if pad <= 0:
        return x
    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, pad)
    return jnp.pad(x, widths, constant_values=fill)


def _log_to_raw(log_alphas):
    # HOST f64 result: device f32 would underflow raw alphas < ~1e-38
    la = np.asarray(log_alphas, np.float64)
    with np.errstate(over="ignore"):
        return 10.0 ** la


def fit_records_sharded(values, errors, A, reg_mats, mesh: Mesh,
                        method: str = "chi2", manual_params=None,
                        regparam_mode: str = "exact", reg_taus=None):
    """Sharded batched fit.  values/errors: [nrec, npoints]; A: [npoints,
    nb]; host arrays (expansion splitting happens here).

    Returns (C, dC, chi2, reg_params) with the original nrec (padding
    record and point shards is handled internally with NaN/zero masking);
    reg_params in the reference's raw-alpha units.
    """
    values = np.asarray(values, np.float64)
    errors = np.asarray(errors, np.float64)
    nrec, npts = values.shape
    r_ax = mesh.shape["records"]
    p_ax = mesh.shape["points"]

    # records padded to a multiple of the FULL device count so stage 2 can
    # shard them over both axes; points to the points-axis size
    nrec_p = -(-nrec // (r_ax * p_ax)) * (r_ax * p_ax)
    npts_p = -(-npts // p_ax) * p_ax

    # pad records with NaN (fully masked) and points with NaN data + zero
    # basis rows: both contribute nothing to the statistics
    v = _pad_to(_pad_to(np.asarray(values), nrec_p, 0, np.nan),
                npts_p, 1, np.nan)
    e = _pad_to(_pad_to(np.asarray(errors), nrec_p, 0, np.nan),
                npts_p, 1, np.nan)
    Ap = _pad_to(np.asarray(A, np.float64), npts_p, 0, 0.0)

    b_x, W_x, mask, A_x, reg_x = prepare_fit_inputs(
        np.asarray(v), np.asarray(e), np.asarray(Ap), reg_mats)

    if method == "gcv":
        C, dC, chi2, log_a = _gcv_stage(
            b_x, W_x, mask, A_x, reg_x, mesh, regparam_mode)
        return (C[:nrec], dC[:nrec], chi2[:nrec],
                _log_to_raw(log_a[:nrec]))

    mlp = None
    if manual_params is not None:
        with np.errstate(divide="ignore"):
            mlp = jnp.asarray(np.log10(np.asarray(manual_params,
                                                  np.float64)))
    reg_taus_x = _split_taus(reg_taus)
    C, dC, chi2, log_a = _stats_then_solve(
        b_x, W_x, mask, A_x, reg_x, mesh, method, mlp, regparam_mode,
        reg_taus_x=reg_taus_x)
    return C[:nrec], dC[:nrec], chi2[:nrec], _log_to_raw(log_a[:nrec])


def _split_taus(reg_taus):
    """Backend-appropriate expansion split of the optional tau vectors
    (data-informed regularization; see ops/fit.fit_records)."""
    if reg_taus is None:
        return None
    rt = np.asarray(reg_taus, np.float64)
    if jax.default_backend() == "tpu":
        return tuple(map(jnp.asarray, xprec.split_f64_host(rt, 3)))
    return (jnp.asarray(rt),)


def _gcv_stage(b_x, W_x, mask, A_x, reg_x, mesh: Mesh, regparam_mode):
    """Point-sharded GCV fit (SURVEY.md 5.7): each device holds a point
    shard, the exactly-combined full statistics drive the solve, and every
    leave-one-out objective evaluation reduces ONE scalar over the points
    axis (ops/regparam.gcv_objective's axis_name path)."""
    from ..ops import regparam
    from ..ops.fit import fit_one_record_x
    from ..ops.solve import final_solve_x
    from ..ops.xprec import exp_hi, psum_x

    nreg = reg_x[0].shape[0]
    nw = len(b_x)

    @partial(
        shard_map,
        mesh=mesh,
        in_specs=(P(None, "records", "points"), P(None, "records", "points"),
                  P("records", "points"), P(None, "points", None), P()),
        out_specs=(P("records"), P("records"), P("records"), P("records")),
        check_vma=False,
    )
    def stage(b_s, W_s, m_blk, A_s, reg_s):
        b_blk = unstack_x(b_s, nw)
        W_blk = unstack_x(W_s, nw)
        A_blk = unstack_x(A_s, nw)
        regs = unstack_x(reg_s, nw)

        def one(bb, ww, mm):
            AtWA_x, AtWb_x, btWb_x, N = suff_stats_x(A_blk, bb, ww, mm)
            AtWA_x = psum_x(AtWA_x, "points")
            AtWb_x = psum_x(AtWb_x, "points")
            btWb_x = psum_x(btWb_x, "points")
            Wm = jnp.where(mm > 0, exp_hi(ww), 0.0)
            if regparam_mode == "fast":
                log_a = jnp.stack([
                    regparam.gcv_reg_param(
                        exp_hi(AtWA_x), exp_hi(AtWb_x),
                        exp_hi(tuple(w[i] for w in regs)),
                        exp_hi(A_blk), exp_hi(bb), Wm, mm,
                        axis_name="points", regparam_mode="fast",
                    )
                    for i in range(nreg)
                ])
            else:
                # anchored exact objective on the LOCAL point shard (T
                # rows local, objective psum'd); the replicated stats
                # ladder is computed per shard — small vs the NM loop
                log_a = jnp.stack([
                    regparam.gcv_reg_param_x(
                        AtWA_x, AtWb_x, tuple(w[i] for w in regs),
                        A_blk, exp_hi(bb), Wm, mm, axis_name="points",
                    )
                    for i in range(nreg)
                ])
            C, dC, chi2 = final_solve_x(AtWA_x, AtWb_x, btWb_x, regs,
                                        log_a)
            bad = jnp.any(jnp.isnan(log_a))
            nb = C.shape[-1]
            C = jnp.where(bad, jnp.full((nb,), jnp.nan, C.dtype), C)
            dC = jnp.where(bad, jnp.full_like(dC, jnp.nan), dC)
            chi2 = jnp.where(bad, jnp.nan, chi2)
            return C, dC, chi2, log_a

        return jax.vmap(one)(b_blk, W_blk, m_blk)

    return stage(stack_x(b_x), stack_x(W_x), mask, stack_x(A_x),
                 stack_x(reg_x))


def _stats_then_solve(b_x, W_x, mask, A_x, reg_x, mesh: Mesh, method,
                      manual_log_params, regparam_mode, reg_taus_x=None):
    """The two sharded stages on already-padded expansion inputs:
    point-sharded exactly-combined sufficient statistics, then the
    per-record solve with records sharded over the whole mesh.  Shared by
    the single-process (fit_records_sharded) and multi-process
    (parallel/distributed.py) paths."""
    from ..ops.xprec import psum_x

    nw = len(b_x)

    # stage 1: point-sharded, exactly-reduced sufficient statistics
    @partial(
        shard_map,
        mesh=mesh,
        in_specs=(P(None, "records", "points"), P(None, "records", "points"),
                  P("records", "points"), P(None, "points", None)),
        out_specs=(P(None, "records"), P(None, "records"), P(None, "records"),
                   P("records")),
    )
    def stats_stage(b_s, W_s, m_blk, A_s):
        b_blk = unstack_x(b_s, nw)
        W_blk = unstack_x(W_s, nw)
        A_blk = unstack_x(A_s, nw)

        def one(bb, ww, mm):
            return suff_stats_x(A_blk, bb, ww, mm)

        AtWA_x, AtWb_x, btWb_x, N = jax.vmap(one)(b_blk, W_blk, m_blk)
        AtWA_x = psum_x(AtWA_x, "points")
        AtWb_x = psum_x(AtWb_x, "points")
        btWb_x = psum_x(btWb_x, "points")
        N = jax.lax.psum(N, "points")
        return stack_x(AtWA_x), stack_x(AtWb_x), stack_x(btWb_x), N

    AtWA_s, AtWb_s, btWb_s, N = stats_stage(
        stack_x(b_x), stack_x(W_x), mask, stack_x(A_x))

    # stage 2: records resharded over the whole mesh, no communication
    sh2 = NamedSharding(mesh, P(None, ("records", "points")))
    sh2n = NamedSharding(mesh, P(("records", "points")))
    AtWA_s = jax.device_put(AtWA_s, sh2)
    AtWb_s = jax.device_put(AtWb_s, sh2)
    btWb_s = jax.device_put(btWb_s, sh2)
    N = jax.device_put(N, sh2n)

    taus_s = None if reg_taus_x is None else stack_x(reg_taus_x)
    ntw = 0 if reg_taus_x is None else len(reg_taus_x)

    @partial(jax.jit, static_argnames=("method", "regparam_mode"),
             out_shardings=sh2n)
    def solve(AtWA_s, AtWb_s, btWb_s, N, reg_s, mlp, taus_s,
              method=method, regparam_mode=regparam_mode):
        from ..ops.fit import BOOT_ATWA, batch_mean_eig

        boot_VA = None
        if (BOOT_ATWA and method == "chi2" and regparam_mode == "exact"
                and reg_s.shape[1] > 0):
            # record-independent boot basis (ops/fit.batch_mean_eig);
            # the record-axis mean over the sharded statistics is one
            # tiny [nb, nb] collective, the fresh ladder of the mean is
            # replicated compute
            boot_VA = batch_mean_eig(unstack_x(AtWA_s, nw))

        def one(a_s, ab_s, bb_s, n):
            return fit_from_stats_x(
                unstack_x(a_s, nw), unstack_x(ab_s, nw),
                unstack_x(bb_s, nw), n, unstack_x(reg_s, nw),
                method=method, manual_log_params=mlp,
                regparam_mode=regparam_mode,
                reg_taus_x=(None if taus_s is None
                            else unstack_x(taus_s, ntw)),
                boot_VA=boot_VA)

        # record axis is axis 1 of the word-stacked statistics
        return jax.vmap(one, in_axes=(1, 1, 1, 0))(
            AtWA_s, AtWb_s, btWb_s, N)

    return solve(AtWA_s, AtWb_s, btWb_s, N, stack_x(reg_x),
                 manual_log_params, taus_s)


def grid_eval_sharded(evaluator, C, gdlat, gdlon, gdalt, mesh: Mesh):
    """Dense-grid evaluation with points sharded over every mesh device
    (pure map, zero communication).

    The sharded executable is CACHED on the evaluator per mesh: building a
    fresh ``jax.jit`` wrapper per call re-traces the whole Clenshaw graph
    every dispatch (measured at ~40% of the one-chip call time, and the
    source of the 5x run-to-run spread in the committed bench records —
    BENCH_r02 1.85e9 vs BENCH_SELF 0.62e9 pts/s on identical code)."""
    gdlat = jnp.asarray(gdlat)
    shape = gdlat.shape
    n = int(np.prod(shape))
    ndev = mesh.devices.size
    n_p = -(-n // ndev) * ndev

    cache = evaluator.__dict__.setdefault("_sharded_jit_cache", {})
    ev = cache.get(mesh)
    if ev is None:
        sh = NamedSharding(mesh, P(("records", "points")))
        ev = jax.jit(
            evaluator._eval_flat,
            in_shardings=(None, sh, sh, sh),
            out_shardings=sh,
        )
        cache[mesh] = ev

    def flat(x):
        x = jnp.asarray(x, dtype=evaluator.dtype)
        if x.ndim != 1:
            x = x.ravel()
        return _pad_to(x, n_p, 0, 0.0)

    out = ev(evaluator.fold_coeffs(C), flat(gdlat), flat(gdlon), flat(gdalt))
    if n_p != n:
        out = out[:n]
    return out.reshape(shape)
