"""End-to-end batched fit: records in, (C, dC, chi2) out.

The reference's serial per-record loop (interpolate.py:511-574) becomes one
vmapped, jit-compiled pipeline over a static-shape record batch:

    per record:  mask -> sufficient statistics -> pencil whitening ->
                 regularization-parameter search -> final solve -> chi^2

Records whose parameter search fails are NaN-filled, matching
interpolate.py:557-563.  The design matrix A is shared across records (the
beam geometry is file-level in AMISR data, interpolate.py:496,525) and is
computed once outside this module.

Sharding: see parallel/fit.py for the mesh-parallel wrapper (records axis =
data parallel; measurement-point axis = psum-reduced partial normal
equations).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from . import regparam
from .solve import final_solve, suff_stats


def record_stats(values, errors, A):
    """Masked sufficient statistics of one record (NaN -> zero weight)."""
    mask = jnp.isfinite(values).astype(A.dtype)
    W = jnp.where(mask > 0, errors, 1.0) ** (-2)
    b = jnp.where(mask > 0, values, 0.0)
    return suff_stats(A, b, W, mask)


def fit_from_stats(AtWA, AtWb, btWb, N, reg_mats, method: str,
                   manual_params=None, regparam_mode: str = "exact"):
    """Fit one record from sufficient statistics (chi2/manual methods; GCV
    needs per-point quantities, see fit_one_record).

    regparam_mode: 'exact' (default) uses the hybrid cutoff-semantics
    search (~9 eighs/record, ops/regparam.chi2_reg_param); 'exact_grid'
    uses the full 101-point cutoff-eigh grid scan (round-1 receipts
    baseline); 'fast' uses the O(nbasis)-per-alpha whitened search
    (ops/regparam.chi2_reg_param_fast).

    Returns (C [nb], dC [nb, nb], chi2 [], reg_params [nreg])."""
    nreg = reg_mats.shape[0]
    if nreg == 0:
        alphas = jnp.zeros((0,), dtype=AtWA.dtype)
    elif method in ("manual", "prompt"):
        alphas = jnp.asarray(manual_params, dtype=AtWA.dtype)
    elif method == "chi2":
        # reference semantics: each parameter solved with all others at
        # zero (interpolate.py:120-124, 246-252)
        search = {
            "exact": regparam.chi2_reg_param,
            "exact_grid": regparam.chi2_reg_param_grid,
            "fast": regparam.chi2_reg_param_fast,
        }[regparam_mode]
        alphas = jnp.stack([
            search(AtWA, AtWb, btWb, N, reg_mats[i])
            for i in range(nreg)
        ])
    else:
        raise ValueError(f"method {method!r} needs per-point data; "
                         "use fit_one_record")

    C, dC, chi2 = final_solve(AtWA, AtWb, btWb, reg_mats, alphas)

    # NaN-fill failed records (interpolate.py:557-563)
    bad = jnp.any(jnp.isnan(alphas)) if nreg > 0 else jnp.asarray(False)
    nb = AtWA.shape[-1]
    C = jnp.where(bad, jnp.full((nb,), jnp.nan, dtype=C.dtype), C)
    dC = jnp.where(bad, jnp.full((nb, nb), jnp.nan, dtype=dC.dtype), dC)
    chi2 = jnp.where(bad, jnp.nan, chi2)
    return C, dC, chi2, alphas


def fit_one_record(values, errors, A, reg_mats, method: str,
                   manual_params=None, regparam_mode: str = "exact"):
    """Fit a single record.  values/errors: [npoints]; A: [npoints, nbasis];
    reg_mats: [nreg, nbasis, nbasis].  `method` is static.

    Returns (C [nb], dC [nb, nb], chi2 [], reg_params [nreg]).
    """
    AtWA, AtWb, btWb, N = record_stats(values, errors, A)

    nreg = reg_mats.shape[0]
    if method == "gcv" and nreg > 0:
        mask = jnp.isfinite(values).astype(A.dtype)
        W = jnp.where(mask > 0, errors, 1.0) ** (-2)
        b = jnp.where(mask > 0, values, 0.0)
        Wm = jnp.where(mask > 0, W, 0.0)
        alphas = jnp.stack([
            regparam.gcv_reg_param(
                AtWA, AtWb, reg_mats[i], A, b, Wm, mask,
                regparam_mode=("fast" if regparam_mode == "fast"
                               else "exact"),
            )
            for i in range(nreg)
        ])
        C, dC, chi2 = final_solve(AtWA, AtWb, btWb, reg_mats, alphas)
        bad = jnp.any(jnp.isnan(alphas))
        nb = A.shape[1]
        C = jnp.where(bad, jnp.full((nb,), jnp.nan, dtype=C.dtype), C)
        dC = jnp.where(bad, jnp.full((nb, nb), jnp.nan, dtype=dC.dtype), dC)
        chi2 = jnp.where(bad, jnp.nan, chi2)
        return C, dC, chi2, alphas

    return fit_from_stats(AtWA, AtWb, btWb, N, reg_mats, method,
                          manual_params, regparam_mode)


@partial(jax.jit, static_argnames=("method", "regparam_mode"))
def fit_records(values, errors, A, reg_mats, method: str = "chi2",
                manual_params=None, regparam_mode: str = "exact"):
    """Vmapped batched fit.  values/errors: [nrec, npoints].

    Returns (C [nrec, nb], dC [nrec, nb, nb], chi2 [nrec],
    reg_params [nrec, nreg])."""
    f = partial(fit_one_record, A=A, reg_mats=reg_mats, method=method,
                manual_params=manual_params, regparam_mode=regparam_mode)
    return jax.vmap(f)(values, errors)
