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


def fit_one_record(values, errors, A, reg_mats, method: str,
                   manual_params=None):
    """Fit a single record.  values/errors: [npoints]; A: [npoints, nbasis];
    reg_mats: [nreg, nbasis, nbasis].  `method` is static.

    Returns (C [nb], dC [nb, nb], chi2 [], reg_params [nreg]).
    """
    mask = jnp.isfinite(values).astype(A.dtype)
    W = jnp.where(mask > 0, errors, 1.0) ** (-2)
    b = jnp.where(mask > 0, values, 0.0)
    AtWA, AtWb, btWb, N = suff_stats(A, b, W, mask)

    nreg = reg_mats.shape[0]
    if nreg == 0:
        alphas = jnp.zeros((0,), dtype=A.dtype)
    elif method in ("manual", "prompt"):
        alphas = jnp.asarray(manual_params, dtype=A.dtype)
    else:
        found = []
        for i in range(nreg):
            # reference semantics: each parameter solved with all others
            # at zero (interpolate.py:120-124, 246-252)
            if method == "chi2":
                found.append(
                    regparam.chi2_reg_param(AtWA, AtWb, btWb, N, reg_mats[i])
                )
            elif method == "gcv":
                Wm = jnp.where(mask > 0, W, 0.0)
                found.append(
                    regparam.gcv_reg_param(AtWA, AtWb, reg_mats[i], A, b, Wm, mask)
                )
            else:
                raise ValueError(f"unknown regularization method {method!r}")
        alphas = jnp.stack(found)

    C, dC, chi2 = final_solve(AtWA, AtWb, btWb, reg_mats, alphas)

    # NaN-fill failed records (interpolate.py:557-563)
    bad = jnp.any(jnp.isnan(alphas)) if nreg > 0 else jnp.asarray(False)
    nb = A.shape[1]
    C = jnp.where(bad, jnp.full((nb,), jnp.nan, dtype=C.dtype), C)
    dC = jnp.where(bad, jnp.full((nb, nb), jnp.nan, dtype=dC.dtype), dC)
    chi2 = jnp.where(bad, jnp.nan, chi2)
    return C, dC, chi2, alphas


@partial(jax.jit, static_argnames=("method",))
def fit_records(values, errors, A, reg_mats, method: str = "chi2",
                manual_params=None):
    """Vmapped batched fit.  values/errors: [nrec, npoints].

    Returns (C [nrec, nb], dC [nrec, nb, nb], chi2 [nrec],
    reg_params [nrec, nreg])."""
    f = partial(fit_one_record, A=A, reg_mats=reg_mats, method=method,
                manual_params=manual_params)
    return jax.vmap(f)(values, errors)
