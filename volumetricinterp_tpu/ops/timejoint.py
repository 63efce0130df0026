"""Jointly time-regularized fits: a time penalty coupling records INSIDE
the solve.

This completes the reference's "Adapt model to fit for time" TODO
(reference models/sphharmlag.py:17) beyond the post-fit spline smoothing of
ops/timesmooth.py: instead of smoothing per-record coefficient TRAJECTORIES
after independent fits, the records are solved together,

    min_C  sum_r ||W_r^1/2 (A C_r - b_r)||^2
         + sum_r sum_i alpha_ri C_r' R_i C_r
         + beta  sum_r ||C_{r+1} - C_r||^2 ,

whose normal equations are BLOCK-TRIDIAGONAL in the record index:

    (X_r + c_r beta I) C_r - beta C_{r-1} - beta C_{r+1} = AtWb_r ,

with X_r = AtWA_r + sum_i alpha_ri R_i and c_r the neighbor count (1 at the
ends, 2 inside).  The per-record regularization parameters alpha_ri come
from the standard chi2/GCV search (their semantics are untouched); beta is
the coupling strength, configured RELATIVE to the mean data-term scale so
one value works across physical units:

    beta = beta_rel * mean_r trace(AtWA_r) / nbasis .

The solve is the block Thomas algorithm as a `lax.scan` over records —
sequential in the record index by construction (the coupling is the whole
point), but each step is one nbasis-size factorization on the MXU and the
whole chain is a single device dispatch.

PRECISION: f32-grade on TPU by design (documented envelope, like the fast
chi2 mode and GCV, docs/PARITY_NOTES.md #6/#7): the time coupling itself
acts as a ridge at scale beta on every data-blind direction, so the deep
sub-cutoff spectrum that forces the expansion machinery in the independent
solve is regularized away here for any beta_rel >~ 1e-6.  On CPU the same
code runs in native f64 (the test oracle).

A welcome side effect: records whose regularization search FAILED (NaN
alphas — the reference NaN-fills them, interpolate.py:557-563) are solved
with alpha = 0 and held by their neighbors through the coupling, so a
jointly-fit day has no NaN gaps (reported separately; the independent-fit
products keep reference NaN semantics).
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax


def _stats_batch(values, errors, A):
    """Masked per-record sufficient statistics (plain arrays, f32-grade on
    TPU — see module docstring)."""
    mask = jnp.isfinite(values)
    W = jnp.where(mask, errors, 1.0) ** -2.0
    W = jnp.where(mask, W, 0.0)
    b = jnp.where(mask, values, 0.0)
    Aw = W[:, :, None] * A[None]          # [nrec, npts, nb]
    AtWA = jnp.einsum("pi,rpj->rij", A, Aw)
    AtWb = jnp.einsum("rpi,rp->ri", Aw, b)
    btWb = jnp.sum(W * b * b, axis=1)
    N = jnp.sum(mask, axis=1)
    return AtWA, AtWb, btWb, N


def joint_time_solve(AtWA, AtWb, reg_mats, log_alphas, beta_rel,
                     jitter_rel=1e-7):
    """Block-tridiagonal solve of the jointly time-regularized system.

    AtWA: [nrec, nb, nb]; AtWb: [nrec, nb]; reg_mats: [nreg, nb, nb];
    log_alphas: [nrec, nreg] (log10; -inf -> 0, NaN -> 0 and the record is
    carried by its neighbors); beta_rel: coupling relative to the mean
    data-term scale.  Returns C [nrec, nb]."""
    dt = AtWA.dtype
    nrec, nb, _ = AtWA.shape
    # normalize to O(1): one global scale keeps every block f32-safe
    s = jnp.mean(jax.vmap(jnp.trace)(AtWA)) / nb
    s = jnp.where(s > 0, s, 1.0)
    Xn = AtWA / s
    rhs = AtWb / s
    if reg_mats.shape[0]:
        la = jnp.nan_to_num(log_alphas, nan=-jnp.inf)  # failed -> alpha 0
        # alpha / s in normalized units; alphas span 1e-100..1 so work in
        # logs and flush what underflows (it is sub-coupling anyway)
        a_n = jnp.exp(jnp.clip(la * np.log(10.0) - jnp.log(s),
                               -80.0, 80.0)).astype(dt)
        Xn = Xn + jnp.einsum("ri,ijk->rjk", a_n, reg_mats.astype(dt))
    beta = jnp.asarray(beta_rel, dt)
    eye = jnp.eye(nb, dtype=dt)
    c_r = jnp.where((jnp.arange(nrec) == 0) | (jnp.arange(nrec) == nrec - 1),
                    1.0, 2.0).astype(dt)
    diag = Xn + (c_r[:, None, None] * beta + jitter_rel) * eye

    # forward elimination: S_r = D_r - beta^2 S_{r-1}^{-1},
    # y_r' = rhs_r + beta S_{r-1}^{-1} y_{r-1}'
    def fwd(carry, inp):
        Sinv_prev, y_prev, first = carry
        D_r, rhs_r = inp
        S_r = D_r - jnp.where(first, 0.0, beta * beta) * Sinv_prev
        y_r = rhs_r + jnp.where(first, 0.0, beta) * (Sinv_prev @ y_prev)
        Sinv_r = jnp.linalg.inv(S_r)
        return (Sinv_r, y_r, jnp.zeros((), bool)), (Sinv_r, y_r)

    init = (jnp.zeros((nb, nb), dt), jnp.zeros((nb,), dt),
            jnp.ones((), bool))
    _, (Sinv, y) = lax.scan(fwd, init, (diag, rhs))

    # back substitution: C_n = Sinv_n y_n; C_r = Sinv_r (y_r + beta C_{r+1})
    def bwd(C_next, inp):
        Sinv_r, y_r, last = inp
        C_r = Sinv_r @ (y_r + jnp.where(last, 0.0, beta) * C_next)
        return C_r, C_r

    last = jnp.arange(nrec) == nrec - 1
    _, C_rev = lax.scan(bwd, jnp.zeros((nb,), dt),
                        (Sinv[::-1], y[::-1], last[::-1]))
    return C_rev[::-1]


def fit_time_coupled(values, errors, A, reg_mats, log_alphas, beta_rel):
    """Host entry point: jointly re-solve a day's records at the alphas the
    standard search already selected.

    values/errors: [nrec, npoints] (NaN-masked); A: [npoints, nb];
    reg_mats: [nreg, nb, nb]; log_alphas: [nrec, nreg] log10 alphas (NaN =
    failed search -> alpha 0, neighbor-carried).  Returns (C [nrec, nb],
    chi2 [nrec]) with chi2 the DATA chi-square of the joint solution."""
    on_tpu = jax.default_backend() == "tpu"
    dt = jnp.float32 if on_tpu else jnp.float64
    values = jnp.asarray(np.asarray(values), dt)
    errors = jnp.asarray(np.asarray(errors), dt)
    A = jnp.asarray(np.asarray(A), dt)
    reg_mats = jnp.asarray(np.asarray(reg_mats), dt)
    la = jnp.asarray(np.asarray(log_alphas, np.float64), dt)

    @jax.jit
    def run(values, errors, A, reg_mats, la):
        AtWA, AtWb, btWb, N = _stats_batch(values, errors, A)
        C = joint_time_solve(AtWA, AtWb, reg_mats, la, beta_rel)
        # data chi^2 of the joint solution
        mask = jnp.isfinite(values)
        W = jnp.where(mask, errors, 1.0) ** -2.0
        W = jnp.where(mask, W, 0.0)
        r = jnp.where(mask, values - C @ A.T, 0.0)
        chi2 = jnp.sum(W * r * r, axis=1)
        return C, chi2

    C, chi2 = run(values, errors, A, reg_mats, la)
    return np.asarray(C), np.asarray(chi2)
