"""Regularization-parameter selection, batched and jit-safe.

Reproduces the reference's four methods (interpolate.py:97-407) with the
same decision semantics but TPU-native algorithms:

* chi2  — the reference's scale-factor ladder (0.6..1.0), downward bracket
  scan over alpha = 0,-1,...,-100 and Brent root find
  (interpolate.py:152-218) become a STATIC alpha-grid evaluation plus a
  fixed-count bisection.  Each chi^2(alpha) evaluation costs O(nbasis)
  thanks to the one-time pencil whitening in ops/solve.py — the reference
  pays a full scipy lstsq per evaluation (interpolate.py:255).
* gcv   — the reference's brute-force leave-one-out refit loop
  (interpolate.py:299-351, O(npoints) refits per objective call) is replaced
  by the EXACT rank-one-downdate identity
      loo_resid_i = (yhat_i - b_i) / (1 - h_ii),
      h_ii = W_i a_i' X^{-1} a_i,
  which yields identical objective values, evaluated in O(npoints * nbasis).
  The 1-D Nelder-Mead minimizer from alpha0 = -20 (interpolate.py:287-291)
  is replicated step-for-step (scipy defaults: initial simplex
  [-20, -21], rho=1, chi=2, psi=0.5, sigma=0.5, xatol=fatol=1e-4,
  maxiter=200) so the selected parameter matches scipy's trajectory.
* manual — hardcoded constants (interpolate.py:353-381).
* prompt — interactive entry, fixed for python 3 (the reference's
  raw_input at interpolate.py:403 is python-2-only and raises NameError);
  handled host-side in the Interpolate driver.

All search routines return log10(alpha) = NaN to signal "no parameter found"
(the reference's ValueError -> NaN-record path, interpolate.py:142-147,
557-563).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax import lax

from .solve import cutoff_chi2, sym_pinv_apply

# reference constants (interpolate.py:173, 199-202)
SCALE_FACTORS = (0.6, 0.7, 0.8, 0.9, 1.0)
ALPHA_MIN = -100.0
# Concurrency of the exact (cutoff-eigh) search: records_in_flight * CHUNK
# eigh instances coexist in HBM (the decomposition itself runs in f32 with
# f64 Rayleigh refinement, solve._eigh_safe); keep record_chunk * GRID_CHUNK
# <~ 4000 at nbasis=144 (v5e 16 GB).
# The exact search is eigh-THROUGHPUT bound, not round-latency bound
# (measured: XLA batched f32 eigh saturates ~1480/s on v5e regardless of
# batch size), so minimize TOTAL evaluations: 104 grid + 40 bisection steps
# = 144 per record.  KSECTION=1 is plain bisection; more interior points
# per round only pay off when latency dominates.
GRID_CHUNK = 8  # alphas evaluated per sequential round (batched eigh)
KSECTION = 1  # interior points per root-refinement round (bisection)
N_KSECTION = 40  # rounds: bracket width 1 -> 2^-40 ~ 9e-13 in log10


def chi2_reg_param(AtWA, AtWb, btWb, N, R):
    """chi2-nu regularization parameter for one record, one reg matrix.

    Inputs are the record's sufficient statistics plus the reg matrix R.
    Every chi^2(alpha) evaluation uses the reference's exact lstsq-cutoff
    solve semantics (solve.cutoff_chi2).

    TPU scheduling: sequential depth is what costs wall-clock (each round is
    one batched-eigh kernel when this function is vmapped over records), so
    the 101-point bracket grid is evaluated GRID_CHUNK alphas per round and
    Brent/bisection is replaced by KSECTION-point interval subdivision —
    ~13 sequential rounds instead of 201, converging to the same root of
    the monotone objective to ~3e-14 in log10(alpha) (tighter than brentq's
    default xtol = 2e-12, interpolate.py:214).

    Returns the regularization parameter itself (NOT log10): 0.0 for the
    "too smooth" early exit (interpolate.py:189-191), NaN when no bracket
    exists in (1e-100, 1] for any scale factor (interpolate.py:210-211).
    """
    dt = btWb.dtype

    def chi2_of_logalpha(a_log):
        return cutoff_chi2(10.0**a_log, AtWA, AtWb, btWb, R)

    chi2_batch = jax.vmap(chi2_of_logalpha)

    # chi^2 on the static alpha grid 0, -1, ..., -100 (+ padding), chunked
    n_grid = int(-ALPHA_MIN) + 1  # 101
    n_pad = -(-n_grid // GRID_CHUNK) * GRID_CHUNK
    alphas_pad = -jnp.arange(float(n_pad), dtype=dt)
    chi2_grid = lax.map(
        chi2_batch, alphas_pad.reshape(-1, GRID_CHUNK)
    ).reshape(-1)[:n_grid]
    alphas = alphas_pad[:n_grid]

    sf = jnp.asarray(SCALE_FACTORS, dtype=dt)
    nus = N * sf  # [5]
    f_grid = chi2_grid[None, :] - nus[:, None]  # [5, 101]

    too_smooth = f_grid[:, 0] < 0.0  # per sf: chi2(alpha=0) - nu < 0
    neg = f_grid < 0.0
    has_bracket = jnp.any(neg[:, 1:], axis=1) & ~too_smooth  # [5]

    event = too_smooth | has_bracket
    s = jnp.argmax(event)  # first scale factor with an outcome
    any_event = jnp.any(event)

    is_smooth = too_smooth[s]
    nu = nus[s]
    # first grid index with f < 0 for the selected sf (index >= 1 since
    # f[0] >= 0 when not too_smooth)
    j = jnp.argmax(neg[s])
    lo = alphas[j]  # f(lo) < 0
    hi = alphas[j - 1]  # f(hi) >= 0

    frac = jnp.arange(1.0, KSECTION + 1.0, dtype=dt) / (KSECTION + 1.0)

    def body(_, carry):
        lo, hi = carry
        pts = hi + (lo - hi) * frac  # descending from hi toward lo
        f = chi2_batch(pts) - nu  # monotone: f decreasing along pts
        below = f < 0.0  # suffix of True entries (toward lo)
        # new lo: first point with f < 0 (closest to hi); new hi: the
        # point just above it (or the old hi when none are below)
        any_below = jnp.any(below)
        i0 = jnp.argmax(below)
        new_lo = jnp.where(any_below, pts[i0], lo)
        new_hi = jnp.where(any_below,
                           jnp.where(i0 > 0, pts[i0 - 1], hi),
                           pts[-1])
        return new_lo, new_hi

    lo, hi = lax.fori_loop(0, N_KSECTION, body, (lo, hi))
    root = 0.5 * (lo + hi)

    reg = 10.0**root
    reg = jnp.where(is_smooth, 0.0, reg)
    reg = jnp.where(any_event, reg, jnp.nan)
    return reg


def chi2_reg_param_fast(AtWA, AtWb, btWb, N, R):
    """Fast-mode chi2-nu search: one pencil whitening per record, then every
    chi^2(alpha) evaluation is O(nbasis) (ops/solve.whitened_chi2) instead
    of an eigendecomposition.

    Identical decision structure to chi2_reg_param (same scale-factor
    ladder, bracket grid, k-section refinement); the solve uses a tiny
    relative Cholesky jitter instead of the reference's lstsq cutoff, so the
    selected alpha deviates only when sub-cutoff directions matter
    (docs/PARITY_NOTES.md #7) — typically <1e-6 relative on well-posed
    records, up to a few percent on cutoff-straddling ones.  ~100x less
    work on TPU than the exact mode; select with [TPU] REGPARAM_MODE=fast.
    """
    from .solve import whiten_pencil, whitened_chi2

    dt = btWb.dtype
    lam, Q, Binv = whiten_pencil(AtWA, R)
    u = Q.T @ (Binv @ AtWb)

    def chi2_of_logalpha(a_log):
        return whitened_chi2(10.0**a_log, lam, u, btWb)

    n_grid = int(-ALPHA_MIN) + 1
    alphas = -jnp.arange(float(n_grid), dtype=dt)
    chi2_grid = jax.vmap(chi2_of_logalpha)(alphas)

    sf = jnp.asarray(SCALE_FACTORS, dtype=dt)
    nus = N * sf
    f_grid = chi2_grid[None, :] - nus[:, None]

    too_smooth = f_grid[:, 0] < 0.0
    neg = f_grid < 0.0
    has_bracket = jnp.any(neg[:, 1:], axis=1) & ~too_smooth
    event = too_smooth | has_bracket
    s = jnp.argmax(event)
    any_event = jnp.any(event)
    is_smooth = too_smooth[s]
    nu = nus[s]
    j = jnp.argmax(neg[s])
    lo = alphas[j]
    hi = alphas[j - 1]

    K = 31
    frac = jnp.arange(1.0, K + 1.0, dtype=dt) / (K + 1.0)

    def body(_, carry):
        lo, hi = carry
        pts = hi + (lo - hi) * frac
        f = jax.vmap(chi2_of_logalpha)(pts) - nu
        below = f < 0.0
        any_below = jnp.any(below)
        i0 = jnp.argmax(below)
        new_lo = jnp.where(any_below, pts[i0], lo)
        new_hi = jnp.where(any_below,
                           jnp.where(i0 > 0, pts[i0 - 1], hi),
                           pts[-1])
        return new_lo, new_hi

    lo, hi = lax.fori_loop(0, 9, body, (lo, hi))
    root = 0.5 * (lo + hi)

    reg = 10.0**root
    reg = jnp.where(is_smooth, 0.0, reg)
    reg = jnp.where(any_event, reg, jnp.nan)
    return reg


# ---------------------------------------------------------------------------
# GCV via exact LOO identity + scipy-faithful 1-D Nelder-Mead
# ---------------------------------------------------------------------------

GCV_ALPHA0 = -20.0  # interpolate.py:288
NM_XATOL = 1e-4
NM_FATOL = 1e-4
NM_MAXITER = 200  # scipy default N * 200 for N = 1


def gcv_objective(a_log, AtWA, AtWb, R, A, b, W, mask):
    """Sum of weighted squared LOO residuals at reg param 10^a_log.

    Uses the exact rank-one-downdate identity
        loo_resid_i = (yhat_i - b_i) / (1 - h_ii),
        h_ii = W_i a_i' pinv(X) a_i,   X = AtWA + a R,
    which matches the reference's per-point refit loop
    (interpolate.py:332-351) in value, with the same cutoff-solve
    semantics as chi2 (solve.sym_pinv_apply).
    """
    a = 10.0**a_log
    X = AtWA + a * R
    # the LOO identity needs H to be the SAME operator that produced C
    # (the gelsd-cutoff solve), not the pinv-cutoff covariance operator
    eps = float(jnp.finfo(X.dtype).eps)
    C, H = sym_pinv_apply(X, AtWb, rcond_factor_H=eps)
    yhat = A @ C  # [npoints]
    h = W * jnp.einsum("pi,ij,pj->p", A, H, A)
    r = (yhat - b) / (1.0 - h)
    r = jnp.where(mask > 0, r, 0.0)
    return jnp.sum(r * r * jnp.where(mask > 0, W, 0.0))


def nelder_mead_1d(f, x0, xatol=NM_XATOL, fatol=NM_FATOL, maxiter=NM_MAXITER):
    """scipy.optimize.minimize(method='Nelder-Mead') for 1-D problems,
    replicated as a lax.while_loop.  Returns (x_best, converged)."""
    nonzdelt = 0.05
    zdelt = 0.00025
    x1 = jnp.where(x0 != 0.0, (1.0 + nonzdelt) * x0, zdelt)

    f0, f1 = f(x0), f(x1)
    # order: simplex[0] best
    xs = jnp.where(f0 <= f1, jnp.stack([x0, x1]), jnp.stack([x1, x0]))
    fs = jnp.where(f0 <= f1, jnp.stack([f0, f1]), jnp.stack([f1, f0]))

    def cond(state):
        xs, fs, it = state
        done = (jnp.abs(xs[1] - xs[0]) <= xatol) & (jnp.abs(fs[1] - fs[0]) <= fatol)
        return (~done) & (it < maxiter)

    def body(state):
        xs, fs, it = state
        x0, x1 = xs[0], xs[1]
        f0, f1 = fs[0], fs[1]
        xbar = x0
        xr = 2.0 * xbar - x1
        fr = f(xr)

        # expansion
        xe = 3.0 * xbar - 2.0 * x1
        fe = f(xe)
        new_x_exp = jnp.where(fe < fr, xe, xr)
        new_f_exp = jnp.where(fe < fr, fe, fr)

        # contraction (outside if fr < f1, else inside)
        xc_out = 1.5 * xbar - 0.5 * x1
        fc_out = f(xc_out)
        xc_in = 0.5 * xbar + 0.5 * x1
        fc_in = f(xc_in)

        use_out = fr < f1
        xc = jnp.where(use_out, xc_out, xc_in)
        fc = jnp.where(use_out, fc_out, fc_in)
        accept_c = jnp.where(use_out, fc_out <= fr, fc_in < f1)

        # shrink
        x_shr = x0 + 0.5 * (x1 - x0)
        f_shr = f(x_shr)

        expand = fr < f0
        new_x = jnp.where(
            expand, new_x_exp, jnp.where(accept_c, xc, x_shr)
        )
        new_f = jnp.where(
            expand, new_f_exp, jnp.where(accept_c, fc, f_shr)
        )

        xs = jnp.where(new_f < f0, jnp.stack([new_x, x0]), jnp.stack([x0, new_x]))
        fs = jnp.where(new_f < f0, jnp.stack([new_f, f0]), jnp.stack([f0, new_f]))
        return xs, fs, it + 1

    xs, fs, it = lax.while_loop(cond, body, (xs, fs, jnp.asarray(0)))
    converged = (jnp.abs(xs[1] - xs[0]) <= xatol) & (jnp.abs(fs[1] - fs[0]) <= fatol)
    return xs[0], converged


def gcv_reg_param(AtWA, AtWb, R, A, b, W, mask):
    """GCV regularization parameter for one record, one reg matrix.

    NaN when the minimizer fails to converge (interpolate.py:292-293)."""
    obj = partial(gcv_objective, AtWA=AtWA, AtWb=AtWb, R=R, A=A, b=b, W=W,
                  mask=mask)
    x, ok = nelder_mead_1d(lambda a: obj(a), GCV_ALPHA0)
    reg = 10.0**x
    return jnp.where(ok, reg, jnp.nan)


# ---------------------------------------------------------------------------
# manual constants (interpolate.py:353-381)
# ---------------------------------------------------------------------------

MANUAL_PARAMS = {"curvature": 1.0e-28, "0thorder": 1.0e-23}


def manual_reg_param(reg_name: str) -> float:
    if reg_name not in MANUAL_PARAMS:
        raise ValueError(
            f"manual regularization has no hardcoded value for {reg_name!r} "
            "(reference interpolate.py:376-379 covers only 'curvature' and "
            "'0thorder')"
        )
    return MANUAL_PARAMS[reg_name]
