"""Regularization-parameter selection, batched and jit-safe.

Reproduces the reference's four methods (interpolate.py:97-407) with the
same decision semantics but TPU-native algorithms:

* chi2  — the reference's scale-factor ladder (0.6..1.0), downward bracket
  scan over alpha = 0,-1,...,-100 and Brent root find
  (interpolate.py:152-218).  Three implementations:
    - 'exact' (default, chi2_reg_param): DEFECT-CORRECTED search — ladder
      decisions from exact-cutoff chi^2 at the bracket-grid endpoints
      (alpha = 1 and 1e-100), then a defect-corrected root iteration: one
      exact cutoff-eigh per step measures D = chi2_exact - chi2_fast and an
      O(nbasis) whitened bisection re-solves chi2_fast + D = nu, guarded by
      a monotone exact bracket.  9 eigendecompositions per record instead
      of ~145, which matters because batched eigh is the measured TPU
      throughput ceiling (docs/ROADMAP.md).  For monotone objectives (PSD
      regularizers) the selected root is identical to the grid scan's; see
      docs/PARITY_NOTES.md #4/#9 for the non-monotone (divergent-Omega)
      caveat.
    - 'exact_grid' (chi2_reg_param_grid): round-1 faithful replica of the
      full 101-point downward grid scan, every evaluation a full
      cutoff-eigh.  The receipts baseline for 'exact'.
    - 'fast' (chi2_reg_param_fast): every chi^2(alpha) evaluation costs
      O(nbasis) after a one-time pencil whitening (jitter instead of the
      gelsd cutoff) — the reference pays a full scipy lstsq per evaluation
      (interpolate.py:255).
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

from .solve import (chi2_from_eig, cutoff_chi2, normalized_eigh,
                    sym_pinv_apply, whiten_pencil, whitened_chi2)

# reference constants (interpolate.py:173, 199-202)
SCALE_FACTORS = (0.6, 0.7, 0.8, 0.9, 1.0)
ALPHA_MIN = -100.0
# exact_grid mode: records_in_flight * GRID_CHUNK eigh instances coexist in
# HBM (the decomposition itself runs in f32 with f64 Rayleigh refinement,
# solve._eigh_safe); keep record_chunk * GRID_CHUNK <~ 4000 at nbasis=144
# (v5e 16 GB).  KSECTION=1 is plain bisection.
GRID_CHUNK = 8  # alphas evaluated per sequential round (batched eigh)
KSECTION = 1  # interior points per root-refinement round (bisection)
N_KSECTION = 40  # rounds: bracket width 1 -> 2^-40 ~ 9e-13 in log10

# hybrid 'exact' mode (chi2_reg_param): defect-corrected root iteration
N_DEFECT = 9  # exact-eigh defect iterations; each contracts the root error
# by the local variability of D(alpha) = chi2_exact - chi2_fast relative to
# chi2's slope (1e-1..1e-2 per step on typical records; up to ~0.5 inside
# the cutoff transition region of straddling records, where the extra
# iterations matter), with a monotone-bracket fallback bounding
# pathological records
INNER_K = 64  # interior points per inner k-section round
N_INNER_ROUNDS = 5  # bracket width 100 -> 100/65^5 ~ 9e-8 decades


DEFECT_MODEL_RANGE = 0.5  # decades: linear D-model trust region around r0


def _whitened_root_offset(lam, u, btWb, nu, d, r0=None, slope=None):
    """First-crossing root of the FAST (jittered-whitening) objective plus
    a local linear model of the cutoff defect,

        chi2_fast(alpha) + d + slope * clip(alpha - r0, +-RANGE) = nu,

    on [1e-100, 1], by 64-point k-section (5 rounds: sequential depth is
    what costs wall-clock on TPU, and each O(nbasis)-per-point round is one
    fused elementwise kernel — the whole solve costs far less than one
    eigendecomposition).  With slope=None the defect model is the constant
    d.

    Returns log10(alpha), or NaN when the modeled objective has no crossing
    (endpoint signs equal; the fast objective is monotone for PSD R)."""
    dt = btWb.dtype

    def f_of(a_log):
        f = whitened_chi2(10.0 ** a_log, lam, u, btWb) + d - nu
        if slope is not None:
            f = f + slope * jnp.clip(a_log - r0, -DEFECT_MODEL_RANGE,
                                     DEFECT_MODEL_RANGE)
        return f

    lo = jnp.asarray(ALPHA_MIN, dt)
    hi = jnp.asarray(0.0, dt)
    has = (f_of(hi) >= 0.0) & (f_of(lo) < 0.0)

    frac = jnp.arange(1.0, INNER_K + 1.0, dtype=dt) / (INNER_K + 1.0)

    def body(_, carry):
        lo, hi = carry
        pts = lo + (hi - lo) * frac  # ascending interior points
        below = jax.vmap(f_of)(pts) < 0.0
        # first crossing (reference first-sign-change semantics; for the
        # monotone fast objective `below` is a prefix anyway)
        j = jnp.argmax(~below)  # first non-below index; 0 when below[0]=F
        all_below = jnp.all(below)
        j = jnp.where(all_below, INNER_K, j)
        new_lo = jnp.where(j > 0, pts[jnp.maximum(j - 1, 0)], lo)
        new_hi = jnp.where(all_below, hi, pts[jnp.minimum(j, INNER_K - 1)])
        return new_lo, new_hi

    lo, hi = lax.fori_loop(0, N_INNER_ROUNDS, body, (lo, hi))
    return jnp.where(has, 0.5 * (lo + hi), jnp.nan)


def chi2_reg_param(AtWA, AtWb, btWb, N, R):
    """chi2-nu regularization parameter, DEFECT-CORRECTED exact search (the
    default 'exact' mode).

    Reference semantics preserved (interpolate.py:152-218): every chi^2
    evaluation that DECIDES something uses the exact gelsd-cutoff solve
    (solve.chi2_from_eig); the scale-factor ladder, the too-smooth alpha=0
    early exit, and the no-bracket NaN all follow the reference's rules,
    with ladder decisions taken from the exact objective at the grid
    endpoints alpha = 1 and alpha = 1e-100 (for a monotone objective these
    are equivalent to the reference's downward scan; the divergent-Omega
    non-monotone caveat is documented in docs/PARITY_NOTES.md #9).

    TPU scheduling: batched eigh is the measured throughput ceiling (~2100
    decompositions/s at nbasis=144 on v5e) and f64 arithmetic is emulated at
    ~46 GFLOP/s (docs/ROADMAP.md), so the search minimizes DECOMPOSITION
    COUNT via defect correction: with the one-time pencil whitening making
    chi2_fast(alpha) an O(nbasis) closed form, write

        chi2_exact(alpha) = chi2_fast(alpha) + D(alpha)

    where D (the gelsd-cutoff-vs-jitter discrepancy) varies slowly in alpha
    compared to chi2 except across keep-set flips.  Each iteration measures
    D at the current iterate with ONE exact eigendecomposition, then
    re-solves chi2_fast(alpha) + D = nu to machine precision with a 60-round
    O(nbasis) bisection.  The iteration contracts like |D'|/|chi2'| (one to
    two orders per step on real records); a monotone exact bracket guards
    every step, falling back to exact-midpoint bisection whenever the
    prediction leaves the bracket (non-monotone divergent-Omega records,
    PARITY_NOTES #9).

    Eigendecomposition budget per record per regularization matrix:
      1  AtWA — shared by the fast whitening AND the alpha -> 0 endpoint
         (X(1e-100) == AtWA to f64 rounding: the grid floor alpha = 1e-100
         times any conceivable |R|/|AtWA| is below one ulp of AtWA)
      1  the whitened pencil G
      1  exact chi^2(alpha=1) — ladder / too-smooth decisions
      6  defect iterations (N_DEFECT)
    = 9 vs ~145 for the grid scan, at identical cutoff semantics.

    Returns the regularization parameter itself (NOT log10): 0.0 for the
    "too smooth" early exit (interpolate.py:189-191), NaN when no bracket
    exists in (1e-100, 1] for any scale factor (interpolate.py:210-211).
    """
    dt = btWb.dtype

    def full_eval(a_log):
        X = AtWA + (10.0 ** a_log) * R
        w, V, _ = normalized_eigh(X)
        return chi2_from_eig(w, V, AtWA, AtWb, btWb)

    # shared decompositions
    wA, VA, _ = normalized_eigh(AtWA)
    chi2_floor = chi2_from_eig(wA, VA, AtWA, AtWb, btWb)  # alpha -> 0 limit
    lam, Q, Binv = whiten_pencil(AtWA, R, eig_AtWA=(wA, VA))
    u = Q.T @ (Binv @ AtWb)
    chi2_one = full_eval(jnp.asarray(0.0, dt))

    # scale-factor ladder from the exact endpoints (interpolate.py:180-207)
    sf = jnp.asarray(SCALE_FACTORS, dtype=dt)
    nus = N * sf
    too_smooth = chi2_one - nus < 0.0
    has_bracket = (chi2_floor - nus < 0.0) & ~too_smooth
    event = too_smooth | has_bracket
    s = jnp.argmax(event)
    any_event = jnp.any(event)
    is_smooth = too_smooth[s]
    nu = nus[s]

    # defect-corrected iteration, seeded at the root of chi2_fast + D0 = nu
    # with D0 the PLATEAU defect chi2_floor - chi2_fast(1e-100), already in
    # hand for free.  On cutoff-straddling records (the fast floor can sit
    # ABOVE nu while the exact floor sits below, PARITY_NOTES #7) the raw
    # fast objective has no crossing at all, but the D0-shifted one always
    # does for active records (it equals chi2_floor < nu at the floor and
    # chi2(1) >= nu at alpha=1, both exact).  Then constant-D step first,
    # secant steps on D (linear local model) after, all inside a monotone
    # exact bracket with midpoint fallback.
    d0 = chi2_floor - whitened_chi2(jnp.asarray(1e-100, dt), lam, u, btWb)
    r = _whitened_root_offset(lam, u, btWb, nu, d0)
    r = jnp.clip(jnp.where(jnp.isnan(r), -50.0, r), ALPHA_MIN + 0.1, -0.1)
    lo = jnp.asarray(ALPHA_MIN, dt)   # f(lo) < 0 for active records
    hi = jnp.asarray(0.0, dt)         # f(hi) >= 0 for active records
    r_prev = jnp.asarray(jnp.nan, dt)
    d_prev = jnp.asarray(jnp.nan, dt)

    def body(_, carry):
        lo, hi, r, r_prev, d_prev = carry
        c_r = full_eval(r)
        f_r = c_r - nu
        below = f_r < 0.0
        lo = jnp.where(below, r, lo)
        hi = jnp.where(below, hi, r)
        d = c_r - whitened_chi2(10.0 ** r, lam, u, btWb)
        dr = r - r_prev
        slope = jnp.where(
            jnp.isfinite(d_prev) & (jnp.abs(dr) > 1e-13),
            (d - d_prev) / jnp.where(jnp.abs(dr) > 1e-13, dr, 1.0),
            0.0,
        )
        r_new = _whitened_root_offset(lam, u, btWb, nu, d, r0=r,
                                      slope=slope)
        # out-of-bracket predictions carry directional information: clip
        # just inside the violated end instead of discarding them (the
        # far bracket end is often unevaluated, making a midpoint jump
        # wasteful); NaN (no modeled crossing) falls back to the midpoint
        width = hi - lo
        r_clip = jnp.clip(r_new, lo + 0.02 * width, hi - 0.02 * width)
        r_next = jnp.where(jnp.isnan(r_new), 0.5 * (lo + hi), r_clip)
        return lo, hi, r_next, r, d

    _, _, root, _, _ = lax.fori_loop(
        0, N_DEFECT, body, (lo, hi, r, r_prev, d_prev))

    reg = 10.0 ** root
    reg = jnp.where(is_smooth, 0.0, reg)
    reg = jnp.where(any_event, reg, jnp.nan)
    return reg


def chi2_reg_param_grid(AtWA, AtWb, btWb, N, R):
    """chi2-nu regularization parameter via the FULL exact grid scan
    ('exact_grid' mode — the receipts baseline for the hybrid default).

    Inputs are the record's sufficient statistics plus the reg matrix R.
    Every chi^2(alpha) evaluation uses the reference's exact lstsq-cutoff
    solve semantics (solve.cutoff_chi2), including all 101 bracket-grid
    points, exactly like the reference's downward scan.

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
NM_MAXFEV = 200  # scipy default N * 200 function evaluations for N = 1


def gcv_objective(a_log, AtWA, AtWb, R, A, b, W, mask, axis_name=None):
    """Sum of weighted squared LOO residuals at reg param 10^a_log.

    Uses the exact rank-one-downdate identity
        loo_resid_i = (yhat_i - b_i) / (1 - h_ii),
        h_ii = W_i a_i' pinv(X) a_i,   X = AtWA + a R,
    which matches the reference's per-point refit loop
    (interpolate.py:332-351) in value, with the same cutoff-solve
    semantics as chi2 (solve.sym_pinv_apply).

    Point-sharded evaluation (SURVEY.md 5.7): AtWA/AtWb are the psum'd FULL
    statistics (replicated), A/b/W/mask the local point shard; pass the
    mesh axis as ``axis_name`` and the local partial sum is psum-reduced —
    the only communication is one scalar per objective call.
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
    out = jnp.sum(r * r * jnp.where(mask > 0, W, 0.0))
    if axis_name is not None:
        out = lax.psum(out, axis_name)
    return out


def gcv_objective_fast(a_log, lam, u, T, T2, b, W, mask, axis_name=None):
    """Whitened O(npoints * nbasis)-per-alpha GCV objective ('fast' mode).

    With the one-time pencil whitening (solve.whiten_pencil) and the
    precomputed projections T = A Binv' Q (rows = data points in the
    whitened eigenbasis), every objective evaluation is elementwise:

        d      = 1 / (1 + alpha * lam)
        yhat_i = sum_j T_ij d_j u_j
        h_ii   = W_i sum_j T_ij^2 d_j

    Same jitter-vs-cutoff deviation envelope as the fast chi2 search
    (docs/PARITY_NOTES.md #7).  Point-shardable like gcv_objective.
    """
    d = 1.0 / (1.0 + (10.0 ** a_log) * lam)
    yhat = T @ (d * u)
    h = W * (T2 @ d)
    r = (yhat - b) / (1.0 - h)
    r = jnp.where(mask > 0, r, 0.0)
    out = jnp.sum(r * r * jnp.where(mask > 0, W, 0.0))
    if axis_name is not None:
        out = lax.psum(out, axis_name)
    return out


def nelder_mead_1d(f, x0, xatol=NM_XATOL, fatol=NM_FATOL, maxiter=NM_MAXITER,
                   maxfev=NM_MAXFEV):
    """scipy.optimize.minimize(method='Nelder-Mead') for 1-D problems,
    replicated as a lax.while_loop.  Returns (x_best, converged).

    The function-evaluation budget mirrors scipy's maxfev accounting for
    the trajectory scipy would take: 2 initial evals, then 2 per iteration
    (reflection + expansion-or-contraction) plus 1 more when the iteration
    shrinks — even though this vectorized replica computes all candidate
    points every iteration."""
    nonzdelt = 0.05
    zdelt = 0.00025
    x1 = jnp.where(x0 != 0.0, (1.0 + nonzdelt) * x0, zdelt)

    f0, f1 = f(x0), f(x1)
    # order: simplex[0] best
    xs = jnp.where(f0 <= f1, jnp.stack([x0, x1]), jnp.stack([x1, x0]))
    fs = jnp.where(f0 <= f1, jnp.stack([f0, f1]), jnp.stack([f1, f0]))

    def cond(state):
        xs, fs, it, fev = state
        done = (jnp.abs(xs[1] - xs[0]) <= xatol) & (jnp.abs(fs[1] - fs[0]) <= fatol)
        return (~done) & (it < maxiter) & (fev < maxfev)

    def body(state):
        xs, fs, it, fev = state
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
        # scipy-equivalent eval count: reflection + (expansion | contraction),
        # plus the shrink point when the contraction was rejected
        fev = fev + jnp.where(expand | accept_c, 2, 3)
        return xs, fs, it + 1, fev

    xs, fs, it, fev = lax.while_loop(
        cond, body, (xs, fs, jnp.asarray(0), jnp.asarray(2)))
    converged = (jnp.abs(xs[1] - xs[0]) <= xatol) & (jnp.abs(fs[1] - fs[0]) <= fatol)
    return xs[0], converged


def gcv_reg_param(AtWA, AtWb, R, A, b, W, mask, axis_name=None,
                  regparam_mode: str = "exact"):
    """GCV regularization parameter for one record, one reg matrix.

    regparam_mode 'exact' uses the cutoff-solve LOO objective per objective
    call; 'fast' whitens the pencil once and makes each call elementwise
    (gcv_objective_fast).  With ``axis_name`` the per-point quantities may
    be point shards (parallel/fit.py).

    NaN when the minimizer fails to converge (interpolate.py:292-293)."""
    if regparam_mode == "fast":
        lam, Qw, Binv = whiten_pencil(AtWA, R)
        u = Qw.T @ (Binv @ AtWb)
        T = A @ (Binv.T @ Qw)
        obj = partial(gcv_objective_fast, lam=lam, u=u, T=T, T2=T * T,
                      b=b, W=W, mask=mask, axis_name=axis_name)
    else:
        obj = partial(gcv_objective, AtWA=AtWA, AtWb=AtWb, R=R, A=A, b=b,
                      W=W, mask=mask, axis_name=axis_name)
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
