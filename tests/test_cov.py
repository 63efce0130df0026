"""Covariance (dC) f32-path regression tests.

Round-3 bug these pin down: at production scales (suff-stats scale
s ~ 7e-21, spectrum spanning 20+ decades) the f32 covariance sandwich
overflowed (intermediates ~1/w^2 after the 1/s unscale) and shipped
+-f32-max garbage with ~49% NEGATIVE diagonal entries on a real day —
Estimate(calcerr=True) NaN'd.  The graded sandwich (solve._cov_sandwich_x)
must reproduce the f64 closed form at these scales in pure f32.

The f32 path is exercised ON CPU by feeding 2-word f32 expansions (the
TPU representation; ops/solve.py's precision model note).
"""

import numpy as np
import jax.numpy as jnp
import pytest

from volumetricinterp_tpu.ops import solve, xprec
from volumetricinterp_tpu.ops.fit import cov_to_f64


def _graded_system(n=48, decades=20, seed=0, s_exp=-67):
    """SPD X = s * V diag(w) V' with w spanning `decades`, s = 2^s_exp
    (2^-67 ~ 7e-21: the measured Ne-fit suff-stats scale, where s*s
    UNDERFLOWS f32 outright)."""
    rng = np.random.default_rng(seed)
    Q, _ = np.linalg.qr(rng.normal(size=(n, n)))
    w = np.logspace(0.0, -float(decades), n)
    s = float(2.0 ** s_exp)
    return Q, w, s


@pytest.mark.parametrize("s_exp", [-56, -67])
def test_cov_sandwich_matches_f64_closed_form(s_exp):
    n = 48
    Q, w, s = _graded_system(n=n, s_exp=s_exp)
    # exact projection in a perfect eigenbasis is diag(w); feed the f32
    # expansion representation of V and M
    Vx = tuple(map(jnp.asarray, xprec.split_f64_host(Q, 2)))
    M = np.diag(w)
    M_x = tuple(map(jnp.asarray, xprec.split_f64_host(M, 3)))
    X_raw = (Q * w) @ Q.T * s
    AtWA_x = tuple(map(jnp.asarray, xprec.split_f64_host(X_raw, 3)))
    w_hi = jnp.asarray(w, jnp.float32)
    keep_H = np.abs(w) > n * solve.EPS64 * np.max(np.abs(w))
    dC = cov_to_f64(
        solve._cov_sandwich_x(Vx, w_hi, M_x, AtWA_x,
                              jnp.asarray(s, jnp.float32),
                              jnp.asarray(keep_H), coupled=True))
    # f64 closed form: dC = H X H = V diag(keep / (w s)) V'
    dC_o = (Q * (keep_H / (w * s))) @ Q.T
    d = np.diag(dC)
    d_o = np.diag(dC_o)
    assert np.all(np.isfinite(dC))
    assert np.all(d > 0), "covariance diagonal must be positive"
    assert np.max(np.abs(dC)) < 1e38, "no f32-max clamping"
    # accuracy floor here is the FIXTURE's f64 assembly noise: X = QwQ'
    # rounds at ~sqrt(n) eps64 of scale (~3e-17), which reaches ~1e-4
    # relative on modes near the pinv cutoff (1e-14 of scale) — the same
    # f64-accumulation envelope the reference's own deep spectrum carries
    # (docs/PARITY_NOTES.md).  The sandwich itself sits below it
    # (verified by sweeping maxpq and the V word count: the error is
    # invariant).  Pre-fix values at these bars: median ~1e2, max ~1e3,
    # half the diagonal NEGATIVE.
    rel = np.abs(d - d_o) / d_o
    assert np.median(rel) < 5e-4
    assert np.max(rel) < 5e-3
    # full-matrix agreement where entries are significant
    scale = np.sqrt(np.outer(d_o, d_o))
    rel_m = np.abs(dC - dC_o) / scale
    assert np.max(rel_m) < 5e-3


def test_cov_sandwich_coupled_block():
    """A basis that is NOT an eigenbasis (rotated within a near-degenerate
    kept pair) must still give the right covariance through the coupled
    block inverse (Galerkin invariance)."""
    n = 16
    Q, w, s = _graded_system(n=n, decades=8, s_exp=-40)
    w[3] = w[4] * 1.5  # near-degenerate kept pair
    th = 0.6
    R2 = np.eye(n)
    R2[3, 3] = R2[4, 4] = np.cos(th)
    R2[3, 4], R2[4, 3] = -np.sin(th), np.sin(th)
    V = Q @ R2  # rotated basis: M = R2' diag(w) R2 has O(1) couplings
    M = R2.T @ np.diag(w) @ R2
    X_raw = (Q * w) @ Q.T * s
    Vx = tuple(map(jnp.asarray, xprec.split_f64_host(V, 2)))
    M_x = tuple(map(jnp.asarray, xprec.split_f64_host(M, 3)))
    AtWA_x = tuple(map(jnp.asarray, xprec.split_f64_host(X_raw, 3)))
    w_hi = jnp.asarray(np.diag(M), jnp.float32)
    keep_H = np.abs(np.diag(M)) > n * solve.EPS64 * np.max(np.abs(w))
    dC = cov_to_f64(
        solve._cov_sandwich_x(Vx, w_hi, M_x, AtWA_x,
                              jnp.asarray(s, jnp.float32),
                              jnp.asarray(keep_H), coupled=True))
    keep_o = np.abs(w) > n * solve.EPS64 * np.max(np.abs(w))
    dC_o = (Q * (keep_o / (w * s))) @ Q.T
    d, d_o = np.diag(dC), np.diag(dC_o)
    assert np.all(d > 0)
    rel = np.abs(d - d_o) / d_o
    assert np.max(rel) < 1e-2


def test_cov_sandwich_field_variance_cancellation():
    """The PRODUCT metric — predicted field variance diag(A dC A',
    estimate.py:109) — survives the entry-basis cancellation only
    because dC ships as a TWO-word expansion (round 4, PARITY_NOTES
    #8): on real day records the quadratic form cancels ~11 decades
    (gross sum|a_i a_j dC_ij| 1.5e31 vs net 1.3e20), so single-f32-word
    entries (2^-24 per-entry noise) break it by ~300x even when every
    internal stage is exact.  This fixture reproduces the regime:
    test vectors almost orthogonal to the deep kept modes, whose 1/w
    dominates dC's entries but cancels in the form."""
    n = 48
    Q, w, s = _graded_system(n=n, decades=14, s_exp=-67)
    rng = np.random.default_rng(5)
    # vectors dominated by well-determined modes, graded deep tails --
    # the deep-mode 1/w contributions to a' dC a are ~1e-10 of the
    # entry magnitudes they ride on (the measured day-record regime)
    coef = rng.normal(size=(64, n)) * np.sqrt(w)[None, :]
    At = coef @ Q.T  # [npts, n] test "design" rows
    Vx = tuple(map(jnp.asarray, xprec.split_f64_host(Q, 2)))
    M = np.diag(w)
    M_x = tuple(map(jnp.asarray, xprec.split_f64_host(M, 3)))
    X_raw = (Q * w) @ Q.T * s
    AtWA_x = tuple(map(jnp.asarray, xprec.split_f64_host(X_raw, 3)))
    w_hi = jnp.asarray(w, jnp.float32)
    keep_H = np.abs(w) > n * solve.EPS64 * np.max(np.abs(w))
    dCw = np.asarray(
        solve._cov_sandwich_x(Vx, w_hi, M_x, AtWA_x,
                              jnp.asarray(s, jnp.float32),
                              jnp.asarray(keep_H), coupled=True))
    assert dCw.shape == (2, n, n), "2-word stacked covariance"
    dC = cov_to_f64(dCw)
    dC_o = (Q * (keep_H / (w * s))) @ Q.T
    va = np.einsum("pi,ij,pj->p", At, dC_o, At)
    vt = np.einsum("pi,ij,pj->p", At, dC, At)
    rel = np.abs(vt - va) / va
    assert np.median(rel) < 1e-3, np.median(rel)
    assert np.max(rel) < 1e-2, np.max(rel)
    # the hi word ALONE (the round-3 representation) must visibly break
    # the cancellation on this fixture — this is the regression guard
    # that dC keeps shipping as two words
    v1 = np.einsum("pi,ij,pj->p", At, dCw[0].astype(np.float64), At)
    rel1 = np.abs(v1 - va) / va
    assert np.median(rel1) > 10 * np.median(rel)
