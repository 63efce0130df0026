"""Batched regularized weighted least-squares solver.

TPU-first re-design of the reference fit core (interpolate.py:432-469):

* NaN points are handled by WEIGHT-ZERO MASKING instead of row deletion
  (interpolate.py:516-520), so every record has the same static shape and the
  whole record axis vmaps/shards cleanly.
* The per-record data enters only through sufficient statistics
  (AtWA, AtWb, btWb, N), computed ONCE per record; the regularization-
  parameter search (which the reference serves with a full scipy lstsq per
  objective evaluation, interpolate.py:255,345) operates entirely in
  coefficient space.
* For the alpha line-search, a single generalized eigendecomposition of the
  (AtWA, R) pencil per record turns every subsequent chi^2(alpha) evaluation
  into an O(nbasis) diagonal expression (see ops/regparam.py).
* The final solve reproduces scipy.linalg.lstsq/pinv min-norm semantics
  (interpolate.py:462-466) through a symmetric eigendecomposition with the
  scipy cutoff rule — exact for the symmetric matrices used here, and far
  cheaper than SVD on TPU.

All functions are jit-safe, vmap over a leading record axis, and work in
float64 (required: the normal equations square the design-matrix condition
number; see SURVEY.md section 7).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def suff_stats(A, b, W, mask):
    """Sufficient statistics of one record's weighted LS problem.

    A: [npoints, nbasis] design matrix (shared across records)
    b: [npoints] data (NaNs allowed where mask=0)
    W: [npoints] weights = error^{-2} (NaNs allowed where mask=0)
    mask: [npoints] 1.0 for valid points

    Returns (AtWA [nb,nb], AtWb [nb], btWb [], N []).
    """
    Wm = jnp.where(mask > 0, W, 0.0)
    bm = jnp.where(mask > 0, b, 0.0)
    Aw = A * Wm[:, None]
    AtWA = A.T @ Aw
    AtWb = Aw.T @ bm
    btWb = jnp.sum(Wm * bm * bm)
    N = jnp.sum(mask)
    return AtWA, AtWb, btWb, N


N_REFINE_SMALL = 64  # eigenvalues refined in f64 under refine='mixed'


def _eigh_safe(Xn, refine="full"):
    """Symmetric eigendecomposition of a trace-normalized matrix, robust on
    the TPU backend.

    TPU f64 eigh is unreliable: it loses ~8 digits at absolute scales around
    1e-20, and the BATCHED n>~100 f64 path returns NaN outright (observed on
    v5e).  On TPU we therefore run the (working) float32 eigh and refine the
    eigenvalues in float64 with Rayleigh quotients w_i = (v_i' X v_i)/
    (v_i'v_i) — f32 eigenvectors give ~1e-7-accurate subspaces and hence
    ~1e-14-accurate refined eigenvalues for separated modes, which matches
    the documented TPU parity floor.  Other backends use the native f64
    path.

    refine='mixed' (the regularization-search path): f64 matmuls are
    EMULATED on TPU at ~46 GFLOP/s (measured, docs/ROADMAP.md), making the
    full-spectrum f64 Rayleigh (~105 us/record at n=144) comparable to the
    eigh itself.  Only the near-cutoff end of the spectrum needs f64
    resolution (the gelsd keep-decision at eps64 * max|w| sits far below
    f32's ~1e-7 floor; large eigenvalues enter chi^2 as 1/w where
    f32-relative accuracy shifts the root by ~1e-7 decades, two orders
    below the cutoff-retention noise floor of PARITY_NOTES #7).  So:
    the f32 eigh's own eigenvalues for the bulk + f64 Rayleigh for the
    N_REFINE_SMALL smallest-|w| vectors.
    """
    if jax.default_backend() == "tpu" and Xn.dtype == jnp.float64:
        w32, V32 = jnp.linalg.eigh(Xn.astype(jnp.float32))
        V = V32.astype(jnp.float64)
        tiny = jnp.finfo(Xn.dtype).tiny
        if refine == "mixed":
            n = Xn.shape[-1]
            k = min(N_REFINE_SMALL, n)
            _, idx = jax.lax.top_k(-jnp.abs(w32), k)
            Vs = jnp.take_along_axis(V, idx[..., None, :], axis=-1)
            num = jnp.einsum("...ij,...ij->...j", Vs, Xn @ Vs)
            den = jnp.maximum(jnp.einsum("...ij,...ij->...j", Vs, Vs), tiny)
            w = jnp.put_along_axis(
                w32.astype(jnp.float64), idx, num / den, axis=-1,
                inplace=False,
            )
            return w, V
        num = jnp.einsum("...ij,...ik,...kj->...j", V, Xn, V)
        # normalize by v'v so the refined eigenvalue error is second-order
        # in the f32 subspace error (f32 vector norms deviate from 1 by
        # ~1e-7, which would otherwise leak in at first order)
        den = jnp.einsum("...ij,...ij->...j", V, V)
        w = num / jnp.maximum(den, tiny)
        return w, V
    return jnp.linalg.eigh(Xn)


def sym_pinv_apply(X, y, rcond_factor=None, want_H=True, rcond_factor_H=None):
    """Min-norm solve C = pinv(X) @ y for symmetric X, plus pinv(X).

    Matches the reference's SOLVER PAIR exactly (interpolate.py:462-465),
    which uses two DIFFERENT singular-value cutoffs:
      * C comes from scipy.linalg.lstsq -> LAPACK gelsd with rcond < 0,
        i.e. cutoff = eps * max_sv  (verified empirically: gelsd keeps
        singular values down to eps*max, NOT max(M,N)*eps*max);
      * the covariance H comes from scipy.linalg.pinv, whose default
        cutoff IS max(M,N) * eps * max_sv.
    So directions with eps*max < sv < N*eps*max are fit (huge C
    components) but reported as zero-variance — a reference inconsistency
    reproduced faithfully here.
    """
    n = X.shape[-1]
    eps = float(jnp.finfo(X.dtype).eps)
    if rcond_factor is None:
        rcond_factor = eps  # gelsd machine-precision default
    if rcond_factor_H is None:
        rcond_factor_H = float(n) * eps  # scipy.linalg.pinv default
    # normalize to O(1): weighted normal matrices live at absolute scales
    # ~1e-20 (W ~ error^-2 ~ 1e-21), far outside TPU linalg's comfort zone
    s = jnp.trace(X) / n
    s = jnp.where(jnp.abs(s) > 0, jnp.abs(s), 1.0)
    w, V = _eigh_safe(X / s)
    w = w * s
    aw = jnp.abs(w)
    wmax = jnp.max(aw, axis=-1, keepdims=True)
    inv_w = jnp.where(aw > rcond_factor * wmax, 1.0 / w, 0.0)
    Vty = V.T @ y
    C = V @ (inv_w * Vty)
    if not want_H:
        return C, None
    inv_w_H = jnp.where(aw > rcond_factor_H * wmax, 1.0 / w, 0.0)
    H = (V * inv_w_H[None, :]) @ V.T
    return C, H


def chi2_from_eig(w, V, AtWA, AtWb, btWb):
    """Reference-cutoff chi^2 from a precomputed eigendecomposition (w, V)
    of X = AtWA + a R.  Same gelsd cutoff rule as sym_pinv_apply
    (eps * max |w|); chi^2 from sufficient statistics:
        chi2 = C'AtWA C - 2 C'AtWb + btWb  ==  sum_i W_i (A C - b)_i^2.
    """
    eps = float(jnp.finfo(AtWA.dtype).eps)
    V = V.astype(AtWA.dtype)
    aw = jnp.abs(w)
    keep = aw > eps * jnp.max(aw)
    u = V.T @ AtWb
    C = V @ jnp.where(keep, u / w, 0.0)
    return C @ (AtWA @ C) - 2.0 * (C @ AtWb) + btWb


def cutoff_chi2(a, AtWA, AtWb, btWb, R):
    """chi^2 of the fit with X = AtWA + a R under REFERENCE solve semantics.

    Reproduces interpolate.py:220-261 (chi2objfunct) exactly: the coefficient
    vector comes from the min-norm lstsq solve with scipy's singular-value
    cutoff — which matters when the quirk-suppressed sin-columns
    (docs/PARITY_NOTES.md #2) push X's spectrum below the cutoff.  chi^2 is
    then evaluated from sufficient statistics:
        chi2 = C'AtWA C - 2 C'AtWb + btWb  ==  sum_i W_i (A C - b)_i^2.
    """
    X = AtWA + a * R
    C, _ = sym_pinv_apply(X, AtWb, want_H=False)
    return C @ (AtWA @ C) - 2.0 * (C @ AtWb) + btWb


def normalized_eigh(X, refine="mixed"):
    """Trace-normalized _eigh_safe: returns (w, V) of X itself (w rescaled
    back), plus the normalization scale.  The shared entry point for every
    cutoff-semantics decomposition in the chi2 SEARCH, hence the 'mixed'
    Rayleigh refinement default (see _eigh_safe; the final solve keeps the
    full-precision path through sym_pinv_apply)."""
    n = X.shape[-1]
    s = jnp.trace(X) / n
    s = jnp.where(jnp.abs(s) > 0, jnp.abs(s), 1.0)
    w, V = _eigh_safe(X / s, refine=refine)
    return w * s, V, s


def final_solve(AtWA, AtWb, btWb, reg_mats, reg_params):
    """Coefficients, covariance and chi^2 of one record's regularized fit.

    Implements interpolate.py:432-469 (eval_C with calccov=True) plus the
    chi^2 computation of interpolate.py:569, all from sufficient statistics:
      X = AtWA + sum_r alpha_r R_r
      C = pinv(X) AtWb              (== scipy lstsq min-norm solution)
      dC = pinv(X) AtWA pinv(X)
      chi2 = C'AtWA C - 2 C'AtWb + btWb

    reg_mats: [nreg, nb, nb]; reg_params: [nreg].
    """
    X = AtWA
    if reg_mats.shape[0] > 0:
        X = X + jnp.tensordot(reg_params, reg_mats, axes=1)
    C, H = sym_pinv_apply(X, AtWb)
    dC = H @ AtWA @ H
    chi2 = C @ (AtWA @ C) - 2.0 * (C @ AtWb) + btWb
    return C, dC, chi2


def whiten_pencil(AtWA, R, jitter_rel=1e-12, eig_AtWA=None):
    """One-time whitening of the pencil (AtWA, R) for O(n) alpha scans.

    Eigendecomposition-based (no Cholesky — batched f64 cholesky shares the
    TPU fragility of batched eigh): with AtWA = V W V', define the factor
    B^{-1} = W~^{-1/2} V' (W~ = W clipped at jitter_rel * max W), then
    G = B^{-1} R B^{-T} = Q Lam Q'.  The closed forms

        chi2(a) = sum u^2 [1/(1+a lam)^2 - 2/(1+a lam)] + btWb
        C(a)    = B^{-T} Q (I + a Lam)^{-1} u,   u = Q' B^{-1} AtWb

    make every subsequent alpha evaluation O(nbasis).  The clipping
    regularizes singular records (ridge limit == the reference's lstsq
    min-norm behaviour, since AtWb is orthogonal to null(AtWA)).

    Returns (lam [n], Q [n, n], Binv [n, n]).  ``eig_AtWA`` optionally
    supplies a precomputed (w, V) of AtWA itself (e.g. from
    normalized_eigh) so the hybrid exact search shares one decomposition.
    """
    n = AtWA.shape[-1]
    if eig_AtWA is None:
        scale = jnp.trace(AtWA) / n
        scale = jnp.where(scale > 0, scale, 1.0)
        w, V = _eigh_safe(AtWA / scale, refine="mixed")
        w = w * scale
    else:
        w, V = eig_AtWA
        V = V.astype(AtWA.dtype)
    wmax = jnp.max(jnp.abs(w))
    w_safe = jnp.maximum(w, jitter_rel * jnp.where(wmax > 0, wmax, 1.0))
    Binv = (w_safe[:, None] ** -0.5) * V.T  # [n, n]

    sR = jnp.trace(R) / n
    sR = jnp.where(jnp.abs(sR) > 0, jnp.abs(sR), 1.0)
    G = Binv @ (R / sR) @ Binv.T
    G = 0.5 * (G + G.T)
    # G is O(1)-normalized by construction; refine on its own trace scale
    sG = jnp.trace(jnp.abs(G * jnp.eye(n, dtype=G.dtype))) / n + 1e-300
    lam, Q = _eigh_safe(G / sG, refine="mixed")
    lam = lam * (sG * sR)
    return lam, Q, Binv


def whitened_chi2(a, lam, u, btWb):
    """chi^2 of the fit with X = AtWA + a R, from whitened quantities.

    u = Q' B^{-1} AtWb.  Derivation: with B'C = Q (I+aLam)^{-1} u,
    C'AtWA C = ||(I+aLam)^{-1} u||^2 and C'AtWb = u'(I+aLam)^{-1}u, so
    chi2(a) = sum_i u_i^2 (d_i^2 - 2 d_i) + btWb,  d_i = 1/(1+a lam_i).
    Monotone non-decreasing in a for a >= 0 (and lam >= 0), which makes the
    chi2-nu root unique and bisection safe.
    """
    d = 1.0 / (1.0 + a * lam)
    return jnp.sum(u * u * (d * d - 2.0 * d)) + btWb


def whitened_solve(a, lam, Q, Binv, u):
    """C(a) = (AtWA + a R)^{-1} AtWb from whitened quantities."""
    d = 1.0 / (1.0 + a * lam)
    return Binv.T @ (Q @ (d * u))
