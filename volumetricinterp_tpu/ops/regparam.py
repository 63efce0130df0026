"""Regularization-parameter selection, batched and jit-safe.

Reproduces the reference's four methods (interpolate.py:97-407) with the
same decision semantics but TPU-native algorithms:

* chi2  — the reference's scale-factor ladder (0.6..1.0), downward bracket
  scan over alpha = 0,-1,...,-100 and Brent root find
  (interpolate.py:152-218).  Three implementations:
    - 'exact' (default, chi2_reg_param): DEFECT-CORRECTED search — ladder
      decisions from exact-cutoff chi^2 at the bracket-grid endpoints
      (alpha = 1 and 1e-100), then a defect-corrected root iteration: one
      exact cutoff decomposition per step measures D = chi2_exact -
      chi2_fast and an O(nbasis) whitened k-section re-solves
      chi2_fast + D = nu, guarded by a monotone exact bracket.  Exact
      evaluations use the deflation-ladder eigendecomposition
      (ops/solve.py) over f32 EXPANSIONS — this TPU has no f64 — with the
      defect steps BOOTSTRAPPED from AtWA's eigenbasis (the n-size eigh
      is the platform throughput ceiling).
    - 'exact_grid' (chi2_reg_param_grid): faithful replica of the full
      101-point downward grid scan, every evaluation a full fresh-ladder
      cutoff solve.  The receipts baseline for 'exact'.
    - 'fast' (chi2_reg_param_fast): every chi^2(alpha) evaluation costs
      O(nbasis) after a one-time pencil whitening (jitter instead of the
      gelsd cutoff) — the reference pays a full scipy lstsq per evaluation
      (interpolate.py:255).
* gcv   — the reference's brute-force leave-one-out refit loop
  (interpolate.py:299-351) replaced by the EXACT rank-one-downdate
  identity, evaluated in O(npoints * nbasis); scipy's Nelder-Mead
  trajectory replicated step-for-step including the maxfev=200 cap.
* manual — hardcoded constants (interpolate.py:353-381).
* prompt — interactive entry, fixed for python 3; handled host-side.

All chi2 searches return LOG10(alpha): raw alphas live down at 1e-50 and
below (far under f32 range); -inf encodes the "too smooth" alpha = 0
early exit (interpolate.py:189-191) and NaN the no-bracket failure
(interpolate.py:142-147, 557-563).
"""

from __future__ import annotations

from functools import partial

import os

import jax
import jax.numpy as jnp
from jax import lax

from . import solve
from .solve import (anchor_chi2_x, chi2_from_eig_x, make_anchor_x,
                    normalized_eigh_x, normalized_eigh_boot_x, exp_add,
                    exp_mul_split, exp_hi, pow10_split, sym_pinv_apply,
                    whiten_pencil, whitened_chi2, whitened_chi2_split,
                    whitened_chi2_tau_split)
from .xprec import ozaki_mm

# reference constants (interpolate.py:173, 199-202)
SCALE_FACTORS = (0.6, 0.7, 0.8, 0.9, 1.0)
ALPHA_MIN = -100.0
GRID_CHUNK = 8  # exact_grid: alphas evaluated per sequential round

# 'exact' mode (chi2_reg_param): defect-corrected root iteration.
# N_DEFECT exact evaluations total; the rounds listed in REANCHOR_ROUNDS
# run a FULL boot-ladder decomposition (solve.normalized_eigh_boot_x) and
# become the M-shift ANCHOR; every other round is an ANCHORED evaluation
# (solve.anchor_chi2_x): exact chi^2 from the shifted exact projection,
# no eigh, no full-size Ozaki product — the measured per-eval cost drops
# ~180 ms -> ~20 ms per 128-record dispatch (scripts/profile_exact.py).
# Anchored iterates are CLIPPED to ANCHOR_TRUST decades of their anchor
# (outside it the anchor basis stops near-diagonalizing X(alpha) and the
# CG keep-solve's convergence degrades); the mid-loop re-anchor recenters
# the trust region at the current iterate, so the search's total reach is
# ~ANCHOR_TRUST * N_DEFECT decades around the whitened seed — far beyond
# the measured defect-root distances (PARITY_NOTES #4: 'exact' vs
# 'exact_grid' max 0.036 decades).
N_DEFECT = int(os.environ.get("VITPU_NDEFECT", "9"))
# exact-evaluation defect iterations; each contracts the
# root error by the local variability of D(alpha) = chi2_exact - chi2_fast
# relative to chi2's slope (1e-1..1e-2 per step on typical records; up to
# ~0.5 inside the cutoff transition region of straddling records), with a
# monotone-bracket fallback bounding pathological records.  9 STAYS:
# a TPU day-scale A/B (scripts/ab_knobs.py, round 3) measured 7 as
# parity-neutral against the f64 oracle, but on CPU/f64 — where the
# search IS the oracle — 7 rounds leave a curvature-regularized record's
# bracket wide enough to miss chi2 = nu by 0.7% (caught by
# test_against_reference::test_curvature_regularization_matches_reference
# at rtol 1e-3); the ~25 ms/dispatch saving is not worth degrading the
# reference-grade path
REANCHOR_ROUNDS = (0,)  # rounds that pay a full boot ladder.  With the
# 6-decade trust radius and the root-centered endgame re-anchor, a
# mid-loop re-anchor is redundant (A/B'd at day scale: see the commit
# trail); the seed anchor covers the defect loop alone.
N_POLISH = int(os.environ.get("VITPU_NPOLISH", "2"))
# post-loop anchored rounds centered on the converged
# root: their anchor sits AT the candidate (one extra boot ladder), so
# every polish evaluation runs at delta ~ 0 — fresh-ladder accuracy
# where it matters, and the final solve reuses the same anchor.  2 ships
# (A/B receipts under N_DEFECT above: the polish evaluations converge in
# one round on healthy records; the second is the safety margin)
BRACKET_PAD_PER_DEC = 0.08  # decades of bracket-update slack per decade
# of anchor distance beyond PAD_FREE_RADIUS: an anchored evaluation far
# from its anchor carries ~1e-3..1e-2 relative chi^2 drift, enough to
# mis-sign f = chi2 - nu near a flat crossing; a HARD bracket clamp from
# such an evaluation is irreversible (the safeguarded step confines all
# later iterates inside the bracket — the measured light-tail poisoning
# failure).  Padding the clamp by the evaluation's trust-distance bounds
# the damage while near-anchor evaluations still converge the bracket at
# full speed.
PAD_FREE_RADIUS = 0.25  # decades: anchored evals this close to their
# anchor are boot-ladder-grade (measured ~1e-3 relative); no pad
ANCHOR_TRUST = 6.0  # decades: anchored-evaluation clip radius.  The
# M-shift projection is exact at ANY alpha; what degrades with distance
# is (a) the keep decision (diagonal eigenvalue estimates distort in the
# transition band) and (b) CG convergence on drift couplings — but
# far-BELOW evals drop the drifted deep sector sub-cutoff (harmless) and
# far-ABOVE evals only need sign-grade accuracy (chi2 >> nu there), so a
# tight clip is wrong: measured on a cutoff-heavy CPU record, a 0.2 clip
# pinned iterates at the trust edge for whole phases (wasting rounds and
# driving the safeguarded bracket to a 9-decade-wrong midpoint root)
# while anchored evaluations 19 decades out agreed with fresh ladders to
# 1e-5 relative.  2.0 decades keeps near-root evaluations near their
# (root-recentered) anchor without fighting the bracket logic.
INNER_K = 64  # interior points per inner k-section round
N_INNER_ROUNDS = 5  # bracket width 100 -> 100/65^5 ~ 9e-8 decades

DEFECT_MODEL_RANGE = 0.5  # decades: linear D-model trust region around r0

SEED_TAIL = os.environ.get("VITPU_SEED_TAIL", "mid")
# boot-ladder tail schedule for the SEED anchor (round 0).  Its consumers
# are the sign-grade defect-loop evaluations only — the endgame re-anchor
# (always 'full') re-derives root placement and the final solve — so a
# cheaper tail suffices here.  Day-scale A/B (scripts/day_check.py,
# round 2): 'mid' holds ORACLE PARITY exactly (chi2 median 2.26% vs
# 2.25%, max equal, same NaN set); round-3 stage profile: the full tail
# costs ~98 ms of the seed boot ladder's 155 ms per 128-record dispatch,
# 'mid' ~35 ms.  'mid' ships (round-3 day receipts in PARITY_NOTES #4);
# VITPU_SEED_TAIL=full restores the old schedule.

ENDGAME_TAIL = os.environ.get("VITPU_ENDGAME_TAIL", "mid")
# boot-ladder tail schedule for the ROOT-CENTERED endgame re-anchor (and
# thus the final-solve anchor).  This anchor decides final root placement
# and the returned C/dC/chi2, so the bar is higher than the seed
# anchor's: 'mid' KEEPS the half-size cutoff-zone grading level (the
# dense near-cutoff wall is what decides keeps) and drops only the n/4
# touch-up level + extra polish rounds.  Day-scale A/B vs the f64 oracle
# (scripts/ab_knobs.py, round 3, on top of N_DEFECT=7/N_POLISH=2):
# wfield median 1.89 -> 1.92% / max 10.55 -> 10.55%, chi2 median
# 2.28 -> 2.30%, SAME NaN set, day wall 7.22 -> 6.91 s.
# VITPU_ENDGAME_TAIL=full restores the old schedule.

N_REFINE_DEFECT = int(os.environ.get("VITPU_NREFINE_DEFECT", "0"))
# keep-solve refinement passes for DEFECT-LOOP evaluations (the endgame
# re-anchor + polish rounds always run the full-accuracy 2): these
# evaluations only steer the safeguarded bracket and the local defect
# model — both re-converged by the root-centered endgame — so one
# guarded CG pass (n_refine=0, ~2.5x cheaper per eval) suffices.
# Receipts (scripts/day_check.py, 1000 real-basis records, same oracle):
# n_refine=2 day 9.87 s / chi2-vs-f64 median 2.27% max 0.45;
# n_refine=0 day 9.37 s / median 2.28% max 0.31 — equal parity (the max
# actually improves: one fewer cutoff-straddling record mis-steered).


def _whitened_root_offset(lam, u, btWb, nu, d, r0=None, slope=None,
                          utau=None):
    """First-crossing root of the FAST (jittered-whitening) objective plus
    a local linear model of the cutoff defect,

        chi2_fast(alpha) + d + slope * clip(alpha - r0, +-RANGE) = nu,

    on [1e-100, 1], by 64-point k-section (5 rounds: sequential depth is
    what costs wall-clock on TPU, and each O(nbasis)-per-point round is one
    fused elementwise kernel).  With slope=None the defect model is the
    constant d.  Returns log10(alpha), or NaN when the modeled objective
    has no crossing."""
    dt = btWb.dtype

    def f_of(a_log):
        m, k = pow10_split(a_log)
        if utau is None:
            f = whitened_chi2_split(m, k, lam, u, btWb) + d - nu
        else:
            f = whitened_chi2_tau_split(m, k, lam, u, utau, btWb) + d - nu
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
        j = jnp.argmax(~below)  # first non-below index
        all_below = jnp.all(below)
        j = jnp.where(all_below, INNER_K, j)
        new_lo = jnp.where(j > 0, pts[jnp.maximum(j - 1, 0)], lo)
        new_hi = jnp.where(all_below, hi, pts[jnp.minimum(j, INNER_K - 1)])
        return new_lo, new_hi

    lo, hi = lax.fori_loop(0, N_INNER_ROUNDS, body, (lo, hi))
    return jnp.where(has, 0.5 * (lo + hi), jnp.nan)


def _ladder_outcome(chi2_floor, chi2_one, N):
    """Reference scale-factor ladder decisions (interpolate.py:180-207)
    from the exact endpoint evaluations.  Returns (nu, is_smooth,
    any_event)."""
    dt = chi2_floor.dtype
    sf = jnp.asarray(SCALE_FACTORS, dtype=dt)
    nus = N.astype(dt) * sf
    too_smooth = chi2_one - nus < 0.0
    has_bracket = (chi2_floor - nus < 0.0) & ~too_smooth
    event = too_smooth | has_bracket
    s = jnp.argmax(event)
    return nus[s], too_smooth[s], jnp.any(event)


def chi2_reg_param(AtWA_x, AtWb_x, btWb_x, N, R_x, tau_x=None, eigA=None,
                   eigR=None, want_anchor=False):
    """chi2-nu regularization parameter, DEFECT-CORRECTED exact search
    (the default 'exact' mode).  Inputs are EXPANSIONS (ops/xprec.py).

    Reference semantics preserved (interpolate.py:152-218): every chi^2
    evaluation that DECIDES something uses the exact gelsd-cutoff solve,
    with ladder decisions taken from the exact objective at the grid
    endpoints alpha = 1 and alpha = 1e-100.

    Decomposition budget per record per regularization matrix: one fresh
    ladder for AtWA (shared with the alpha -> 0 endpoint, the pencil
    whitening, and — via ``eigA`` — across regularization matrices and
    the caller's final solve), one cheap f32 eigh for the whitened
    pencil G, and THREE bootstrapped ladders (no n-size eigh): the X(1)
    endpoint from R's basis (R is record-independent, so its fresh
    ladder is hoisted out of the record batch by vmap) or AtWA's,
    whichever side dominates X(1) = AtWA + R, plus the two RE-ANCHOR
    rounds of the defect loop; every other defect evaluation is an
    ANCHORED M-shift (solve.anchor_chi2_x) costing no decomposition at
    all.

    ``eigA``: optional precomputed ``normalized_eigh_x(AtWA_x)`` tuple
    (w_x, Vx, s, M_x) — pass it when the caller already holds AtWA's
    ladder decomposition so it is not recomputed here.

    ``eigR``: optional precomputed (VR_x, sR) from
    ``normalized_eigh_x(R_x)`` — R is FIT-CONSTANT, so callers running
    many dispatches (ops/fit.fit_records) memoize its ladder once per
    run instead of paying an unbatched full ladder (~0.4 s of pure eigh
    latency) inside every dispatch.

    ``want_anchor``: additionally return the M-shift anchor for the
    FINAL solve — the last re-anchor's decomposition, or (too-smooth
    records, root = -inf -> alpha = 0) the fresh AtWA anchor, selected
    elementwise.  solve.final_solve_anchor_x consumes it, skipping the
    final solve's own boot ladder entirely.

    Returns LOG10(alpha): -inf for "too smooth" (alpha = 0,
    interpolate.py:189-191), NaN when no bracket exists
    (interpolate.py:210-211)."""
    dt = btWb_x[0].dtype

    # shared fresh decomposition of AtWA (normalized units)
    wA_x, VA_x, sA, MA_x = eigA if eigA is not None \
        else normalized_eigh_x(AtWA_x)
    chi2_floor = chi2_from_eig_x(wA_x, VA_x, MA_x, AtWb_x, btWb_x, sA)
    lam, Q, Binv = whiten_pencil(exp_hi(AtWA_x), exp_hi(R_x),
                                 eig_AtWA=(exp_hi(wA_x) * sA,
                                           exp_hi(VA_x)))
    u = Q.T @ (Binv @ exp_hi(AtWb_x))
    utau = None if tau_x is None else Q.T @ (Binv @ exp_hi(tau_x))
    btWb_hi = btWb_x[0]
    for wd in btWb_x[1:]:
        btWb_hi = btWb_hi + wd

    def anchor_at(a_log, basis=None, tail="full"):
        """Full exact decomposition at alpha = 10^a_log: one BOOTSTRAPPED
        ladder (from AtWA's eigenbasis — valid because alpha R perturbs
        the TOP modes negligibly near any root; regularization acts on
        the deep spectrum, which the boot ladder re-resolves exactly),
        packaged as an M-shift anchor."""
        m, k = pow10_split(a_log)
        aR_x = exp_mul_split(R_x, m, k)
        Xx = exp_add(AtWA_x, aR_x)
        eig = normalized_eigh_boot_x(Xx, VA_x if basis is None else basis,
                                     tail=tail)
        return make_anchor_x(a_log, eig, R_x, AtWb_x, tau_x=tau_x)

    # alpha = 1 endpoint: X(1) = AtWA + R, far from AtWA's basis when R
    # dominates (the physical-units case: AtWA ~ 1e-17 ||R|| for Ne
    # fits).  NO ladder here: project X(1) onto whichever side's
    # eigenbasis dominates the sum (R's fresh ladder is record-
    # INDEPENDENT and memoized per dispatch; AtWA's is already in hand)
    # and evaluate chi^2 through the coupling-aware keep-solve —
    # chi2_from_eig_x is Galerkin-exact on the kept subspace for ANY
    # near-eigenbasis, and the dominated side's couplings are tiny
    # (~||AtWA||/||R|| or vice versa).  chi2_one only decides the
    # too-smooth EVENT (chi2_one < nu), with a measured ~30x margin on
    # real days (chi2_one ~ btWb >> nu), so ladder-grade eigenvalues
    # buy nothing here.  The power-of-two normalization scales sA/sR
    # are exact order-of-magnitude proxies for the norms.
    if eigR is not None:
        VR_x, sR = eigR
    else:
        _, VR_x, sR, _ = normalized_eigh_x(R_x)
    pickR = sR >= sA
    Vboot = tuple(jnp.where(pickR, r, a) for r, a in zip(VR_x, VA_x))
    one_m, one_k = pow10_split(jnp.asarray(0.0, dt))
    R1_x = exp_mul_split(R_x, one_m, one_k)
    X1_x = exp_add(AtWA_x, R1_x)
    s1 = solve._norm_scale_x(X1_x)
    X1n = solve.exp_scale_pow2(X1_x, 1.0 / s1)
    M1_x = solve._project_x(X1n, Vboot)
    if solve._is_x64(M1_x):
        w1_x = (jnp.diagonal(M1_x[0], axis1=-2, axis2=-1),)
    else:
        w1_x = tuple(jnp.diagonal(w, axis1=-2, axis2=-1) for w in M1_x[:2])
    atau1 = None if tau_x is None else exp_mul_split(tau_x, one_m, one_k)
    chi2_one = chi2_from_eig_x(w1_x, Vboot, M1_x, AtWb_x, btWb_x, s1,
                               aR_x=R1_x, atau_x=atau1)
    nu, is_smooth, any_event = _ladder_outcome(chi2_floor, chi2_one, N)

    if tau_x is None:
        fast_at = lambda a_log: whitened_chi2_split(
            *pow10_split(jnp.asarray(a_log, dt)), lam, u, btWb_hi)
    else:
        fast_at = lambda a_log: whitened_chi2_tau_split(
            *pow10_split(jnp.asarray(a_log, dt)), lam, u, utau, btWb_hi)
    fast_floor = fast_at(-100.0)

    # FLOOR-FAILURE RESCUE (measured on the bench day, round 3): ~2/1000
    # records carry a coupled near-cutoff wall that stalls the guarded CG
    # keep-solve at alpha -> 0 — the exact chi2_floor comes back inflated
    # 1.6-3.1x (device probe: record 459 floor 1457 vs f64 469; keep
    # counts fine), no rung brackets, and the record NaN-fails where the
    # f64 oracle finds an ordinary root (~1e-31).  At the root's alpha the
    # spectrum is lifted by alpha R and the anchored evaluations are
    # healthy — only the floor DECISION breaks.  Rescue: when the exact
    # outcome finds NO event, re-derive the rung decision from the
    # WHITENED floor (bracket-complete on every record of the day — the
    # fast mode's finite_frac is 1.0) and seed the defect model at d0 = 0
    # (the exact floor is untrusted here; the safeguarded bracket and the
    # root-centered endgame re-derive the defect locally).  Strictly
    # NaN-or-better: the fallback only fires where the answer was NaN.
    nu_fb, smooth_fb, event_fb = _ladder_outcome(fast_floor, chi2_one, N)
    use_fb = (~any_event) & event_fb
    nu = jnp.where(use_fb, nu_fb, nu)
    is_smooth = jnp.where(use_fb, smooth_fb, is_smooth)
    any_event = any_event | event_fb

    # defect-corrected iteration, seeded at the root of chi2_fast + D0 =
    # nu with D0 the PLATEAU defect chi2_floor - chi2_fast(1e-100)
    d0 = jnp.where(use_fb, 0.0, chi2_floor - fast_floor)
    r = _whitened_root_offset(lam, u, btWb_hi, nu, d0, utau=utau)
    r = jnp.clip(jnp.where(jnp.isnan(r), -50.0, r), ALPHA_MIN + 0.1, -0.1)
    lo = jnp.asarray(ALPHA_MIN, dt)   # f(lo) < 0 for active records
    hi = jnp.asarray(0.0, dt)         # f(hi) >= 0 for active records
    r_prev = jnp.asarray(jnp.nan, dt)
    d_prev = jnp.asarray(jnp.nan, dt)

    def round_body(carry, anchor, clip_to_trust, n_refine=2):
        lo, hi, r, r_prev, d_prev = carry
        # anchored evaluations stay inside the anchor's trust region; the
        # monotone bracket stays valid at the clipped point (every
        # anchored chi^2 is still EXACT — the M-shift projection is exact
        # at any alpha, only the keep/CG quality degrades with distance,
        # hence the clip).  ``clip_to_trust`` may be a TRACED bool: the
        # re-anchor rounds (which evaluate AT their own anchor, no clip)
        # are folded into the same fori_loop as the clipped rounds so the
        # round body is traced once (compile-wall receipts:
        # scripts/graph_size.py).
        r_clip = jnp.clip(r, anchor["a_log"] - ANCHOR_TRUST,
                          anchor["a_log"] + ANCHOR_TRUST)
        r_eval = jnp.where(clip_to_trust, r_clip, r)
        c_r = anchor_chi2_x(anchor, r_eval, btWb_x, n_refine=n_refine)
        f_r = c_r - nu
        below = f_r < 0.0
        # trust-proportional bracket slack (see BRACKET_PAD_PER_DEC)
        pad = BRACKET_PAD_PER_DEC * jnp.maximum(
            jnp.abs(r_eval - anchor["a_log"]) - PAD_FREE_RADIUS, 0.0)
        lo = jnp.where(below, jnp.maximum(lo, r_eval - pad), lo)
        hi = jnp.where(below, hi, jnp.minimum(hi, r_eval + pad))
        d = c_r - fast_at(r_eval)
        dr = r_eval - r_prev
        slope = jnp.where(
            jnp.isfinite(d_prev) & (jnp.abs(dr) > 1e-6),
            (d - d_prev) / jnp.where(jnp.abs(dr) > 1e-6, dr, 1.0),
            0.0,
        )
        r_new = _whitened_root_offset(lam, u, btWb_hi, nu, d, r0=r_eval,
                                      slope=slope, utau=utau)
        # SAFEGUARDED step: clip the model prediction into the central
        # half of the exact bracket, so every iteration shrinks the
        # bracket by >= 25% even when the defect model keeps predicting
        # outside (measured failure: stale-model predictions pinned near
        # one end left decade-wide brackets and chi2 misses of several
        # percent at the returned point); when the model is right, its
        # prediction inside the central half is used as-is and
        # convergence stays superlinear.  NaN (no modeled crossing) falls
        # back to bisection.
        width = hi - lo
        r_clip = jnp.clip(r_new, lo + 0.25 * width, hi - 0.25 * width)
        r_next = jnp.where(jnp.isnan(r_new), 0.5 * (lo + hi), r_clip)
        return lo, hi, r_next, r_eval, d

    carry = (lo, hi, r, r_prev, d_prev)
    # re-anchor rounds pay a full boot ladder; every other round is an
    # anchored M-shift on the most recent anchor.  Each re-anchor's OWN
    # round (which evaluates at the fresh anchor, unclipped) is folded
    # into the following fori_loop phase via a traced clip flag, so
    # round_body is traced once per phase instead of once per re-anchor
    # plus once per phase.
    next_round = 0
    unclipped_at = -1
    for ra in REANCHOR_ROUNDS:
        if ra > next_round:

            def phase_body(i, carry, _anchor=anchor, _u=unclipped_at):
                return round_body(carry, _anchor, clip_to_trust=(i != _u),
                                  n_refine=N_REFINE_DEFECT)

            carry = lax.fori_loop(next_round, ra, phase_body, carry)
        anchor = anchor_at(carry[2], tail=SEED_TAIL)
        unclipped_at = ra
        next_round = ra
    if N_DEFECT > next_round:

        def tail_body(i, carry, _u=unclipped_at):
            return round_body(carry, anchor, clip_to_trust=(i != _u),
                              n_refine=N_REFINE_DEFECT)

        carry = lax.fori_loop(next_round, N_DEFECT, tail_body, carry)

    def _root_of(carry):
        # when the exact bracket has CONVERGED (narrow), the last model
        # prediction inside it is brentq-grade (the defect model is
        # locally accurate; measured ~1e-3 decades vs the grid search);
        # on a still-wide bracket the model is suspect — stale
        # predictions pinned decades from the root were the original
        # failure mode — so fall back to the guaranteed midpoint
        lo, hi, r_last, _, _ = carry
        width = hi - lo
        return jnp.where(width < 0.2, jnp.clip(r_last, lo, hi),
                         0.5 * (lo + hi))

    # FLOOR-FAILURE RESCUE, part 2 (round 5, f32 BACKENDS ONLY): on
    # rescued records the EXACT evaluations themselves are untrusted —
    # the same stalled keep-solve that inflated the floor inflates every
    # defect-loop evaluation, so the loop walks the root to where the
    # INFLATED chi^2 equals nu.  Measured on the bench day (record 456,
    # reproducible): root -22.4 where the true f64 chi^2 is 1.16 nu —
    # no reference nu-scale rung even corresponds — with the reported
    # chi^2 coming back NEGATIVE (an impossible value for a weighted sum
    # of squares; run-to-run it swung -289938 .. +634), while the
    # reference root is -32.3 at chi^2 = 0.7 nu.  Take the WHITENED root
    # directly on these records (bracket-complete and jitter-envelope-
    # accurate; the d0 = 0 seed already IS that root) and pin the
    # endgame anchor AT it.  On f64/CPU the exact evaluations ARE
    # trustworthy even on rescued records, and the defect loop's exact
    # root beats the whitened one (the whitened objective carries the
    # fast envelope): measured on the production-order reference-compare
    # record, the f64 whitened override moved chi2-at-root 2.7% -> 5.9%
    # from the reference — hence the static gate.
    exact_trustworthy = solve._is_x64(AtWA_x)  # static (dtype)
    r_fb = jnp.clip(
        _whitened_root_offset(lam, u, btWb_hi, nu, jnp.zeros_like(d0),
                              utau=utau),
        ALPHA_MIN, 0.0)
    r_fb = jnp.where(jnp.isnan(r_fb), -50.0, r_fb)
    fb_root = use_fb & jnp.asarray(not exact_trustworthy)

    # ROOT-CENTERED endgame: one final re-anchor AT the converged
    # candidate, then N_POLISH cheap anchored rounds whose evaluations
    # run at delta ~ 0 from their anchor — fresh-ladder-grade chi^2
    # exactly where the root lands (anchored-eval drift over the trust
    # region was measured to scatter roots ~0.45 decades median on a
    # real day; polishing at the root recovers the all-ladder search's
    # placement).  The final solve reuses this anchor at delta ~ 0.
    r_cand = jnp.clip(_root_of(carry), ALPHA_MIN, 0.0)
    r_cand = jnp.where(fb_root, r_fb, r_cand)
    anchor = anchor_at(r_cand, tail=ENDGAME_TAIL)
    carry = (carry[0], carry[1], r_cand, carry[3], carry[4])

    def phase3_body(i, carry):
        # round 0 evaluates AT the fresh root-centered anchor (no clip);
        # later polish rounds clip to its trust region — one traced body
        return round_body(carry, anchor, clip_to_trust=(i > 0))

    carry = lax.fori_loop(0, N_POLISH, phase3_body, carry)
    # rescued records: polish rounds are exact evaluations too — pinned
    # (f32 backends; f64 keeps the defect loop's exact root)
    root = jnp.where(fb_root, r_fb, _root_of(carry))

    root = jnp.where(is_smooth, -jnp.inf, root)
    root = jnp.where(any_event, root, jnp.nan)
    # whitened chi^2 at the returned root: the reporting fallback for
    # records whose exact final chi^2 is untrusted (f32 rescued) or
    # impossible (negative) — consumed by ops/fit.fit_from_stats_x.
    # The rescued-substitution flag is fb_root (f32 only): on f64 the
    # exact final chi^2 at the root is the better report.
    chi2_fb = fast_at(jnp.where(jnp.isfinite(root), root, -100.0))
    if not want_anchor:
        return root
    # final-solve anchor: the last re-anchor's decomposition (root is
    # within its trust region by construction on converged records), or
    # the fresh AtWA anchor for too-smooth records (alpha = 0 solves X =
    # AtWA, exactly the fresh decomposition's territory)
    anchor_fresh = make_anchor_x(jnp.asarray(-jnp.inf, dt),
                                 (wA_x, VA_x, sA, MA_x), R_x, AtWb_x,
                                 tau_x=tau_x)
    anchor_out = jax.tree_util.tree_map(
        lambda f, a: jnp.where(is_smooth, f, a), anchor_fresh, anchor)
    return root, anchor_out, (fb_root, chi2_fb)


def chi2_reg_param_grid(AtWA_x, AtWb_x, btWb_x, N, R_x, tau_x=None):
    """chi2-nu regularization parameter via the FULL exact grid scan
    ('exact_grid' mode — the receipts baseline for the defect-corrected
    default).  Every chi^2(alpha) evaluation is a fresh-ladder cutoff
    solve, including all 101 bracket-grid points, exactly like the
    reference's downward scan; KSECTION bisection replaces Brent (same
    root of the monotone objective to ~9e-13 in log10(alpha), tighter
    than brentq's default xtol, interpolate.py:214).

    Returns LOG10(alpha); -inf for too-smooth, NaN for no-bracket."""
    dt = btWb_x[0].dtype

    def chi2_of_logalpha(a_log):
        m, k = pow10_split(a_log)
        aR_x = exp_mul_split(R_x, m, k)
        Xx = exp_add(AtWA_x, aR_x)
        atau_x = None if tau_x is None else exp_mul_split(tau_x, m, k)
        w_x, Vx, s, M_x = normalized_eigh_x(Xx)
        return chi2_from_eig_x(w_x, Vx, M_x, AtWb_x, btWb_x, s, aR_x=aR_x,
                               atau_x=atau_x)

    chi2_batch = jax.vmap(chi2_of_logalpha)

    n_grid = int(-ALPHA_MIN) + 1  # 101
    n_pad = -(-n_grid // GRID_CHUNK) * GRID_CHUNK
    alphas_pad = -jnp.arange(float(n_pad), dtype=dt)
    chi2_grid = lax.map(
        chi2_batch, alphas_pad.reshape(-1, GRID_CHUNK)
    ).reshape(-1)[:n_grid]
    alphas = alphas_pad[:n_grid]

    sf = jnp.asarray(SCALE_FACTORS, dtype=dt)
    nus = N.astype(dt) * sf  # [5]
    f_grid = chi2_grid[None, :] - nus[:, None]  # [5, 101]

    too_smooth = f_grid[:, 0] < 0.0  # per sf: chi2(alpha=1) - nu < 0
    neg = f_grid < 0.0
    has_bracket = jnp.any(neg[:, 1:], axis=1) & ~too_smooth  # [5]

    event = too_smooth | has_bracket
    s = jnp.argmax(event)
    any_event = jnp.any(event)

    is_smooth = too_smooth[s]
    nu = nus[s]
    j = jnp.argmax(neg[s])
    lo = alphas[j]      # f(lo) < 0
    hi = alphas[j - 1]  # f(hi) >= 0

    N_BISECT = 40

    def body(_, carry):
        lo, hi = carry
        mid = 0.5 * (lo + hi)
        below = chi2_of_logalpha(mid) - nu < 0.0
        new_lo = jnp.where(below, mid, lo)
        new_hi = jnp.where(below, hi, mid)
        return new_lo, new_hi

    lo, hi = lax.fori_loop(0, N_BISECT, body, (lo, hi))
    root = 0.5 * (lo + hi)

    root = jnp.where(is_smooth, -jnp.inf, root)
    root = jnp.where(any_event, root, jnp.nan)
    return root


def chi2_reg_param_fast(AtWA_x, AtWb_x, btWb_x, N, R_x, tau_x=None):
    """Fast-mode chi2-nu search: one pencil whitening per record, then
    every chi^2(alpha) evaluation is O(nbasis) (ops/solve.whitened_chi2)
    instead of an eigendecomposition.

    Identical decision structure to chi2_reg_param (same scale-factor
    ladder, bracket grid, k-section refinement); the solve uses a tiny
    relative jitter instead of the reference's lstsq cutoff, so the
    selected alpha deviates only when sub-cutoff directions matter
    (docs/PARITY_NOTES.md #7).  Select with [TPU] REGPARAM_MODE=fast.

    Returns LOG10(alpha); -inf for too-smooth, NaN for no-bracket."""
    dt = btWb_x[0].dtype
    lam, Q, Binv = whiten_pencil(exp_hi(AtWA_x), exp_hi(R_x))
    u = Q.T @ (Binv @ exp_hi(AtWb_x))
    utau = None if tau_x is None else Q.T @ (Binv @ exp_hi(tau_x))
    btWb_hi = btWb_x[0]
    for wd in btWb_x[1:]:
        btWb_hi = btWb_hi + wd

    def chi2_of_logalpha(a_log):
        m, k = pow10_split(a_log)
        if utau is None:
            return whitened_chi2_split(m, k, lam, u, btWb_hi)
        return whitened_chi2_tau_split(m, k, lam, u, utau, btWb_hi)

    n_grid = int(-ALPHA_MIN) + 1
    alphas = -jnp.arange(float(n_grid), dtype=dt)
    chi2_grid = jax.vmap(chi2_of_logalpha)(alphas)

    sf = jnp.asarray(SCALE_FACTORS, dtype=dt)
    nus = N.astype(dt) * sf
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

    root = jnp.where(is_smooth, -jnp.inf, root)
    root = jnp.where(any_event, root, jnp.nan)
    return root


# ---------------------------------------------------------------------------
# GCV via exact LOO identity + scipy-faithful 1-D Nelder-Mead
# ---------------------------------------------------------------------------
#
# PRECISION (round-3 device receipts, scripts/gcv_check.py, nbasis=144 on
# real-basis statistics): the plain-f32 objective is NOT a benign envelope —
# 23% of records failed to converge and converged alphas scattered 10.9
# decades median from the f64 oracle; the whitened 'fast' objective
# converges but its jitter floor distorts the landscape (18 decades, chi2
# 20x).  The failure mechanism is the hat diagonal: h_i = W_i a_i'X^-1 a_i
# expands as sum_k t_ik^2 / w_k with t = V'a_i — ALL-POSITIVE terms, but
# the deep-mode components t_ik sit 8+ decades below ||a_i||, an f32 dot
# product returns noise ~6e-8 ||a_i|| for them, and noise^2 / w_k explodes
# (h errors of O(10), denominators 1 - h crossing zero).  The cure is ONE
# exact-sliced Ozaki product T = A V per eigenbasis — every entry of T
# correct RELATIVE to itself — after which f32 is fine everywhere
# downstream (the objective needs ~1e-3 relative): gcv_objective_anchored
# below, the production GCV path on both backends.

def _gcv_basis_bundle(Vx, AtWA_x, R_x, AtWb_x, A_x):
    """Per-eigenbasis precomputation for the anchored GCV objective:
    exact projections of BOTH pencil sides, the projected rhs, and the
    exact design-row projection T = A V (the one product whose f32
    evaluation destroys the hat diagonal — see the section comment)."""
    PA_x = solve._project_x(AtWA_x, Vx)
    PR_x = solve._project_x(R_x, Vx)
    u_x = ozaki_mm(solve._vxT(Vx), tuple(x[..., None] for x in AtWb_x),
                   nwords=2)
    u_x = tuple(w[..., 0] for w in u_x)
    T_hi = exp_hi(ozaki_mm(A_x, Vx, nwords=1))
    return {"PA_x": PA_x, "PR_x": PR_x, "u_x": u_x, "T": T_hi}


def gcv_objective_anchored(a_log, bundle, b, W, mask, axis_name=None,
                           keep_resolve=False):
    """Sum of weighted squared LOO residuals at reg param 10^a_log from an
    exact basis bundle (production path, both backends).

    M(alpha) = V'(AtWA + alpha R)V is formed by EXACT shift from the
    bundle's projections; both LOO ingredients then come from ONE ridged
    f32-grade kept-block inverse on the unit-diagonal scaled system:

        yhat_i = t_i' M^-1 u / s,      h_i = W_i t_i' M^-1 t_i / s ,

    with t the EXACT T = A V rows (the one product whose f32 evaluation
    destroys the hat diagonal — see the section comment).  Unlike chi^2
    there is no deep cancellation in these outputs (r = yhat - b cancels
    only to the ~5% residual level), so f32 arithmetic downstream of the
    exact T/M/u is inside the objective's ~1e-3 tolerance.  The ridge
    (1e-4 on the unit-diagonal system) bounds the knee regime where the
    diag keep rule over-keeps deep alpha-R-dominated modes whose kept
    block is near-singular (measured: keep 102 vs true 92, the LOO terms
    spiking 1000x with an unguarded inverse)."""
    from .solve import _norm_scale_x, _pow2_exp_i, mul_pow2i

    dt = exp_hi(bundle["PA_x"]).dtype
    m, k = pow10_split(jnp.asarray(a_log, dt))
    aPR_x = exp_mul_split(bundle["PR_x"], m, k)
    M_x = exp_add(bundle["PA_x"], aPR_x, nwords=3)
    s = _norm_scale_x(M_x)
    Mn_x = solve.exp_scale_pow2(M_x, 1.0 / s)
    Mh = exp_hi(Mn_x)
    # DEFLATED eigenvalue estimates (solve._deflated_diag_x): the raw
    # Rayleigh diagonal is biased UP near the cutoff by the basis's
    # aggregate far pollution, which displaces the objective's keep-KNEE
    # by decades at deep alpha (measured: a record whose f64 objective
    # rises 28% from 1e-33 to 1e-43 looked flat on device because the
    # inflated estimates hid the keep-set change) — round 4, VERDICT r3
    # item 3 tail work
    w_hi = exp_hi(solve._deflated_diag_x(Mn_x))
    if keep_resolve:
        # cluster-grade keep estimates (round 5): the keep-KNEE location
        # is what displaces the objective's sharp wells vs f64
        # (PARITY_NOTES #6 addendum) — the Schur-complemented mini-ladder
        # puts the wall's values within ~1e-4 of the true eigenvalues,
        # aligning the knee.  ONLY the keep mask uses them: the sd
        # grading below must stay consistent with the (unrotated) M the
        # kept-block inverse actually acts on.
        w_r = solve._cluster_keep_estimates_x(Mn_x)
        keep_w = exp_hi(w_r) if w_r is not None else w_hi
    else:
        keep_w = w_hi
    aw = jnp.abs(keep_w)
    keep = aw > solve.EPS64 * jnp.max(aw)
    is64 = Mh.dtype == jnp.float64
    n = Mh.shape[-1]
    sd = jnp.sqrt(jnp.maximum(jnp.abs(jnp.where(keep, w_hi, 1.0)),
                              jnp.finfo(Mh.dtype).tiny))
    km = keep[..., None, :] & keep[..., :, None]
    eye = jnp.eye(n, dtype=Mh.dtype)
    Msc = jnp.where(km, Mh / (sd[..., None, :] * sd[..., :, None]), eye)
    Minv_sc = jnp.linalg.inv(Msc + 1e-4 * eye)
    Minv_sc = jnp.where(km, Minv_sc, 0.0)
    T = bundle["T"]
    Tk = jnp.where(keep[..., None, :], T / sd[..., None, :], 0.0)
    uk = jnp.where(keep, exp_hi(bundle["u_x"]) / sd, 0.0)
    yhat = Tk @ (Minv_sc @ uk[..., None])[..., 0]
    h = jnp.einsum("...pi,...ij,...pj->...p", Tk, Minv_sc, Tk)
    Wm = jnp.where(mask > 0, W, 0.0)
    if is64:
        yhat = yhat / s
        h = Wm * h / s
    else:
        j = _pow2_exp_i(s)
        yhat = mul_pow2i(yhat, -j)
        h = mul_pow2i(Wm * h, -j)
    r = (yhat - b) / (1.0 - h)
    r = jnp.where(mask > 0, r, 0.0)
    out = jnp.sum(r * r * Wm, axis=-1)
    if axis_name is not None:
        out = lax.psum(out, axis_name)
    return out


def gcv_reg_param_x(AtWA_x, AtWb_x, R_x, A_x, b, W, mask, eigA=None,
                    eigR=None, axis_name=None):
    """GCV regularization parameter from EXPANSION inputs (production
    path): scipy-faithful Nelder-Mead over the anchored exact objective.

    Two basis bundles cover the whole alpha line: AtWA's ladder basis
    (data-dominant alphas) and R's (regularization-dominant) — each
    objective evaluation picks the side that dominates X(alpha), exactly
    like the chi2 search's X(1) endpoint.  ``eigA``/``eigR`` optionally
    supply the ladder decompositions (eigR is fit-constant and memoized
    by ops/fit._reg_mats_eig).

    Returns LOG10(alpha); NaN when the minimizer fails to converge
    (reference interpolate.py:292-293)."""
    if eigA is None:
        eigA = normalized_eigh_x(AtWA_x)
    VA_x = eigA[1]
    sA = eigA[2]
    if eigR is not None:
        VR_x, sR = eigR
    else:
        _, VR_x, sR, _ = normalized_eigh_x(R_x)
    bun_A = _gcv_basis_bundle(VA_x, AtWA_x, R_x, AtWb_x, A_x)
    bun_R = _gcv_basis_bundle(VR_x, AtWA_x, R_x, AtWb_x, A_x)
    dt = exp_hi(AtWb_x).dtype
    # dominance threshold in log10(alpha): alpha sR >= sA  <=>
    # a_log >= log10(sA / sR); sA/sR are exact powers of two
    thresh = (jnp.log2(sA) - jnp.log2(sR)) * jnp.asarray(0.30102999566398,
                                                         dt)

    def obj(a_log, keep_resolve=False):
        oA = gcv_objective_anchored(a_log, bun_A, b, W, mask,
                                    axis_name=axis_name,
                                    keep_resolve=keep_resolve)
        oR = gcv_objective_anchored(a_log, bun_R, b, W, mask,
                                    axis_name=axis_name,
                                    keep_resolve=keep_resolve)
        return jnp.where(a_log >= thresh, oR, oA)

    # f32 backends need a relative fatol component (see nelder_mead_1d);
    # 1e-5 covers the measured objective noise (~sqrt(npoints) * eps_f32)
    frel = 0.0 if dt == jnp.float64 else 1e-5
    x, ok = nelder_mead_1d(obj, jnp.asarray(GCV_ALPHA0, dt),
                           fatol_rel=frel)
    if GCV_POLISH and dt != jnp.float64:
        # f32-backend POLISH (round 4, VERDICT r3 item 3): the relative
        # fatol that makes NM terminate on a noisy f32 objective also lets
        # it stop early on flat stretches — the round-3 regret tail (p95
        # 10%, max 14.4% vs the f64 oracle's NM) was NM stop-point
        # scatter, not objective error.  A fixed bracketed descent around
        # the NM stop (uniform probe grid, then golden-section rounds,
        # always keeping the best SEEN point — offset 0 makes it
        # monotone-or-equal vs the raw NM stop) retires that scatter for
        # ~19 extra objective evals.  f64 backends keep the scipy-faithful
        # stop (the NM-vs-scipy oracle parity test pins it);
        # VITPU_GCV_POLISH=0 restores it everywhere.
        half = (GCV_POLISH_PROBES - 1) // 2
        offs = [GCV_POLISH_SPAN * (k - half) / half
                for k in range(GCV_POLISH_PROBES)]
        # polish evaluations optionally use cluster-RESOLVED keep
        # estimates (VITPU_GCV_KEEP_RESOLVE; see gcv_objective_anchored)
        pobj = (lambda a: obj(a, keep_resolve=True)) \
            if GCV_KEEP_RESOLVE else obj
        X = jnp.stack([x + jnp.asarray(o, dt) for o in offs])
        F = jnp.stack([pobj(xi) for xi in X])
        i = jnp.argmin(F, axis=0)
        xb = jnp.take_along_axis(X, i[None], axis=0)[0]
        fb = jnp.take_along_axis(F, i[None], axis=0)[0]
        step = jnp.asarray(offs[1] - offs[0], dt)
        inv = jnp.asarray(0.3819660112501051, dt)  # 2 - golden ratio

        def gs_body(_, carry):
            lo, hi, xb, fb = carry
            x1 = lo + inv * (hi - lo)
            x2 = hi - inv * (hi - lo)
            f1, f2 = pobj(x1), pobj(x2)
            lo = jnp.where(f1 <= f2, lo, x1)
            hi = jnp.where(f1 <= f2, x2, hi)
            xc = jnp.where(f1 <= f2, x1, x2)
            fc = jnp.minimum(f1, f2)
            better = fc < fb
            xb = jnp.where(better, xc, xb)
            fb = jnp.where(better, fc, fb)
            return lo, hi, xb, fb

        _, _, xb, fb = lax.fori_loop(
            0, GCV_POLISH, gs_body, (xb - step, xb + step, xb, fb))
        # accept only a REAL descent (beyond the f32 objective's noise):
        # on decades-flat valleys (e.g. the faithful stop-at--20 behavior,
        # PARITY_NOTES #6) the polish "improvement" is pure noise and the
        # NM stop point is kept
        f_nm = F[half]  # offs[half] == 0.0 — the objective at the NM stop
        improved = fb < f_nm - (NM_FATOL + 1e-4 * jnp.abs(f_nm))
        x = jnp.where(improved, xb, x)
        if GCV_RESCUE:
            # NM-budget RESCUE (f32 backends only): when the f32 NM
            # exhausts its scipy-faithful budget without triggering the
            # termination test (objective noise keeps the simplex
            # wobbling — the f64 oracle converges on the same records),
            # the polish's bracketed descent around NM's best-so-far is
            # a well-defined minimum and strictly NaN-or-better: the
            # reference raises on non-convergence and the record would
            # NaN-fill (interpolate.py:292,557-563).  VITPU_GCV_RESCUE=0
            # restores the faithful failure.
            ok = ok | jnp.isfinite(fb)
    return jnp.where(ok, x, jnp.nan)


GCV_ALPHA0 = -20.0  # interpolate.py:288
NM_XATOL = 1e-4
NM_FATOL = 1e-4
NM_MAXITER = 200  # scipy default N * 200 for N = 1
NM_MAXFEV = 200  # scipy default N * 200 function evaluations for N = 1
# f32-backend post-NM bracketed polish: golden-section rounds (0 = off,
# scipy-faithful NM stop everywhere — the f64/CPU path always stops there)
GCV_POLISH = int(os.environ.get("VITPU_GCV_POLISH", "8"))
# polish evaluations with cluster-resolved keep estimates.  Round-5 A/B
# on the 64-record real-basis set (PARITY_NOTES #6): regret tail 6 -> 4
# records, p95 6.2% -> 5.3%, warm wall +1.6 s per 64 records (the
# estimate passes hide inside the batch).  VITPU_GCV_KEEP_RESOLVE=0
# restores the raw deflated-diagonal keep.
GCV_KEEP_RESOLVE = os.environ.get("VITPU_GCV_KEEP_RESOLVE", "1") == "1"
GCV_POLISH_SPAN = 1.5  # probe-grid half-width, decades around the NM stop
# probe-grid size (odd; the center probe is the NM stop itself).  Round-5
# A/B on the 64-record real-basis set (scripts/gcv_check.py --regret
# --addendum): 7 probes / 6 golden rounds left regret median +9.5e-4 and
# a 7-record tail; 13 probes / 8 rounds (0.25-decade spacing) moved the
# median to -9.6e-5 — BETTER than the f64 oracle's own NM stop — and
# retired one tail record, at 55.6 s warm wall for 64 records.  The
# remaining 6-record tail is the f32 objective's own well displacement
# near keep transitions, not search resolution (docs/PARITY_NOTES.md #6
# round-5 addendum), so denser probing buys nothing further.
GCV_POLISH_PROBES = int(os.environ.get("VITPU_GCV_POLISH_PROBES", "13"))
GCV_RESCUE = os.environ.get("VITPU_GCV_RESCUE", "1") == "1"  # accept the
# polish minimum when the f32 NM exhausts its budget (NaN-or-better)


def gcv_objective(a_log, AtWA, AtWb, R, A, b, W, mask, axis_name=None):
    """Sum of weighted squared LOO residuals at reg param 10^a_log.

    Uses the exact rank-one-downdate identity
        loo_resid_i = (yhat_i - b_i) / (1 - h_ii),
        h_ii = W_i a_i' pinv(X) a_i,   X = AtWA + a R,
    which matches the reference's per-point refit loop
    (interpolate.py:332-351) in value, with the same cutoff-solve
    semantics as chi2 (solve.sym_pinv_apply).  Plain-array surface:
    f32-grade on TPU (documented, docs/PARITY_NOTES.md).

    Point-sharded evaluation (SURVEY.md 5.7): AtWA/AtWb are the psum'd
    FULL statistics (replicated), A/b/W/mask the local point shard; pass
    the mesh axis as ``axis_name``."""
    from .solve import mul_pow2i
    if AtWA.dtype == jnp.float64:
        aR = (10.0 ** a_log) * R  # CPU: exact f64 alpha (NM trajectories
        # branch on near-ties; keep the oracle bit-path)
    else:
        m, k = pow10_split(a_log)
        aR = mul_pow2i(m * R, k)
    X = AtWA + aR
    eps = float(jnp.finfo(jnp.float64).eps)
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
    whitened eigenbasis), every objective evaluation is elementwise.
    Same jitter-vs-cutoff deviation envelope as the fast chi2 search."""
    from .solve import mul_pow2i
    if lam.dtype == jnp.float64:
        al = (10.0 ** a_log) * lam  # CPU: exact f64 alpha
    else:
        m, k = pow10_split(a_log)
        al = mul_pow2i(m * lam, k)
    d = 1.0 / (1.0 + al)
    yhat = T @ (d * u)
    h = W * (T2 @ d)
    r = (yhat - b) / (1.0 - h)
    r = jnp.where(mask > 0, r, 0.0)
    out = jnp.sum(r * r * jnp.where(mask > 0, W, 0.0))
    if axis_name is not None:
        out = lax.psum(out, axis_name)
    return out


def nelder_mead_1d(f, x0, xatol=NM_XATOL, fatol=NM_FATOL, maxiter=NM_MAXITER,
                   maxfev=NM_MAXFEV, fatol_rel=0.0):
    """scipy.optimize.minimize(method='Nelder-Mead') for 1-D problems,
    replicated as a lax.while_loop.  Returns (x_best, converged).

    The function-evaluation budget mirrors scipy's maxfev accounting for
    the trajectory scipy would take: 2 initial evals, then 2 per iteration
    (reflection + expansion-or-contraction) plus 1 more when the iteration
    shrinks — even though this vectorized replica computes all candidate
    points every iteration.

    ``fatol_rel``: additional RELATIVE function tolerance, needed on f32
    backends — scipy's fatol is ABSOLUTE (1e-4) and an f32 objective of
    magnitude ~1e3 carries ~1e-3 of arithmetic noise, so the reference's
    literal criterion can never trigger there (measured: every
    production-order record hit the maxfev cap and reported
    non-convergence).  Convergence becomes
    |f1 - f0| <= fatol + fatol_rel * |f0|."""
    nonzdelt = 0.05
    zdelt = 0.00025
    x1 = jnp.where(x0 != 0.0, (1.0 + nonzdelt) * x0, zdelt)

    f0, f1 = f(x0), f(x1)
    # order: simplex[0] best
    xs = jnp.where(f0 <= f1, jnp.stack([x0, x1]), jnp.stack([x1, x0]))
    fs = jnp.where(f0 <= f1, jnp.stack([f0, f1]), jnp.stack([f1, f0]))

    def _ftol(fs):
        return fatol + fatol_rel * jnp.abs(fs[0])

    def cond(state):
        xs, fs, it, fev = state
        done = (jnp.abs(xs[1] - xs[0]) <= xatol) \
            & (jnp.abs(fs[1] - fs[0]) <= _ftol(fs))
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

        xs = jnp.where(new_f < f0, jnp.stack([new_x, x0]),
                       jnp.stack([x0, new_x]))
        fs = jnp.where(new_f < f0, jnp.stack([new_f, f0]),
                       jnp.stack([f0, new_f]))
        fev = fev + jnp.where(expand | accept_c, 2, 3)
        return xs, fs, it + 1, fev

    xs, fs, it, fev = lax.while_loop(
        cond, body, (xs, fs, jnp.asarray(0), jnp.asarray(2)))
    converged = (jnp.abs(xs[1] - xs[0]) <= xatol) \
        & (jnp.abs(fs[1] - fs[0]) <= _ftol(fs))
    return xs[0], converged


def gcv_reg_param(AtWA, AtWb, R, A, b, W, mask, axis_name=None,
                  regparam_mode: str = "exact"):
    """GCV regularization parameter for one record, one reg matrix (plain
    arrays; f32-grade on TPU, exact on CPU).

    Returns LOG10(alpha); NaN when the minimizer fails to converge
    (interpolate.py:292-293)."""
    if regparam_mode == "fast":
        lam, Qw, Binv = whiten_pencil(AtWA, R)
        u = Qw.T @ (Binv @ AtWb)
        T = A @ (Binv.T @ Qw)
        obj = partial(gcv_objective_fast, lam=lam, u=u, T=T, T2=T * T,
                      b=b, W=W, mask=mask, axis_name=axis_name)
    else:
        obj = partial(gcv_objective, AtWA=AtWA, AtWb=AtWb, R=R, A=A, b=b,
                      W=W, mask=mask, axis_name=axis_name)
    x, ok = nelder_mead_1d(lambda a: obj(a),
                           jnp.asarray(GCV_ALPHA0, AtWA.dtype))
    return jnp.where(ok, x, jnp.nan)


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
