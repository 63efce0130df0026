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
* For the alpha line-search, a single eigendecomposition per objective
  evaluation turns chi^2(alpha) into a diagonal expression (ops/regparam.py).
* The final solve reproduces scipy.linalg.lstsq/pinv min-norm semantics
  (interpolate.py:462-466) through a symmetric eigendecomposition with the
  scipy cutoff rule.

PRECISION MODEL.  The reference runs in LAPACK f64; this TPU has no f64 at
all (storage truncates, every op rounds at f32 or below — measured, see
ops/xprec.py).  Precision-critical values therefore travel as f32
EXPANSIONS (tuples of 1-3 f32 words, host-split), matmuls that must
preserve deep cancellation go through the exact-sliced Ozaki matmul
(xprec.ozaki_mm), and eigendecompositions use the deflation LADDER below
(f32 eighs + exact projections + an EXPANSION-STORED eigenbasis: a plain
f32 basis carries ~5e-13 * |w|max of irreducible Rayleigh contamination
from vector rounding alone, 1000x the gelsd cutoff at eps64 * |w|max).
On CPU — where real f64 exists — an expansion is a single f64 word and
every xprec primitive collapses to the native op, so ONE code path serves
both backends and the CPU test suite exercises the same algorithms.

Alpha spans [1e-100, 1] (reference bracket grid), far outside f32 range;
it travels as a SPLIT (mantissa f32, exponent int32) and multiplies
expansions through exact exponent-bit shifts (mul_pow2i).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax

from . import xprec
from .xprec import (as_expansion, exp_add, exp_hi, exp_mul, exp_mul_f32,
                    exp_neg, exp_renorm, exp_scale_pow2, ozaki_mm,
                    ozaki_mm_long, two_sum)


def _is_x64(x):
    return x[0].dtype == jnp.float64


# ---------------------------------------------------------------------------
# split-exponent scalars: values like alpha = 10^a, a in [-100, 0]
# ---------------------------------------------------------------------------

def pow10_split(a_log):
    """10**a_log as (mantissa in [1, 2), integer exponent): f32-safe for
    ANY a_log (1e-100 underflows f32 outright).  -inf (the too-smooth
    alpha = 0 sentinel) clamps to an exponent that flushes to zero in
    mul_pow2i; NaN propagates."""
    a = jnp.maximum(a_log, -4000.0)  # keep k inside int32, m finite
    t = a * 3.321928094887362  # log2(10)
    k = jnp.floor(t)
    m = jnp.exp2(t - k)  # in [1, 2): f32-accurate relative
    m = jnp.where(jnp.isnan(a_log), jnp.nan, m)
    return m.astype(jnp.float32), k.astype(jnp.int32)


def mul_pow2i(x, k):
    """x * 2^k for integer k via exponent-bit addition — exact; results
    outside f32 range flush to zero / clamp to max (acceptable: they sit
    beyond every cutoff used here).  Works on f64 (CPU) via ldexp."""
    if x.dtype == jnp.float64:
        return x * jnp.exp2(k.astype(jnp.float64))
    bits = jax.lax.bitcast_convert_type(x.astype(jnp.float32), jnp.int32)
    e = (bits >> 23) & 0xFF
    new_e = e + k
    flush = (new_e <= 0) | (e == 0)
    new_e = jnp.clip(new_e, 1, 254)
    mant = bits & jnp.int32(~(0xFF << 23))
    out = jax.lax.bitcast_convert_type(mant | (new_e << 23), jnp.float32)
    return jnp.where(flush, 0.0, out)


def exp_mul_split(x, m, k):
    """Expansion times a split scalar (m * 2^k)."""
    if _is_x64(x):
        scale = m.astype(jnp.float64) * jnp.exp2(k.astype(jnp.float64))
        return (x[0] * scale,)
    out = exp_mul_f32(x, m)
    return tuple(mul_pow2i(w, k) for w in out)


# ---------------------------------------------------------------------------
# sufficient statistics
# ---------------------------------------------------------------------------

def suff_stats(A, b, W, mask):
    """Sufficient statistics of one record's weighted LS problem (plain
    arrays; library-surface / CPU path).

    A: [npoints, nbasis]; b, W, mask: [npoints].
    Returns (AtWA [nb,nb], AtWb [nb], btWb [], N [])."""
    Wm = jnp.where(mask > 0, W, 0.0)
    bm = jnp.where(mask > 0, b, 0.0)
    Aw = A * Wm[:, None]
    AtWA = A.T @ Aw
    AtWb = Aw.T @ bm
    btWb = jnp.sum(Wm * bm * bm)
    N = jnp.sum(mask)
    return AtWA, AtWb, btWb, N


_STATS_MAXPQ = 5  # Ozaki chunk-product budget for the sufficient
# statistics: truncation floor 2^-56 ~ 1.4e-17 of the operand scales, 16x
# below the gelsd cutoff — and far below the reference's OWN accumulation
# noise (f64 summation over npoints ~ 2400 rounds AtWA at ~n*eps64 ~
# 5e-13 of scale), so the deep spectrum here is BETTER determined than
# the reference's


def suff_stats_x(A_x, b_x, W_x, mask):
    """Expansion sufficient statistics: exact-grade A'WA / A'Wb / b'Wb.

    A_x: [npoints, nbasis] expansion (shared across records); b_x, W_x:
    [npoints] expansions; mask: [npoints] f32.  The reference computes
    these einsums in f64 (interpolate.py:456-458); on TPU the native
    "f64" matmul is bf16-grade, which alone perturbs AtWA's deep spectrum
    by ~1e-3 and breaks the gelsd-cutoff solve, hence ozaki_mm_long.

    TWO-WORD operands suffice (prepare_fit_inputs splits A/b/W to 2
    words): the 2^-48 elementwise representation error perturbs AtWA by
    ~3.6e-15 of scale — 100x BELOW the f64 accumulation noise the
    reference's own einsum carries at npoints ~ 2400."""
    Wm_x = tuple(jnp.where(mask > 0, w, 0.0) for w in W_x)
    bm_x = tuple(jnp.where(mask > 0, w, 0.0) for w in b_x)
    # Aw = A * W (elementwise, broadcast W over columns)
    Aw_x = exp_mul(A_x, tuple(w[..., None] for w in Wm_x),
                   nwords=min(2, len(A_x) + len(W_x) - 1))
    At_x = tuple(jnp.swapaxes(w, -1, -2) for w in A_x)
    AtWA_x = ozaki_mm_long(At_x, Aw_x, maxpq=_STATS_MAXPQ)
    Wb_x = exp_mul(Wm_x, bm_x)
    AtWb_x = ozaki_mm_long(At_x, tuple(w[..., None] for w in Wb_x),
                           maxpq=_STATS_MAXPQ)
    AtWb_x = tuple(w[..., 0] for w in AtWb_x)
    btWb_x = xprec.exp_dot(Wb_x, bm_x)
    N = jnp.sum(mask)
    return AtWA_x, AtWb_x, btWb_x, N


# ---------------------------------------------------------------------------
# the deflation-ladder eigendecomposition (expansion-stored basis)
# ---------------------------------------------------------------------------
#
# Problem: eigendecompose a normal matrix whose spectrum spans 16-20
# decades, down to the gelsd cutoff at eps64 * |w|max ~ 2e-16, on hardware
# whose ONLY native eigh is f32-grade (TPU QDWH backward error ~2e-5 of
# ||X||, measured — 70x XLA-CPU's f32 eigh, 1300x LAPACK).  Two separate
# obstacles, each fatal alone:
#
#   (1) algorithmic: the f32 eigh scrambles every mode below ~2e-5 |w|max;
#   (2) representational: even a PERFECT basis rounded to f32 carries
#       delta'X delta ~ 5e-13 |w|max of Rayleigh contamination per vector
#       (delta = rounding), so eigenvalues below ~1e-12 |w|max are
#       unrecoverable from any f32-stored basis.
#
# The ladder fixes (1) with scaled deflation — re-eigh the k smallest
# modes' EXACT projected block, renormalized to O(1) so the f32 solver
# resolves that block's own top decades — and (2) by storing the
# eigenbasis as a TWO-WORD f32 expansion (48-bit: contamination
# ~2^-96 |w|max) with every basis update an exact-sliced Ozaki product.
# After the levels, a sorted SLIDING-WINDOW block-Jacobi sweep repairs the
# local scrambling the level eighs leave (near-floor and level-boundary
# mixing) with exact rotations at each window's own scale, then gated
# first-order POLISH rounds contract the perturbative remainder
# quadratically.  The residue no rotation can remove — couplings between
# near-degenerate pairs (values within ~3x) — is absorbed downstream by
# the coupling-aware solve (_keep_solve_x): chi^2 is invariant under
# rotations within the kept subspace, so solving the coupled projected
# system exactly replaces a perfect eigenbasis.

def _ladder_levels(n, boot=False):
    """Deflation-block sizes at basis size n.

    Fresh ladders use FIVE levels (fractions 0.875 down to 0.49; at
    n=144: 126, 113, 98, 85, 71).  A three-level trim looked equivalent
    on small samples but failed 6% of a 1000-record synthetic day
    (keep-zone NaNs on tail records); the full schedule ran the same day
    with ZERO failures at indistinguishable wall-clock.  Each level re-eighs the k smallest modes'
    exact block at its own scale, peeling ~4.5 decades of spectrum IN
    VALUE per level regardless of how many modes live per decade — which
    matters because real AMISR-basis normal matrices span 40+ decades at
    only ~3 modes/decade (the signed-m column suppression, PARITY_NOTES
    #2), where position-based windows alone (a 48-wide window covers 14
    decades there) cannot grade the spectrum.  The schedule's only
    constraint is that each level's block CONTAINS the still-unresolved
    cluster: at >=4.5 decades/level, five levels reach the gelsd cutoff
    (16 decades down) on both dense (9 modes/decade) and sparse (3/decade)
    spectra with margin.

    Bootstrapped ladders (whose starting basis is already graded by a
    fresh ladder on the nearby AtWA) need NO levels — the window sweep
    absorbs the alpha-step drift at every alpha from aR negligible to aR
    dominant."""
    if boot:
        return ()
    return tuple(max(1, min(-(-n * num // 1000), n))
                 for num in (875, 785, 680, 585, 490))


_EIGH_EMULATED_RESID = 0.0  # test hook: emulate TPU QDWH quality on CPU


def _block_eigh_f32(M):
    """f32 eigendecomposition of a normalized block (the only native eigh
    this hardware has).  _EIGH_EMULATED_RESID > 0 injects a deterministic
    symmetric backward error of that relative size — the CPU test suite
    uses it to reproduce the TPU QDWH residual level (~2e-5 of ||M||,
    measured; XLA-CPU's own f32 eigh is ~3e-7, LAPACK ~1.5e-8) without
    TPU access."""
    M = M.astype(jnp.float32)
    if _EIGH_EMULATED_RESID:
        n = M.shape[-1]
        i = jnp.arange(n, dtype=jnp.float32)
        eta = jnp.sin(3.7 * i[:, None] + 1.3 * i[None, :] + 0.61)
        eta = 0.5 * (eta + eta.T)
        # per-matrix max so batched-block calls (the phased window sweep
        # stacks windows on a leading axis) perturb each block at ITS scale
        scale = jnp.max(jnp.abs(M), axis=(-2, -1), keepdims=True) \
            * jnp.float32(_EIGH_EMULATED_RESID)
        M = M + scale * eta
    return jnp.linalg.eigh(M)


def _vxT(Vx):
    return tuple(jnp.swapaxes(w, -1, -2) for w in Vx)


def _promote_x(V, nwords=2):
    """Plain array -> zero-padded expansion (f64 stays one word)."""
    if V.dtype == jnp.float64:
        return (V,)
    V = V.astype(jnp.float32)
    return (V,) + tuple(jnp.zeros_like(V) for _ in range(nwords - 1))


import os as _os0

_LADDER_MAXPQ = int(_os0.environ.get("VITPU_LADDER_MAXPQ", "6"))
# Ozaki chunk-product budget inside the ladder: floor 2^-64 ~ 5e-20 of
# the normalized scale — 600x below the eps64 cutoff the keep decision
# needs, and 33% fewer MXU products than the default 8.  Env-overridable
# for day-scale A/Bs (scripts/ab_knobs.py).
_LADDER_MAXPQ_V = int(_os0.environ.get("VITPU_LADDER_MAXPQ_V", "5"))
# budget for BASIS-update products (V rotations,
# orthonormalization): the basis itself only needs 48-bit fidelity (its
# representation floor), so the 2^-56 truncation floor at maxpq=5 is
# already below V's own storage error — ~25% fewer MXU products on the
# V-side ops (M-projection products keep the full budget)


def _project_x(Xx, Vx, nwords=3):
    """Exact M = V' X V for an expansion basis (two chained Ozaki
    products), symmetrized.  Per-entry ABSOLUTE accuracy ~5e-20 of the
    operand scales — resolving couplings 16+ decades below ||X|| is the
    whole game; no native matmul on this hardware can do it."""
    T = ozaki_mm(Xx, Vx, nwords=nwords, maxpq=_LADDER_MAXPQ)
    M = ozaki_mm(_vxT(Vx), T, nwords=nwords, maxpq=_LADDER_MAXPQ)
    return tuple(0.5 * (w + jnp.swapaxes(w, -1, -2)) for w in M)


def _ns_orth_x(Vx):
    """Newton-Schulz orthonormalization in expansion arithmetic:
    V <- V + V (I - V'V)/2; one step squares the defect.  Must run in the
    expansion: a plain f32 multiplier cannot even represent diagonal
    deviations below ~6e-8, and basis cross-talk eta acts exactly like
    eigenvector mixing (contamination eta^2 * |w|max)."""
    if _is_x64(Vx):
        return Vx
    G = ozaki_mm(_vxT(Vx), Vx, nwords=2, maxpq=_LADDER_MAXPQ_V)
    n = G[0].shape[-1]
    eye = jnp.eye(n, dtype=G[0].dtype)
    # D = (I - G)/2: I - G0 is exact in f32 (entries near 1 subtract by
    # Sterbenz; the rest are sign flips), /2 is a pow2 scale
    D = exp_renorm([0.5 * (eye - G[0])] + [-0.5 * w for w in G[1:]],
                   nwords=2)
    return exp_add(Vx, ozaki_mm(Vx, D, nwords=2, maxpq=_LADDER_MAXPQ_V),
                   nwords=2)


_WIN = 48     # window width (positions); spans ~4-5 decades on AMISR-like
_WSTRIDE = 24  # spectra — within the f32 eigh's ~4.5-decade resolution


def _window_starts(n):
    """Static window starts covering [0, n) from the TOP of an ascending
    order (start n - _WIN first, descending by _WSTRIDE, last window
    left-aligned at 0)."""
    if n <= _WIN:
        return [0]
    starts = list(range(n - _WIN, 0, -_WSTRIDE))
    starts.append(0)
    return starts


def _window_sweep_x(Vx, d_hi, M_x):
    """One sequential sliding-window block-Jacobi sweep down the sorted
    spectrum.

    Modes are sorted by |Rayleigh value|; overlapping windows (width
    _WIN, stride _WSTRIDE) walk from the TOP of the spectrum down.  Each
    window's block of the exact projection M is renormalized to O(1)
    (power of two) and eigendecomposed in f32 — an EXACT orthogonal
    rotation of those modes, at the window's own scale, regardless of
    gaps.  This is what first-order polish corrections cannot do: with
    QDWH-grade Rayleigh estimates, gap signs invert and gated
    gradient-like corrections amplify as often as they contract
    (measured: stuck at ~1e-1 mixing through 10 rounds).  A window eigh
    has no denominators to get wrong.

    Each window may scramble its own bottom ~decade (below ITS noise
    floor); the next window — shifted _WSTRIDE, overlapping by
    _WIN - _WSTRIDE — re-resolves those modes at the deeper scale, so a
    full sweep leaves every mode resolved by a window whose top is within
    ~2.7 decades of it.  M is maintained EXACTLY through the sweep via
    skinny Ozaki row/column updates.  Couplings between modes more than
    _WIN positions apart are perturbative at every stage (the deflation
    levels already resolved them to their blocks' noise floors) and
    second-order harmless.

    Returns (d_hi, Vx, M_x) with columns in sorted order (eigen-order is
    arbitrary downstream: every consumer masks on |w|); M_x is the
    maintained exact projection, permuted and updated through every
    window rotation."""
    n = d_hi.shape[-1]
    # ascending |d|: consistent with eigh's within-window ascending order,
    # so windows never reshuffle already-resolved modes back into deeper
    # windows
    order = jnp.argsort(jnp.abs(d_hi))
    Vx = tuple(jnp.take(w, order, axis=-1) for w in Vx)
    # permuting the maintained exact projection is free and exact
    M_x = tuple(jnp.take(jnp.take(w, order, axis=-1), order, axis=-2)
                for w in M_x)
    win = min(_WIN, n)
    starts = jnp.asarray(_window_starts(n), jnp.int32)

    def body(i, carry):
        Vx, M_x = carry
        s0 = starts[i]
        z0 = jnp.zeros((), jnp.int32)
        Mb = tuple(lax.dynamic_slice(w, (s0, s0), (win, win)) for w in M_x)
        db = jnp.abs(jnp.diagonal(exp_hi(Mb), axis1=-2, axis2=-1))
        sc = xprec._pow2_scale(jnp.max(db)[None])[0]
        _, Q = _block_eigh_f32(exp_hi(exp_scale_pow2(Mb, 1.0 / sc)))
        # rotate the window's basis columns and M rows/cols (exact)
        Vs = tuple(lax.dynamic_slice(w, (z0, s0), (n, win)) for w in Vx)
        Vw = ozaki_mm(Vs, (Q,), nwords=2, maxpq=_LADDER_MAXPQ_V)
        Vx = tuple(lax.dynamic_update_slice(w, vw, (z0, s0))
                   for w, vw in zip(Vx, Vw))
        Ms = tuple(lax.dynamic_slice(w, (z0, s0), (n, win)) for w in M_x)
        Mc = ozaki_mm(Ms, (Q,), nwords=3, maxpq=_LADDER_MAXPQ)
        M_x = tuple(lax.dynamic_update_slice(w, mc, (z0, s0))
                    for w, mc in zip(M_x, Mc))
        Mt = tuple(lax.dynamic_slice(w, (s0, z0), (win, n)) for w in M_x)
        Mr = ozaki_mm((Q.T,), Mt, nwords=3, maxpq=_LADDER_MAXPQ)
        M_x = tuple(lax.dynamic_update_slice(w, mr, (s0, z0))
                    for w, mr in zip(M_x, Mr))
        return Vx, M_x

    Vx, M_x = lax.fori_loop(0, len(_window_starts(n)), body, (Vx, M_x))
    d_hi = jnp.diagonal(exp_hi(M_x), axis1=-2, axis2=-1)
    return d_hi, Vx, M_x


import os as _os

_SWEEP_PHASED = _os.environ.get("VITPU_SWEEP_PHASED", "0") == "1"
# Phase-batched window sweep (below) — MEASURED SLOWER on this TPU, ships
# OFF.  Premise was a per-eigh-call latency floor to amortize; in fact
# eigh cost scales linearly in batch (same receipts as the anchored-eval
# design), so batching the 5 sequential 48-wide eighs into 3 batched
# calls saves nothing while the repair schedule's re-run phase does 7/5
# of the window updates.  A/B at day scale (scripts/day_check.py, 1000
# real-basis records, same oracle): sequential 9.87 s / chi2-vs-f64
# median 2.27%, phased 10.22 s / 2.21% — parity equal, wall-clock worse.
# Kept selectable for hardware where small-batch eigh IS latency-floored.


def _sweep_phases(n):
    """Disjoint-window phases of the sweep: windows whose index ranges do
    not overlap share one batched eigh.

    The descending sweep is a repair CHAIN — each window must be the
    final writer of the previous (shallower) window's bottom ~decade, so
    the edges s_0 -> s_1 -> ... admit no exact 2-coloring (a plain
    even/odd split leaves the odd windows' bottoms at their own shallow
    floors; measured on the 18-decade test spectrum: deep-half matched
    error 3.6e-2 -> 0.73).  The three-phase schedule [evens, odds,
    evens-minus-first] re-runs the deeper even windows AFTER the odds,
    making the FINAL writer of every position range identical in depth
    order to the sequential sweep: at n=144 -> [[96, 48, 0], [72, 24],
    [48, 0]] (3 batched eigh calls instead of 5 sequential).  Windows
    within a phase are 2 * _WSTRIDE = _WIN apart: disjoint."""
    starts = _window_starts(n)
    if len(starts) == 1:
        return [starts]
    evens = starts[0::2]
    odds = starts[1::2]
    phases = [evens, odds]
    if len(evens) > 1:
        phases.append(evens[1:])
    return phases


def _window_sweep_phased_x(Vx, d_hi, M_x):
    """Phase-batched variant of _window_sweep_x: disjoint windows share
    ONE batched eigh and batched skinny Ozaki products.  Eigh cost on
    this TPU scales linearly in batch above a ~10 ms per-CALL latency
    floor (scripts/profile_exact.py receipts), so collapsing the five
    sequential 48-wide calls at n=144 into two batched calls is pure
    dispatch-latency recovery at identical FLOPs.

    Exactness: within a phase the combined rotation is block-diagonal
    orthogonal, so applying ALL column updates (sliced from the
    pre-phase M — ranges are disjoint) and then ALL row updates (from
    the column-updated M) is exactly Q' M Q.  The 3-phase schedule (see
    _sweep_phases) makes the final writer of every position range
    identical in depth order to the sequential sweep, so the repaired
    floors match (measured: deep-half matched error equal to the
    sequential sweep's on the 18-decade test spectrum, where a naive
    2-phase split blew it 3.6e-2 -> 0.73)."""
    n = d_hi.shape[-1]
    order = jnp.argsort(jnp.abs(d_hi))
    Vx = tuple(jnp.take(w, order, axis=-1) for w in Vx)
    M_x = tuple(jnp.take(jnp.take(w, order, axis=-1), order, axis=-2)
                for w in M_x)
    win = min(_WIN, n)
    for phase in _sweep_phases(n):
        Mb = tuple(jnp.stack([w[..., s:s + win, s:s + win] for s in phase],
                             axis=-3) for w in M_x)  # [.., nph, win, win]
        db = jnp.abs(jnp.diagonal(exp_hi(Mb), axis1=-2, axis2=-1))
        sc = xprec._pow2_scale(jnp.max(db, axis=-1))  # [.., nph]
        _, Q = _block_eigh_f32(exp_hi(exp_scale_pow2(
            Mb, 1.0 / sc[..., None, None])))
        Vs = tuple(jnp.stack([w[..., :, s:s + win] for s in phase], axis=-3)
                   for w in Vx)
        Vw = ozaki_mm(Vs, (Q,), nwords=2, maxpq=_LADDER_MAXPQ_V)
        for i, s in enumerate(phase):
            Vx = tuple(w.at[..., :, s:s + win].set(vw[..., i, :, :])
                       for w, vw in zip(Vx, Vw))
        Ms = tuple(jnp.stack([w[..., :, s:s + win] for s in phase], axis=-3)
                   for w in M_x)
        Mc = ozaki_mm(Ms, (Q,), nwords=3, maxpq=_LADDER_MAXPQ)
        for i, s in enumerate(phase):
            M_x = tuple(w.at[..., :, s:s + win].set(mc[..., i, :, :])
                        for w, mc in zip(M_x, Mc))
        Mt = tuple(jnp.stack([w[..., s:s + win, :] for s in phase], axis=-3)
                   for w in M_x)
        Mr = ozaki_mm((jnp.swapaxes(Q, -1, -2),), Mt, nwords=3,
                      maxpq=_LADDER_MAXPQ)
        for i, s in enumerate(phase):
            M_x = tuple(w.at[..., s:s + win, :].set(mr[..., i, :, :])
                        for w, mr in zip(M_x, Mr))
    d_hi = jnp.diagonal(exp_hi(M_x), axis1=-2, axis2=-1)
    return d_hi, Vx, M_x


_FO_GATE = 0.1  # first-order corrections only below this |coupling/gap|


def _fo_polish_round_x(Xx, Vx, M_x=None):
    """One gated first-order polish round against the exact projection.

    Kills the FAR POLLUTION every mode carries — overlap with modes
    decades above, injected by each eigh's backward error and spread by
    every block rotation — contracting it quadratically across rounds
    because M is re-projected exactly each time (measured on a real
    record: 2e-14 -> 3e-17 absolute Rayleigh contamination in three
    rounds).  Corrections are gated on |E| < 0.1 AND a >= ~3x value
    separation: for closer pairs the Rayleigh-estimate error can flip the
    gap sign and the correction amplifies instead; such near-pairs are
    left to the block eighs (grading levels), which rotate them exactly
    at their own scale.  Rotation-like machinery must NOT run inside
    these rounds: an O(1) rotation re-mixes cleaned modes with dirty ones
    and misdirects the simultaneously-applied first-order terms
    (measured: keep-counts blow to n).

    Returns (d_hi, Vx)."""
    if M_x is None:
        M_x = _project_x(Xx, Vx)
    M = exp_hi(M_x)
    n = M.shape[-1]
    tiny = jnp.finfo(M.dtype).tiny
    eye = jnp.eye(n, dtype=bool)
    d = jnp.diagonal(M, axis1=-2, axis2=-1)
    ad = jnp.abs(d)
    den = d[..., None, :] - d[..., :, None]  # den[i,j] = d_j - d_i
    E = jnp.where(eye, 0.0, M) / jnp.where(jnp.abs(den) > tiny, den, tiny)
    reliable = jnp.abs(den) > 0.5 * (ad[..., None, :] + ad[..., :, None])
    DEV = jnp.where((jnp.abs(E) < _FO_GATE) & reliable & ~eye, E, 0.0)
    Vx = exp_add(Vx, ozaki_mm(Vx, (DEV,), nwords=2,
                              maxpq=_LADDER_MAXPQ_V),
                 nwords=2)
    return d, _ns_orth_x(Vx)


def _level_x(Xx, Vx, d_hi, k, M_x):
    """One deflation level: re-eigh the k smallest-|d| modes' EXACT
    projected block, renormalized to O(1) so the f32 solver resolves the
    block's own top ~4.5 decades, and rotate those basis columns (exact
    Ozaki product — the rotation itself is f32, which is enough: pairs
    the eigh rotates by O(1) angles have near-equal eigenvalues, so the
    f32 angle error contaminates only at (6e-8)^2 relative).

    The block is SLICED from the maintained exact projection ``M_x``
    (free), and M_x is updated through the rotation with two skinny Ozaki
    products — no full-size re-projection anywhere in the ladder.

    SELECTION BY PERMUTATION: the basis is sorted ascending-|d| (one
    argsort + contiguous gathers — exact: permutations move words
    unchanged), so the level block is the STATIC prefix [0:k] and every
    update is a static-slice write.  The previous top_k/put_along_axis
    formulation lowered to TPU scatters costing ~50 ms per level at
    [128, 144, 144] — 8x the level's own eigh (measured; the permuted
    form is value-identical).  Column order is arbitrary downstream
    (every consumer masks on |w|)."""
    order = jnp.argsort(jnp.abs(d_hi))
    Vx = tuple(jnp.take(w, order, axis=-1) for w in Vx)
    M_x = tuple(jnp.take(jnp.take(w, order, axis=-1), order, axis=-2)
                for w in M_x)
    z0 = jnp.asarray(0, jnp.int32)
    Ms = tuple(w[..., :k, :k] for w in M_x)
    db = jnp.abs(jnp.diagonal(exp_hi(Ms), axis1=-2, axis2=-1))
    s = xprec._pow2_scale(jnp.max(db)[None])[0]
    _, Q = _block_eigh_f32(exp_hi(exp_scale_pow2(Ms, 1.0 / s)))
    Vs = ozaki_mm(tuple(w[..., :, :k] for w in Vx), (Q,), nwords=2,
                  maxpq=_LADDER_MAXPQ_V)
    Vx = tuple(lax.dynamic_update_slice(w, vs, (z0, z0))
               for w, vs in zip(Vx, Vs))
    # M <- Q~' M Q~ (Q~ = Q on the block columns, identity elsewhere)
    Mc = ozaki_mm(tuple(w[..., :, :k] for w in M_x), (Q,), nwords=3,
                  maxpq=_LADDER_MAXPQ)
    M_x = tuple(lax.dynamic_update_slice(w, mc, (z0, z0))
                for w, mc in zip(M_x, Mc))
    Mr = ozaki_mm((Q.T,), tuple(w[..., :k, :] for w in M_x), nwords=3,
                  maxpq=_LADDER_MAXPQ)
    M_x = tuple(lax.dynamic_update_slice(w, mr, (z0, z0))
                for w, mr in zip(M_x, Mr))
    d_hi = jnp.diagonal(exp_hi(M_x), axis1=-2, axis2=-1)
    return d_hi, Vx, M_x


_N_SWEEPS = 1  # window sweeps after the deflation levels
_N_FO = 2      # polish rounds per clean phase (before and after the
# cutoff-zone grading level)


def _ladder_eigh_x(Xx, boot_Vx=None, tail="full"):
    """Ladder eigendecomposition of a NORMALIZED expansion (|w|max ~ 1).

    Structure: one full-size f32 eigh seeds the basis; the deflation
    LEVELS grade the deep spectrum (each re-eighs the k smallest modes'
    exact block at its own scale, advancing the resolved floor ~4.5
    decades); the WINDOW SWEEPS then repair all residual local scrambling
    (near-floor and level-boundary mixing) with exact rotations; one
    Newton-Schulz step restores expansion-grade orthonormality.

    Returns (w_x, Vx, M_x): eigenvalues as a 2-word expansion (the exact
    Rayleigh diagonal), the 2-word expansion eigenbasis, and the final
    exact projection M = V' X V (near-diagonal; its off-diagonal
    couplings feed the cutoff solve's Richardson refinement).

    ``boot_Vx``: eigenbasis of a NEARBY matrix (e.g. AtWA for
    X = AtWA + alpha R near a chi2 root) — skips the full-size f32 eigh
    and ALL deflation levels; the window sweep alone re-resolves the
    alpha-step drift (validated from aR negligible to aR dominant).

    ``tail``: 'full' (default) runs the complete clean/grade/touch-up
    tail; 'light' (boot only) stops after the window sweep plus one
    polish round and the final projection — for evaluations whose ONLY
    consumer is a scalar chi^2 inside a bracketed search, where
    residual wall-internal mixing shifts chi^2 by less than the
    bracket tolerance."""
    hi = exp_hi(Xx)
    if _is_x64(Xx):  # CPU: native f64 eigh is exact — no ladder needed
        w, V = jnp.linalg.eigh(hi)
        M = jnp.zeros_like(hi) + jnp.diag(w)  # exact projection is diagonal
        return (w,), (V,), (M,)
    n = hi.shape[-1]
    if boot_Vx is None:
        _, V0 = _block_eigh_f32(hi)
        Vx = _promote_x(V0)
        levels = _ladder_levels(n)
    else:
        Vx = boot_Vx
        levels = _ladder_levels(n, boot=True)
    # the ONE full projection; levels and sweeps maintain it exactly
    # through their rotations with skinny Ozaki updates
    M_x = _project_x(Xx, Vx)
    d_hi = jnp.diagonal(exp_hi(M_x), axis1=-2, axis2=-1)
    for k in levels:
        d_hi, Vx, M_x = _level_x(Xx, Vx, d_hi, k, M_x)
    sweep = _window_sweep_phased_x if _SWEEP_PHASED else _window_sweep_x
    for _ in range(_N_SWEEPS):
        d_hi, Vx, M_x = sweep(Vx, d_hi, M_x)
    if tail == "light" and boot_Vx is not None:
        d_hi, Vx = _fo_polish_round_x(Xx, Vx, M_x=M_x)
        M_x = _project_x(Xx, Vx)
        w_x = tuple(jnp.diagonal(w, axis1=-2, axis2=-1) for w in M_x[:2])
        return w_x, Vx, M_x
    if tail == "mid" and boot_Vx is not None:
        # keep the half-size cutoff-zone grading level (the dense
        # near-cutoff wall is what the light tail misses) but drop the
        # finer n/4 level and the extra polish rounds
        d_hi, Vx = _fo_polish_round_x(Xx, Vx, M_x=M_x)
        M_x = _project_x(Xx, Vx)
        d_hi, Vx, M_x = _level_x(Xx, Vx, d_hi, max(1, n // 2), M_x)
        d_hi, Vx = _fo_polish_round_x(Xx, Vx, M_x=M_x)
        M_x = _project_x(Xx, Vx)
        w_x = tuple(jnp.diagonal(w, axis1=-2, axis2=-1) for w in M_x[:2])
        return w_x, Vx, M_x
    # CLEAN, then GRADE, then touch up.  The polish rounds first kill the
    # far-pollution every mode carries (overlap with modes decades above,
    # injected by every eigh's backward error and spread by every block
    # rotation) — fo contracts it quadratically, but ONLY while no O(1)
    # rotation re-mixes cleaned modes with dirty ones.  The cutoff-zone
    # level (half the basis, re-eighed at its own scale, floor ~2e-17)
    # then separates the dense near-cutoff wall real AMISR bases have
    # (~50 modes within two decades of eps64 * |w|max) from CLEAN
    # members, so its rotations no longer redistribute pollution.
    # Measured on real records: grade-then-clean leaves keep ~30 over
    # truth and chi2 off 10-50%; clean-then-grade converges to the
    # reference's own retention-ambiguity envelope (PARITY_NOTES #8: the
    # wall sits at the reference's f64 accumulation noise, so its
    # retention is BLAS-order-arbitrary there too).
    for i in range(_N_FO):
        d_hi, Vx = _fo_polish_round_x(Xx, Vx, M_x=M_x if i == 0 else None)
    M_x = _project_x(Xx, Vx)
    d_hi, Vx, M_x = _level_x(Xx, Vx, d_hi, max(1, n // 2), M_x)
    for i in range(_N_FO):
        d_hi, Vx = _fo_polish_round_x(Xx, Vx, M_x=M_x if i == 0 else None)
    # second, FINER grading level: the n/2 block's eigh floor over a
    # dense near-cutoff wall still leaves ~0.1 wall-internal mixing
    # (backward error / wall gaps); a quarter-size block re-eighs the
    # wall at ~60x finer scale on now-clean members
    M_x = _project_x(Xx, Vx)
    d_hi, Vx, M_x = _level_x(Xx, Vx, d_hi, max(1, n // 4), M_x)
    d_hi, Vx = _fo_polish_round_x(Xx, Vx, M_x=M_x)
    M_x = _project_x(Xx, Vx)
    w_x = tuple(jnp.diagonal(w, axis1=-2, axis2=-1) for w in M_x[:2])
    return w_x, Vx, M_x


def _norm_scale_x(Xx):
    """Power-of-two normalization scale (f32-safe) from the hi word's
    mean |diagonal| — exact to divide by."""
    hi = exp_hi(Xx)
    if _is_x64(Xx):
        # CPU: exactness of the scale is irrelevant (native f64); keep the
        # reference-style trace normalization
        n = hi.shape[-1]
        t = jnp.trace(hi) / n
        return jnp.where(jnp.abs(t) > 0, jnp.abs(t), 1.0)
    t = jnp.mean(jnp.abs(jnp.diagonal(hi)))
    return xprec._pow2_scale(t[None])[0]


def normalized_eigh_x(Xx):
    """Ladder eigendecomposition of an expansion with power-of-two
    normalization.  Returns (w_x, Vx, s, M_x): w_x the 2-word eigenvalue
    expansion of Xx / s (NORMALIZED units — f32-safe even when the raw
    matrix scale is 1e-22), Vx the 2-word expansion eigenbasis, s the
    exact power-of-two scale, M_x the exact projection V'(Xx/s)V."""
    s = _norm_scale_x(Xx)
    Xn = exp_scale_pow2(Xx, 1.0 / s)
    w_x, Vx, M_x = _ladder_eigh_x(Xn)
    return w_x, Vx, s, M_x


def normalized_eigh_boot_x(Xx, boot_Vx, tail="full"):
    """Bootstrapped normalized_eigh_x from the eigenbasis of a nearby
    matrix (skips the full-size f32 eigh and the first deflation level)."""
    s = _norm_scale_x(Xx)
    Xn = exp_scale_pow2(Xx, 1.0 / s)
    if _is_x64(Xx):
        w, V = jnp.linalg.eigh(exp_hi(Xn))
        return (w,), (V,), s, (jnp.zeros_like(exp_hi(Xn)) + jnp.diag(w),)
    w_x, Vx, M_x = _ladder_eigh_x(Xn, boot_Vx=boot_Vx, tail=tail)
    return w_x, Vx, s, M_x


# ---------------------------------------------------------------------------
# cutoff solves and chi^2 (reference gelsd/pinv semantics)
# ---------------------------------------------------------------------------

EPS64 = 2.220446049250313e-16  # the reference's f64 cutoff unit


def _exp_div_masked(u_x, w_x, keep):
    """Elementwise expansion divide z = u / w on ``keep`` (0 elsewhere):
    hi-quotient seed plus one exact-residual Newton step — full
    f64-grade relative accuracy, which chi^2 = btWb - u'z needs because
    the two terms cancel by orders of magnitude on well-fit records."""
    if _is_x64(u_x):
        z = u_x[0] / jnp.where(keep, w_x[0], 1.0)
        return (jnp.where(keep, z, 0.0),)
    w0 = jnp.where(keep, exp_hi(w_x), 1.0)
    z0 = jnp.where(keep, exp_hi(u_x) / w0, 0.0)
    r = exp_add(u_x, exp_neg(exp_mul(w_x, (z0,))), nwords=2)
    z1 = jnp.where(keep, exp_hi(r) / w0, 0.0)
    return exp_renorm([z0, z1], nwords=2)


_N_CG = 32  # f32 CG iterations per refinement pass


def _cg_f32(A, b, n_iter=_N_CG):
    """Fixed-iteration conjugate gradients on a well-scaled SPD f32
    system (unit diagonal, couplings < 1)."""
    tiny = jnp.finfo(b.dtype).tiny

    def body(_, carry):
        z, r, p, rho = carry
        Ap = A @ p
        denom = p @ Ap
        alpha = rho / jnp.where(jnp.abs(denom) > tiny, denom, tiny)
        z = z + alpha * p
        r = r - alpha * Ap
        rho_new = r @ r
        beta = rho_new / jnp.where(rho > tiny, rho, tiny)
        p = r + beta * p
        return z, r, p, rho_new

    z0 = jnp.zeros_like(b)
    z, _, _, _ = lax.fori_loop(0, n_iter, body, (z0, b, b, b @ b))
    return z


def _keep_solve_x(w_x, u_x, M_x, keep, n_refine=2):
    """z = solve of M|keep z = u|keep against the EXACT projection
    M = V' Xn V, restricted to the kept modes.

    The ladder basis is NOT a perfect eigenbasis: near-degenerate pairs
    (values within ~3x) retain O(1)-couplings that no f32-eigh-based
    rotation can reliably remove (the eigh backward error re-injects
    them).  That is fine — chi^2 = btWb - u' M^-1|keep u is invariant
    under any rotation WITHIN the kept subspace, so solving the coupled
    system exactly replaces a perfect eigenbasis.  The solve runs CG on
    the diagonally-scaled f32 system (unit diagonal, scaled couplings
    <~ 0.8 -> converges where Richardson diverges), wrapped in exact-
    residual expansion refinement: each pass multiplies the accuracy by
    the f32 CG factor, reaching the ~1e-14 relative accuracy the
    btWb - S cancellation needs in two passes.

    MONOTONE GUARD: the iterate seeds at the DIAGONAL solve (what a
    perfect uncoupled eigenbasis would give) and a refinement pass is
    kept only if it SHRINKS the exact residual.  On healthy records
    every pass improves and the guard never fires; on the rare record
    whose kept set straddles the cutoff with a strongly coupled
    near-floor mode (scaled couplings >> 1 there -> CG diverges), the
    guard rejects the diverged passes instead of letting them feed the
    btWb - S cancellation garbage (observed once per ~1000 real-basis
    records as chi2 ~ -1e6; chi^2 is a weighted square sum and can
    never go negative)."""
    if _is_x64(u_x):
        # CPU/f64: direct kept-subspace solve.  M is exactly diagonal
        # when the basis came from a native f64 eigh, but ANCHORED
        # evaluations (anchor_chi2_x) shift M off-diagonal — solve the
        # coupled system (Galerkin: exact for any basis of the kept
        # subspace), identity-padding the dropped modes.
        Mh = M_x[0]
        n = Mh.shape[-1]
        km = keep[..., None, :] & keep[..., :, None]
        A = jnp.where(km, Mh, jnp.eye(n, dtype=Mh.dtype))
        rhs = jnp.where(keep, u_x[0], 0.0)
        z = jnp.linalg.solve(A, rhs[..., None])[..., 0]
        return (jnp.where(keep, z, 0.0),)
    d_hi = exp_hi(w_x)
    sd = jnp.sqrt(jnp.abs(jnp.where(keep, d_hi, 1.0)))
    sd = jnp.maximum(sd, jnp.finfo(sd.dtype).tiny)
    Mh = exp_hi(M_x)
    km = keep[..., None, :] & keep[..., :, None]
    n = d_hi.shape[-1]
    eyeM = jnp.eye(n, dtype=Mh.dtype)
    A32 = jnp.where(km, Mh / (sd[..., None, :] * sd[..., :, None]), eyeM)

    def resid(z_x):
        Mz = ozaki_mm(M_x, tuple(z[..., None] for z in z_x), nwords=2)
        Mz = tuple(w[..., 0] for w in Mz)
        r_x = exp_add(u_x, exp_neg(Mz), nwords=2)
        return tuple(jnp.where(keep, r, 0.0) for r in r_x)

    z_x = exp_renorm(list(_exp_div_masked(u_x, w_x, keep)), nwords=2)
    r_x = resid(z_x)
    rn = jnp.linalg.norm(exp_hi(r_x), axis=-1)
    for _ in range(n_refine + 1):
        rhs = jnp.where(keep, exp_hi(r_x) / sd, 0.0)
        y = _cg_f32(A32, rhs)
        dz = jnp.where(keep, y / sd, 0.0)
        z_new = exp_renorm(list(z_x) + [dz], nwords=2)
        r_new = resid(z_new)
        rn_new = jnp.linalg.norm(exp_hi(r_new), axis=-1)
        ok = rn_new <= rn
        z_x = tuple(jnp.where(ok, a, b) for a, b in zip(z_new, z_x))
        r_x = tuple(jnp.where(ok, a, b) for a, b in zip(r_new, r_x))
        rn = jnp.where(ok, rn_new, rn)
    return tuple(jnp.where(keep, z, 0.0) for z in z_x)


def chi2_from_eig_x(w_x, Vx, M_x, AtWb_x, btWb_x, s, aR_x=None,
                    atau_x=None):
    """Reference-cutoff chi^2 from ladder eigenpairs of X/s.

    Uses the cancellation-free identity (V orthonormal, u = V'AtWb,
    keep = |w| > eps64 max|w|, C = V z with z the kept-subspace solve):

        chi2 = btWb - u'z/s - C'(alpha R)C,

    which avoids the catastrophic C'AtWA C - 2 C'AtWb cancellation of the
    direct form (C carries 1/w amplification over ~16 decades).  Every
    term through the btWb - u'z/s cancellation is expansion-grade: u via
    Ozaki (deep modes have u ~ sqrt(w)), z from the Richardson-refined
    expansion solve against the exact M, the dot and the subtraction in
    exact two_sum cascades.

    ``aR_x``: expansion of alpha*R (the SAME regularization term inside
    X), or None for alpha = 0.  ``s``: the normalization scale of the
    eigenpairs (w_x in X/s units).  ``atau_x``: optional expansion of
    alpha*tau for data-informed regularization (rhs becomes AtWb +
    alpha tau; see final_solve_x)."""
    ub_x = ozaki_mm(_vxT(Vx), tuple(x[..., None] for x in AtWb_x), nwords=2)
    ub_x = tuple(w[..., 0] for w in ub_x)
    if atau_x is None:
        u_x = ub_x
    else:
        rhs_x = exp_add(AtWb_x, atau_x)
        u_x = ozaki_mm(_vxT(Vx), tuple(x[..., None] for x in rhs_x),
                       nwords=2)
        u_x = tuple(w[..., 0] for w in u_x)
    aw = jnp.abs(exp_hi(w_x))
    keep = aw > EPS64 * jnp.max(aw)
    z_x = _keep_solve_x(w_x, u_x, M_x, keep)
    S_x = xprec.exp_dot(ub_x, z_x, nwords=2)
    S_x = exp_scale_pow2(S_x, 1.0 / s)
    diff = exp_add(btWb_x, exp_neg(S_x), nwords=2)
    chi2 = diff[0]
    for wd in diff[1:]:
        chi2 = chi2 + wd
    if aR_x is not None or atau_x is not None:
        C = exp_hi(ozaki_mm(Vx, tuple(z[..., None] for z in z_x),
                            nwords=1))[..., 0] / s
        if atau_x is not None:
            chi2 = chi2 + C @ exp_hi(atau_x)
        if aR_x is not None:
            t = exp_hi(ozaki_mm(aR_x, (C[..., None],), nwords=1))[..., 0]
            chi2 = chi2 - C @ t
    return chi2


def cutoff_chi2_x(m, k, AtWA_x, AtWb_x, btWb_x, R_x):
    """chi^2 with X = AtWA + alpha R at alpha = m * 2^k (split scalar),
    under reference gelsd-cutoff semantics (interpolate.py:220-261)."""
    aR_x = exp_mul_split(R_x, m, k)
    Xx = exp_add(AtWA_x, aR_x)
    w_x, Vx, s, M_x = normalized_eigh_x(Xx)
    return chi2_from_eig_x(w_x, Vx, M_x, AtWb_x, btWb_x, s, aR_x=aR_x)


# ---------------------------------------------------------------------------
# anchored (M-shift) exact evaluations
# ---------------------------------------------------------------------------
#
# The expensive object in the exact search is the ladder eigendecomposition
# of X(alpha) = AtWA + alpha R.  But chi^2 itself never needs an eigenBASIS
# of X(alpha) — only (a) the EXACT projection M = V' X(alpha) V in SOME
# near-eigenbasis V (the coupling-aware _keep_solve_x solves the coupled
# kept-subspace system, and chi^2 is Galerkin/rotation-invariant there) and
# (b) eigenvalue ESTIMATES for the keep decision (diagonal of M, exact to
# first order in the residual couplings).  Given ONE full decomposition of
# X(alpha*) — the ANCHOR — the exact projection at ANY other alpha follows
# from a matrix shift, with NO eigh and NO full-size Ozaki product:
#
#     M(alpha) = M* + ((alpha - alpha*)/s*) P,      P = V*' R V*,
#
# where P is computed once per anchor (two Ozaki products) and the shift is
# elementwise expansion arithmetic.  Validity is a TRUST REGION in
# log10(alpha): the anchor basis stops near-diagonalizing X(alpha) when the
# drift couplings (|10^da - 1| relative, on regularization-dominated modes)
# grow past what the CG keep-solve absorbs (~0.8 scaled, with its monotone
# guard rejecting diverged passes).  Callers clip anchored evaluations to
# |da| <= ~0.2 and re-anchor (one boot ladder) to move farther — measured
# eigh cost on this TPU scales LINEARLY in batch (no latency to amortize),
# so replacing per-evaluation ladders with anchored shifts is the only way
# to cut the search's dominant cost (scripts/profile_exact.py receipts).


def make_anchor_x(a_log, eig, R_x, AtWb_x, tau_x=None):
    """Build an M-shift anchor from a full ladder decomposition ``eig`` =
    (w_x, Vx, s, M_x) of X(10^a_log) = AtWA + 10^a_log R (pass
    a_log = -inf for the pure-AtWA decomposition).  Returns the anchor
    pytree used by anchor_chi2_x / final_solve_anchor_x."""
    w_x, Vx, s, M_x = eig
    P_x = _project_x(R_x, Vx)  # raw R units, exact
    ub_x = ozaki_mm(_vxT(Vx), tuple(x[..., None] for x in AtWb_x), nwords=2)
    ub_x = tuple(w[..., 0] for w in ub_x)
    ut_x = None
    if tau_x is not None:
        ut_x = ozaki_mm(_vxT(Vx), tuple(x[..., None] for x in tau_x),
                        nwords=2)
        ut_x = tuple(w[..., 0] for w in ut_x)
    dt = exp_hi(M_x).dtype
    return {"a_log": jnp.asarray(a_log, dt), "Vx": Vx, "s": s, "M_x": M_x,
            "P_x": P_x, "ub_x": ub_x, "ut_x": ut_x}


def _anchor_shift_M(anchor, m, k):
    """Exact projection M(alpha)/s* = M* + ((alpha - alpha*)/s*) P at
    alpha = m * 2^k.  Pure elementwise expansion arithmetic."""
    if _is_x64(anchor["M_x"]):
        a_star = jnp.where(jnp.isneginf(anchor["a_log"]), 0.0,
                           10.0 ** anchor["a_log"])
        a = m * jnp.exp2(jnp.asarray(k, jnp.float64))
        return (anchor["M_x"][0]
                + ((a - a_star) / anchor["s"]) * anchor["P_x"][0],)
    m_s, k_s = pow10_split(anchor["a_log"])
    T_new = exp_mul_split(anchor["P_x"], m, k)
    T_old = exp_mul_split(anchor["P_x"], m_s, k_s)
    dT = exp_add(T_new, exp_neg(T_old), nwords=3)
    dT = exp_scale_pow2(dT, 1.0 / anchor["s"])
    return exp_add(anchor["M_x"], dT, nwords=3)


def _pow2_exp_i(s):
    """Integer exponent j of an exact power-of-two scale s = 2^j (f32
    log2 of an exact pow2 is exact).  Used to fold normalization-scale
    divisions into mul_pow2i exponent arithmetic: raw 1/s**2 UNDERFLOWS
    f32 on physical-unit records (measured s ~ 7e-21 -> s*s ~ 5e-41,
    denormal; the division then poisoned every anchored chi^2 with a
    2^34-grade garbage reg term on a real day)."""
    return jnp.round(jnp.log2(s)).astype(jnp.int32)


def anchor_chi2_x(anchor, a_log, btWb_x, n_refine=2):
    """Exact-cutoff chi^2 at alpha = 10^a_log from the anchor (NO eigh, no
    full-size product).  Reference semantics preserved: keep =
    |w| > eps64 * max|w| with w the exact Rayleigh diagonal of M(alpha);
    residual couplings are absorbed by the coupling-aware keep-solve
    exactly as in the laddered path (chi^2 is invariant under rotations
    within the kept subspace).  Valid inside the anchor's trust region.

    ``n_refine``: keep-solve refinement passes.  The default (2) is the
    full-accuracy contract; searches whose evaluations only steer a
    safeguarded bracket can pass 0 (one guarded CG pass — sign-grade,
    ~2.5x cheaper; see ops/regparam.N_REFINE_DEFECT receipts)."""
    m, k = pow10_split(a_log)
    M_x = _anchor_shift_M(anchor, m, k)
    w_x = tuple(jnp.diagonal(w, axis1=-2, axis2=-1) for w in M_x[:2])
    aw = jnp.abs(exp_hi(w_x))
    keep = aw > EPS64 * jnp.max(aw)
    if anchor["ut_x"] is None:
        u_x = anchor["ub_x"]
    else:
        at = exp_mul_split(anchor["ut_x"], m, k)
        u_x = exp_add(anchor["ub_x"], at, nwords=2)
    z_x = _keep_solve_x(w_x, u_x, M_x, keep, n_refine=n_refine)
    s = anchor["s"]
    S_x = xprec.exp_dot(anchor["ub_x"], z_x, nwords=2)
    S_x = exp_scale_pow2(S_x, 1.0 / s)
    diff = exp_add(btWb_x, exp_neg(S_x), nwords=2)
    chi2 = diff[0]
    for wd in diff[1:]:
        chi2 = chi2 + wd
    # - alpha C'RC (+ alpha C'tau), with C'RC = z'Pz / s^2 and
    # C'tau = z'ut / s — no need to materialize C.  The /s and /s^2 go
    # through mul_pow2i exponent arithmetic (see _pow2_exp_i).
    Pz = exp_hi(ozaki_mm(anchor["P_x"], tuple(z[..., None] for z in z_x),
                         nwords=1))[..., 0]
    zPz = exp_hi(z_x) @ Pz
    if zPz.dtype == jnp.float64:
        a_raw = m * jnp.exp2(jnp.asarray(k, jnp.float64))
        chi2 = chi2 - a_raw * zPz / (s * s)
        if anchor["ut_x"] is not None:
            zu = (exp_hi(z_x) @ exp_hi(anchor["ut_x"])) / s
            chi2 = chi2 + a_raw * zu
        return chi2
    j = _pow2_exp_i(s)
    chi2 = chi2 - mul_pow2i(m * zPz, k - 2 * j)
    if anchor["ut_x"] is not None:
        zu = exp_hi(z_x) @ exp_hi(anchor["ut_x"])
        chi2 = chi2 + mul_pow2i(m * zu, k - j)
    return chi2


_CLUSTER = _os.environ.get("VITPU_CLUSTER", "1") == "1"
_CLUSTER_WIN = 64   # cutoff-cluster window width (positions): must cover
# the dense near-cutoff wall real AMISR bases carry (~50 modes within two
# decades of the gelsd cutoff, PARITY_NOTES #9a); value-mask padding
# makes the static width safe on sparse spectra


def _deflated_diag_x(M_x):
    """Second-order-corrected eigenvalue estimates from the exact
    projection M = V' X V:

        w_i ~ M_ii - sum_{j != i} M_ij^2 / (M_jj - M_ii)

    on reliably-separated pairs (>= ~3x value ratio, the FO gate's
    criterion).  The ladder basis carries irreducible FAR POLLUTION —
    each deep column overlaps every top mode at eta ~ 1e-7 (f32-eigh
    rotation grade) — whose AGGREGATE biases deep Rayleigh diagonals UP
    by sum_j eta^2 w_j ~ 90 modes x 1e-14 x w_top: measured 2-17x
    inflation of near-cutoff values on a dense-wall spectrum under the
    QDWH noise hook, straddling the keep decisions by ~10/96 modes.  No
    rotation pass can remove it (the couplings hide below every block
    eigh's noise floor), but the exact M RECORDS it — M_ij^2/(M_jj-M_ii)
    IS the pollution term, so subtracting it recovers the true
    eigenvalue to second order.  Near-pairs are skipped (their coupling
    is rotation-equivalent mixing the coupled keep-solve absorbs, and
    the denominator sign is unreliable there).

    Precision: M_ij entries (~1e-10 of scale) square to ~1e-20-grade
    corrections — f32 per-term accuracy leaves the correction's own
    error ~1e-7 RELATIVE, far inside the tolerance of every consumer
    (keep boundaries, covariance grading, solve seeds — all ~1e-3).
    Returns a 2-word expansion whose value is hi-word (f32) grade."""
    Mh = exp_hi(M_x)
    d = jnp.diagonal(Mh, axis1=-2, axis2=-1)
    n = d.shape[-1]
    eye = jnp.eye(n, dtype=bool)
    den = d[..., None, :] - d[..., :, None]  # den[i,j] = d_j - d_i
    ad = jnp.abs(d)
    reliable = jnp.abs(den) > 0.5 * (ad[..., None, :] + ad[..., :, None])
    tiny = jnp.finfo(Mh.dtype).tiny
    num = jnp.where(reliable & ~eye, Mh * Mh, 0.0)
    corr = jnp.sum(num / jnp.where(jnp.abs(den) > tiny, den, 1.0),
                   axis=-1)
    # CLAMP into [0, d] (sign-respecting): the far-pollution bias is
    # provably one-sided (a PSD Gram inflates |d|), so the correction may
    # only SHRINK the value toward zero.  An overshoot past zero would
    # hand downstream consumers (the 1/sqrt|w| covariance grading, the
    # keep boundary placement) a re-inflated magnitude — measured on
    # device as 1e4-grade field-variance errors before the clamp.
    h = d - corr
    h = jnp.clip(h, jnp.minimum(d, 0.0), jnp.maximum(d, 0.0))
    h = jnp.where(jnp.abs(h) < tiny, jnp.sign(d) * tiny, h)
    if _is_x64(M_x):
        return (h,)
    return (h, jnp.zeros_like(h))


def _cg_mat_f32(A, B, n_iter=_N_CG):
    """Multi-RHS variant of _cg_f32: fixed-iteration CG on a well-scaled
    SPD f32 system, all RHS columns advanced together."""
    tiny = jnp.finfo(B.dtype).tiny

    def body(_, carry):
        Z, R, P, rho = carry
        AP = A @ P
        denom = jnp.sum(P * AP, axis=-2)
        alpha = rho / jnp.where(jnp.abs(denom) > tiny, denom, tiny)
        Z = Z + alpha * P
        R = R - alpha * AP
        rho_new = jnp.sum(R * R, axis=-2)
        beta = rho_new / jnp.where(rho > tiny, rho, tiny)
        P = R + beta * P
        return Z, R, P, rho_new

    Z0 = jnp.zeros_like(B)
    Z, _, _, _ = lax.fori_loop(
        0, n_iter, body, (Z0, B, B, jnp.sum(B * B, axis=-2)))
    return Z


_CLUSTER_LEVELS = (1.0, 0.75, 0.5)  # mini-ladder block fractions of the
# window: each level re-eighs the |diag|-smallest fraction of the
# Schur-corrected block at its own scale (~4.5 decades per f32 eigh)


def _cluster_resolve_x(Vx, M_x, vecs=(), mats=()):
    """Cutoff-CLUSTER resolving pass (round 4, VERDICT r3 item 2).

    Real AMISR-basis normal matrices carry a dense wall of modes around
    the gelsd cutoff (PARITY_NOTES #9a) whose retention decides the
    keep-count straddle and dominates the per-coefficient dC error
    (PARITY_NOTES #8).  The ladder leaves two residuals there that bias
    every deep Rayleigh estimate UP (measured 2-6x at the cutoff on a
    dense-wall spectrum under the QDWH noise hook):

      (1) aggregate FAR POLLUTION — each deep column overlaps every top
          mode at eta ~ 1e-7 (f32-rotation grade), summing to
          sum_j eta^2 w_j ~ O(cutoff) on the diagonal;
      (2) within-wall O(1) mixing — the wall was last rotated by eighs
          whose block tops sit decades above it.

    The fix, validated step-by-step against f64 (scripts/probe_keep.py
    receipts; the f64 version of this extraction reproduces the f64
    oracle keep-set EXACTLY on the diagnostic spectrum):

      a. sort by DEFLATED diagonal estimates (_deflated_diag_x — the
         raw diagonal misplaces the boundary by its own bias);
      b. take ONE static window of _CLUSTER_WIN positions covering both
         cutoff boundaries (gelsd eps*max and pinv N*eps*max);
      c. SCHUR-COMPLEMENT the modes ABOVE the window out of the
         window's exact block: B_eff = B - M_bo M_oo^{-1} M_ob.  The
         diagonal-inverse shortcut measures as NO-OP — the outside
         modes are strongly coupled among themselves, so M_oo^{-1} must
         be a real solve: masked diagonally-scaled f32 CG wrapped in
         one exact-residual expansion refinement (same recipe as
         _keep_solve_x);
      d. run a small deflation mini-LADDER on B_eff (f32 eighs of the
         |diag|-smallest fraction at its own scale, exact expansion
         updates of B_eff, re-sorting between levels);
      e. keep estimates = deflated diagonal of the final B_eff —
         returned as ``w_est`` for the callers' keep decisions — and
         the composite window rotation is applied to V, M, projected
         vectors (u = V'rhs) and projected matrices (P = V'RV) through
         exact skinny Ozaki products, so the coupled keep-solve and the
         covariance sandwich operate in the resolved basis.

    Returns (Vx, M_x, vecs, mats, w_est); w_est is a 2-word expansion
    of per-mode eigenvalue estimates aligned with the returned
    (permuted) column order, or None when the pass is skipped.  f64
    (CPU oracle) inputs pass through untouched — the native eigh is
    exact and M is already diagonal."""
    if _is_x64(M_x) or not _CLUSTER:
        return Vx, M_x, vecs, mats, None
    n = M_x[0].shape[-1]
    win = min(_CLUSTER_WIN, n)
    d_hi = exp_hi(_deflated_diag_x(M_x))
    order = jnp.argsort(jnp.abs(d_hi))
    Vx = tuple(jnp.take(w, order, axis=-1) for w in Vx)
    M_x = tuple(jnp.take(jnp.take(w, order, axis=-1), order, axis=-2)
                for w in M_x)
    vecs = tuple(tuple(jnp.take(w, order, axis=-1) for w in v)
                 for v in vecs)
    mats = tuple(tuple(jnp.take(jnp.take(w, order, axis=-1), order,
                                axis=-2) for w in P) for P in mats)
    aw = jnp.take(jnp.abs(d_hi), order)
    wmax = jnp.max(aw)
    tiny = jnp.finfo(wmax.dtype).tiny
    ncut_C = jnp.sum(aw <= EPS64 * wmax).astype(jnp.int32)
    ncut_H = jnp.sum(aw <= float(n) * EPS64 * wmax).astype(jnp.int32)
    s0 = jnp.clip(ncut_H + 8 - win, 0, n - win)
    s0 = jnp.minimum(s0, jnp.clip(ncut_C - 8, 0, n - win))
    z0 = jnp.zeros((), jnp.int32)

    # --- Schur complement of the modes above the window -----------------
    idx = jnp.arange(n, dtype=jnp.int32)
    outm = idx >= s0 + win
    out2 = outm[..., :, None] & outm[..., None, :]
    Mh = exp_hi(M_x)
    draw = jnp.diagonal(Mh, axis1=-2, axis2=-1)
    Dsc = jnp.where(outm,
                    1.0 / jnp.sqrt(jnp.maximum(jnp.abs(draw), tiny)), 0.0)
    eyeN = jnp.eye(n, dtype=Mh.dtype)
    A32 = jnp.where(out2, Dsc[..., :, None] * Mh * Dsc[..., None, :], eyeN)
    Moo_x = tuple(jnp.where(out2, w, 0.0) for w in M_x)
    RHS_x = tuple(
        jnp.where(outm[..., :, None],
                  lax.dynamic_slice(w, (z0, s0), (n, win)), 0.0)
        for w in M_x)
    Z_x = None
    r_x = RHS_x
    for _ in range(2):  # f32 CG + one exact-residual refinement pass
        y = _cg_mat_f32(A32, Dsc[..., :, None] * exp_hi(r_x))
        dZ = Dsc[..., :, None] * y
        Z_x = (dZ,) if Z_x is None else exp_renorm(list(Z_x) + [dZ],
                                                   nwords=2)
        Mz = ozaki_mm(Moo_x, Z_x, nwords=2, maxpq=_LADDER_MAXPQ)
        r_x = exp_add(RHS_x, exp_neg(Mz), nwords=2)
    Mbo_x = tuple(
        jnp.where(outm[..., None, :],
                  lax.dynamic_slice(w, (s0, z0), (win, n)), 0.0)
        for w in M_x)
    corr_x = ozaki_mm(Mbo_x, Z_x, nwords=3, maxpq=_LADDER_MAXPQ)
    Mb_x = tuple(lax.dynamic_slice(w, (s0, s0), (win, win)) for w in M_x)
    B_x = exp_add(Mb_x, exp_neg(corr_x), nwords=3)
    B_x = tuple(0.5 * (w + jnp.swapaxes(w, -1, -2)) for w in B_x)

    # --- mini deflation ladder on the Schur-corrected block -------------
    Qw = jnp.eye(win, dtype=Mh.dtype)
    for frac in _CLUSTER_LEVELS:
        blk = max(1, int(round(win * frac)))
        db = jnp.diagonal(exp_hi(B_x), axis1=-2, axis2=-1)
        ob = jnp.argsort(jnp.abs(db))
        B_x = tuple(jnp.take(jnp.take(w, ob, axis=-1), ob, axis=-2)
                    for w in B_x)
        Qw = jnp.take(Qw, ob, axis=-1)
        Bb = tuple(w[..., :blk, :blk] for w in B_x)
        dbb = jnp.abs(jnp.diagonal(exp_hi(Bb), axis1=-2, axis2=-1))
        sc = xprec._pow2_scale(jnp.maximum(jnp.max(dbb), tiny)[None])[0]
        _, Qb = _block_eigh_f32(exp_hi(exp_scale_pow2(Bb, 1.0 / sc)))
        # columns then rows, exact
        Bc = ozaki_mm(tuple(w[..., :, :blk] for w in B_x), (Qb,),
                      nwords=3, maxpq=_LADDER_MAXPQ)
        B_x = tuple(lax.dynamic_update_slice(w, c, (z0, z0))
                    for w, c in zip(B_x, Bc))
        Br = ozaki_mm((Qb.T,), tuple(w[..., :blk, :] for w in B_x),
                      nwords=3, maxpq=_LADDER_MAXPQ)
        B_x = tuple(lax.dynamic_update_slice(w, r, (z0, z0))
                    for w, r in zip(B_x, Br))
        Qw = Qw.at[..., :, :blk].set(Qw[..., :, :blk] @ Qb)
    west_x = _deflated_diag_x(B_x)

    # --- apply the composite window rotation to V, M, vecs, mats --------
    Vs = tuple(lax.dynamic_slice(w, (z0, s0), (n, win)) for w in Vx)
    Vw = ozaki_mm(Vs, (Qw,), nwords=2, maxpq=_LADDER_MAXPQ_V)
    Vx = tuple(lax.dynamic_update_slice(w, vw, (z0, s0))
               for w, vw in zip(Vx, Vw))
    Ms = tuple(lax.dynamic_slice(w, (z0, s0), (n, win)) for w in M_x)
    Mc = ozaki_mm(Ms, (Qw,), nwords=3, maxpq=_LADDER_MAXPQ)
    M_x = tuple(lax.dynamic_update_slice(w, mc, (z0, s0))
                for w, mc in zip(M_x, Mc))
    Mt = tuple(lax.dynamic_slice(w, (s0, z0), (win, n)) for w in M_x)
    Mr = ozaki_mm((Qw.T,), Mt, nwords=3, maxpq=_LADDER_MAXPQ)
    M_x = tuple(lax.dynamic_update_slice(w, mr, (s0, z0))
                for w, mr in zip(M_x, Mr))
    new_vecs = []
    for v in vecs:
        us = tuple(lax.dynamic_slice(w, (s0,), (win,))[..., None]
                   for w in v)
        un = ozaki_mm((Qw.T,), us, nwords=2)
        un = tuple(w[..., 0] for w in un)
        new_vecs.append(tuple(lax.dynamic_update_slice(w, x, (s0,))
                              for w, x in zip(v, un)))
    vecs = tuple(new_vecs)
    new_mats = []
    for P in mats:
        Ps = tuple(lax.dynamic_slice(w, (z0, s0), (n, win)) for w in P)
        Pc = ozaki_mm(Ps, (Qw,), nwords=3, maxpq=_LADDER_MAXPQ)
        P = tuple(lax.dynamic_update_slice(w, pc, (z0, s0))
                  for w, pc in zip(P, Pc))
        Pt = tuple(lax.dynamic_slice(w, (s0, z0), (win, n)) for w in P)
        Pr = ozaki_mm((Qw.T,), Pt, nwords=3, maxpq=_LADDER_MAXPQ)
        P = tuple(lax.dynamic_update_slice(w, pr, (s0, z0))
                  for w, pr in zip(P, Pr))
        new_mats.append(P)
    mats = tuple(new_mats)

    # keep estimates: deflated diagonal of the rotated M everywhere,
    # overridden on the window by the mini-ladder's resolved values
    w_est = _deflated_diag_x(M_x)
    pad = len(w_est) - len(west_x)
    west_full = tuple(west_x) + tuple(
        jnp.zeros_like(west_x[0]) for _ in range(pad))
    w_est = tuple(lax.dynamic_update_slice(w, e, (s0,))
                  for w, e in zip(w_est, west_full[:len(w_est)]))
    return Vx, M_x, vecs, mats, w_est


def _cluster_keep_estimates_x(M_x):
    """ESTIMATE-ONLY sibling of _cluster_resolve_x: resolved near-cutoff
    eigenvalue estimates, returned ALIGNED WITH THE ORIGINAL column
    order, with the basis untouched.

    Consumers that only need better KEEP decisions (the GCV objective's
    keep-knee placement, PARITY_NOTES #6 round-5 addendum) get the
    Schur-complemented mini-ladder values without the composite window
    rotation — within-wall mode mixing is then absorbed by their coupled
    kept-block inverses (the same Galerkin argument as _keep_solve_x).
    Window estimates map back to pre-ladder slots through each final
    column's DOMINANT |Qw| row (exact under pure permutations; within a
    degenerate cluster the values are mask-equivalent anyway).

    Returns a 2-word expansion, or None when the pass is disabled/f64."""
    if _is_x64(M_x) or not _CLUSTER:
        return None
    n = M_x[0].shape[-1]
    win = min(_CLUSTER_WIN, n)
    d_x = _deflated_diag_x(M_x)
    d_hi = exp_hi(d_x)
    order = jnp.argsort(jnp.abs(d_hi))
    M_x = tuple(jnp.take(jnp.take(w, order, axis=-1), order, axis=-2)
                for w in M_x)
    aw = jnp.take(jnp.abs(d_hi), order)
    wmax = jnp.max(aw)
    tiny = jnp.finfo(wmax.dtype).tiny
    ncut_C = jnp.sum(aw <= EPS64 * wmax).astype(jnp.int32)
    ncut_H = jnp.sum(aw <= float(n) * EPS64 * wmax).astype(jnp.int32)
    s0 = jnp.clip(ncut_H + 8 - win, 0, n - win)
    s0 = jnp.minimum(s0, jnp.clip(ncut_C - 8, 0, n - win))
    z0 = jnp.zeros((), jnp.int32)

    # Schur complement of the modes above the window (see the sibling)
    idx = jnp.arange(n, dtype=jnp.int32)
    outm = idx >= s0 + win
    out2 = outm[..., :, None] & outm[..., None, :]
    Mh = exp_hi(M_x)
    draw = jnp.diagonal(Mh, axis1=-2, axis2=-1)
    Dsc = jnp.where(outm,
                    1.0 / jnp.sqrt(jnp.maximum(jnp.abs(draw), tiny)), 0.0)
    eyeN = jnp.eye(n, dtype=Mh.dtype)
    A32 = jnp.where(out2, Dsc[..., :, None] * Mh * Dsc[..., None, :], eyeN)
    Moo_x = tuple(jnp.where(out2, w, 0.0) for w in M_x)
    RHS_x = tuple(
        jnp.where(outm[..., :, None],
                  lax.dynamic_slice(w, (z0, s0), (n, win)), 0.0)
        for w in M_x)
    Z_x = None
    r_x = RHS_x
    for _ in range(2):
        y = _cg_mat_f32(A32, Dsc[..., :, None] * exp_hi(r_x))
        dZ = Dsc[..., :, None] * y
        Z_x = (dZ,) if Z_x is None else exp_renorm(list(Z_x) + [dZ],
                                                   nwords=2)
        Mz = ozaki_mm(Moo_x, Z_x, nwords=2, maxpq=_LADDER_MAXPQ)
        r_x = exp_add(RHS_x, exp_neg(Mz), nwords=2)
    Mbo_x = tuple(
        jnp.where(outm[..., None, :],
                  lax.dynamic_slice(w, (s0, z0), (win, n)), 0.0)
        for w in M_x)
    corr_x = ozaki_mm(Mbo_x, Z_x, nwords=3, maxpq=_LADDER_MAXPQ)
    Mb_x = tuple(lax.dynamic_slice(w, (s0, s0), (win, win)) for w in M_x)
    B_x = exp_add(Mb_x, exp_neg(corr_x), nwords=3)
    B_x = tuple(0.5 * (w + jnp.swapaxes(w, -1, -2)) for w in B_x)

    # mini deflation ladder (values only; Qw tracked for the map-back)
    Qw = jnp.eye(win, dtype=Mh.dtype)
    for frac in _CLUSTER_LEVELS:
        blk = max(1, int(round(win * frac)))
        db = jnp.diagonal(exp_hi(B_x), axis1=-2, axis2=-1)
        ob = jnp.argsort(jnp.abs(db))
        B_x = tuple(jnp.take(jnp.take(w, ob, axis=-1), ob, axis=-2)
                    for w in B_x)
        Qw = jnp.take(Qw, ob, axis=-1)
        Bb = tuple(w[..., :blk, :blk] for w in B_x)
        dbb = jnp.abs(jnp.diagonal(exp_hi(Bb), axis1=-2, axis2=-1))
        sc = xprec._pow2_scale(jnp.maximum(jnp.max(dbb), tiny)[None])[0]
        _, Qb = _block_eigh_f32(exp_hi(exp_scale_pow2(Bb, 1.0 / sc)))
        Bc = ozaki_mm(tuple(w[..., :, :blk] for w in B_x), (Qb,),
                      nwords=3, maxpq=_LADDER_MAXPQ)
        B_x = tuple(lax.dynamic_update_slice(w, c, (z0, z0))
                    for w, c in zip(B_x, Bc))
        Br = ozaki_mm((Qb.T,), tuple(w[..., :blk, :] for w in B_x),
                      nwords=3, maxpq=_LADDER_MAXPQ)
        B_x = tuple(lax.dynamic_update_slice(w, r, (z0, z0))
                    for w, r in zip(B_x, Br))
        Qw = Qw.at[..., :, :blk].set(Qw[..., :, :blk] @ Qb)
    west_x = _deflated_diag_x(B_x)
    # pre-ladder window slot j's estimate: the final column whose Qw
    # weight on slot j dominates
    dom = jnp.argmax(jnp.abs(Qw), axis=-1)  # [win]: slot j -> final col
    west_x = tuple(jnp.take(w, dom, axis=-1) for w in west_x)

    # full-length estimates in SORTED order: outside = deflated diag,
    # window slots overridden by the resolved values
    base = tuple(jnp.take(w, order, axis=-1) for w in d_x)
    pad = len(base) - len(west_x)
    west_full = tuple(west_x) + tuple(
        jnp.zeros_like(west_x[0]) for _ in range(pad))
    w_sorted = tuple(lax.dynamic_update_slice(w, e, (s0,))
                     for w, e in zip(base, west_full[:len(base)]))
    inv = jnp.argsort(order)
    return tuple(jnp.take(w, inv, axis=-1) for w in w_sorted)


def _cov_sandwich_x(Vx, w_hi, M_x, AtWA_x, s, keep_H, coupled=True):
    """Overflow-safe f32 covariance dC = H AtWA H, H = pinv-cutoff inverse
    of X = s (V M V') restricted to ``keep_H`` (reference semantics:
    interpolate.py:465-466 with scipy.linalg.pinv's N*eps cutoff).

    Returns dC as a TWO-WORD f32 expansion stacked on axis -3
    ([..., 2, n, n]); combine on host with ops.fit.cov_to_f64.

    The naive normalized-units sandwich Minv G Minv forms intermediates
    ~1/w^2 (up to 1e27 at the pinv cutoff) that OVERFLOW f32 after the
    1/s unscale and amplify f32 matmul noise by the same factor —
    measured on a production-order day (round 3): 49% of saved dC
    diagonal entries NEGATIVE, magnitudes clamped at f32-max, and
    Estimate(calcerr=True) NaN.  Fix: grade symmetrically by
    y = 1/sqrt(|w|) (bounded by 1/sqrt(n eps) ~ 6e6), so with
    B = V diag(y), Ms = diag(y) M diag(y) (unit |diagonal|),
    Gs = diag(y) (V' AtWA/s V) diag(y):

        dC = B [Ms^-1|keep Gs Ms^-1|keep] B' / s,

    where every f32 matmul operand is O(1)-graded (Gs deep diagonal ~ 1)
    or y-bounded, intermediates stay far inside f32 range, and the
    middle projection G is computed EXACTLY (Ozaki) so its deep entries
    (~n eps of scale) are signal, not f32 matmul noise.  Measured vs the
    f64 oracle (scripts/probe_dc.py): diagonal and predicted field
    variance relative error at the f32 representation floor.

    ``coupled``: invert the kept BLOCK of M (anchor bases are not
    eigenbases — Galerkin, same as _keep_solve_x); False uses the
    diagonal inverse (true eigenbasis path).  f64 (CPU) callers keep
    their native formulas — this helper is the f32 path only."""
    n = w_hi.shape[-1]
    aw = jnp.abs(w_hi)
    tiny = jnp.finfo(w_hi.dtype).tiny
    y = jnp.where(keep_H, 1.0 / jnp.sqrt(jnp.maximum(aw, tiny)), 0.0)
    V = exp_hi(Vx)
    # FULL chunk budget (maxpq=8) here, not the ladder budgets: Gs
    # divides G by w down to the keep_H floor (n eps ~ 1e-14 of scale),
    # so the first DROPPED chunk diagonal sets the relative leak there —
    # measured ~2^-55 absolute at maxpq=6 -> 2e-4 relative on the
    # deepest kept diagonal (tests/test_cov.py receipts); maxpq=8 puts
    # the floor at ~2^-71.  Two products once per record: cheap.
    AtWA_nx = exp_scale_pow2(AtWA_x, 1.0 / s)
    T_x = ozaki_mm(AtWA_nx, Vx, nwords=2)
    G_x = ozaki_mm(_vxT(Vx), T_x, nwords=1)
    Gs = exp_hi(G_x) * y[..., :, None] * y[..., None, :]
    if coupled:
        Ms = exp_hi(M_x) * y[..., :, None] * y[..., None, :]
        eyeM = jnp.eye(n, dtype=Ms.dtype)
        kmH = keep_H[..., None, :] & keep_H[..., :, None]
        Msi = jnp.linalg.inv(jnp.where(kmH, Ms, eyeM))
        Msi = jnp.where(kmH, Msi, 0.0)
        Hs = Msi @ Gs @ Msi
    else:
        sgn = jnp.where(keep_H, jnp.sign(w_hi), 0.0)
        Hs = (sgn[..., :, None] * Gs) * sgn[..., None, :]
    # The B-sandwich legs need EXACT ACCUMULATION (Ozaki), not exact
    # factors, AND the result needs TWO f32 words: dC's entries span ~13
    # decades (deep kept modes carry 1/w^2 up to 1e32 while
    # well-determined pairs sit at 1e19), and the product metric — the
    # predicted field variance diag(A dC A'), estimate.py:109 — cancels
    # ~11 of them (measured on a real-basis day record: gross
    # sum|a_i a_j dC_ij| 1.5e31 vs net 1.3e20).  Per-entry noise at
    # 2^-24 (ONE f32 word — even with every internal stage exact)
    # breaks that cancellation by 300x; at 2^-48 (two words) it
    # contributes 4e-5.  Every internal FACTOR can stay plain f32:
    # casting Gs, Msi, Hs, or B to f32 entries individually moves the
    # field-variance error only to <= 3.4e-4 (round-4 stage bisect,
    # /tmp receipts summarized in docs/PARITY_NOTES.md #8).  Hence: f32
    # factors, Ozaki exact accumulation, 2-word result, combined to
    # host f64 by ops.fit.cov_to_f64 (which also symmetrizes — a
    # device-side per-word symmetrization would itself round at f32).
    B_x = xprec.exp_mul_f32(Vx, y[..., None, :])
    T_x = ozaki_mm(B_x, (Hs,), nwords=2)
    dC_x = ozaki_mm(T_x, _vxT(B_x), nwords=2)
    mj = -_pow2_exp_i(s)
    return jnp.stack([mul_pow2i(w, mj) for w in dC_x], axis=-3)


def final_solve_anchor_x(anchor, a_log, AtWA_x, AtWb_x, btWb_x,
                         want_keep=False):
    """Coefficients, covariance and chi^2 at alpha = 10^a_log from the
    anchor (single-regularizer fast path of final_solve_x: same dual
    cutoffs, same cancellation-free chi^2 — but no fresh ladder; the
    search's last anchor is reused at its own root).  -inf encodes
    alpha = 0 (too-smooth early exit).

    ``want_keep``: additionally return (keep_C count, keep_H count) —
    receipts instrumentation (scripts/probe_keep.py)."""
    m, k = pow10_split(a_log)
    M_x = _anchor_shift_M(anchor, m, k)
    # cutoff-cluster pass: resolve the near-cutoff wall at its own scale
    # BEFORE the keep decisions (no-op on f64/CPU and on gated-sparse
    # records; see _cluster_resolve_x)
    vecs = (anchor["ub_x"],)
    if anchor["ut_x"] is not None:
        vecs = vecs + (anchor["ut_x"],)
    Vx, M_x, vecs, (P_x,), w_est = _cluster_resolve_x(
        anchor["Vx"], M_x, vecs=vecs, mats=(anchor["P_x"],))
    ub_x = vecs[0]
    ut_x = vecs[1] if anchor["ut_x"] is not None else None
    if w_est is None:
        w_x = tuple(jnp.diagonal(w, axis1=-2, axis2=-1) for w in M_x[:2])
    else:
        # keep decisions from the cluster pass's resolved estimates
        # (Schur-corrected mini-ladder + far-pollution deflation); the
        # coupled keep-solve and covariance sandwich keep the exact M
        w_x = w_est
    w_hi = exp_hi(w_x)
    aw = jnp.abs(w_hi)
    wmax = jnp.max(aw)
    n = w_hi.shape[-1]
    keep_C = aw > EPS64 * wmax
    keep_H = aw > float(n) * EPS64 * wmax
    u_x = ub_x
    if ut_x is not None:
        u_x = exp_add(u_x, exp_mul_split(ut_x, m, k), nwords=2)
    z_x = _keep_solve_x(w_x, u_x, M_x, keep_C)
    s = anchor["s"]
    is64 = exp_hi(M_x).dtype == jnp.float64
    j = None if is64 else _pow2_exp_i(s)
    C_raw = exp_hi(ozaki_mm(Vx, tuple(z[..., None] for z in z_x),
                            nwords=1))[..., 0]
    C = C_raw / s if is64 else mul_pow2i(C_raw, -j)
    # covariance — COUPLING-AWARE: the anchor basis is not an eigenbasis
    # of X(root), so H must invert the kept BLOCK of M, not its diagonal
    # (Galerkin: basis-invariant on the kept subspace; a diagonal inverse
    # leaves ~0.5% basis-drift noise in predicted field variances,
    # measured).  The f32 path grades by 1/sqrt|w| (_cov_sandwich_x):
    # the previous direct Minv G Minv sandwich overflowed f32 at
    # production scales and shipped +-f32-max garbage diagonals.
    if is64:
        V = exp_hi(Vx)
        Mh = exp_hi(M_x)
        nI = jnp.eye(n, dtype=Mh.dtype)
        kmH = keep_H[..., None, :] & keep_H[..., :, None]
        Minv = jnp.linalg.inv(jnp.where(kmH, Mh, nI))
        Minv = jnp.where(kmH, Minv, 0.0)
        VA = V.T if V.ndim == 2 else jnp.swapaxes(V, -1, -2)
        G = (VA @ (exp_hi(AtWA_x) / s)) @ V
        dC = (V @ (Minv @ G @ Minv) @ VA) / s
        dC = jnp.stack([dC, jnp.zeros_like(dC)], axis=-3)
    else:
        dC = _cov_sandwich_x(Vx, w_hi, M_x, AtWA_x, s, keep_H,
                             coupled=True)
    # chi^2 = btWb - z'ub/s - alpha z'Pz/s^2 + alpha z'ut/s
    S_x = xprec.exp_dot(ub_x, z_x, nwords=2)
    S_x = exp_scale_pow2(S_x, 1.0 / s)
    diff = exp_add(btWb_x, exp_neg(S_x), nwords=2)
    chi2 = diff[0]
    for wd in diff[1:]:
        chi2 = chi2 + wd
    Pz = exp_hi(ozaki_mm(P_x, tuple(z[..., None] for z in z_x),
                         nwords=1))[..., 0]
    zPz = exp_hi(z_x) @ Pz
    keep_counts = (jnp.sum(keep_C), jnp.sum(keep_H))
    if is64:
        a_raw = m * jnp.exp2(jnp.asarray(k, jnp.float64))
        chi2 = chi2 - a_raw * zPz / (s * s)
        if ut_x is not None:
            chi2 = chi2 + a_raw * (exp_hi(z_x) @ exp_hi(ut_x)) / s
        return (C, dC, chi2, keep_counts) if want_keep else (C, dC, chi2)
    chi2 = chi2 - mul_pow2i(m * zPz, k - 2 * j)
    if ut_x is not None:
        zu = exp_hi(z_x) @ exp_hi(ut_x)
        chi2 = chi2 + mul_pow2i(m * zu, k - j)
    return (C, dC, chi2, keep_counts) if want_keep else (C, dC, chi2)


def final_solve_x(AtWA_x, AtWb_x, btWb_x, reg_mats_x, reg_params,
                  reg_taus_x=None, boot_Vx=None):
    """Coefficients, covariance and chi^2 of one record's regularized fit
    (interpolate.py:432-469 eval_C with calccov=True, plus the chi^2 of
    interpolate.py:569), from expansion sufficient statistics.

    Matches the reference's SOLVER PAIR: C uses the gelsd cutoff
    (eps * max|w|), the covariance H uses scipy.linalg.pinv's cutoff
    (N * eps * max|w|) — reproducing the reference's own inconsistency
    (docs/PARITY_NOTES.md #8).

    reg_mats_x: expansion with leading [nreg, ...] axis; reg_params:
    [nreg] LOG10 alphas (raw alphas live down at 1e-50, far below f32
    range; -inf encodes alpha = 0).

    reg_taus_x: optional [nreg, nbasis] expansion of tau vectors for
    DATA-INFORMED regularization (the reference's IRI hint,
    sphharmlag.py:186,241-259): penalty alpha (C'RC - 2 tau'C), i.e. a
    pull toward the target profile with tau = R C_target.  The normal
    equations become (AtWA + sum alpha R) C = AtWb + sum alpha tau; the
    DATA chi^2 reported (and searched against nu) keeps its meaning.

    boot_Vx: optional expansion eigenbasis of AtWA (from the chi2
    search's shared fresh ladder) — the final solve happens AT the
    search's root, exactly where the search's own bootstrapped
    evaluations ran all day, so the boot ladder is as valid here as it
    was there and the n-size f32 eigh plus all deflation levels are
    skipped.
    """
    nreg = reg_mats_x[0].shape[0]
    Xx = AtWA_x
    rhs_x = AtWb_x
    aR_sum = None
    ataus = []  # (m, k, tau_i) splits for the chi2 correction terms
    for i in range(nreg):
        R_i = tuple(wd[i] for wd in reg_mats_x)
        m, k = pow10_split(reg_params[i])
        aR_i = exp_mul_split(R_i, m, k)
        aR_sum = aR_i if aR_sum is None else exp_add(aR_sum, aR_i)
        Xx = exp_add(Xx, aR_i)
        if reg_taus_x is not None:
            tau_i = tuple(wd[i] for wd in reg_taus_x)
            rhs_x = exp_add(rhs_x, exp_mul_split(tau_i, m, k))
    if boot_Vx is not None:
        w_x, Vx, s, M_x = normalized_eigh_boot_x(Xx, boot_Vx)
    else:
        w_x, Vx, s, M_x = normalized_eigh_x(Xx)
    # cutoff-cluster pass before the keep decisions (no-op on f64; see
    # _cluster_resolve_x); u is computed from the rotated basis below
    Vx, M_x, _, _, w_est = _cluster_resolve_x(Vx, M_x)
    if w_est is not None:
        w_x = w_est
    n = w_x[0].shape[-1]
    u_x = ozaki_mm(_vxT(Vx), tuple(x[..., None] for x in rhs_x), nwords=2)
    u_x = tuple(w[..., 0] for w in u_x)
    w_hi = exp_hi(w_x)
    aw = jnp.abs(w_hi)
    wmax = jnp.max(aw)
    keep_C = aw > EPS64 * wmax
    keep_H = aw > float(n) * EPS64 * wmax
    z_x = _keep_solve_x(w_x, u_x, M_x, keep_C)
    C = exp_hi(ozaki_mm(Vx, tuple(z[..., None] for z in z_x),
                        nwords=1))[..., 0] / s
    V = exp_hi(Vx)
    # dC = H AtWA H with H = V diag(1/w)|keep_H V' / s.  CPU/f64 keeps
    # the direct form; the f32 path must grade by 1/sqrt|w|
    # (_cov_sandwich_x): the direct form both OVERFLOWS (s*s underflows
    # f32 outright at physical scales — s ~ 7e-21) and amplifies f32
    # matmul noise by 1/w^2.  The anchor basis here comes from a ladder
    # (true near-eigenbasis after the boot tail), but near-degenerate
    # kept pairs still carry O(1) couplings — invert the kept block
    # (coupled=True), same Galerkin argument as _keep_solve_x.
    if _is_x64(AtWA_x):
        inv_w_H = jnp.where(keep_H, 1.0 / jnp.where(keep_H, w_hi, 1.0),
                            0.0)
        VA = V.T @ exp_hi(AtWA_x)  # [n, n]
        G = (VA @ V)               # V' AtWA V
        Hmid = (inv_w_H[:, None] * G) * inv_w_H[None, :]
        dC = (V @ Hmid @ V.T) / (s * s)
        dC = jnp.stack([dC, jnp.zeros_like(dC)], axis=-3)
    else:
        dC = _cov_sandwich_x(Vx, w_hi, M_x, AtWA_x, s, keep_H,
                             coupled=True)
    # chi^2 via the cancellation-free identity, expansion-grade through
    # the btWb - S cancellation: chi2 = btWb - z'u_b/s + sum_i alpha_i
    # tau_i'C - C'(sum alpha R)C, with u_b = V'AtWb (= u when no taus)
    if reg_taus_x is None:
        ub_x = u_x
    else:
        ub_x = ozaki_mm(_vxT(Vx), tuple(x[..., None] for x in AtWb_x),
                        nwords=2)
        ub_x = tuple(w[..., 0] for w in ub_x)
    S_x = xprec.exp_dot(ub_x, z_x, nwords=2)
    S_x = exp_scale_pow2(S_x, 1.0 / s)
    diff = exp_add(btWb_x, exp_neg(S_x), nwords=2)
    chi2 = diff[0]
    for wd in diff[1:]:
        chi2 = chi2 + wd
    if reg_taus_x is not None:
        for i in range(nreg):
            m, k = pow10_split(reg_params[i])
            tau_i = exp_hi(tuple(wd[i] for wd in reg_taus_x))
            chi2 = chi2 + mul_pow2i(m * (C @ tau_i), k)
    if aR_sum is not None:
        t = exp_hi(ozaki_mm(aR_sum, (C[..., None],), nwords=1))[..., 0]
        chi2 = chi2 - C @ t
    return C, dC, chi2


# ---------------------------------------------------------------------------
# plain-array compatibility surface (library methods, CPU oracle tests)
# ---------------------------------------------------------------------------

def _plain_to_x(X):
    """Wrap a plain array as an expansion: 1-word f64 on CPU; on TPU a
    plain 'f64' array is already f32-grade (no f64 exists), so it becomes
    a 1-word f32 expansion — the library surface is documented f32-grade
    on TPU, the production pipeline passes host-split expansions."""
    if X.dtype == jnp.float64 and jax.default_backend() != "tpu":
        return (X,)
    return (X.astype(jnp.float32),)


def sym_pinv_apply(X, y, rcond_factor=None, want_H=True, rcond_factor_H=None):
    """Min-norm solve C = pinv(X) @ y for symmetric X, plus pinv(X), with
    the reference's dual cutoffs (gelsd eps*max for C, pinv N*eps*max for
    H) — see final_solve_x."""
    n = X.shape[-1]
    eps = EPS64
    if rcond_factor is None:
        rcond_factor = eps
    if rcond_factor_H is None:
        rcond_factor_H = float(n) * eps
    Xx = _plain_to_x(X)
    w_x, Vx, s, _ = normalized_eigh_x(Xx)
    w = (exp_hi(w_x) * s).astype(X.dtype)
    V = exp_hi(Vx).astype(X.dtype)
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
    """Reference-cutoff chi^2 from plain eigenpairs (w, V) of
    X = AtWA + a R (library/test surface; CPU-grade arrays)."""
    eps = EPS64
    V = V.astype(AtWA.dtype)
    w = w.astype(AtWA.dtype)
    aw = jnp.abs(w)
    keep = aw > eps * jnp.max(aw)
    u = V.T @ AtWb
    C = V @ jnp.where(keep, u / w, 0.0)
    return C @ (AtWA @ C) - 2.0 * (C @ AtWb) + btWb


def cutoff_chi2(a, AtWA, AtWb, btWb, R):
    """chi^2 of the fit with X = AtWA + a R under REFERENCE solve
    semantics (interpolate.py:220-261), plain-array surface."""
    X = AtWA + a * R
    C, _ = sym_pinv_apply(X, AtWb, want_H=False)
    return C @ (AtWA @ C) - 2.0 * (C @ AtWb) + btWb


def normalized_eigh(X, refine="ladder"):
    """Plain-array ladder eigendecomposition: (w, V, s) with w on the
    ORIGINAL scale (callers on the library surface; the expansion
    pipeline uses normalized_eigh_x).  refine='rayleigh' gives the cheap
    f32+Rayleigh decomposition used by the fast-mode pencil whitening."""
    n = X.shape[-1]
    if refine == "rayleigh" and jax.default_backend() == "tpu":
        s = jnp.trace(X) / n
        s = jnp.where(jnp.abs(s) > 0, jnp.abs(s), 1.0)
        Xn = X / s
        w32, V32 = jnp.linalg.eigh(Xn.astype(jnp.float32))
        V = V32.astype(X.dtype)
        tiny = jnp.finfo(X.dtype).tiny
        num = jnp.einsum("...ij,...ik,...kj->...j", V, Xn, V)
        den = jnp.maximum(jnp.einsum("...ij,...ij->...j", V, V), tiny)
        return (num / den) * s, V, s
    w_x, Vx, s, _ = normalized_eigh_x(_plain_to_x(X))
    return ((exp_hi(w_x) * s).astype(X.dtype), exp_hi(Vx).astype(X.dtype),
            s)


def final_solve(AtWA, AtWb, btWb, reg_mats, reg_params):
    """Plain-array final solve (library surface / CPU path); the
    expansion pipeline uses final_solve_x."""
    X = AtWA
    if reg_mats.shape[0] > 0:
        X = X + jnp.tensordot(reg_params, reg_mats, axes=1)
    C, H = sym_pinv_apply(X, AtWb)
    dC = H @ AtWA @ H
    chi2 = C @ (AtWA @ C) - 2.0 * (C @ AtWb) + btWb
    return C, dC, chi2


# ---------------------------------------------------------------------------
# fast-path pencil whitening (f32-grade by design: jitter semantics)
# ---------------------------------------------------------------------------

def whiten_pencil(AtWA, R, jitter_rel=1e-12, eig_AtWA=None):
    """One-time whitening of the pencil (AtWA, R) for O(n) alpha scans.

    Eigendecomposition-based: with AtWA = V W V', define B^{-1} =
    W~^{-1/2} V' (W~ clipped at jitter_rel * max W), then G = B^{-1} R
    B^{-T} = Q Lam Q'.  The closed forms

        chi2(a) = sum u^2 [1/(1+a lam)^2 - 2/(1+a lam)] + btWb
        C(a)    = B^{-T} Q (I + a Lam)^{-1} u,   u = Q' B^{-1} AtWb

    make every alpha evaluation O(nbasis).  The clipping regularizes
    singular records (ridge limit == the reference's lstsq min-norm
    behaviour, since AtWb is orthogonal to null(AtWA)).  f32-grade
    throughout (documented jitter semantics, docs/PARITY_NOTES.md #7).

    Returns (lam [n], Q [n, n], Binv [n, n]).  ``eig_AtWA`` optionally
    supplies precomputed (w, V) of AtWA (RAW scale) to share the search's
    ladder decomposition."""
    n = AtWA.shape[-1]
    if eig_AtWA is None:
        w, V, _ = normalized_eigh(AtWA, refine="rayleigh")
    else:
        w, V = eig_AtWA
        V = V.astype(AtWA.dtype)
        w = w.astype(AtWA.dtype)
    wmax = jnp.max(jnp.abs(w))
    w_safe = jnp.maximum(w, jitter_rel * jnp.where(wmax > 0, wmax, 1.0))
    Binv = (w_safe[:, None] ** -0.5) * V.T  # [n, n]

    sR = jnp.trace(R) / n
    sR = jnp.where(jnp.abs(sR) > 0, jnp.abs(sR), 1.0)
    G = Binv @ (R / sR) @ Binv.T
    G = 0.5 * (G + G.T)
    sG = jnp.trace(jnp.abs(G * jnp.eye(n, dtype=G.dtype))) / n + 1e-300
    if jax.default_backend() == "tpu":
        w32, Q32 = jnp.linalg.eigh((G / sG).astype(jnp.float32))
        Q = Q32.astype(G.dtype)
        tiny = jnp.finfo(G.dtype).tiny
        num = jnp.einsum("ij,ik,kj->j", Q, G / sG, Q)
        den = jnp.maximum(jnp.einsum("ij,ij->j", Q, Q), tiny)
        lam = (num / den) * (sG * sR)
    else:
        lam, Q = jnp.linalg.eigh(G / sG)
        lam = lam * (sG * sR)
    return lam, Q, Binv


def whitened_chi2(a, lam, u, btWb):
    """chi^2 with X = AtWA + a R from whitened quantities (u = Q' B^{-1}
    AtWb): chi2(a) = sum u_i^2 (d_i^2 - 2 d_i) + btWb, d = 1/(1+a lam).
    Monotone non-decreasing in a for PSD R: bisection-safe."""
    d = 1.0 / (1.0 + a * lam)
    return jnp.sum(u * u * (d * d - 2.0 * d)) + btWb


def whitened_chi2_split(m, k, lam, u, btWb):
    """whitened_chi2 with alpha = m * 2^k (split scalar, f32-safe for the
    reference's 1e-100 grid floor)."""
    al = mul_pow2i(m * lam, k) if lam.dtype != jnp.float64 \
        else m * lam * jnp.exp2(jnp.asarray(k, jnp.float64))
    d = 1.0 / (1.0 + al)
    return jnp.sum(u * u * (d * d - 2.0 * d)) + btWb


def whitened_chi2_tau_split(m, k, lam, u, utau, btWb):
    """whitened_chi2_split with a data-informed target: rhs = AtWb +
    alpha tau, utau = Q' B^{-1} tau.  chi2(a) = btWb - 2 sum d u (u + a
    utau) + sum d^2 (u + a utau)^2, d = 1/(1 + a lam).  Collapses to
    whitened_chi2_split when utau = 0 (alpha utau flushes for the deep
    bracket grid)."""
    if lam.dtype == jnp.float64:
        a = m.astype(jnp.float64) * jnp.exp2(jnp.asarray(k, jnp.float64))
        al = a * lam
        ua = u + a * utau
    else:
        al = mul_pow2i(m * lam, k)
        ua = u + mul_pow2i(m * utau, k)
    d = 1.0 / (1.0 + al)
    return jnp.sum(d * ua * (d * ua - 2.0 * u)) + btWb


def whitened_solve(a, lam, Q, Binv, u):
    """C(a) = (AtWA + a R)^{-1} AtWb from whitened quantities."""
    d = 1.0 / (1.0 + a * lam)
    return Binv.T @ (Q @ (d * u))
