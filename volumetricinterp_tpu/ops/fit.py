"""End-to-end batched fit: records in, (C, dC, chi2) out.

The reference's serial per-record loop (interpolate.py:511-574) becomes one
vmapped, jit-compiled pipeline over a static-shape record batch:

    per record:  mask -> sufficient statistics -> pencil whitening ->
                 regularization-parameter search -> final solve -> chi^2

Records whose parameter search fails are NaN-filled, matching
interpolate.py:557-563.  The design matrix A is shared across records (the
beam geometry is file-level in AMISR data, interpolate.py:496,525) and is
computed once outside this module.

PRECISION: the reference runs in f64; this TPU has none (ops/xprec.py), so
the public entry point ``fit_records`` is a HOST wrapper that splits the
inputs into f32 expansions (exact, 3 words) before the jitted expansion
pipeline.  On CPU an expansion is one f64 word and the same code is the
plain f64 algorithm.  Regularization parameters travel device-side as
LOG10(alpha) (raw alphas reach 1e-50, far below f32 range) and are
converted to the reference's raw-alpha convention on the host.

Sharding: see parallel/fit.py for the mesh-parallel wrapper (records axis =
data parallel; measurement-point axis = psum-reduced partial normal
equations).
"""

from __future__ import annotations

import hashlib
from functools import partial

import numpy as np
import jax
import jax.numpy as jnp

from . import regparam, solve, xprec
from .solve import final_solve_x, suff_stats, suff_stats_x
from .xprec import exp_hi


def record_stats(values, errors, A):
    """Masked sufficient statistics of one record (NaN -> zero weight);
    plain-array library surface."""
    mask = jnp.isfinite(values).astype(A.dtype)
    W = jnp.where(mask > 0, errors, 1.0) ** (-2)
    b = jnp.where(mask > 0, values, 0.0)
    return suff_stats(A, b, W, mask)


def fit_from_stats_x(AtWA_x, AtWb_x, btWb_x, N, reg_mats_x, method: str,
                     manual_log_params=None, regparam_mode: str = "exact",
                     reg_taus_x=None, reg_eigR=None, boot_VA=None):
    """Fit one record from expansion sufficient statistics (chi2/manual
    methods; GCV needs per-point quantities, see fit_one_record_x).

    regparam_mode: 'exact' (default) uses the defect-corrected ladder
    search (ops/regparam.chi2_reg_param); 'exact_grid' the full 101-point
    grid scan (receipts baseline); 'fast' the O(nbasis)-per-alpha
    whitened search.

    reg_eigR: optional memoized ladder bases of the (fit-constant)
    regularization matrices — (VR_x words [nreg, nb, nb], sR [nreg]);
    see _reg_mats_eig.

    boot_VA: optional RECORD-INDEPENDENT starting basis for AtWA's ladder
    (the eigenbasis of the scale-normalized BATCH-MEAN statistics, one
    unbatched fresh ladder per dispatch — see _batch_mean_eig).  With it,
    each record's AtWA decomposition is a BOOT ladder (window sweep +
    grading tail; no n-size eigh, no five deflation-level eighs), cutting
    the measured per-dispatch fresh-ladder cost 297 -> ~155 ms at
    [128, 144, 144] (scripts/profile_exact.py, round 3).  Record-to-record
    drift (weight scatter, QC-mask dropouts) is exactly the class of
    perturbation the boot tail was built to absorb (ops/solve.py ladder
    notes); parity receipts: tests/test_ladder.py
    ::test_boot_from_batch_mean_basis + the day-scale oracle compare.

    Returns (C [nb], dC [2, nb, nb] 2-word expansion — see
    fit_records/cov_to_f64, chi2 [], log_alphas [nreg])."""
    dt = btWb_x[0].dtype
    nreg = reg_mats_x[0].shape[0]
    # In exact mode, AtWA's ladder decomposition is shared across every
    # regularization matrix's search AND the final solve (which
    # bootstraps from its eigenbasis): one n-size decomposition per
    # record instead of nreg + 2.
    eigA = None
    boot_Vx = None
    final_anchor = None
    if method == "chi2" and regparam_mode == "exact" and nreg > 0:
        if boot_VA is not None:
            eigA = solve.normalized_eigh_boot_x(AtWA_x, boot_VA)
        else:
            eigA = solve.normalized_eigh_x(AtWA_x)
        # Cutoff-cluster pass on the FRESH decomposition (round 5): the
        # chi2 search's floor evaluation, its X(1) endpoint, every
        # anchor boot and the final solve all inherit this basis, so
        # resolving the near-cutoff wall HERE fixes the whole chain —
        # the round-4 pass only resolved the final solve, leaving the
        # floor's keep decisions and stalled keep-solve to misplace the
        # reference nu-ladder rung on coupled-wall records (record 456
        # receipts, docs/PARITY_NOTES.md #4: rung sf=1.0 instead of
        # 0.7, root 10 decades off, negative reported chi^2).  No-op on
        # f64/CPU (the oracle path is untouched).
        wA_r, VA_r, MA_r, w_est = (eigA[0], eigA[1], eigA[3], None)
        VA_r, MA_r, _, _, w_est = solve._cluster_resolve_x(VA_r, MA_r)
        if w_est is not None:
            eigA = (w_est, VA_r, eigA[2], MA_r)
        boot_Vx = eigA[1]
    if nreg == 0:
        log_alphas = jnp.zeros((0,), dtype=dt)
    elif method in ("manual", "prompt"):
        log_alphas = jnp.asarray(manual_log_params, dtype=dt)
    elif method == "chi2":
        # reference semantics: each parameter solved with all others at
        # zero (interpolate.py:120-124, 246-252)
        def search(i, want_anchor=False):
            R_i = tuple(w[i] for w in reg_mats_x)
            tau_i = (None if reg_taus_x is None
                     else tuple(w[i] for w in reg_taus_x))
            if regparam_mode == "exact":
                eigR_i = (None if reg_eigR is None else
                          (tuple(w[i] for w in reg_eigR[0]),
                           reg_eigR[1][i]))
                return regparam.chi2_reg_param(
                    AtWA_x, AtWb_x, btWb_x, N, R_i, tau_x=tau_i,
                    eigA=eigA, eigR=eigR_i, want_anchor=want_anchor)
            f = {"exact_grid": regparam.chi2_reg_param_grid,
                 "fast": regparam.chi2_reg_param_fast}[regparam_mode]
            return f(AtWA_x, AtWb_x, btWb_x, N, R_i, tau_x=tau_i)

        if regparam_mode == "exact" and nreg == 1:
            # single-regularizer fast path: the search's last M-shift
            # anchor doubles as the final solve's decomposition — the
            # final solve happens AT the search's root, inside the
            # anchor's trust region, so no further ladder is needed
            root, final_anchor, chi2_fallback = search(0, want_anchor=True)
            log_alphas = jnp.stack([root])
        else:
            log_alphas = jnp.stack([search(i) for i in range(nreg)])
    else:
        raise ValueError(f"method {method!r} needs per-point data; "
                         "use fit_one_record_x")

    if final_anchor is not None:
        C, dC, chi2 = solve.final_solve_anchor_x(
            final_anchor, log_alphas[0], AtWA_x, AtWb_x, btWb_x)
        # chi^2 reporting guard (round 5): on floor-failure-RESCUED
        # records the exact machinery is untrusted end to end, and a
        # NEGATIVE chi^2 is impossible for a weighted sum of squares on
        # any record — both substitute the whitened chi^2 at the
        # returned root (see regparam.chi2_reg_param, record-456
        # receipts in docs/PARITY_NOTES.md #4)
        use_fb, chi2_fb = chi2_fallback
        chi2 = jnp.where(use_fb | (chi2 < 0.0), chi2_fb, chi2)
    else:
        C, dC, chi2 = final_solve_x(AtWA_x, AtWb_x, btWb_x, reg_mats_x,
                                    log_alphas, reg_taus_x=reg_taus_x,
                                    boot_Vx=boot_Vx)

    # NaN-fill failed records (interpolate.py:557-563)
    bad = jnp.any(jnp.isnan(log_alphas)) if nreg > 0 else jnp.asarray(False)
    nb = C.shape[-1]
    C = jnp.where(bad, jnp.full((nb,), jnp.nan, dtype=C.dtype), C)
    dC = jnp.where(bad, jnp.full_like(dC, jnp.nan), dC)
    chi2 = jnp.where(bad, jnp.nan, chi2)
    return C, dC, chi2, log_alphas


def fit_one_record_x(b_x, W_x, mask, A_x, reg_mats_x, method: str,
                     manual_log_params=None, regparam_mode: str = "exact",
                     reg_taus_x=None, reg_eigR=None):
    """Fit a single record from expansion inputs.  b_x/W_x: [npoints]
    expansions (pre-masked on host); mask: [npoints]; A_x: [npoints,
    nbasis] expansion; reg_mats_x: [nreg, nbasis, nbasis] expansion.

    Returns (C [nb], dC [2, nb, nb] 2-word expansion — see
    fit_records/cov_to_f64, chi2 [], log_alphas [nreg])."""
    AtWA_x, AtWb_x, btWb_x, N = suff_stats_x(A_x, b_x, W_x, mask)

    nreg = reg_mats_x[0].shape[0]
    if method == "gcv" and nreg > 0:
        # GCV needs per-point quantities.  'exact' runs the anchored
        # expansion objective (exact T = A V + exact M shifts — the
        # plain-f32 objective scattered alphas 10.9 decades and failed
        # 23% of production-order records on device; receipts in
        # ops/regparam.py); 'fast' keeps the whitened jitter objective
        # (documented envelope).
        b = exp_hi(b_x)
        Wm = jnp.where(mask > 0, exp_hi(W_x), 0.0)
        if regparam_mode == "fast":
            A = exp_hi(A_x)
            log_alphas = jnp.stack([
                regparam.gcv_reg_param(
                    exp_hi(AtWA_x), exp_hi(AtWb_x),
                    exp_hi(tuple(w[i] for w in reg_mats_x)),
                    A, b, Wm, mask, regparam_mode="fast",
                )
                for i in range(nreg)
            ])
        else:
            # NOTE (round 5): cluster-resolving this fresh basis (as the
            # chi2 search now does) was TRIED for the GCV regret tail
            # and REJECTED: the resolved keep estimates RELOCATE the
            # objective's keep-transition wells rather than pinning them
            # to the f64 locations — the old 6-record tail healed
            # (incl. the 18% worst record) but a different set entered,
            # one at 62% regret (A/B receipts: scripts/gcv_check.py
            # --regret --addendum, round-5 run).  The chi2 search keeps
            # the resolve because its day-scale receipts improved 760x;
            # GCV's valley geometry is knife-edged where chi2's rung
            # logic is not.
            eigA = solve.normalized_eigh_x(AtWA_x)
            log_alphas = jnp.stack([
                regparam.gcv_reg_param_x(
                    AtWA_x, AtWb_x, tuple(w[i] for w in reg_mats_x),
                    A_x, b, Wm, mask, eigA=eigA,
                    eigR=(None if reg_eigR is None else
                          (tuple(w[i] for w in reg_eigR[0]),
                           reg_eigR[1][i])),
                )
                for i in range(nreg)
            ])
        C, dC, chi2 = final_solve_x(AtWA_x, AtWb_x, btWb_x, reg_mats_x,
                                    log_alphas)
        bad = jnp.any(jnp.isnan(log_alphas))
        nb = C.shape[-1]
        C = jnp.where(bad, jnp.full((nb,), jnp.nan, dtype=C.dtype), C)
        dC = jnp.where(bad, jnp.full_like(dC, jnp.nan), dC)
        chi2 = jnp.where(bad, jnp.nan, chi2)
        return C, dC, chi2, log_alphas

    return fit_from_stats_x(AtWA_x, AtWb_x, btWb_x, N, reg_mats_x, method,
                            manual_log_params, regparam_mode,
                            reg_taus_x=reg_taus_x, reg_eigR=reg_eigR)


import os as _os

BOOT_ATWA = _os.environ.get("VITPU_BOOT_ATWA", "0") == "1"
# Boot each record's AtWA ladder from the batch-mean eigenbasis (see
# fit_from_stats_x docstring).  SHIPS OFF — measured NEGATIVE result on a
# real-basis day (scripts/day_check.py, round 3): the emulated-noise
# ladder test passes (tests/test_ladder.py::test_boot_from_batch_mean_
# basis — synthetic graded columns keep deep eigenvectors axis-aligned
# and weight-stable), but on real AMISR-basis spectra the deep
# eigenvectors come from near-cancellations that rotate O(1) under a 3%
# QC-mask change, so the batch-mean basis is wrong by ~25 decades at the
# bottom — beyond what the boot tail's sweep + two grading levels can
# regrade (they cover ~13 decades).  Day receipts: 6 failed records (vs
# 2), d(log10 alpha) median 1.09 decades vs the f64 oracle (vs ~0.03),
# and WALL-CLOCK 10.57 s vs 9.98 s (the damaged basis degrades the
# anchored evaluations' CG convergence downstream).  Exactly the trap
# documented in CLAUDE.md: tune the ladder against REAL-basis records,
# not synthetic graded matrices.


def batch_mean_eig(AtWA_x):
    """Record-independent boot basis: the eigenbasis of the SCALE-
    NORMALIZED batch-mean statistics.

    Each record is normalized by its own power-of-two scale before
    averaging, so a chunk mixing parameters of wildly different physical
    scales (single-pass multiparameter fits: W ~ 1e-20 for Ne, ~1e-4 for
    temperatures) still averages same-magnitude matrices — an unnormalized
    mean would be dominated by the largest-scale parameter and hand the
    other parameters a useless starting basis.  The mean itself is only a
    BOOT basis (exactness comes from the exact projections downstream),
    so word-wise f32 averaging + renorm is plenty.  One UNBATCHED fresh
    ladder per dispatch — eigh cost on this TPU is linear in batch, so
    this costs ~1/nrec of the per-record fresh ladders it replaces."""
    def norm_one(X_x):
        s = solve._norm_scale_x(X_x)
        return solve.exp_scale_pow2(X_x, 1.0 / s)

    Xn = jax.vmap(norm_one)(AtWA_x)
    Xbar = xprec.exp_renorm([jnp.mean(w, axis=0) for w in Xn],
                            nwords=len(AtWA_x))
    _, Vbar, _, _ = solve.normalized_eigh_x(Xbar)
    return Vbar


@partial(jax.jit, static_argnames=("method", "regparam_mode"))
def _fit_records_core(b_x, W_x, mask, A_x, reg_mats_x, method: str = "chi2",
                      manual_log_params=None, regparam_mode: str = "exact",
                      reg_taus_x=None, reg_eigR=None):
    """Vmapped batched fit over expansion inputs (leading record axis on
    b_x/W_x/mask)."""
    if method == "gcv":
        f = partial(fit_one_record_x, A_x=A_x, reg_mats_x=reg_mats_x,
                    method=method, manual_log_params=manual_log_params,
                    regparam_mode=regparam_mode, reg_taus_x=reg_taus_x,
                    reg_eigR=reg_eigR)
        return jax.vmap(f, in_axes=(0, 0, 0))(b_x, W_x, mask)

    AtWA_x, AtWb_x, btWb_x, N = jax.vmap(
        lambda b, w, m: suff_stats_x(A_x, b, w, m))(b_x, W_x, mask)
    boot_VA = None
    if (BOOT_ATWA and method == "chi2" and regparam_mode == "exact"
            and reg_mats_x[0].shape[0] > 0):
        boot_VA = batch_mean_eig(AtWA_x)
    f = partial(fit_from_stats_x, reg_mats_x=reg_mats_x, method=method,
                manual_log_params=manual_log_params,
                regparam_mode=regparam_mode, reg_taus_x=reg_taus_x,
                reg_eigR=reg_eigR, boot_VA=boot_VA)
    return jax.vmap(f, in_axes=(0, 0, 0, 0))(AtWA_x, AtWb_x, btWb_x, N)


_CONST_SPLIT_CACHE: dict = {}


def _split_fit_constant(x, nw):
    """Memoized host-split + device upload of a FIT-CONSTANT array (the
    design matrix and the regularization matrices are shared by every
    record chunk of a day; re-splitting and re-uploading them per chunk
    costs ~5.5 MB of tunnel bandwidth per dispatch for nothing).  Keyed
    by a collision-resistant content digest (sha1 — the salted 64-bit
    builtin hash could silently alias two same-shape arrays and corrupt
    every fit); LRU-evicted so alternating fits don't thrash each other's
    entries."""
    on_tpu = jax.default_backend() == "tpu"
    key = (x.shape, nw, on_tpu, hashlib.sha1(x.tobytes()).digest())
    hit = _CONST_SPLIT_CACHE.get(key)
    if hit is not None:
        _CONST_SPLIT_CACHE[key] = _CONST_SPLIT_CACHE.pop(key)  # LRU touch
        return hit
    if on_tpu:
        out = tuple(map(jnp.asarray, xprec.split_f64_host(x, nw)))
    else:
        out = (jnp.asarray(x),)
    while len(_CONST_SPLIT_CACHE) >= 8:  # bound memory across fits
        _CONST_SPLIT_CACHE.pop(next(iter(_CONST_SPLIT_CACHE)))
    _CONST_SPLIT_CACHE[key] = out
    return out


def prepare_fit_inputs(values, errors, A, reg_mats):
    """HOST-side preparation: reference QC masking semantics
    (interpolate.py:516-524) in numpy f64, then backend-appropriate
    expansion splitting (3-word f32 on TPU — exact for f64; 1-word f64
    elsewhere).  Splitting must happen on host: f64 does not survive the
    device transfer on this TPU.

    On TPU the five per-chunk word planes (b hi/lo, W hi/lo, mask) ride
    ONE packed [5, nrec, npts] f32 transfer and are sliced apart on
    device: five separate ~1.2 MB device_puts through the dev tunnel cost
    ~140 ms of the measured 920 ms warm dispatch (scripts/
    profile_exact.py round 3 — per-transfer round trips, not bandwidth)."""
    values = np.asarray(values, np.float64)
    errors = np.asarray(errors, np.float64)
    A = np.asarray(A, np.float64)
    reg_mats = np.asarray(reg_mats, np.float64)
    mask = np.isfinite(values)
    W = np.where(mask, errors, 1.0) ** -2.0
    b = np.where(mask, values, 0.0)
    W = np.where(mask, W, 0.0)
    on_tpu = jax.default_backend() == "tpu"

    # A/b/W travel as TWO words: their 2^-48 elementwise representation
    # error perturbs the statistics 100x less than the reference's own
    # f64 accumulation noise (see ops/solve.suff_stats_x); the
    # regularization matrices stay 3-word (cheap, and they enter X
    # formation directly).  A and reg_mats are fit-constant: their
    # split/upload is memoized across record chunks.
    if on_tpu:
        b_w = xprec.split_f64_host(b, 2)
        W_w = xprec.split_f64_host(W, 2)
        packed = jnp.asarray(np.stack(
            list(b_w) + list(W_w) + [mask.astype(np.float32)]))
        b_x = (packed[0], packed[1])
        W_x = (packed[2], packed[3])
        mask_d = packed[4]
    else:
        b_x = (jnp.asarray(b),)
        W_x = (jnp.asarray(W),)
        mask_d = jnp.asarray(mask.astype(np.float32))
    return (b_x, W_x, mask_d,
            _split_fit_constant(A, 2), _split_fit_constant(reg_mats, 3))


_EIGR_CACHE: dict = {}


def _reg_mats_eig(reg_mats, reg_mats_x):
    """Memoized ladder bases of the regularization matrices: (VR_x words
    [nreg, nb, nb] 2-word tuple, sR [nreg]).

    The chi2 'exact' search boots its alpha = 1 endpoint from R's
    eigenbasis (ops/regparam.chi2_reg_param); R is FIT-CONSTANT, so its
    fresh ladder — an UNBATCHED full decomposition that pays every eigh's
    latency without batch amortization (~0.4 s/dispatch measured) — is
    paid once per reg set per process here instead of inside every
    record-chunk dispatch."""
    key = (reg_mats.shape, hashlib.sha1(reg_mats.tobytes()).digest())
    hit = _EIGR_CACHE.get(key)
    if hit is not None:
        return hit
    from . import solve as _solve

    @jax.jit
    def one(R_x):
        _, Vx, s, _ = _solve.normalized_eigh_x(R_x)
        return Vx, s

    nreg = reg_mats.shape[0]
    Vs, ss = [], []
    for i in range(nreg):
        Vx, s = one(tuple(w[i] for w in reg_mats_x))
        Vs.append(Vx)
        ss.append(s)
    out = (tuple(jnp.stack([v[w] for v in Vs]) for w in range(len(Vs[0]))),
           jnp.stack(ss))
    _EIGR_CACHE.clear()  # bound memory: keep the current reg set only
    _EIGR_CACHE[key] = out
    return out


def fit_records(values, errors, A, reg_mats, method: str = "chi2",
                manual_params=None, regparam_mode: str = "exact",
                reg_taus=None, prepared=None, host_alphas=True):
    """Batched fit of a record block (host entry point).

    values/errors: [nrec, npoints]; A: [npoints, nbasis]; reg_mats:
    [nreg, nbasis, nbasis]; manual_params: raw alphas (reference
    convention).

    Returns (C [nrec, nb], dC [nrec, 2, nb, nb], chi2 [nrec],
    reg_params [nrec, nreg]) — reg_params in the reference's RAW alpha
    units (converted on host from the device-side log10 representation).
    dC is a TWO-WORD f32 expansion stacked on axis -3 (lo word zero on
    f64/CPU backends): the saved covariance must reach the file at f64
    grade — its product metric, the predicted field variance
    diag(A dC A') (estimate.py:109), cancels ~11 decades at physical
    scales and single-f32-word entries break it by ~300x (PARITY_NOTES
    #8).  Combine on host with ``cov_to_f64``.

    reg_taus: optional [nreg, nbasis] tau vectors for DATA-INFORMED
    regularization (penalty alpha (C'RC - 2 tau'C), a pull toward the
    target profile with tau = R @ C_target; the reference only hints at
    this — sphharmlag.py:186,241-259 — and never implements it).

    prepared: optional pre-staged ``prepare_fit_inputs`` result — the
    day pipeline prepares + uploads chunk i+1 on a worker thread while
    chunk i computes (the per-chunk host->device transfer is ~6 MB and
    bandwidth-bound through the dev tunnel; unoverlapped it costs
    ~140 ms of every ~920 ms dispatch).
    """
    b_x, W_x, mask, A_x, reg_mats_x = (
        prepared if prepared is not None
        else prepare_fit_inputs(values, errors, A, reg_mats))
    reg_taus_x = None
    if reg_taus is not None:
        on_tpu = jax.default_backend() == "tpu"
        rt = np.asarray(reg_taus, np.float64)
        if on_tpu:
            reg_taus_x = tuple(map(jnp.asarray, xprec.split_f64_host(rt, 3)))
        else:
            reg_taus_x = (jnp.asarray(rt),)
    mlp = None
    if manual_params is not None:
        mp = np.asarray(manual_params, np.float64)
        with np.errstate(divide="ignore"):
            mlp = jnp.asarray(np.log10(mp))
    reg_eigR = None
    if (method in ("chi2", "gcv") and regparam_mode == "exact"
            and np.asarray(reg_mats).shape[0] > 0):
        reg_eigR = _reg_mats_eig(np.asarray(reg_mats, np.float64),
                                 reg_mats_x)
    C, dC, chi2, log_alphas = _fit_records_core(
        b_x, W_x, mask, A_x, reg_mats_x, method=method,
        manual_log_params=mlp, regparam_mode=regparam_mode,
        reg_taus_x=reg_taus_x, reg_eigR=reg_eigR)
    if not host_alphas:
        # pipelined callers: the host conversion below BLOCKS on the whole
        # chunk's computation (np.asarray fences the dispatch), killing
        # the fetch/compute overlap of the day pipeline — they take the
        # device-side LOG10 alphas and convert at materialize time
        # (log_alphas_to_raw)
        return C, dC, chi2, log_alphas
    return C, dC, chi2, log_alphas_to_raw(log_alphas)


def cov_to_f64(dC):
    """Combine the pipeline's 2-word covariance ([..., 2, nb, nb]) into
    one HOST f64 matrix [..., nb, nb], symmetrized.

    The symmetrization lives here rather than on device because a
    per-word device symmetrization would round at f32 — exactly the
    per-entry noise the 2-word representation exists to avoid."""
    a = np.asarray(dC)
    d = a[..., 0, :, :].astype(np.float64) + a[..., 1, :, :].astype(
        np.float64)
    return 0.5 * (d + np.swapaxes(d, -1, -2))


def log_alphas_to_raw(log_alphas):
    """Device log10 alphas -> the reference's RAW alphas, on HOST f64:
    device arrays are f32 on this TPU and raw alphas reach 1e-50 —
    jnp.asarray would underflow them to 0 (a reporting bug that
    masqueraded as 17% of a day classified too-smooth)."""
    la = np.asarray(log_alphas, np.float64)
    with np.errstate(over="ignore"):
        return 10.0 ** la  # -inf -> 0.0 (too smooth), NaN -> NaN


def fit_one_record(values, errors, A, reg_mats, method: str,
                   manual_params=None, regparam_mode: str = "exact"):
    """Fit a single record (host entry point); see fit_records."""
    C, dC, chi2, rp = fit_records(
        np.asarray(values)[None], np.asarray(errors)[None], A, reg_mats,
        method=method, manual_params=manual_params,
        regparam_mode=regparam_mode)
    return C[0], dC[0], chi2[0], rp[0]
