"""The deflation-ladder eigendecomposition (ops/solve._ladder_eigh_x).

On TPU every f64-input eigh is silently f32-precision inside, so weighted
normal matrices (spectra spanning 16-20 decades) lose everything below
~1e-7 |w|max — which breaks the reference's gelsd-cutoff solve semantics
at eps64 * |w|max (observed: every record of a synthetic day NaN-failing
because chi2(alpha -> 0) was inflated above nu).  The ladder recovers
f64-grade resolution from f32 eighs plus exact-sliced matmuls and an
expansion-stored basis.

These tests run the ladder ON CPU with f32-split expansions, which
reproduces the TPU precision model (f32 words, f32 level-0 eigh) against
numpy's f64 oracle.  The `_EIGH_EMULATED_RESID` hook additionally injects
the measured TPU QDWH backward-error level (~2e-5 of ||M|| — 70x XLA-CPU's
f32 eigh) so the REAL device's failure mode is covered without TPU access.

Eigenvalues are compared by NEAREST MATCH, not sorted position:
near-degenerate pairs legitimately repel/shuffle under perturbation.  The
ladder's contract is NOT a perfect eigenbasis — near-degenerate pairs
(values within ~3x) retain couplings that no f32-eigh rotation can remove
— so eigenvalue bars loosen toward the deep end, and chi^2 (what the fit
actually consumes) is compared through the coupling-aware exact solve,
where those couplings cancel (see ops/solve._keep_solve_x)."""

import numpy as np
import pytest
import jax.numpy as jnp

from volumetricinterp_tpu.ops import solve
from volumetricinterp_tpu.ops.solve import (_ladder_eigh_x, _ladder_levels,
                                            chi2_from_eig, chi2_from_eig_x,
                                            EPS64)
from volumetricinterp_tpu.ops.xprec import split_f64_host, exp_hi


@pytest.fixture(autouse=True)
def _reset_noise_hook():
    yield
    solve._EIGH_EMULATED_RESID = 0.0


def _as_x(m, nwords=3):
    """Host-split f32 expansion: on CPU this SIMULATES the TPU precision
    model (f32 words + f32 eighs) against the f64 oracle."""
    return tuple(map(jnp.asarray, split_f64_host(m, nwords=nwords)))


def _exp_val(e):
    out = np.zeros(np.shape(e[0]))
    for w in reversed(e):
        out = out + np.asarray(w, np.float64)
    return out


def _spd_logspectrum(rng, n, decades):
    w = 10.0 ** (-decades * rng.random(n))
    w[0] = 1.0  # pin the top
    Q, _ = np.linalg.qr(rng.normal(size=(n, n)))
    return (Q * w) @ Q.T


def _fit_problem(rng, n=144, npts=400, grade=8.0):
    """Fit-structured (AtWA, AtWb, btWb): graded design columns make the
    normal matrix span ~16 decades, and AtWb = A'Wb lies in range(AtWA)
    like every real record."""
    A = rng.normal(size=(npts, n)) * (10.0 ** (-grade * rng.random(n)))[None]
    W = rng.uniform(0.5, 2.0, npts)
    b = A @ rng.normal(size=n) + 0.1 * rng.normal(size=npts)
    AtWA = (A * W[:, None]).T @ A
    AtWb = (A * W[:, None]).T @ b
    return AtWA, AtWb, float(W @ (b * b))


def _matched_rel(w_est, w_true, floor):
    """Nearest-match relative error for true eigenvalues above ``floor``."""
    sel = w_true > floor
    return np.array([np.min(np.abs(w_est - t)) / t for t in w_true[sel]])


def test_ladder_levels_sizes():
    ks = _ladder_levels(144)
    assert len(ks) == 5 and ks[0] == 126 and ks[-1] == 71
    assert all(a > b for a, b in zip(ks, ks[1:]))
    assert _ladder_levels(144, boot=True) == ()
    ks = _ladder_levels(3)
    assert all(1 <= k <= 3 for k in ks)


@pytest.mark.parametrize(
    "noise", [pytest.param(0.0, marks=pytest.mark.slow), 2e-5])
def test_ladder_resolves_deep_spectrum(noise):
    solve._EIGH_EMULATED_RESID = noise
    rng = np.random.default_rng(11)
    n = 144
    X = _spd_logspectrum(rng, n, 18)
    s = np.trace(X) / n
    Xn = X / s
    w_true = np.sort(np.linalg.eigvalsh(Xn))
    w_x, _, _ = _ladder_eigh_x(_as_x(Xn))
    w = _exp_val(w_x)
    mx = np.abs(w_true).max()
    # tight where the spectrum is solidly above the QDWH-noise ladder
    # floor, looser through the deep half (near-pair couplings, see
    # module docstring)
    assert _matched_rel(w, w_true, 1e-4 * mx).max() < 5e-2
    assert _matched_rel(w, w_true, 1e-10 * mx).max() < 0.5
    if noise == 0.0:
        # the plain f32 eigh alone is NOT enough (this is the TPU failure
        # mode the ladder exists to fix): sub-floor eigenvalues are noise
        w32 = np.linalg.eigvalsh(Xn.astype(np.float32)).astype(float)
        rel32 = _matched_rel(w32, w_true, 1e-10 * mx)
        assert rel32.max() > 10 * _matched_rel(w, w_true, 1e-10 * mx).max()


@pytest.mark.slow  # the phased sweep ships OFF (VITPU_SWEEP_PHASED)
def test_phased_sweep_resolves_deep_spectrum():
    """The phase-batched window sweep (non-default; ships off because it
    measured SLOWER on this TPU — no eigh latency floor to amortize)
    must stay correct: its 3-phase repair schedule preserves the
    descending final-writer order, so the deep half resolves within the
    same loosened bar as the sequential sweep (a naive even/odd split
    fails this at 0.73)."""
    solve._EIGH_EMULATED_RESID = 2e-5
    assert solve._sweep_phases(144) == [[96, 48, 0], [72, 24], [48, 0]]
    assert solve._sweep_phases(40) == [[0]]
    old = solve._SWEEP_PHASED
    solve._SWEEP_PHASED = True
    try:
        rng = np.random.default_rng(11)
        n = 144
        X = _spd_logspectrum(rng, n, 18)
        Xn = X / (np.trace(X) / n)
        w_true = np.sort(np.linalg.eigvalsh(Xn))
        w_x, _, _ = _ladder_eigh_x(_as_x(Xn))
        w = _exp_val(w_x)
        mx = np.abs(w_true).max()
        assert _matched_rel(w, w_true, 1e-4 * mx).max() < 5e-2
        assert _matched_rel(w, w_true, 1e-10 * mx).max() < 0.5
    finally:
        solve._SWEEP_PHASED = old


def test_boot_ladder_tracks_perturbed_matrix():
    """Bootstrapping from a nearby matrix's ladder basis resolves the
    perturbed matrix's deep spectrum without a fresh full-size eigh."""
    solve._EIGH_EMULATED_RESID = 2e-5
    rng = np.random.default_rng(3)
    n = 144
    X = _spd_logspectrum(rng, n, 18)
    s = np.trace(X) / n
    _, V0x, _ = _ladder_eigh_x(_as_x(X / s))
    R = rng.normal(size=(n, n))
    R = R @ R.T
    X2 = X + 1e-7 * s * R / np.abs(np.linalg.eigvalsh(R)).max()
    s2 = np.trace(X2) / n
    Xn2 = X2 / s2
    w_x, _, _ = _ladder_eigh_x(_as_x(Xn2), boot_Vx=V0x)
    w_true = np.sort(np.linalg.eigvalsh(Xn2))
    mx = np.abs(w_true).max()
    assert _matched_rel(_exp_val(w_x), w_true, 1e-4 * mx).max() < 0.12


def test_boot_from_batch_mean_basis():
    """The production BOOT_ATWA path (ops/fit.batch_mean_eig): every
    record's AtWA ladder boots from ONE basis — the eigenbasis of the
    scale-normalized batch mean — instead of paying a per-record fresh
    ladder (five deflation-level eighs + the n-size seed eigh, the
    dominant measured cost of the exact search, scripts/profile_exact.py).

    Stress ingredients mirror production: per-record weight scatter, QC
    dropouts (zeroed rows), and a 1e16 scale split between two record
    groups (single-pass multiparameter chunks mix Ne- and temperature-
    scale statistics).  The bar is the SAME chi^2/keep envelope as the
    fresh-ladder test above, under the real TPU's emulated eigh noise.

    NOTE: this test PASSING while the real-basis day FAILED (see the
    BOOT_ATWA ships-off receipts in ops/fit.py) is itself the round-3
    measurement of the synthetic-vs-real-spectrum gap: graded synthetic
    columns keep deep eigenvectors axis-aligned and weight-stable; real
    AMISR-basis deep eigenvectors come from near-cancellations and rotate
    O(1) under a 3% mask change.  Kept as the regression bar for the
    opt-in path (VITPU_BOOT_ATWA=1)."""
    solve._EIGH_EMULATED_RESID = 2e-5
    rng = np.random.default_rng(29)
    n = 144
    npts = 400
    A = rng.normal(size=(npts, n)) * (10.0 ** (-8.0 * rng.random(n)))[None]
    b0 = A @ rng.normal(size=n)

    recs = []
    for r in range(4):
        scale = 1.0 if r < 2 else 1e-16  # two parameter groups
        W = rng.uniform(0.5, 2.0, npts) * scale
        W[rng.random(npts) < 0.05] = 0.0  # QC dropouts
        b = b0 + 0.1 * rng.normal(size=npts)
        AtWA = (A * W[:, None]).T @ A
        AtWb = (A * W[:, None]).T @ b
        recs.append((AtWA, AtWb, float(W @ (b * b))))

    # the batch-mean basis, built exactly like ops/fit.batch_mean_eig
    # (scale-normalized mean), through the same f32-expansion ladder
    Xbar = np.mean([AtWA / (2.0 ** np.round(np.log2(np.trace(AtWA) / n)))
                    for AtWA, _, _ in recs], axis=0)
    sb = float(2.0 ** np.round(np.log2(np.trace(Xbar) / n)))
    _, Vbar_x, _ = _ladder_eigh_x(_as_x(Xbar / sb))

    for trial, (AtWA, AtWb, btWb) in enumerate(recs):
        s = float(2.0 ** np.round(np.log2(np.trace(AtWA) / n)))
        Xn = AtWA / s
        wt, Vt = np.linalg.eigh(Xn)
        c2_true = float(chi2_from_eig(
            jnp.asarray(wt * s), jnp.asarray(Vt), jnp.asarray(AtWA),
            jnp.asarray(AtWb), jnp.asarray(btWb)))
        k_true = int((np.abs(wt) > EPS64 * np.abs(wt).max()).sum())
        w_x, Vx, M_x = _ladder_eigh_x(_as_x(Xn), boot_Vx=Vbar_x)
        c2_l = float(chi2_from_eig_x(
            w_x, Vx, M_x, _as_x(AtWb), _as_x(np.float64(btWb)),
            jnp.float32(s)))
        w_hi = np.asarray(exp_hi(w_x))
        k_l = int((np.abs(w_hi) > EPS64 * np.abs(w_hi).max()).sum())
        assert abs(c2_l - c2_true) / abs(c2_true) < 3e-2, \
            (trial, c2_l, c2_true)
        assert abs(k_l - k_true) <= 4, (trial, k_l, k_true)


@pytest.mark.parametrize(
    "noise", [pytest.param(0.0, marks=pytest.mark.slow), 2e-5])
def test_ladder_chi2_matches_f64_cutoff(noise):
    """chi^2 under gelsd-cutoff semantics from the ladder must agree with
    the f64 oracle inside the keep-flip staircase envelope, on
    fit-structured matrices whose chi2 floor the plain-f32 path inflates
    by tens of percent (the TPU all-records-NaN regression).  noise=2e-5
    reproduces the real TPU QDWH eigh quality."""
    solve._EIGH_EMULATED_RESID = noise
    rng = np.random.default_rng(7)
    n = 144

    for trial in range(3):
        AtWA, AtWb, btWb = _fit_problem(rng)
        s = float(2.0 ** np.round(np.log2(np.trace(AtWA) / n)))
        Xn = AtWA / s
        wt, Vt = np.linalg.eigh(Xn)
        c2_true = float(chi2_from_eig(
            jnp.asarray(wt * s), jnp.asarray(Vt), jnp.asarray(AtWA),
            jnp.asarray(AtWb), jnp.asarray(btWb)))
        k_true = int((np.abs(wt) > EPS64 * np.abs(wt).max()).sum())
        # production TPU path: f32-expansion ladder + identity-form chi^2
        w_x, Vx, M_x = _ladder_eigh_x(_as_x(Xn))
        c2_l = float(chi2_from_eig_x(
            w_x, Vx, M_x, _as_x(AtWb), _as_x(np.float64(btWb)),
            jnp.float32(s)))
        w_hi = np.asarray(exp_hi(w_x))
        k_l = int((np.abs(w_hi) > EPS64 * np.abs(w_hi).max()).sum())
        assert abs(c2_l - c2_true) / abs(c2_true) < 3e-2, \
            (trial, c2_l, c2_true)
        assert abs(k_l - k_true) <= 4, (trial, k_l, k_true)


# ---------------------------------------------------------------------------
# cutoff-cluster resolving pass (round 4: solve._cluster_resolve_x)
# ---------------------------------------------------------------------------

def _wall_matrix(rng, n=96):
    """Spectrum with a dense wall straddling the gelsd cutoff — the real
    AMISR-basis regime the cluster pass targets (PARITY_NOTES #9a)."""
    decades = np.concatenate([
        np.linspace(0, -13, n - 40),
        np.linspace(-14.2, -16.8, 40),
    ])
    w = 10.0 ** decades
    Q, _ = np.linalg.qr(rng.normal(size=(n, n)))
    X = (Q * w) @ Q.T
    return 0.5 * (X + X.T)


def _keep_counts(X, b):
    """(keepC_f32pipeline, keepH_f32pipeline) via the anchored final
    solve, plus the f64 truth."""
    n = X.shape[0]
    Xx = _as_x(X)
    ub = _as_x(b, 2)
    bt = _as_x(np.float64(10.0 * abs(b @ b)), 2)
    R = np.eye(n) * float(np.mean(np.abs(np.diag(X))))
    Rx = _as_x(R)
    eig = solve.normalized_eigh_x(Xx)
    anchor = solve.make_anchor_x(jnp.asarray(-60.0, jnp.float32), eig, Rx,
                                 ub)
    _, _, _, (kC, kH) = solve.final_solve_anchor_x(
        anchor, jnp.asarray(-60.0, jnp.float32), Xx, ub, bt,
        want_keep=True)
    aw = np.abs(np.linalg.eigvalsh(X))
    kC64 = int((aw > EPS64 * aw.max()).sum())
    kH64 = int((aw > n * EPS64 * aw.max()).sum())
    return int(kC), int(kH), kC64, kH64


def test_cluster_resolve_tightens_keep_straddle():
    """Under the QDWH noise hook, the Schur-complemented cluster window +
    deflated estimates must pull the keep decisions well inside the raw
    ladder's straddle (measured on this spectrum: raw 88/67 vs f64 78/56;
    with the pass <= 83/59)."""
    rng = np.random.default_rng(0)
    X = _wall_matrix(rng)
    b = rng.normal(size=X.shape[0])
    solve._EIGH_EMULATED_RESID = 2e-5
    kC, kH, kC64, kH64 = _keep_counts(X, b)
    solve._CLUSTER = False
    try:
        kC0, kH0, _, _ = _keep_counts(X, b)
    finally:
        solve._CLUSTER = True
    assert abs(kC - kC64) <= 5, (kC, kC64)
    assert abs(kH - kH64) <= 4, (kH, kH64)
    # strictly better than the raw ladder on both boundaries
    assert abs(kC - kC64) < abs(kC0 - kC64), (kC, kC0, kC64)
    assert abs(kH - kH64) < abs(kH0 - kH64), (kH, kH0, kH64)


def test_cluster_resolve_f64_extraction_exact():
    """The f64 version of the same extraction (no noise hook, f64 words)
    must leave the keep decisions at the f64 oracle's (+-1: boundary
    modes within eps flip between any two correct solvers)."""
    rng = np.random.default_rng(1)
    X = _wall_matrix(rng)
    b = rng.normal(size=X.shape[0])
    n = X.shape[0]
    Xx = (jnp.asarray(X),)
    ub = (jnp.asarray(b),)
    bt = (jnp.asarray(np.float64(10.0 * abs(b @ b))),)
    R = np.eye(n) * float(np.mean(np.abs(np.diag(X))))
    eig = solve.normalized_eigh_x(Xx)
    anchor = solve.make_anchor_x(jnp.asarray(-60.0, jnp.float64), eig,
                                 (jnp.asarray(R),), ub)
    _, _, _, (kC, kH) = solve.final_solve_anchor_x(
        anchor, jnp.asarray(-60.0, jnp.float64), Xx, ub, bt,
        want_keep=True)
    Xa = X + 1e-60 * R
    aw = np.abs(np.linalg.eigvalsh(Xa))
    kC64 = int((aw > EPS64 * aw.max()).sum())
    kH64 = int((aw > n * EPS64 * aw.max()).sum())
    # +-1: a mode within eps of the boundary legitimately flips between
    # any two correct f64 solvers (PARITY_NOTES #8)
    assert abs(int(kC) - kC64) <= 1
    assert abs(int(kH) - kH64) <= 1


def test_cluster_keep_estimates_align_cutoff_wall():
    """_cluster_keep_estimates_x (round 5, the GCV polish's keep source):
    on a dense near-cutoff wall under the emulated TPU eigh noise, the
    resolved estimates place the gelsd keep-count closer to the true f64
    count than the raw deflated diagonal, and return in ORIGINAL column
    order (basis untouched)."""
    solve._EIGH_EMULATED_RESID = 2e-5
    rng = np.random.default_rng(7)
    n = 144
    # spectrum: well-separated top half + a dense wall straddling the
    # gelsd cutoff (eps64 * max), the real-basis geometry of
    # PARITY_NOTES #9a
    w = 10.0 ** (-10.0 * rng.random(n // 2))
    wall = EPS64 * 10.0 ** rng.uniform(-2.0, 2.0, n - n // 2)
    w = np.concatenate([w, wall])
    w[0] = 1.0
    Q, _ = np.linalg.qr(rng.normal(size=(n, n)))
    X = (Q * w) @ Q.T
    w_true = np.linalg.eigvalsh(X)
    true_keep = int((np.abs(w_true) > EPS64 * np.abs(w_true).max()).sum())

    w_x, Vx, M_x = _ladder_eigh_x(_as_x(X))
    raw = np.abs(_exp_val(solve._deflated_diag_x(M_x)))
    est_x = solve._cluster_keep_estimates_x(M_x)
    est = np.abs(_exp_val(est_x))
    raw_keep = int((raw > EPS64 * raw.max()).sum())
    est_keep = int((est > EPS64 * est.max()).sum())
    assert abs(est_keep - true_keep) <= abs(raw_keep - true_keep)
    assert abs(est_keep - true_keep) <= 2
    # alignment: outside the resolving window the estimates ARE the
    # deflated diagonal (same column order)
    both_top = (raw > 1e-6 * raw.max())
    np.testing.assert_allclose(est[both_top], raw[both_top], rtol=1e-6)
