"""Anchored (M-shift) exact evaluations: solve.make_anchor_x /
anchor_chi2_x / final_solve_anchor_x and their use by the default 'exact'
search (ops/regparam.chi2_reg_param want_anchor=True).

Two precision models are covered, mirroring tests/test_ladder.py:
* f64 (CPU-native): the anchored path must match the laddered path to
  f64 round-off — same root, same outputs.
* 3-word f32 expansions at PHYSICAL scales: the anchor's normalization
  scale s sits near 1e-21 on real Ne records, so s**2 UNDERFLOWS f32
  (denormal) — the regression that once poisoned every anchored chi^2
  with a 2^34-grade garbage reg term on a real day (all /s and /s**2
  must ride mul_pow2i exponent arithmetic; solve._pow2_exp_i).
"""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from volumetricinterp_tpu.ops import regparam, solve
from volumetricinterp_tpu.ops.solve import EPS64, exp_add, exp_mul_split, \
    pow10_split
from volumetricinterp_tpu.ops.xprec import split_f64_host


def _record(rng, n=32, npts=300, scale=1.0):
    """Consistent weighted-LS sufficient statistics at a chosen physical
    scale (scale ~ 1e-11 mimics Ne fits: AtWA ~ 1e-21)."""
    A = rng.normal(size=(npts, n)) * (10.0 ** (-6 * rng.random(n)))[None]
    A = A * scale
    W = rng.uniform(0.5, 2.0, npts)
    b = A @ rng.normal(size=n) + 0.1 * scale * rng.normal(size=npts)
    AtWA = (A * W[:, None]).T @ A
    AtWb = (A * W[:, None]).T @ b
    R = np.eye(n) + 0.01 * np.diag(np.arange(n, dtype=float))
    return (0.5 * (AtWA + AtWA.T), AtWb, float(W @ (b * b)),
            float(npts), R)


def _as_x(m, nwords):
    return tuple(map(jnp.asarray, split_f64_host(np.asarray(m), nwords)))


def test_anchor_matches_ladder_f64():
    """f64 path: anchored search root == plain root; anchored final
    solve == laddered final solve to round-off."""
    rng = np.random.default_rng(3)
    AtWA, AtWb, btWb, N, R = _record(rng)
    with jax.enable_x64(True):
        args = ((jnp.asarray(AtWA),), (jnp.asarray(AtWb),),
                (jnp.asarray(btWb),), jnp.asarray(N), (jnp.asarray(R),))
        root, anchor, _fb = regparam.chi2_reg_param(*args, want_anchor=True)
        root0 = regparam.chi2_reg_param(*args)
        assert float(root) == float(root0)
        C, dC, chi2 = solve.final_solve_anchor_x(
            anchor, root, args[0], args[1], args[2])
        C2, dC2, chi22 = solve.final_solve_x(
            args[0], args[1], args[2], (jnp.asarray(R)[None],),
            jnp.stack([root0]))
        np.testing.assert_allclose(float(chi2), float(chi22), rtol=1e-10)
        np.testing.assert_allclose(np.asarray(C), np.asarray(C2),
                                   rtol=0, atol=1e-12 * np.abs(C2).max())
        from volumetricinterp_tpu.ops.fit import cov_to_f64

        dC, dC2 = cov_to_f64(dC), cov_to_f64(dC2)
        np.testing.assert_allclose(dC, dC2,
                                   rtol=0, atol=1e-10 * np.abs(dC2).max())


@pytest.mark.parametrize(
    "scale", [pytest.param(1.0, marks=pytest.mark.slow), 1e-11])
def test_anchor_chi2_expansion_physical_scale(scale):
    """Expansion path (TPU precision model, f32 words + noisy eigh): the
    anchored chi^2 at delta = 0 must match chi2_from_eig_x on the SAME
    decomposition to the expansion floor, including at physical scales
    where the normalization s ~ 1e-21 underflows f32 when squared."""
    rng = np.random.default_rng(7)
    AtWA, AtWb, btWb, N, R = _record(rng, scale=scale)
    solve._EIGH_EMULATED_RESID = 2e-5
    try:
        AtWA_x = _as_x(AtWA, 3)
        AtWb_x = _as_x(AtWb, 3)
        btWb_x = _as_x(btWb, 3)
        R_x = _as_x(R, 3)
        # exact root region: alpha ~ where reg term bites; pick a few
        # probe points around the whitened seed scale
        for a0 in (-3.0, -8.0, -15.0):
            a0 = jnp.asarray(np.float32(a0))
            m, k = pow10_split(a0)
            aR_x = exp_mul_split(R_x, m, k)
            Xx = exp_add(AtWA_x, aR_x)
            eig = solve.normalized_eigh_x(Xx)
            ref = float(solve.chi2_from_eig_x(
                eig[0], eig[1], eig[3], AtWb_x, btWb_x, eig[2],
                aR_x=aR_x))
            anchor = solve.make_anchor_x(a0, eig, R_x, AtWb_x)
            got = float(solve.anchor_chi2_x(anchor, a0, btWb_x))
            assert got == pytest.approx(ref, rel=1e-4), (scale, float(a0))
    finally:
        solve._EIGH_EMULATED_RESID = 0.0


def test_anchor_shift_matches_fresh_expansion():
    """Expansion path: anchored chi^2 a fraction of a decade from its
    anchor tracks a FRESH fully-laddered evaluation there (the trust
    region contract the defect search relies on)."""
    rng = np.random.default_rng(11)
    AtWA, AtWb, btWb, N, R = _record(rng, scale=1e-11)
    solve._EIGH_EMULATED_RESID = 2e-5
    try:
        AtWA_x = _as_x(AtWA, 3)
        AtWb_x = _as_x(AtWb, 3)
        btWb_x = _as_x(btWb, 3)
        R_x = _as_x(R, 3)
        a0 = jnp.asarray(np.float32(-8.0))
        m, k = pow10_split(a0)
        aR_x = exp_mul_split(R_x, m, k)
        Xx = exp_add(AtWA_x, aR_x)
        anchor = solve.make_anchor_x(a0, solve.normalized_eigh_x(Xx),
                                     R_x, AtWb_x)
        for da in (0.25, -0.25, 1.0, -1.0):
            a = jnp.asarray(np.float32(-8.0 + da))
            got = float(solve.anchor_chi2_x(anchor, a, btWb_x))
            ref = float(solve.cutoff_chi2_x(*pow10_split(a), AtWA_x,
                                            AtWb_x, btWb_x, R_x))
            assert got == pytest.approx(ref, rel=2e-2), da
    finally:
        solve._EIGH_EMULATED_RESID = 0.0


def test_endpoint_direct_projection_matches_ladder():
    """The alpha=1 endpoint (too-smooth event) evaluates chi^2 through a
    DIRECT projection onto the dominant side's eigenbasis — must match
    the boot-laddered evaluation it replaced (expansion path)."""
    rng = np.random.default_rng(13)
    AtWA, AtWb, btWb, N, R = _record(rng, scale=1e-11)
    solve._EIGH_EMULATED_RESID = 2e-5
    try:
        AtWA_x = _as_x(AtWA, 3)
        AtWb_x = _as_x(AtWb, 3)
        btWb_x = _as_x(btWb, 3)
        R_x = _as_x(R, 3)
        zero = jnp.asarray(np.float32(0.0))
        m, k = pow10_split(zero)
        aR_x = exp_mul_split(R_x, m, k)
        Xx = exp_add(AtWA_x, aR_x)
        eigA = solve.normalized_eigh_x(AtWA_x)
        _, VR_x, sR, _ = solve.normalized_eigh_x(R_x)
        pickR = sR >= eigA[2]
        Vb = tuple(jnp.where(pickR, r, a) for r, a in zip(VR_x, eigA[1]))
        lad = solve.normalized_eigh_boot_x(Xx, Vb)
        ref = float(solve.chi2_from_eig_x(lad[0], lad[1], lad[3], AtWb_x,
                                          btWb_x, lad[2], aR_x=aR_x))
        s1 = solve._norm_scale_x(Xx)
        X1n = solve.exp_scale_pow2(Xx, 1.0 / s1)
        M1 = solve._project_x(X1n, Vb)
        w1 = tuple(jnp.diagonal(w, axis1=-2, axis2=-1) for w in M1[:2])
        got = float(solve.chi2_from_eig_x(w1, Vb, M1, AtWb_x, btWb_x, s1,
                                          aR_x=aR_x))
        assert got == pytest.approx(ref, rel=1e-3)
    finally:
        solve._EIGH_EMULATED_RESID = 0.0
