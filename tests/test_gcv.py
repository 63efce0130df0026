"""GCV parity: exact LOO identity + Nelder-Mead replica vs the oracle's
brute-force leave-one-out refits + scipy Nelder-Mead (interpolate.py:263-351).

Small problem so the oracle's O(npoints) refits per objective call stay fast.
"""

import numpy as np
import pytest
import jax.numpy as jnp

from volumetricinterp_tpu.ops.fit import fit_records
from volumetricinterp_tpu.ops.regparam import gcv_objective, nelder_mead_1d
from volumetricinterp_tpu.ops.solve import suff_stats
from tests.oracle import oracle_fit_record
from tests.oracle.ref_impl import oracle_gcv_param


@pytest.fixture(scope="module")
def small_problem():
    rng = np.random.default_rng(8)
    npts, nb = 60, 8
    A = rng.normal(size=(npts, nb))
    R = np.eye(nb) + 0.1 * np.ones((nb, nb))
    C_true = rng.normal(size=nb)
    b = A @ C_true + 0.3 * rng.normal(size=npts)
    W = np.full(npts, 1.0 / 0.09)
    return A, b, W, R


def test_gcv_objective_matches_brute_force(small_problem):
    """The rank-one-downdate identity gives the same objective values as
    physically deleting each point and refitting."""
    import scipy.linalg

    A, b, W, R = small_problem
    mask = np.ones_like(b)
    AtWA, AtWb, btWb, N = suff_stats(
        jnp.asarray(A), jnp.asarray(b), jnp.asarray(W), jnp.asarray(mask)
    )
    for a_log in [-3.0, -1.0, 0.5, 2.0]:
        ours = float(
            gcv_objective(
                a_log, AtWA, AtWb, jnp.asarray(R), jnp.asarray(A),
                jnp.asarray(b), jnp.asarray(W), jnp.asarray(mask),
            )
        )
        # brute force
        alpha = 10.0**a_log
        total = 0.0
        for i in range(len(b)):
            Ai = np.delete(A, i, 0)
            bi = np.delete(b, i, 0)
            Wi = np.delete(W, i, 0)
            X = np.einsum("ji,j,jk->ik", Ai, Wi, Ai) + alpha * R
            y = np.einsum("ji,j,j->i", Ai, Wi, bi)
            C = scipy.linalg.lstsq(X, y)[0]
            total += (A[i] @ C - b[i]) ** 2 * W[i]
        assert np.isclose(ours, total, rtol=1e-9), a_log


def test_nelder_mead_matches_scipy():
    """The 1-D NM replica follows scipy's trajectory on a representative
    objective (same minimizer to xatol)."""
    import scipy.optimize

    f_np = lambda x: np.cosh(0.3 * (np.asarray(x) - 2.2)) + 0.05 * np.sin(
        np.asarray(x)
    )
    sol = scipy.optimize.minimize(
        lambda x: f_np(x[0]), -20.0, method="Nelder-Mead"
    )
    f_j = lambda x: jnp.cosh(0.3 * (x - 2.2)) + 0.05 * jnp.sin(x)
    x, ok = nelder_mead_1d(f_j, jnp.float64(-20.0))
    assert bool(ok) == bool(sol.success)
    assert abs(float(x) - sol.x[0]) < 2e-4


def test_gcv_reg_param_matches_oracle(small_problem):
    A, b, W, R = small_problem
    ref = oracle_gcv_param(A, b, W, [R], 0)

    values = b[None]
    errors = (W ** -0.5)[None]
    C, dC, chi2, alphas = fit_records(
        jnp.asarray(values), jnp.asarray(errors), jnp.asarray(A),
        jnp.asarray(R)[None], method="gcv",
    )
    ours = float(alphas[0, 0])
    assert np.isfinite(ref) and np.isfinite(ours)
    # NM terminates at xatol=1e-4 in log10-alpha
    assert abs(np.log10(ours) - np.log10(ref)) < 5e-4


def test_gcv_fast_close_to_exact(small_problem):
    """The whitened 'fast' GCV OBJECTIVE matches the exact cutoff
    objective away from the deep-spectrum regime (same jitter-vs-cutoff
    envelope as the fast chi2 search).

    The objective values are the contract — argmin comparison is
    inherently fragile: the reference's Nelder-Mead starts at 1e-20 on a
    plateau where cutoff-staircase micro-structure decides how far the
    simplex walks before fatol triggers, so exact and fast can
    legitimately terminate decades apart at indistinguishable objective
    values."""
    from functools import partial

    from volumetricinterp_tpu.ops.regparam import gcv_objective_fast
    from volumetricinterp_tpu.ops.solve import whiten_pencil

    A, b, W, R = small_problem
    mask = np.ones_like(b)
    AtWA, AtWb, btWb, N = suff_stats(
        jnp.asarray(A), jnp.asarray(b), jnp.asarray(W), jnp.asarray(mask)
    )
    lam, Qw, Binv = whiten_pencil(AtWA, jnp.asarray(R))
    T = jnp.asarray(A) @ (Binv.T @ Qw)
    u = Qw.T @ (Binv @ AtWb)
    fast = partial(gcv_objective_fast, lam=lam, u=u, T=T, T2=T * T,
                   b=jnp.asarray(b), W=jnp.asarray(W),
                   mask=jnp.asarray(mask))
    for a_log in [-6.0, -3.0, -1.0, 0.5, 2.0]:
        exact = float(gcv_objective(
            a_log, AtWA, AtWb, jnp.asarray(R), jnp.asarray(A),
            jnp.asarray(b), jnp.asarray(W), jnp.asarray(mask)))
        ours = float(fast(jnp.asarray(a_log)))
        assert np.isclose(ours, exact, rtol=1e-6), (a_log, ours, exact)


def test_nelder_mead_maxfev_cap():
    """scipy's maxfev=200 budget is enforced (PARITY_NOTES #6): a budget
    too small to reach the minimizer reports non-convergence."""
    f = lambda x: (x - 2.2) ** 2
    x_full, ok_full = nelder_mead_1d(f, jnp.float64(-20.0))
    assert bool(ok_full) and abs(float(x_full) - 2.2) < 1e-3
    x_cap, ok_cap = nelder_mead_1d(f, jnp.float64(-20.0), maxfev=20)
    assert not bool(ok_cap)


def _f32_expansion_inputs(A, b, W, R):
    """f32 2-word expansion inputs — the TPU-shaped code path on CPU."""
    from volumetricinterp_tpu.ops.xprec import split_f64_host

    def xs(x, nw):
        return tuple(jnp.asarray(w) for w in split_f64_host(x, nw))

    mask = np.ones_like(b)
    AtWA = A.T @ (W[:, None] * A)
    AtWb = A.T @ (W * b)
    return (xs(AtWA, 2), xs(AtWb, 2), xs(R, 3), xs(A, 2),
            jnp.asarray(b, jnp.float32), jnp.asarray(W, jnp.float32),
            jnp.asarray(mask, jnp.float32))


def test_gcv_polish_never_hurts(small_problem, monkeypatch):
    """The f32-backend post-NM polish (round 4, VERDICT r3 item 3) only
    ever descends the objective: the f64 oracle objective at the polished
    alpha is <= its value at the raw NM stop (up to f32-vs-f64 objective
    noise)."""
    from volumetricinterp_tpu.ops import regparam as rp

    A, b, W, R = small_problem
    args = _f32_expansion_inputs(A, b, W, R)
    x_pol = float(rp.gcv_reg_param_x(*args))
    monkeypatch.setattr(rp, "GCV_POLISH", 0)
    x_nm = float(rp.gcv_reg_param_x(*args))
    assert np.isfinite(x_pol) and np.isfinite(x_nm)

    mask = np.ones_like(b)
    AtWA, AtWb, btWb, N = suff_stats(
        jnp.asarray(A), jnp.asarray(b), jnp.asarray(W), jnp.asarray(mask))

    def f64_obj(a_log):
        return float(gcv_objective(
            a_log, AtWA, AtWb, jnp.asarray(R), jnp.asarray(A),
            jnp.asarray(b), jnp.asarray(W), jnp.asarray(mask)))

    assert f64_obj(x_pol) <= f64_obj(x_nm) * (1.0 + 1e-3)


def test_gcv_polish_keeps_faithful_flat_stop():
    """On a valley that is flat at the NM start (-20), the polish's
    noise-gated acceptance keeps the reference-faithful stop point
    (PARITY_NOTES #6 behavioral note) instead of drifting on f32 noise."""
    from volumetricinterp_tpu.ops import regparam as rp

    rng = np.random.default_rng(0)
    npts, nb = 256, 24
    A = rng.normal(size=(npts, nb)) * 10.0 ** rng.uniform(
        -4, 0, size=nb)[None, :]
    b = A @ rng.normal(size=nb) + 0.1 * rng.normal(size=npts)
    W = np.ones(npts)
    R = np.eye(nb)
    x = float(rp.gcv_reg_param_x(*_f32_expansion_inputs(A, b, W, R)))
    assert x == rp.GCV_ALPHA0


@pytest.mark.slow
def test_gcv_point_sharded_matches_single(small_problem):
    """GCV on a mesh with a non-trivial points axis equals the
    single-device result (psum'd LOO objective, SURVEY.md 5.7).

    The selected alpha itself is only asserted loosely: the reference's NM
    starts at log10(alpha) = -20 where this objective is FLAT, so the
    stopping point is decided by rounding noise in any implementation
    (scipy included) while the resulting fit is identical."""
    import jax
    from volumetricinterp_tpu.parallel import make_mesh, fit_records_sharded

    A, b, W, R = small_problem
    values = np.stack([b, b * 1.02])
    errors = np.broadcast_to(W ** -0.5, values.shape).copy()

    C0, dC0, c20, al0 = fit_records(
        jnp.asarray(values), jnp.asarray(errors), jnp.asarray(A),
        jnp.asarray(R)[None], method="gcv",
    )
    y0 = np.asarray(C0) @ A.T
    for shape in [(2, 4), (4, 2), (1, 8)]:
        mesh = make_mesh(shape[0], shape[1], devices=jax.devices()[:8])
        C, dC, c2, al = fit_records_sharded(
            values, errors, A, jnp.asarray(R)[None], mesh, method="gcv",
        )
        np.testing.assert_allclose(np.asarray(c2), np.asarray(c20),
                                   rtol=1e-6, err_msg=str(shape))
        y = np.asarray(C) @ A.T
        assert np.max(np.abs(y - y0)) < 1e-6 * np.max(np.abs(y0)), shape
        assert np.allclose(np.log10(np.asarray(al)),
                           np.log10(np.asarray(al0)), atol=1.5), shape


def test_gcv_objective_point_sharded_equals_single(small_problem):
    """The psum'd point-sharded LOO objective equals the single-device
    objective to reduction-order rounding at every alpha."""
    import jax
    from functools import partial
    from jax import shard_map
    from jax.sharding import PartitionSpec as P
    from volumetricinterp_tpu.parallel import make_mesh
    from volumetricinterp_tpu.ops.regparam import gcv_objective

    A, b, W, R = small_problem
    mask = np.ones_like(b)
    AtWA, AtWb, btWb, N = suff_stats(
        jnp.asarray(A), jnp.asarray(b), jnp.asarray(W), jnp.asarray(mask)
    )
    mesh = make_mesh(1, 4, devices=jax.devices()[:4])

    # pad points to the mesh
    npts = b.size
    npts_p = -(-npts // 4) * 4
    pad = npts_p - npts
    Ap = np.pad(A, ((0, pad), (0, 0)))
    bp = np.pad(b, (0, pad))
    Wp = np.pad(W, (0, pad))
    mp = np.pad(mask, (0, pad))

    @partial(shard_map, mesh=mesh,
             in_specs=(P("points", None), P("points"), P("points"),
                       P("points")),
             out_specs=P(), check_vma=False)
    def sharded_obj(A_blk, b_blk, W_blk, m_blk):
        return gcv_objective(-2.0, AtWA, AtWb, jnp.asarray(R), A_blk,
                             b_blk, W_blk, m_blk, axis_name="points")

    v_sh = float(sharded_obj(jnp.asarray(Ap), jnp.asarray(bp),
                             jnp.asarray(Wp), jnp.asarray(mp)))
    v_1 = float(gcv_objective(-2.0, AtWA, AtWb, jnp.asarray(R),
                              jnp.asarray(A), jnp.asarray(b),
                              jnp.asarray(W), jnp.asarray(mask)))
    assert np.isclose(v_sh, v_1, rtol=1e-12)
