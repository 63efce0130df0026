"""Special-function parity vs scipy (SURVEY.md section 4, item 1)."""

import numpy as np
import scipy.special as sp
import jax.numpy as jnp

from volumetricinterp_tpu import special
from volumetricinterp_tpu.tables import build_legendre_tables, nu_of_l


def test_laguerre_vs_scipy(rng):
    z = rng.uniform(0, 20, 100)
    for k in range(8):
        ours = np.asarray(special.eval_laguerre(k, jnp.asarray(z)))
        assert np.allclose(ours, sp.eval_laguerre(k, z), rtol=1e-12, atol=1e-12)


def test_genlaguerre_vs_scipy(rng):
    z = rng.uniform(0, 20, 100)
    for k in range(6):
        ours = np.asarray(special.eval_laguerre(k, jnp.asarray(z), alpha=1.0))
        assert np.allclose(ours, sp.eval_genlaguerre(k, 1, z), rtol=1e-11, atol=1e-11)


def test_lpmv_series_moderate_degree(rng):
    """Direct JAX series vs scipy, inside its accuracy envelope."""
    th = rng.uniform(1e-3, np.deg2rad(10), 100)
    x = np.cos(th)
    for v in [3.7, 22.25, 94.0]:
        for m in [0, 1, 3, -2]:
            ours = np.asarray(special.lpmv(m, v, jnp.asarray(x)))
            ref = special.lpmv_host(m, v, x)
            scale = np.max(np.abs(ref))
            assert np.max(np.abs(ours - ref)) < 1e-6 * scale, (v, m)


def test_lpmv_host_negative_m_no_underflow():
    """scipy.lpmv returns 0.0 at (m=-9, nu=166); the host path must not."""
    v = float(nu_of_l(9, np.deg2rad(10)))
    x = np.cos(np.deg2rad(10))
    val = special.lpmv_host(-9, v, np.array([x]))[0]
    assert val != 0.0
    assert abs(val) < 1e-15  # genuinely tiny, but finite and nonzero


def test_kvm_vs_reference_formula():
    for v, m in [(10.25, 0), (94.0, 3), (166.0, 9)]:
        ours = float(special.kvm(v, m))
        ref = np.sqrt((2 * v + 1) / (4 * np.pi) * sp.gamma(v - m + 1) / sp.gamma(v + m + 1))
        if m != 0:
            ref *= np.sqrt(2)
        assert np.isclose(ours, ref, rtol=1e-12)


def test_tables_accuracy(rng):
    cap = np.deg2rad(10.0)
    tbl = build_legendre_tables(6, cap, tol=1e-12)
    th = rng.uniform(1e-4, tbl.theta_max, 300)
    vals = np.asarray(tbl.eval_all(jnp.asarray(th)))
    for l in range(6):
        v = float(nu_of_l(l, cap))
        for mb in range(l + 1):
            for di, d in enumerate((-1, 0, 1)):
                ref = sp.lpmv(mb, v + d, np.cos(th))
                got = vals[:, 3 * tbl.pair_index(l, mb) + di]
                sup = np.max(np.abs(ref)) + 1e-300
                assert np.max(np.abs(got - ref)) < 1e-9 * sup, (l, mb, d)


def test_tables_column_layout():
    cap = np.deg2rad(10.0)
    tbl = build_legendre_tables(3, cap)
    assert tbl.column(2, 1, -1) == 3 * (2 * 3 // 2 + 1) + 0
    assert tbl.column(2, 1, 0) == 3 * (2 * 3 // 2 + 1) + 1
    assert tbl.column(2, 1, 1) == 3 * (2 * 3 // 2 + 1) + 2
