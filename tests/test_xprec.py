"""Extended-precision f32-expansion/Ozaki layer (ops/xprec.py).

The TPU backend has no real float64 (storage truncates, ops round at f32,
matmuls at bf16); xprec rebuilds f64-grade arithmetic from correctly-
rounded f32 EFTs and exact-sliced bf16 matmuls.  These tests verify the
algorithms on CPU against numpy f64 — the EFT identities and the Ozaki
integer-alignment argument are backend-independent (both require only
correctly rounded f32 add/mul, which holds on CPU and was measured to
hold on the TPU: the two_sum residual identity is exact on device).
"""

import numpy as np
import jax.numpy as jnp

from volumetricinterp_tpu.ops import xprec


def _pair(m, nwords=3):
    return tuple(map(jnp.asarray, xprec.split_f64_host(m, nwords=nwords)))


def test_split_roundtrip_exact():
    rng = np.random.default_rng(0)
    x = rng.normal(size=1000) * 10.0 ** rng.uniform(-20, 20, 1000)
    back = xprec.exp_value_f64(xprec.split_f64_host(x, nwords=3))
    assert np.array_equal(back, x)  # 3 words represent f64 exactly


def test_two_prod_exact():
    rng = np.random.default_rng(2)
    a = jnp.asarray(rng.normal(size=256).astype(np.float32))
    b = jnp.asarray(rng.normal(size=256).astype(np.float32))
    p, e = xprec.two_prod(a, b)
    exact = np.asarray(a, np.float64) * np.asarray(b, np.float64)
    got = np.asarray(p, np.float64) + np.asarray(e, np.float64)
    assert np.array_equal(got, exact)


def test_exp_add_mul():
    rng = np.random.default_rng(1)
    x = rng.normal(size=512)
    y = rng.normal(size=512) * 1e-5
    s = xprec.exp_value_f64(xprec.exp_add(_pair(x), _pair(y)))
    assert np.abs((s - (x + y)) / (x + y)).max() < 2 ** -52
    c = rng.normal(size=512).astype(np.float32)
    p = xprec.exp_value_f64(xprec.exp_mul_f32(_pair(x), jnp.asarray(c)))
    ref = x * c.astype(np.float64)
    assert np.abs((p - ref) / ref).max() < 2 ** -48


def test_ozaki_mm_deep_cancellation():
    """The decisive case: V' X V for an exact eigenbasis V cancels the
    off-diagonal 16 decades below ||X|| — plain f32 matmuls leave 1e-7
    noise there; the Ozaki expansion matmul must reproduce it at f64
    fidelity."""
    rng = np.random.default_rng(3)
    n = 144
    w = 10.0 ** (-16 * rng.random(n))
    w[0] = 1.0
    Q, _ = np.linalg.qr(rng.normal(size=(n, n)))
    X = (Q * w) @ Q.T

    m1 = xprec.ozaki_mm(_pair(Q.T), _pair(X))
    ref1 = Q.T @ X
    err1 = np.abs(xprec.exp_value_f64(m1) - ref1)
    assert err1.max() < 2e-15, err1.max()
    # row-relative: row i of Q'X is w_i * q_i, 16 decades below ||X|| —
    # the f64 ORACLE itself carries ~n*eps64 ~ 2e-17 absolute noise on
    # those rows, so the bar is relative with an oracle-noise floor
    rowscale = np.abs(ref1).max(axis=1)
    assert (err1.max(axis=1) <
            np.maximum(1e-9 * rowscale, 5e-16)).all()

    m2 = xprec.ozaki_mm(m1, _pair(Q))
    M2 = xprec.exp_value_f64(m2)
    ref2 = ref1 @ Q
    assert np.abs(M2 - ref2).max() < 2e-15
    # off-diagonal of Q'XQ is pure cancellation; must sit at f64 level
    # (Q's own f64 orthogonality noise ~1e-15 caps what's testable)
    off = M2 - np.diag(np.diag(M2))
    assert np.abs(off).max() < 1e-14
    # the spectrum: f64-grade relative accuracy down to the oracle floor
    dd = np.sort(np.diag(M2))
    ww = np.sort(w)
    err_d = np.abs(dd - ww)
    assert (err_d < np.maximum(1e-9 * ww, 5e-16)).all()


def test_ozaki_mm_long_contraction():
    """Contractions beyond 256 are blocked; accuracy must hold at n=2000
    (the suff-stats A'WA path)."""
    rng = np.random.default_rng(4)
    npts, nb = 2000, 40
    A = rng.normal(size=(npts, nb)) * (10.0 ** (-8 * rng.random(nb)))[None]
    W = rng.uniform(0.1, 10.0, npts)
    AtW = (A * W[:, None]).T
    ref = AtW @ A
    got = xprec.exp_value_f64(xprec.ozaki_mm_long(_pair(AtW), _pair(A)))
    colscale = np.abs(ref).max(axis=0)
    assert (np.abs(got - ref) / colscale[None, :]).max() < 1e-13
