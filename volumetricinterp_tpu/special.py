"""Special functions for the spherical-cap-harmonic basis, in pure JAX.

Replaces the reference's scipy.special calls inside the hot basis loop
(models/sphharmlag.py:141: sp.eval_laguerre, sp.lpmv; :174-177 generalized
Laguerre and shifted-degree lpmv; :305-321 Kvm via sp.gamma) with jit/vmap-able
implementations:

* Laguerre polynomials by forward three-term recurrence (stable for the small
  orders used here, k <= ~16).
* Ferrers associated Legendre P_nu^m of NON-INTEGER degree nu via the Gauss
  hypergeometric series (DLMF 14.3.1 + the integer-order connection DLMF
  14.9.2).  This matches scipy.special.lpmv semantics including the
  Condon-Shortley phase and the reference's SIGNED-m convention
  (models/sphharmlag.py:141 passes m < 0 straight to lpmv).
* Kvm via lgamma (reference models/sphharmlag.py:305-321).

Accuracy note: the hypergeometric series in s = sin^2(theta/2) suffers
cancellation that grows like exp(2 nu sin(theta/2)); in float64 it holds
1e-9 relative error for nu*sin(theta/2) <~ 8 and degrades beyond.  For the
default cap (10 deg) and maxl=6 (nu ~ 94) it is good to ~1e-10 inside the
cap.  The production basis path (models/sphharmlag.py here) therefore
evaluates P via host-built Chebyshev tables seeded with machine-accurate
values (see tables.py); `lpmv` below is the self-contained device fallback
and the oracle for the tables' own unit tests at moderate nu.

Host-side accurate seeds: `lpmv_host` uses scipy.special.lpmv for m >= 0
(machine accurate for the degrees used here, verified against mpmath) and
the Gamma-ratio connection for m < 0 — where scipy itself underflows to 0
(e.g. lpmv(-9, 166, cos 10deg) returns 0.0; the true value is ~ -1.5e-21).
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp
from jax import lax
from jax.scipy.special import gammaln


# ---------------------------------------------------------------------------
# Laguerre polynomials
# ---------------------------------------------------------------------------

def laguerre_all(kmax: int, z, alpha: float = 0.0):
    """Generalized Laguerre polynomials L_0^a .. L_{kmax}^a at z.

    Returns an array of shape z.shape + (kmax+1,).  Forward recurrence
    (k+1) L_{k+1}^a = (2k+1+a-z) L_k^a - (k+a) L_{k-1}^a.
    """
    z = jnp.asarray(z)
    out = [jnp.ones_like(z)]
    if kmax >= 1:
        out.append(1.0 + alpha - z)
    for k in range(1, kmax):
        lk1 = ((2 * k + 1 + alpha - z) * out[k] - (k + alpha) * out[k - 1]) / (
            k + 1.0
        )
        out.append(lk1)
    return jnp.stack(out, axis=-1)


def np_laguerre_all(kmax: int, z, alpha: float = 0.0):
    """HOST float64 mirror of laguerre_all (same forward recurrence).

    The TPU backend has no real f64 (ops/xprec.py receipts), so the exact
    design-matrix path (models/*.basis on concrete inputs) evaluates on
    host numpy; this is its radial part."""
    z = np.asarray(z, np.float64)
    out = [np.ones_like(z)]
    if kmax >= 1:
        out.append(1.0 + alpha - z)
    for k in range(1, kmax):
        out.append(((2 * k + 1 + alpha - z) * out[k]
                    - (k + alpha) * out[k - 1]) / (k + 1.0))
    return np.stack(out, axis=-1)


def eval_laguerre(k: int, z, alpha: float = 0.0):
    """Single generalized Laguerre polynomial L_k^alpha(z) (k static)."""
    if k < 0:
        # scipy.eval_genlaguerre(-1, 1, z) arises at models/sphharmlag.py:175
        # for k=0; L_{-1} = 0 by convention.
        return jnp.zeros_like(jnp.asarray(z))
    return laguerre_all(k, z, alpha)[..., k]


# ---------------------------------------------------------------------------
# Ferrers associated Legendre of non-integer degree (scipy lpmv semantics)
# ---------------------------------------------------------------------------

def _hyp_series(mm: int, v, s, nterms: int):
    """F(v+1, -v; 1+mm; s) by direct summation with a static term count."""
    s = jnp.asarray(s)
    v = jnp.asarray(v, dtype=s.dtype)

    def body(k, carry):
        acc, term = carry
        acc = acc + term
        ratio = (v + 1.0 + k) * (k - v) / ((1.0 + mm + k) * (1.0 + k))
        return acc, term * ratio * s

    acc = jnp.zeros_like(s)
    term = jnp.ones_like(s)
    acc, _ = lax.fori_loop(0, nterms, body, (acc, term))
    return acc


def lpmv(m: int, v, x, nterms: int = 200):
    """Ferrers function P_v^m(x), scipy.special.lpmv convention.

    m: static signed integer order.  v: non-negative real degree (array ok).
    x: array in (-1, 1].  See module docstring for the accuracy envelope.
    """
    import math

    x = jnp.asarray(x)
    mm = abs(m)
    s = (1.0 - x) / 2.0
    F = _hyp_series(mm, v, s, nterms)
    if mm == 0:
        base = F
    else:
        # ((1-x)/(1+x))^{mm/2} -> 0 correctly as x -> 1
        half = ((1.0 - x) / (1.0 + x)) ** (mm / 2.0)
        base = half * F / float(math.factorial(mm))
    if m >= 0:
        v = jnp.asarray(v, dtype=x.dtype)
        ratio = jnp.exp(gammaln(v + mm + 1.0) - gammaln(v - mm + 1.0))
        return ((-1.0) ** mm) * ratio * base
    return base


def gamma_ratio(v, m: int):
    """Gamma(v - m + 1) / Gamma(v + m + 1) for m >= 0 (underflow-safe)."""
    v = jnp.asarray(v)
    return jnp.exp(gammaln(v - m + 1.0) - gammaln(v + m + 1.0))


def kvm(v, m: int):
    """Normalization constant K_vm (models/sphharmlag.py:305-321).

    K = sqrt((2v+1)/(4 pi) * Gamma(v-m+1)/Gamma(v+m+1)), x sqrt(2) if m != 0.
    m here is the absolute order (the reference calls Kvm(v, abs(m))).
    """
    v = jnp.asarray(v)
    k = jnp.sqrt((2.0 * v + 1.0) / (4.0 * jnp.pi) * gamma_ratio(v, m))
    if m != 0:
        k = k * jnp.sqrt(2.0)
    return k


# ---------------------------------------------------------------------------
# Host-side machine-accurate seeds (table building and test oracles)
# ---------------------------------------------------------------------------

def lpmv_host(m: int, v: float, x):
    """Machine-accurate lpmv on host (numpy), signed-m scipy semantics.

    scipy.special.lpmv is used directly for m >= 0 (verified machine-accurate
    against mpmath for the nu <= ~200 range used here).  For m < 0 scipy
    underflows at large nu, so the Gamma-ratio connection
    P_v^{-m} = (-1)^m Gamma(v-m+1)/Gamma(v+m+1) P_v^{m} is applied to the
    accurate positive-order values instead.
    """
    import scipy.special as sp

    x = np.asarray(x, dtype=np.float64)
    if m >= 0:
        return sp.lpmv(m, v, x)
    mm = -m
    ratio = np.exp(sp.gammaln(v - mm + 1.0) - sp.gammaln(v + mm + 1.0))
    return ((-1.0) ** mm) * ratio * sp.lpmv(mm, v, x)
