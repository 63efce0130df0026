#!/usr/bin/env python
"""Per-stage timing of the exact-mode fit pipeline on the real TPU.

Times each ladder component at the production batch shape so optimization
targets the measured cost, not guesses.  One TPU process at a time.
"""
import os
import time
from functools import partial

import numpy as np

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir",
                  os.environ["JAX_COMPILATION_CACHE_DIR"])
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

from volumetricinterp_tpu.config import Config
from volumetricinterp_tpu.models.sphharmlag import Model
from volumetricinterp_tpu.ops import solve, regparam, xprec
from volumetricinterp_tpu.ops.fit import (prepare_fit_inputs, fit_records,
                                          _reg_mats_eig)

cfg_text = """
[DEFAULT]
REGULARIZATION_LIST = 0thorder
REGULARIZATION_METHOD = chi2
[MODEL]
NAME = sphharmlag
MAXK = 4
MAXL = 6
CAP_LIM = 10
MAX_Z_INT = INF
LATCP = 78
LONCP = 262
[TPU]
QUAD_MODE = gauss
"""
model = Model(Config.from_text(cfg_text))
rng = np.random.default_rng(0)

npts, nrec = 2400, 128
lat = rng.uniform(74.0, 82.0, npts)
lon = rng.uniform(252.0, 272.0, npts)
alt = rng.uniform(1.0e5, 6.0e5, npts)
A = np.asarray(model.basis(lat, lon, alt))
target = 4e11 * np.exp(-(((alt - 3e5) / 1.2e5) ** 2))
C_true = np.linalg.lstsq(A, target, rcond=1e-10)[0]
ne = A @ C_true
noise = 2e10 + 0.05 * np.abs(ne)
values = ne[None] + rng.normal(0, 1, (nrec, npts)) * noise[None]
errors = np.broadcast_to(1.15 * noise, (nrec, npts)).copy()
psi = np.asarray(model.eval_psi())
reg_mats = psi[None]

b_x, W_x, mask, A_x, reg_mats_x = prepare_fit_inputs(values, errors, A,
                                                     reg_mats)
R_x = tuple(w[0] for w in reg_mats_x)


def sync(x):
    while isinstance(x, (tuple, list)):
        x = x[0]
    return float(np.asarray(x.ravel()[:1])[0])


def timeit(name, fn, *args, reps=3):
    out = fn(*args)
    sync(out)
    t0 = time.perf_counter()
    sync(out)
    rtt = time.perf_counter() - t0
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    sync(out)
    dt = (time.perf_counter() - t0 - rtt) / reps
    print(f"{name:42s} {dt*1e3:9.2f} ms   ({dt*1e3/nrec:7.3f} ms/rec)")
    return out, dt


# ---- stage timings (all vmapped over the record axis) ---------------------
@jax.jit
def stats(b_x, W_x, mask):
    return jax.vmap(lambda b, w, m: solve.suff_stats_x(A_x, b, w, m))(
        b_x, W_x, mask)

(AtWA_x, AtWb_x, btWb_x, N), t_stats = timeit("suff_stats_x", stats, b_x,
                                              W_x, mask)


@jax.jit
def fresh(AtWA_x):
    return jax.vmap(solve.normalized_eigh_x)(AtWA_x)

eigA, t_fresh = timeit("fresh ladder (AtWA)", fresh, AtWA_x)
wA_x, VA_x, sA, MA_x = eigA


@jax.jit
def boot_full(AtWA_x, VA_x):
    def one(AtWA_1, VA_1):
        m, k = solve.pow10_split(jnp.asarray(-20.0, jnp.float32))
        aR_x = solve.exp_mul_split(R_x, m, k)
        Xx = solve.exp_add(AtWA_1, aR_x)
        return solve.normalized_eigh_boot_x(Xx, VA_1, tail="full")
    return jax.vmap(one)(AtWA_x, VA_x)

_, t_boot = timeit("boot ladder (full tail) + X form", boot_full, AtWA_x,
                   VA_x)


@jax.jit
def boot_sweep_only(AtWA_x, VA_x):
    def one(AtWA_1, VA_1):
        m, k = solve.pow10_split(jnp.asarray(-20.0, jnp.float32))
        aR_x = solve.exp_mul_split(R_x, m, k)
        Xx = solve.exp_add(AtWA_1, aR_x)
        s = solve._norm_scale_x(Xx)
        Xn = solve.exp_scale_pow2(Xx, 1.0 / s)
        M_x = solve._project_x(Xn, VA_1)
        d_hi = jnp.diagonal(xprec.exp_hi(M_x), axis1=-2, axis2=-1)
        d_hi, Vx, M_x = solve._window_sweep_x(VA_1, d_hi, M_x)
        return d_hi
    return jax.vmap(one)(AtWA_x, VA_x)

_, t_sweep = timeit("  project + window sweep only", boot_sweep_only,
                    AtWA_x, VA_x)


@jax.jit
def project_only(AtWA_x, VA_x):
    def one(AtWA_1, VA_1):
        s = solve._norm_scale_x(AtWA_1)
        Xn = solve.exp_scale_pow2(AtWA_1, 1.0 / s)
        return solve._project_x(Xn, VA_1)
    return jax.vmap(one)(AtWA_x, VA_x)

_, t_proj = timeit("  _project_x alone", project_only, AtWA_x, VA_x)


@jax.jit
def fo_only(AtWA_x, VA_x):
    def one(AtWA_1, VA_1):
        s = solve._norm_scale_x(AtWA_1)
        Xn = solve.exp_scale_pow2(AtWA_1, 1.0 / s)
        d, Vx = solve._fo_polish_round_x(Xn, VA_1)
        return d
    return jax.vmap(one)(AtWA_x, VA_x)

_, t_fo = timeit("  FO polish round (incl project)", fo_only, AtWA_x, VA_x)


@jax.jit
def eigh_batch48(M):
    return jnp.linalg.eigh(M)

M48 = jnp.asarray(rng.normal(size=(nrec, 48, 48)).astype(np.float32))
M48 = M48 + jnp.swapaxes(M48, -1, -2)
_, t_e48 = timeit("  one batched 48x48 f32 eigh", eigh_batch48, M48)

M144 = jnp.asarray(rng.normal(size=(nrec, 144, 144)).astype(np.float32))
M144 = M144 + jnp.swapaxes(M144, -1, -2)
_, t_e144 = timeit("  one batched 144x144 f32 eigh", eigh_batch48, M144)


@jax.jit
def ozaki_once(MA_x, VA_x):
    return xprec.ozaki_mm(MA_x, VA_x, nwords=3, maxpq=solve._LADDER_MAXPQ)

_, t_oz = timeit("  one full ozaki_mm (3w, maxpq=6)", ozaki_once, MA_x, VA_x)


@jax.jit
def ozaki_2w(VA_x, VA_x2):
    return xprec.ozaki_mm(VA_x, VA_x2, nwords=2, maxpq=solve._LADDER_MAXPQ)

_, t_oz2 = timeit("  one full ozaki_mm (2w, maxpq=6)", ozaki_2w, VA_x, VA_x)


# ---- chi2 search end-to-end ------------------------------------------------
reg_eigR = _reg_mats_eig(np.asarray(reg_mats, np.float64), reg_mats_x)


@jax.jit
def search_only(AtWA_x, AtWb_x, btWb_x, N):
    def one(a, b, c, d):
        eigA_1 = solve.normalized_eigh_x(a)
        eigR_1 = (tuple(w[0] for w in reg_eigR[0]), reg_eigR[1][0])
        return regparam.chi2_reg_param(a, b, c, d, R_x, eigA=eigA_1,
                                       eigR=eigR_1)
    return jax.vmap(one)(AtWA_x, AtWb_x, btWb_x, N)

_, t_search = timeit("chi2_reg_param (incl fresh ladder)", search_only,
                     AtWA_x, AtWb_x, btWb_x, N, reps=1)

# ---- whole fit -------------------------------------------------------------
from volumetricinterp_tpu.ops.fit import _fit_records_core

r = fit_records(values, errors, A, reg_mats, method="chi2",
                regparam_mode="exact")  # compile
sync(r[2])
t0 = time.perf_counter()
sync(r[2])
rtt0 = time.perf_counter() - t0
reps = 3
t0 = time.perf_counter()
for _ in range(reps):
    r = fit_records(values, errors, A, reg_mats, method="chi2",
                    regparam_mode="exact")
sync(r[2])
t_all = (time.perf_counter() - t0 - rtt0) / reps
print(f"{'fit_records exact (whole, warm)':42s} {t_all*1e3:9.2f} ms   "
      f"({nrec/t_all:7.1f} fits/s)")

# core dispatch alone: inputs pre-split and resident, reg_eigR in hand —
# the difference to the line above is host prep + upload + alpha unsplit
core = partial(_fit_records_core, method="chi2", regparam_mode="exact")
rc = core(b_x, W_x, mask, A_x, reg_mats_x,
          reg_eigR=reg_eigR)
sync(rc[2])
t0 = time.perf_counter()
for _ in range(reps):
    rc = core(b_x, W_x, mask, A_x, reg_mats_x, reg_eigR=reg_eigR)
sync(rc[2])
t_core = (time.perf_counter() - t0 - rtt0) / reps
print(f"{'  _fit_records_core dispatch alone':42s} {t_core*1e3:9.2f} ms   "
      f"({nrec/t_core:7.1f} fits/s)")

print("\nbudget model: boot ladders/rec = 1 endpoint + 9 defect + 1 final")
print(f"  fresh {t_fresh*1e3:.0f} + 11 x boot {t_boot*1e3:.0f} "
      f"= {(t_fresh + 11*t_boot)*1e3:.0f} ms vs search+solve measured")
