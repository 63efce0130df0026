#!/usr/bin/env python
"""chi2_floor accuracy vs the ladder's V-side Ozaki budget, on the
CPU-emulated TPU expansion path, against exact f64 floors (numpy)."""
import os
import sys

sys.path.insert(0, "/root/repo")
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
import jax.numpy as jnp

from volumetricinterp_tpu.ops import solve, xprec
from volumetricinterp_tpu.interpolate import Interpolate

CACHE = "/root/repo/.day_check"
solve._EIGH_EMULATED_RESID = 2e-5

cfg_text = f"""
[DEFAULT]
FILENAME = {CACHE}/day_1000_1.h5
OUTPUTFILENAME = {CACHE}/coef_dbg.h5
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
interp = Interpolate(cfg_text)
utime, lat, lon, alt, value, error = interp.read_datafile(interp.filename)
_, tt, _ = interp.model.transform_coord(lat, lon, alt)
interp.model.ensure_theta_domain(float(np.max(np.asarray(tt))))
A = np.asarray(interp.model.basis(lat, lon, alt), np.float64)

NREC = 96
mask = np.isfinite(value[:NREC])
W = np.where(mask, error[:NREC], 1.0) ** -2.0
b = np.where(mask, value[:NREC], 0.0)
W = np.where(mask, W, 0.0)

# exact f64 floors in numpy
EPS64 = 2.220446049250313e-16
floors64 = np.zeros(NREC)
Ns = np.zeros(NREC)
for r in range(NREC):
    Aw = A * W[r][:, None]
    AtWA = A.T @ Aw
    AtWb = Aw.T @ b[r]
    btWb = float(b[r] @ (W[r] * b[r]))
    w, V = np.linalg.eigh(AtWA)
    u = V.T @ AtWb
    keep = np.abs(w) > EPS64 * np.abs(w).max()
    z = np.where(keep, u / np.where(keep, w, 1.0), 0.0)
    floors64[r] = btWb - u @ z
    Ns[r] = mask[r].sum()


def split(x, nw=3):
    return tuple(map(jnp.asarray, xprec.split_f64_host(
        np.asarray(x, np.float64), nw)))


A_x = split(A, 2)
b_xx = split(b, 2)
W_xx = split(W, 2)
mk = jnp.asarray(mask.astype(np.float32))


def floors_with(maxpq_v):
    solve._LADDER_MAXPQ_V = maxpq_v

    @jax.jit
    def one(bv, wv, m):
        AtWA_x, AtWb_x, btWb_x, N = solve.suff_stats_x(A_x, bv, wv, m)
        eigA = solve.normalized_eigh_x(AtWA_x)
        return solve.chi2_from_eig_x(eigA[0], eigA[1], eigA[3], AtWb_x,
                                     btWb_x, eigA[2])

    return np.asarray(jax.vmap(one)(b_xx, W_xx, mk))


lad = np.array([0.6, 0.7, 0.8, 0.9, 1.0])


def sf_pick(fl):
    # first sf with floor < N*sf (has_bracket; too_smooth not relevant
    # for these alpha>0 records)
    nus = Ns[:, None] * lad[None, :]
    ok = fl[:, None] < nus
    return np.where(ok.any(1), lad[np.argmax(ok, 1)], np.nan)


s64 = sf_pick(floors64)
for mv in (5, 6):
    fl = floors_with(mv)
    rel = np.abs(fl - floors64) / floors64
    s = sf_pick(fl)
    print(f"maxpq_v={mv}: floor rel err median {np.median(rel):.2e} "
          f"p90 {np.percentile(rel, 90):.2e} max {rel.max():.2e}  "
          f"sf flips {int((s != s64).sum())}/{NREC}")
