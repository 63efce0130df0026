#!/usr/bin/env python
"""Characterize the bench day's device-failed records (VERDICT r2 item 2).

Loads the failing records from the cached day, computes the LADDER OUTCOME
ingredients (chi2_floor, chi2_one, the nu rungs) in f64 and through the
CPU emulation of the TPU ladder (f32-split expansions +
_EIGH_EMULATED_RESID), and reports the decision margins.  CPU-only."""
import os
import sys

import numpy as np

sys.path.insert(0, "/root/repo")
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
import jax.numpy as jnp

from volumetricinterp_tpu.config import Config
from volumetricinterp_tpu.models.sphharmlag import Model
from volumetricinterp_tpu.io.amisr import read_datafile
from volumetricinterp_tpu.ops import solve
from volumetricinterp_tpu.ops.regparam import SCALE_FACTORS
from volumetricinterp_tpu.ops.solve import (chi2_from_eig_x, _ladder_eigh_x,
                                            EPS64)
from volumetricinterp_tpu.ops.xprec import split_f64_host, exp_hi

cfg_text = """
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
RECORDS = [int(a) for a in sys.argv[1:]] or [459, 788]

model = Model(Config.from_text(cfg_text))
utime, lat, lon, alt, value, error = read_datafile(
    "/root/repo/.day_check/day_1000_1.h5", "dens", [1e10, 1e13],
    [0.1, 10.0], [1, 2, 3, 4])
_, t, _ = model.transform_coord(lat, lon, alt)
model.ensure_theta_domain(float(np.max(np.asarray(t))))
A = np.asarray(model.basis(lat, lon, alt))
psi = np.asarray(model.eval_psi())


def _as_x(m, nwords):
    return tuple(map(jnp.asarray, split_f64_host(m, nwords)))


for r in RECORDS:
    v, e = value[r], error[r]
    mask = np.isfinite(v)
    W = np.where(mask, e, 1.0) ** -2.0 * mask
    b = np.where(mask, v, 0.0)
    AtWA = (A * W[:, None]).T @ A
    AtWb = (A * W[:, None]).T @ b
    btWb = float(W @ (b * b))
    N = int(mask.sum())
    nus = np.asarray(SCALE_FACTORS) * N

    # f64 truth
    s = float(2.0 ** np.round(np.log2(np.trace(AtWA) / AtWA.shape[0])))
    w, V = np.linalg.eigh(AtWA / s)
    keep = np.abs(w) > EPS64 * np.abs(w).max()
    u = V.T @ AtWb
    c2_floor64 = btWb - float(u[keep] @ (u[keep] / w[keep])) / s
    print(f"record {r}: N={N}, btWb={btWb:.6g}")
    print(f"  f64 chi2_floor = {c2_floor64:.4f};  nus = {nus}")
    print(f"  f64 margins chi2_floor - nu = {c2_floor64 - nus}")

    # TPU-emulated ladder floor
    solve._EIGH_EMULATED_RESID = 2e-5
    w_x, Vx, M_x = _ladder_eigh_x(_as_x(AtWA / s, 3))
    c2_lad = float(chi2_from_eig_x(
        w_x, Vx, M_x, _as_x(AtWb, 2), _as_x(np.float64(btWb), 2),
        jnp.float32(s)))
    solve._EIGH_EMULATED_RESID = 0.0
    print(f"  emulated-ladder chi2_floor = {c2_lad:.4f} "
          f"(inflation {c2_lad - c2_floor64:+.4f}, "
          f"rel {abs(c2_lad - c2_floor64)/abs(c2_floor64):.3%})")
    print(f"  emulated margins = {c2_lad - nus}")
    kl = int((np.abs(np.asarray(exp_hi(w_x)))
              > EPS64 * np.abs(np.asarray(exp_hi(w_x))).max()).sum())
    print(f"  keep: f64 {int(keep.sum())}, ladder {kl}")
