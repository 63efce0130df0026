#!/usr/bin/env python
"""Covariance (dC) quality probe: TPU exact-mode fit_records vs the pure
NumPy f64 oracle on identical records (the bench fit-leg problem).

Round-3 finding that motivated this: at production order the saved dC was
f32-overflow garbage (49% negative diagonal entries, values clamped at
f32-max) — err = sqrt(diag dC) NaN'd in Estimate(calcerr=True).
"""
import os
import sys
import time

import numpy as np

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
sys.path.insert(0, "/root/repo")

import jax

jax.config.update("jax_compilation_cache_dir",
                  os.environ["JAX_COMPILATION_CACHE_DIR"])
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

from volumetricinterp_tpu.config import Config
from volumetricinterp_tpu.models.sphharmlag import Model
from volumetricinterp_tpu.ops.fit import fit_records

sys.path.insert(0, "/root/repo/tests")
from oracle.ref_impl import oracle_fit_record

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

t0 = time.time()
C, dC, chi2, rp = fit_records(values, errors, A, reg_mats, method="chi2",
                              regparam_mode="exact")
from volumetricinterp_tpu.ops.fit import cov_to_f64
dC = cov_to_f64(dC)
print(f"TPU fit done in {time.time()-t0:.1f}s backend={jax.default_backend()}",
      flush=True)

d = np.diagonal(dC, axis1=1, axis2=2)
print("TPU dC: diag-negative frac", float((d < 0).mean()),
      "|diag| median", float(np.median(np.abs(d))),
      "max |entry|", float(np.nanmax(np.abs(dC))), flush=True)
neg = d < 0
if neg.any():
    # negative diagonal entries are PSD noise on structurally tiny
    # entries iff their magnitude is far below the record's diag scale
    ratio = (np.abs(d) / np.median(np.abs(d), axis=1, keepdims=True))[neg]
    print("  negative-diag magnitude / record diag median:",
          "median", float(np.median(ratio)), "max", float(np.max(ratio)),
          flush=True)

NCHK = int(os.environ.get("PROBE_DC_NREC", "6"))
rel_diag, rel_fro, err_pt = [], [], []
for r in range(NCHK):
    Co, dCo, c2o, po = oracle_fit_record(values[r], errors[r], A, reg_mats,
                                         method="chi2")
    do = np.diag(dCo)
    dt = np.diag(dC[r])
    m = do > 0
    rel_diag.append(np.median(np.abs(dt[m] - do[m]) / do[m]))
    rel_fro.append(np.linalg.norm(dC[r] - dCo) / np.linalg.norm(dCo))
    # the PRODUCT metric: predicted field variance err^2 = diag(A dC A')
    va = np.einsum("pi,ij,pj->p", A, dCo, A)
    vt = np.einsum("pi,ij,pj->p", A, dC[r], A)
    ok = va > 0
    err_pt.append(np.median(np.abs(vt[ok] - va[ok]) / va[ok]))
    print(f"rec {r}: oracle alpha {po}, tpu alpha {np.asarray(rp[r])}; "
          f"diag relerr median {rel_diag[-1]:.3e}, fro {rel_fro[-1]:.3e}, "
          f"field-var relerr median {err_pt[-1]:.3e}", flush=True)

print("SUMMARY diag_relerr median of medians", float(np.median(rel_diag)),
      "field_var relerr", float(np.median(err_pt)))
