#!/usr/bin/env python
"""Probe the anchored GCV objective on device vs the f64 brute identity:
objective values over a log10(alpha) grid for a few bench-day records.
Shows whether the device landscape matches (minimum location + noise)."""
import os
import sys

import numpy as np

sys.path.insert(0, "/root/repo")
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
import jax

ON_CPU = os.environ.get("PROBE_CPU", "0") == "1"
if ON_CPU:
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)
jax.config.update("jax_compilation_cache_dir",
                  os.environ["JAX_COMPILATION_CACHE_DIR"])
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
import jax.numpy as jnp

from volumetricinterp_tpu.config import Config
from volumetricinterp_tpu.models.sphharmlag import Model
from volumetricinterp_tpu.io.amisr import read_datafile
from volumetricinterp_tpu.ops import regparam, solve
from volumetricinterp_tpu.ops.fit import prepare_fit_inputs
from volumetricinterp_tpu.ops.solve import suff_stats_x
from volumetricinterp_tpu.ops.xprec import exp_hi

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
model = Model(Config.from_text(cfg_text))
utime, lat, lon, alt, value, error = read_datafile(
    "/root/repo/.day_check/day_1000_1.h5", "dens", [1e10, 1e13],
    [0.1, 10.0], [1, 2, 3, 4])
_, t, _ = model.transform_coord(lat, lon, alt)
model.ensure_theta_domain(float(np.max(np.asarray(t))))
A = np.asarray(model.basis(lat, lon, alt))
psi = np.asarray(model.eval_psi())

RECORDS = [0, 100]
GRID = np.arange(-44.0, -22.0, 2.0)

idx = np.asarray(RECORDS)
b_x, W_x, mask, A_x, reg_x = prepare_fit_inputs(
    value[idx], error[idx], A, psi[None])


@jax.jit
def objs(b_x, W_x, mask):
    def one(bb, ww, mm):
        AtWA_x, AtWb_x, btWb_x, N = suff_stats_x(A_x, bb, ww, mm)
        eigA = solve.normalized_eigh_x(AtWA_x)
        R_x = tuple(w[0] for w in reg_x)
        VA_x = eigA[1]
        bun = regparam._gcv_basis_bundle(VA_x, AtWA_x, R_x, AtWb_x, A_x)
        Wm = jnp.where(mm > 0, exp_hi(ww), 0.0)
        return jnp.stack([
            regparam.gcv_objective_anchored(
                jnp.asarray(a, exp_hi(btWb_x).dtype), bun, exp_hi(bb),
                Wm, mm)
            for a in GRID
        ])

    return jax.vmap(one)(b_x, W_x, mask)


out = np.asarray(objs(b_x, W_x, mask))
for i, r in enumerate(RECORDS):
    print(f"record {r}:")
    for a, v in zip(GRID, out[i]):
        print(f"  log10(alpha) = {a:7.1f}   objective = {v:.8e}")
