#!/usr/bin/env python
"""Device probe: the exact-path chi2_floor (alpha -> 0 ladder evaluation)
for specific bench-day records, vs the f64 oracle values.  One tiny graph."""
import os
import sys

import numpy as np

sys.path.insert(0, "/root/repo")
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
import jax

jax.config.update("jax_compilation_cache_dir",
                  os.environ["JAX_COMPILATION_CACHE_DIR"])
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
import jax.numpy as jnp

from volumetricinterp_tpu.config import Config
from volumetricinterp_tpu.models.sphharmlag import Model
from volumetricinterp_tpu.io.amisr import read_datafile
from volumetricinterp_tpu.ops.fit import prepare_fit_inputs
from volumetricinterp_tpu.ops.solve import (chi2_from_eig_x,
                                            normalized_eigh_x, suff_stats_x)

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
RECORDS = [int(a) for a in sys.argv[1:]] or [459, 788, 100, 500]

model = Model(Config.from_text(cfg_text))
utime, lat, lon, alt, value, error = read_datafile(
    "/root/repo/.day_check/day_1000_1.h5", "dens", [1e10, 1e13],
    [0.1, 10.0], [1, 2, 3, 4])
_, t, _ = model.transform_coord(lat, lon, alt)
model.ensure_theta_domain(float(np.max(np.asarray(t))))
A = np.asarray(model.basis(lat, lon, alt))
psi = np.asarray(model.eval_psi())

idx = np.asarray(RECORDS)
b_x, W_x, mask, A_x, _ = prepare_fit_inputs(
    value[idx], error[idx], A, psi[None])


@jax.jit
def floors(b_x, W_x, mask):
    def one(bb, ww, mm):
        AtWA_x, AtWb_x, btWb_x, N = suff_stats_x(A_x, bb, ww, mm)
        w_x, Vx, s, M_x = normalized_eigh_x(AtWA_x)
        c2 = chi2_from_eig_x(w_x, Vx, M_x, AtWb_x, btWb_x, s)
        aw = jnp.abs(w_x[0])
        keep = jnp.sum(aw > 2.220446049250313e-16 * jnp.max(aw))
        return c2, N, keep

    return jax.vmap(one)(b_x, W_x, mask)


c2, N, keep = floors(b_x, W_x, mask)
c2 = np.asarray(c2)
N = np.asarray(N)
keep = np.asarray(keep)
for i, r in enumerate(RECORDS):
    print(f"record {r}: device chi2_floor = {c2[i]:.4f}, N = {N[i]:.0f}, "
          f"keep = {keep[i]:.0f}, floor/N = {c2[i]/N[i]:.4f}")
