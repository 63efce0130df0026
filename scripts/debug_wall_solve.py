#!/usr/bin/env python
"""Inspect the kept-block system of the floor-failing records: how ill is
the diagonally-scaled matrix CG sees, and would more CG/refine rounds or a
direct solve fix the floor?  CPU, f64 ground truth + f32 system analysis."""
import os
import sys

import numpy as np

sys.path.insert(0, "/root/repo")
import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

from volumetricinterp_tpu.config import Config
from volumetricinterp_tpu.models.sphharmlag import Model
from volumetricinterp_tpu.io.amisr import read_datafile
from volumetricinterp_tpu.ops.solve import EPS64

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

for r in [459, 788, 100]:
    v, e = value[r], error[r]
    mask = np.isfinite(v)
    W = np.where(mask, e, 1.0) ** -2.0 * mask
    b = np.where(mask, v, 0.0)
    AtWA = (A * W[:, None]).T @ A
    n = AtWA.shape[0]
    s = float(2.0 ** np.round(np.log2(np.trace(AtWA) / n)))
    Xn = AtWA / s
    w, V = np.linalg.eigh(Xn)
    aw = np.abs(w)
    keep = aw > EPS64 * aw.max()
    wk = w[keep]
    print(f"record {r}: keep {keep.sum()}, spectrum decades "
          f"{np.log10(aw.max()/np.abs(wk).min()):.1f}")
    # gaps in the kept spectrum near the cutoff (sorted ascending |w|)
    swk = np.sort(np.abs(wk))[:12]
    print("  12 smallest kept |w| / cutoff:",
          np.array2string(swk / (EPS64 * aw.max()), precision=2))
    # how many kept modes within 3x of another (the coupling-retaining
    # pairs the ladder cannot rotate apart)
    ratios = swk[1:] / swk[:-1]
    print("  adjacent ratios:", np.array2string(ratios, precision=2))
