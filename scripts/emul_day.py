#!/usr/bin/env python
"""Emulated-TPU mini-day: run the full expansion-path fit (3-word f32
splits, TPU-grade eigh noise) on CPU over the first NREC records of the
cached synthetic day and compare chi2/alpha to the f64 oracle.

Usage: python scripts/emul_day.py [--nrec 96] [--chunk 32]
"""
import argparse
import os
import sys
import time

sys.path.insert(0, "/root/repo")
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
import jax.numpy as jnp

from volumetricinterp_tpu.ops import fit as fitops, solve, xprec
from volumetricinterp_tpu.interpolate import Interpolate

CACHE = "/root/repo/.day_check"


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--nrec", type=int, default=96)
    ap.add_argument("--chunk", type=int, default=32)
    args = ap.parse_args()

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
    reg_mats = np.asarray(np.stack(
        [interp._reg_matrices()[r] for r in interp.regularization_list]),
        np.float64)
    _, lat, lon, alt, value, error = interp.read_datafile(interp.filename)
    _, tt, _ = interp.model.transform_coord(lat, lon, alt)
    interp.model.ensure_theta_domain(float(np.max(np.asarray(tt))))
    A = np.asarray(interp.model.basis(lat, lon, alt), np.float64)

    n = args.nrec
    value, error = value[:n], error[:n]
    mask = np.isfinite(value)
    W = np.where(mask, np.where(mask, error, 1.0) ** -2.0, 0.0)
    b = np.where(mask, value, 0.0)

    def split(x, nw):
        return tuple(map(jnp.asarray, xprec.split_f64_host(
            np.asarray(x, np.float64), nw)))

    A_x = split(A, 2)
    reg_mats_x = split(reg_mats, 3)
    reg_eigR = fitops._reg_mats_eig(reg_mats, reg_mats_x)

    t0 = time.perf_counter()
    Cs, c2s, las = [], [], []
    for s in range(0, n, args.chunk):
        e = min(s + args.chunk, n)
        C, dC, c2, la = fitops._fit_records_core(
            split(b[s:e], 2), split(W[s:e], 2),
            jnp.asarray(mask[s:e].astype(np.float32)), A_x, reg_mats_x,
            method="chi2", regparam_mode="exact", reg_eigR=reg_eigR)
        Cs.append(np.asarray(C))
        c2s.append(np.asarray(c2))
        las.append(np.asarray(la))
    c2 = np.concatenate(c2s)
    la = np.concatenate(las)[:, 0].astype(np.float64)
    dt_all = time.perf_counter() - t0

    o = np.load(os.path.join(CACHE, "fit_oracle_1000_1.npz"))
    oc2, orp = o["chi2"][:n], o["reg"][:n, 0]
    both = np.isfinite(c2) & np.isfinite(oc2)
    rel = np.abs(c2[both] - oc2[both]) / np.abs(oc2[both])
    la_o = np.log10(np.where(orp[both] > 0, orp[both], np.nan))
    dla = np.abs(la[both] - la_o)
    print({
        "nrec": n, "wall_s": round(dt_all, 1),
        "nan_mismatch": int((np.isnan(c2) != np.isnan(oc2)).sum()),
        "chi2_rel_median": round(float(np.median(rel)), 5),
        "chi2_rel_p90": round(float(np.percentile(rel, 90)), 5),
        "chi2_rel_max": round(float(np.max(rel)), 5),
        "dla_median": round(float(np.nanmedian(dla)), 4),
        "dla_p90": round(float(np.nanpercentile(dla, 90)), 3),
        "dla_max": round(float(np.nanmax(dla)), 2),
    })


if __name__ == "__main__":
    main()
