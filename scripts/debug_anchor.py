#!/usr/bin/env python
"""Debug the anchored (M-shift) exact evaluation on the TPU EXPANSION path,
emulated on CPU: x64 OFF, 3-word f32 splits, TPU-grade eigh noise.

Compares, per record: fresh-ladder chi2 vs anchored chi2 at several deltas
from the anchor, plus the search root vs the f64 oracle root.
"""
import os
import sys

sys.path.insert(0, "/root/repo")
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
import jax.numpy as jnp

from volumetricinterp_tpu.ops import fit as fitops, regparam, solve, xprec
from volumetricinterp_tpu.config import Config
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
reg_mats_dict = interp._reg_matrices()
names = interp.regularization_list
reg_mats = np.asarray(
    np.stack([reg_mats_dict[r] for r in names]), np.float64)
utime, lat, lon, alt, value, error = interp.read_datafile(interp.filename)
if hasattr(interp.model, "transform_coord"):
    _, t, _ = interp.model.transform_coord(lat, lon, alt)
    interp.model.ensure_theta_domain(float(np.max(np.asarray(t))))
A = np.asarray(interp.model.basis(lat, lon, alt), np.float64)

# worst records by TPU-vs-oracle chi2 rel error
tpu = np.load(os.path.join(CACHE, "fit_tpu_1000_1.npz"))
orc = np.load(os.path.join(CACHE, "fit_oracle_1000_1.npz"))
both = np.isfinite(tpu["chi2"]) & np.isfinite(orc["chi2"])
rel = np.where(both, np.abs(tpu["chi2"] - orc["chi2"])
               / np.abs(orc["chi2"]), 0.0)
worst = np.argsort(rel)[::-1][:4]
print("worst records:", worst, "rel:", rel[worst])
print("tpu alphas:", tpu["reg"][worst, 0], "oracle:", orc["reg"][worst, 0])

# expansion split (TPU convention), on host
mask = np.isfinite(value)
W = np.where(mask, error, 1.0) ** -2.0
b = np.where(mask, value, 0.0)
W = np.where(mask, W, 0.0)


def split(x, nw=3):
    return tuple(map(jnp.asarray, xprec.split_f64_host(
        np.asarray(x, np.float64), nw)))


A_x = split(A, 2)
R_x = split(reg_mats[0], 3)


@jax.jit
def stats_for(b_xx, w_xx, mk):
    return solve.suff_stats_x(A_x, b_xx, w_xx, mk)


@jax.jit
def fresh_chi2(AtWA_x, AtWb_x, btWb_x, a_log):
    m, k = solve.pow10_split(a_log)
    return solve.cutoff_chi2_x(m, k, AtWA_x, AtWb_x, btWb_x, R_x)


@jax.jit
def anchored_probe(AtWA_x, AtWb_x, btWb_x, a0, deltas):
    eigA = solve.normalized_eigh_x(AtWA_x)
    m, k = solve.pow10_split(a0)
    aR_x = solve.exp_mul_split(R_x, m, k)
    Xx = solve.exp_add(AtWA_x, aR_x)
    eig = solve.normalized_eigh_boot_x(Xx, eigA[1])
    anchor = solve.make_anchor_x(a0, eig, R_x, AtWb_x)
    return jnp.stack([solve.anchor_chi2_x(anchor, a0 + d, btWb_x)
                      for d in deltas])


@jax.jit
def search_root(AtWA_x, AtWb_x, btWb_x, N):
    return regparam.chi2_reg_param(AtWA_x, AtWb_x, btWb_x, N, R_x)


deltas = [0.0, 0.25, -0.25, 0.5, -0.5, 1.0, -1.0, 2.0, -2.0]
for r in worst:
    mk = mask[r].astype(np.float32)
    AtWA_x, AtWb_x, btWb_x, N = stats_for(split(b[r], 2), split(W[r], 2),
                                          jnp.asarray(mk))
    a_oracle = float(np.log10(orc["reg"][r, 0])) \
        if orc["reg"][r, 0] > 0 else -np.inf
    root = float(search_root(AtWA_x, AtWb_x, btWb_x, N))
    print(f"\n=== record {r}: oracle root {a_oracle:.4f}  "
          f"emulated-TPU root {root:.4f}  N {float(N):.0f}")
    a0 = a_oracle if np.isfinite(a_oracle) else -10.0
    anc = np.asarray(anchored_probe(AtWA_x, AtWb_x, btWb_x,
                                    jnp.asarray(a0), deltas))
    for d, ca in zip(deltas, anc):
        cf = float(fresh_chi2(AtWA_x, AtWb_x, btWb_x,
                              jnp.asarray(a0 + d)))
        print(f"  delta {d:+.2f}: fresh {cf:.6e}  anchored {float(ca):.6e}"
              f"  rel {abs(float(ca) - cf) / max(abs(cf), 1e-300):.3e}")
