#!/usr/bin/env python
"""Stage-level accounting of the keogram/volume product path (VERDICT r4
item 2): where the wall-clock of Estimate.evaluate_records goes at
BASELINE config-4 scale (512 x 512 x 128 = 33.5M points x 8 records), and
what the transfer-bound ceiling of the tunnelled single-chip setup is.

Usage: python scripts/profile_keogram.py [--coef /root/repo/.day_check/coef.h5]
One TPU process at a time.
"""
import argparse
import datetime as dt
import json
import os
import time

import sys
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir",
                  os.environ["JAX_COMPILATION_CACHE_DIR"])
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--coef", default="/root/repo/.day_check/coef.h5")
    ap.add_argument("--nrec", type=int, default=8)
    args = ap.parse_args()

    from volumetricinterp_tpu import Estimate
    from volumetricinterp_tpu import coords
    from volumetricinterp_tpu.utils.hull import np_check_hull

    est = Estimate(args.coef)
    mt = np.mean(est.time, axis=1)
    times = [dt.datetime(1970, 1, 1) + dt.timedelta(seconds=float(s))
             for s in mt[:args.nrec]]
    klat, klon, kalt = np.meshgrid(
        np.linspace(74.0, 82.0, 512),
        np.linspace(252.0, 272.0, 512),
        np.linspace(1.0e5, 6.0e5, 128),
    )
    npts = klat.size
    n_total = npts * len(times)
    rep = {"npts_grid": npts, "nrec": len(times), "npts_total": n_total}

    def t(f, *a, **k):
        t0 = time.perf_counter()
        out = f(*a, **k)
        return out, time.perf_counter() - t0

    # --- one-time (cached per grid) stages, measured standalone ----------
    _, rep["cap_band_s"] = t(
        coords.np_geodetic_to_cap, klat.ravel(), klon.ravel(), kalt.ravel(),
        est.model.latcp, est.model.loncp)
    inside, rep["hull_mask_s"] = t(
        np_check_hull, est._hull_eqs, klat, klon, kalt)
    rep["inside_frac"] = round(float(inside.mean()), 4)

    def upload():
        a = jnp.asarray(klat.ravel(), jnp.float32)
        b = jnp.asarray(klon.ravel(), jnp.float32)
        c = jnp.asarray(kalt.ravel(), jnp.float32)
        jax.block_until_ready((a, b, c))
        float(np.asarray(c[:1])[0])  # fence
        return a, b, c

    (_lat_d, _lon_d, _alt_d), rep["grid_upload_s"] = t(upload)
    up_mb = 3 * npts * 4 / 1e6
    rep["upload_MBps"] = round(up_mb / rep["grid_upload_s"], 1)

    # --- steady-state call: cold (builds caches) then warm ---------------
    _, rep["call_cold_s"] = t(
        est.evaluate_records, times, klat, klon, kalt)
    out, rep["call_warm_s"] = t(
        est.evaluate_records, times, klat, klon, kalt)
    rep["warm_pts_per_s"] = round(n_total / rep["call_warm_s"], 1)
    rep["finite_frac"] = round(float(np.isfinite(out).mean()), 4)

    # --- decompose the warm call: dispatch (device compute) vs fetch -----
    g = est._prepared_grid
    ev = est._grid_ev
    Cs = np.stack([np.asarray(est.get_C(tt)[0]) for tt in times])
    from volumetricinterp_tpu.estimate import _mask_records_device

    @jax.jit
    def _head(x):  # jitted 1-element fence (eager slices through the
        return x[:1, :1]   # tunnel are remote AOT compiles, seconds each)

    def dispatch_only():
        blk = ev.eval_records(Cs, g["lat_d"], g["lon_d"], g["alt_d"])
        blk = _mask_records_device(jnp.reshape(blk, (len(Cs), npts)),
                                   g["inside_d"])
        float(np.asarray(_head(blk))[0, 0])  # fence, no bulk fetch
        return blk

    blk = dispatch_only()  # warm _head's compile out of the timing
    blk, rep["eval_dispatch_s"] = t(dispatch_only)
    _, rep["output_fetch_s"] = t(np.asarray, blk)
    down_mb = n_total * 4 / 1e6
    rep["fetch_MBps"] = round(down_mb / rep["output_fetch_s"], 1)
    # the ceiling of ANY implementation on this link: the output block
    # must cross device->host once (the evaluation itself overlaps it in
    # the chunked pipeline, so it is not added)
    ceil = n_total / rep["output_fetch_s"]
    rep["transfer_bound_ceiling_pts_per_s"] = round(ceil, 1)
    rep["warm_vs_ceiling"] = round(rep["warm_pts_per_s"] / ceil, 3)
    print(json.dumps(rep, indent=1))


if __name__ == "__main__":
    main()
