#!/usr/bin/env python
"""Measure the COLD compile wall of the exact-mode fit graph on the real TPU.

VERDICT r3 item 1's receipt: trace time + remote compile time of
``ops.fit._fit_records_core`` at production shapes, against a FRESH
compilation-cache directory (so nothing is served from disk).  Run with
the default axon platform:

    python scripts/cold_compile_probe.py [--nrec 128 --npts 2400 --nbasis 144]

Do not run concurrently with another TPU process.
"""

import argparse
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# fresh cache dir BEFORE jax import so nothing warm leaks in
_cache = tempfile.mkdtemp(prefix="vitpu_coldprobe_")
os.environ["JAX_COMPILATION_CACHE_DIR"] = _cache

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--nrec", type=int, default=128)
    ap.add_argument("--npts", type=int, default=2400)
    ap.add_argument("--nbasis", type=int, default=144)
    ap.add_argument("--mode", default="exact")
    ap.add_argument("--platform", default=None,
                    help="override platform (e.g. cpu); default = axon/TPU")
    args = ap.parse_args()

    import jax

    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    jax.config.update("jax_compilation_cache_dir", _cache)

    import jax.numpy as jnp
    from volumetricinterp_tpu.ops import fit as fitmod
    from volumetricinterp_tpu.ops.xprec import split_f64_host

    print(f"platform: {jax.devices()[0].platform}  cache: {_cache}")

    rng = np.random.default_rng(0)
    nrec, npts, nb = args.nrec, args.npts, args.nbasis
    A = rng.normal(size=(npts, nb))
    A *= 10.0 ** rng.uniform(-8, 0, size=nb)[None, :]
    values = rng.normal(size=(nrec, npts)) * 1e11
    errors = np.abs(rng.normal(size=(nrec, npts))) * 1e10 + 1e9
    R = rng.normal(size=(nb, nb))
    R = R @ R.T
    reg_mats = R[None]

    def xsplit(x, nw):
        return tuple(map(jnp.asarray, split_f64_host(x, nw)))

    mask = np.isfinite(values)
    W = np.where(mask, errors, 1.0) ** -2.0
    b = np.where(mask, values, 0.0)
    b_x = xsplit(b, 2)
    W_x = xsplit(W, 2)
    mask_d = jnp.asarray(mask.astype(np.float32))
    A_x = xsplit(A, 2)
    reg_mats_x = xsplit(reg_mats, 3)
    reg_eigR = None
    if args.mode == "exact":
        reg_eigR = fitmod._reg_mats_eig(np.asarray(reg_mats, np.float64),
                                        reg_mats_x)

    t0 = time.perf_counter()
    lowered = fitmod._fit_records_core.lower(
        b_x, W_x, mask_d, A_x, reg_mats_x, method="chi2",
        manual_log_params=None, regparam_mode=args.mode,
        reg_taus_x=None, reg_eigR=reg_eigR)
    t_trace = time.perf_counter() - t0
    print(f"trace time:       {t_trace:8.1f} s")

    t0 = time.perf_counter()
    compiled = lowered.compile()
    t_compile = time.perf_counter() - t0
    print(f"cold compile:     {t_compile:8.1f} s")

    # one execution so the receipt includes a successful run
    t0 = time.perf_counter()
    out = compiled(b_x, W_x, mask_d, A_x, reg_mats_x,
                   manual_log_params=None, reg_taus_x=None,
                   reg_eigR=reg_eigR)
    jax.block_until_ready(out)
    t_run = time.perf_counter() - t0
    print(f"first run:        {t_run:8.1f} s")
    print(f"TOTAL cold wall:  {t_trace + t_compile + t_run:8.1f} s")


if __name__ == "__main__":
    main()
