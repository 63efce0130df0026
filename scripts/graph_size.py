#!/usr/bin/env python
"""Measure the traced/compiled size of the exact-mode fit graph.

The cold-start wall (VERDICT r3 item 1) is compile time: the fit graph
serialized at 37-114 MB and a cold remote compile cost ~340 s.  This script
lowers ``ops.fit._fit_records_core`` with TPU-SHAPED inputs (f32 expansions
— the same tracing path the device takes, since the expansion word dtype is
what selects every branch) on CPU and reports:

  * StableHLO module size (bytes of the serialized lowered module)
  * HLO op counts by op name (where the graph bloat lives)
  * trace time and CPU compile time (a proxy; the remote TPU compile of the
    same graph was measured ~3x the CPU time through the dev tunnel)

Run:  python scripts/graph_size.py [--nrec 8] [--npts 512] [--nbasis 144]
(production shapes are [128, 2400, 144]; tracing cost is shape-independent,
so small shapes measure the same graph structure faster.)
"""

import argparse
import collections
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("JAX_PLATFORMS", "cpu")

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--nrec", type=int, default=8)
    ap.add_argument("--npts", type=int, default=512)
    ap.add_argument("--nbasis", type=int, default=144)
    ap.add_argument("--compile", action="store_true",
                    help="also run the CPU compile (slow) and time it")
    ap.add_argument("--mode", default="exact")
    args = ap.parse_args()

    import jax

    jax.config.update("jax_platforms", "cpu")

    import jax.numpy as jnp
    from volumetricinterp_tpu.ops import fit as fitmod
    from volumetricinterp_tpu.ops.xprec import split_f64_host

    rng = np.random.default_rng(0)
    nrec, npts, nb = args.nrec, args.npts, args.nbasis
    A = rng.normal(size=(npts, nb))
    # graded columns so the keep/cutoff machinery traces realistically
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
    if args.mode in ("exact",):
        reg_eigR = fitmod._reg_mats_eig(np.asarray(reg_mats, np.float64),
                                        reg_mats_x)

    t0 = time.perf_counter()
    lowered = fitmod._fit_records_core.lower(
        b_x, W_x, mask_d, A_x, reg_mats_x, method="chi2",
        manual_log_params=None, regparam_mode=args.mode,
        reg_taus_x=None, reg_eigR=reg_eigR)
    t_trace = time.perf_counter() - t0

    stablehlo = lowered.as_text()
    size = len(stablehlo.encode())

    ops = collections.Counter()
    for m in re.finditer(r"=\s+(?:stablehlo\.)?([a-z_0-9.]+)", stablehlo):
        ops[m.group(1)] += 1
    total_ops = sum(ops.values())

    print(f"shapes: nrec={nrec} npts={npts} nbasis={nb} mode={args.mode}")
    print(f"trace time:           {t_trace:8.1f} s")
    print(f"stablehlo text size:  {size/1e6:8.2f} MB")
    print(f"total ops:            {total_ops:8d}")
    print("top ops:")
    for name, cnt in ops.most_common(15):
        print(f"  {name:28s} {cnt:8d}")

    if args.compile:
        t0 = time.perf_counter()
        compiled = lowered.compile()
        t_comp = time.perf_counter() - t0
        try:
            mem = compiled.memory_analysis()
            code = getattr(mem, "generated_code_size_in_bytes", None)
        except Exception:
            code = None
        print(f"CPU compile time:     {t_comp:8.1f} s")
        if code is not None:
            print(f"generated code size:  {code/1e6:8.2f} MB")


if __name__ == "__main__":
    main()
