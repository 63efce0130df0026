#!/usr/bin/env python
"""Single-chunk reproduction probe for a day record (debugging parity
outliers like the round-5 negative-chi2 record 173).

Runs the production [128 x 2400] fit chunk containing --record through
fit_records on the current backend and prints that record's chi2/alpha,
plus the f64 oracle's values.  Env knobs (VITPU_CLUSTER=0 etc.) bind at
import, so A/B by process.

Usage: python scripts/probe_record.py --record 173
"""
import argparse
import json
import os

import sys
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")

import jax

jax.config.update("jax_compilation_cache_dir",
                  os.environ["JAX_COMPILATION_CACHE_DIR"])
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

CACHE = "/root/repo/.day_check"


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--record", type=int, default=173)
    ap.add_argument("--chunk", type=int, default=128)
    ap.add_argument("--mode", default="exact")
    args = ap.parse_args()

    import sys
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from gcv_check import build_records  # same day, full 1000 records

    values, errors, A, reg_mats = build_records(1000)
    s = (args.record // args.chunk) * args.chunk
    e = s + args.chunk
    from volumetricinterp_tpu.ops.fit import fit_records

    C, dC, chi2, rp = fit_records(values[s:e], errors[s:e], A, reg_mats,
                                  method="chi2", regparam_mode=args.mode)
    i = args.record - s
    rep = {
        "record": args.record,
        "backend": jax.default_backend(),
        "cluster": os.environ.get("VITPU_CLUSTER", "1"),
        "mode": args.mode,
        "chi2": float(np.asarray(chi2)[i]),
        "log10alpha": float(np.log10(np.asarray(rp)[i, 0]))
        if np.asarray(rp)[i, 0] > 0 else None,
        "C_norm": float(np.linalg.norm(np.asarray(C)[i])),
        "dC_diag_min": float(np.min(np.diagonal(
            np.asarray(dC)[i].sum(axis=0)))),
    }
    opath = os.path.join(CACHE, "fit_oracle_1000_1.npz")
    if os.path.exists(opath):
        o = np.load(opath)
        rep["oracle_chi2"] = float(o["chi2"][args.record])
        ra = o["reg"][args.record, 0]
        rep["oracle_log10alpha"] = float(np.log10(ra)) if ra > 0 else None
    print(json.dumps(rep))


if __name__ == "__main__":
    main()
