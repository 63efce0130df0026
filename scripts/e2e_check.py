#!/usr/bin/env python
"""Full-day end-to-end receipts: calc_coeffs + saveh5 on the cached
day_check inputs, timed exactly like bench.py's e2e leg (warm graphs)."""
import json
import os
import sys
import time

import numpy as np


def main():
    os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                          "/root/repo/.jax_cache")
    import jax
    jax.config.update("jax_compilation_cache_dir",
                      os.environ["JAX_COMPILATION_CACHE_DIR"])
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

    sys.path.insert(0, "/root/repo")
    from scripts.day_check import build_inputs
    from volumetricinterp_tpu.interpolate import Interpolate

    nrec = int(os.environ.get("E2E_NREC", "1000"))
    chunk = int(os.environ.get("E2E_CHUNK", "0"))
    cfg_text = build_inputs(nrec, 1)
    if chunk:
        cfg_text += f"\nCHUNK_SIZE = {chunk}\n"  # appends inside [TPU]
    interp = Interpolate(cfg_text)
    interp.calc_coeffs()  # warm-up (compiles cached)
    t0 = time.perf_counter()
    interp.calc_coeffs()
    t1 = time.perf_counter()
    interp.saveh5()
    t2 = time.perf_counter()
    print(json.dumps({
        "full_day_e2e_s": round(t2 - t0, 2),
        "calc_coeffs_s": round(t1 - t0, 2),
        "saveh5_s": round(t2 - t1, 2),
        "nan_frac": float(np.isnan(interp.chi_sq).mean()),
        "backend": jax.default_backend(),
    }))


if __name__ == "__main__":
    main()
