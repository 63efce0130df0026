#!/usr/bin/env python
"""Grid-kernel LANES sweep (VERDICT r3 item 8): time the Pallas kernel at
several tile widths.  Each width is a new kernel -> fresh compile; run
sequentially (one TPU process at a time).

Usage: python scripts/grid_lanes_sweep.py [--lanes 512,1024,2048,4096]
"""
import argparse
import json
import os
import subprocess
import sys

CHILD = r"""
import os, sys, time
sys.path.insert(0, "/root/repo")
import numpy as np
import jax
jax.config.update("jax_compilation_cache_dir",
                  os.environ.get("JAX_COMPILATION_CACHE_DIR",
                                 "/root/repo/.jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
import jax.numpy as jnp
from volumetricinterp_tpu.config import Config
from volumetricinterp_tpu.models.sphharmlag import Model
from volumetricinterp_tpu.ops.grid_eval import make_grid_evaluator

cfg = Config.from_text('''
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
''')
model = Model(cfg)
from volumetricinterp_tpu import coords
rng = np.random.default_rng(0)
n = 512 * 512 * 32
lat = rng.uniform(74.0, 82.0, n)
lon = rng.uniform(252.0, 272.0, n)
alt = rng.uniform(1.0e5, 6.0e5, n)
C = rng.normal(size=model.nbasis) * 1e11
_, t, _ = coords.np_geodetic_to_cap(lat, lon, alt, model.latcp, model.loncp)
ev = make_grid_evaluator(model, (float(t.min()), float(t.max())))
ceff = ev.fold_coeffs(C)
la, lo, al = (jnp.asarray(lat, ev.dtype), jnp.asarray(lon, ev.dtype),
              jnp.asarray(alt, ev.dtype))
out = ev._jit_eval(ceff, la, lo, al)
float(np.asarray(out.ravel()[:1])[0])  # compile + warm fence
t0 = time.perf_counter()
float(np.asarray(out.ravel()[:1])[0])
rtt = time.perf_counter() - t0
# back-to-back dispatches, one value fetch (CLAUDE.md timing rule)
REP = 25
t0 = time.perf_counter()
for _ in range(REP):
    out = ev._jit_eval(ceff, la, lo, al)
float(np.asarray(out.ravel()[:1])[0])
dt = time.perf_counter() - t0 - rtt
print("RESULT", n * REP / dt)
"""


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--lanes", default="512,1024,2048,4096")
    args = ap.parse_args()
    out = {}
    for lanes in args.lanes.split(","):
        e = dict(os.environ)
        e["VITPU_GRID_LANES"] = lanes
        e.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
        p = subprocess.run([sys.executable, "-c", CHILD], env=e,
                           capture_output=True, text=True, timeout=1800)
        rate = None
        for line in p.stdout.splitlines():
            if line.startswith("RESULT"):
                rate = float(line.split()[1])
        if rate is None:
            print(f"lanes {lanes}: FAILED\n{p.stdout[-1500:]}\n{p.stderr[-1500:]}")
        else:
            out[lanes] = rate
            print(f"lanes {lanes}: {rate:.3e} pts/s", flush=True)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
