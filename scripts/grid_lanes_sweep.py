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
rng = np.random.default_rng(0)
n = 512 * 512 * 32
lat = rng.uniform(74.0, 82.0, n)
lon = rng.uniform(252.0, 272.0, n)
alt = rng.uniform(1.0e5, 6.0e5, n)
C = rng.normal(size=model.nbasis)
ev = make_grid_evaluator(model)
f = jax.jit(lambda la, lo, al, c: ev(la, lo, al, c))
la, lo, al = map(jnp.asarray, (lat.astype(np.float32),
                               lon.astype(np.float32),
                               alt.astype(np.float32)))
c = jnp.asarray(C.astype(np.float32))
out = f(la, lo, al, c)
out.block_until_ready()
# back-to-back dispatches, one value fetch (CLAUDE.md timing rule)
REP = 12
t0 = time.perf_counter()
outs = [f(la, lo, al, c) for _ in range(REP)]
_ = np.asarray(outs[-1][:8])
dt = time.perf_counter() - t0
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
