#!/usr/bin/env python
"""Isolated precision of the DEVICE design-matrix / point-eval path vs
host float64 (VERDICT r3 item 4's receipt).

Round 3 shipped docstrings claiming "exact float64 even on TPU" for the
Clenshaw table path and "the float64 path" for Estimate.__call__, while
ops/xprec.py's receipts show this TPU has no real f64 (elementwise "f64"
rounds at f32, storage truncates on transfer).  Round 4 rerouted every
concrete-input basis/gradient/point evaluation to HOST numpy (true f64,
and no eager-op tunnel cost); this probe measures what the device path
actually delivers, in isolation, so the docs state numbers:

  * sphharmlag design matrix: device `_design_jit` (f64-typed, truncated
    to f32 semantics on this TPU) vs host `_design_np`
  * gradient matrix: `_grad_jit` vs `_grad_np`
  * point evaluation A @ C at physical coefficient scales

Run on the TPU (default platform) or CPU (--platform cpu; there the
device path is true f64 and errors should print at ~1e-16).
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def relstats(dev, host, name):
    dev = np.asarray(dev, np.float64)
    host = np.asarray(host, np.float64)
    scale = np.max(np.abs(host))
    d = np.abs(dev - host)
    denom = np.abs(host) + 1e-300
    rel = d / denom
    print(f"{name:34s} max|dA|/||A||max {np.max(d)/scale:9.2e}   "
          f"rel median {np.median(rel):9.2e}  p99 "
          f"{np.quantile(rel, 0.99):9.2e}  max {np.max(rel):9.2e}")
    return np.max(d) / scale


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--platform", default=None)
    ap.add_argument("--npts", type=int, default=4096)
    args = ap.parse_args()

    import jax

    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    jax.config.update("jax_enable_x64", True)

    import jax.numpy as jnp
    from volumetricinterp_tpu.config import Config
    from volumetricinterp_tpu import models

    print(f"platform: {jax.devices()[0].platform}")

    cfg = Config.from_file(os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "volumetricinterp_tpu", "example_config.ini"))
    model = models.make_model(cfg.model.name, cfg)

    rng = np.random.default_rng(7)
    n = args.npts
    lat = rng.uniform(74.0, 80.0, n)
    lon = rng.uniform(255.0, 275.0, n)
    alt = rng.uniform(1.2e5, 6.0e5, n)

    # host truth
    z, t, p = model._coords_for(lat, lon, alt)
    A_host = model._design_np(z, t, p)
    G_host = model._grad_np(z, t, p)

    # device path (what basis() used through round 3): same host coords,
    # table+Clenshaw evaluated through jit on the default backend
    A_dev = np.asarray(model._design_jit(
        jnp.asarray(z), jnp.asarray(t), jnp.asarray(p),
        jnp.asarray(model.tables.coef_np), model.tables.theta_max))
    G_dev = np.asarray(model._grad_jit(
        jnp.asarray(z), jnp.asarray(t), jnp.asarray(p),
        jnp.asarray(model.tables.coef_np), model.tables.theta_max))

    relstats(A_dev, A_host, "design matrix A")
    relstats(G_dev, G_host, "gradient G")

    # point evaluation at physical scales (Ne coefficients ~ 1e11)
    C = rng.normal(size=model.nbasis) * 1e11 / np.sqrt(model.nbasis)
    relstats(A_dev @ C, A_host @ C, "A @ C (point eval)")

    # full device-f64 round trip of the product (old Estimate.__call__):
    # einsum on device too
    P_dev = np.asarray(
        jnp.einsum("ni,i->n", jnp.asarray(A_dev), jnp.asarray(C)))
    relstats(P_dev, A_host @ C, "device einsum A @ C")


if __name__ == "__main__":
    main()
