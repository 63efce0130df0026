#!/usr/bin/env python
"""Attribute the traced fit graph's equations to source lines.

Walks the closed jaxpr of ops.fit._fit_records_core (recursing into scan /
while / cond sub-jaxprs, each counted ONCE — matching what the compiler
sees) and reports equation counts grouped by user-code source location.
Companion to scripts/graph_size.py for deciding where to attack the
compile wall next.
"""

import collections
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_PLATFORMS", "cpu")

import numpy as np


def main():
    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import jax.extend.core as jcore
    from volumetricinterp_tpu.ops import fit as fitmod
    from volumetricinterp_tpu.ops.xprec import split_f64_host

    rng = np.random.default_rng(0)
    nrec, npts, nb = 4, 512, 144
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
    args = (xsplit(b, 2), xsplit(W, 2), jnp.asarray(mask.astype(np.float32)),
            xsplit(A, 2), xsplit(reg_mats, 3))
    reg_eigR = fitmod._reg_mats_eig(np.asarray(reg_mats, np.float64), args[4])

    jaxpr = jax.make_jaxpr(
        lambda *a: fitmod._fit_records_core(*a, method="chi2",
                                            regparam_mode="exact",
                                            reg_eigR=reg_eigR))(*args)

    by_loc = collections.Counter()
    by_fn = collections.Counter()
    total = 0

    def user_frame(eqn):
        src = eqn.source_info
        tb = getattr(src, "traceback", None)
        if tb is None:
            return "<none>"
        try:
            frames = list(tb.frames)
        except Exception:
            return "<none>"
        for fr in frames:
            fn = fr.file_name
            if "volumetricinterp_tpu" in fn:
                return f"{os.path.basename(fn)}:{fr.line_num}", \
                    f"{os.path.basename(fn)}:{fr.function_name}"
        return "<lib>", "<lib>"

    def walk(jx):
        nonlocal total
        for eqn in jx.eqns:
            total += 1
            loc = user_frame(eqn)
            if isinstance(loc, tuple):
                by_loc[loc[0]] += 1
                by_fn[loc[1]] += 1
            else:
                by_loc[loc] += 1
                by_fn[loc] += 1
            for v in eqn.params.values():
                if isinstance(v, jcore.ClosedJaxpr):
                    walk(v.jaxpr)
                elif isinstance(v, jcore.Jaxpr):
                    walk(v)
                elif isinstance(v, (tuple, list)):
                    for u in v:
                        if isinstance(u, jcore.ClosedJaxpr):
                            walk(u.jaxpr)
                        elif isinstance(u, jcore.Jaxpr):
                            walk(u)

    walk(jaxpr.jaxpr)
    print(f"total eqns (subjaxprs once): {total}")
    print("\nby function:")
    for k, v in by_fn.most_common(25):
        print(f"  {k:55s} {v:7d}")
    print("\nby line:")
    for k, v in by_loc.most_common(25):
        print(f"  {k:55s} {v:7d}")


if __name__ == "__main__":
    main()
