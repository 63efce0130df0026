#!/usr/bin/env python
"""Keep-count / covariance straddle receipts (VERDICT r3 item 2).

Compares, on REAL AMISR-basis day records (the bench day generator):
  * the device exact-mode pipeline's OWN keep decisions at its final
    solve (chi2 search -> anchored final solve, want_keep=True)
  * the f64 oracle's keep counts (same pipeline on CPU, where the
    expansion code IS plain f64)
plus the dC per-coefficient diagonal and predicted-field-variance error
vs the oracle — the PARITY_NOTES #8 metrics the cluster pass targets.

Usage:
  python scripts/probe_keep.py --oracle    # CPU f64 leg (cached)
  python scripts/probe_keep.py             # device leg + compare
  VITPU_CLUSTER=0 python scripts/probe_keep.py --tag nocluster  # A/B
"""
import argparse
import json
import os
import sys
import time

import numpy as np

CACHE = "/root/repo/.day_check"


def build_records(nrec, seed=1):
    from volumetricinterp_tpu.config import Config
    from volumetricinterp_tpu.models.sphharmlag import Model
    from volumetricinterp_tpu.io.synth import write_synthetic_amisr
    from volumetricinterp_tpu.io.amisr import read_datafile

    cfg_text = """
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
    os.makedirs(CACHE, exist_ok=True)
    raw = os.path.join(CACHE, "day_1000_1.h5")
    model = Model(Config.from_text(cfg_text))
    if not os.path.exists(raw):
        write_synthetic_amisr(raw, nrec=1000, seed=1, smooth_in_model=model,
                              nan_frac=0.03, bad_frac=0.01)
    utime, lat, lon, alt, value, error = read_datafile(
        raw, "dens", [1e10, 1e13], [0.1, 10.0], [1, 2, 3, 4])
    _, t, _ = model.transform_coord(lat, lon, alt)
    model.ensure_theta_domain(float(np.max(np.asarray(t))))
    A = np.asarray(model.basis(lat, lon, alt))
    psi = np.asarray(model.eval_psi())
    step = max(1, 1000 // nrec)
    idx = np.arange(0, 1000, step)[:nrec]
    return value[idx], error[idx], A, psi[None]


def run_leg(values, errors, A, reg_mats, tag, at_roots=None):
    """fit_records-equivalent pipeline, instrumented with want_keep.

    at_roots: optional [nrec] log10 alphas — skip the search and
    final-solve each record AT the given alpha (same-alpha receipts:
    isolates the ladder/cluster extraction quality from root scatter
    along the chi2 staircase plateau, PARITY_NOTES #7)."""
    import jax
    import jax.numpy as jnp
    from functools import partial
    from volumetricinterp_tpu.ops import fit as F, regparam, solve

    b_x, W_x, mask, A_x, reg_mats_x = F.prepare_fit_inputs(
        values, errors, A, reg_mats)
    reg_eigR = F._reg_mats_eig(np.asarray(reg_mats, np.float64), reg_mats_x)

    @partial(jax.jit)
    def core(b_x, W_x, mask, A_x, reg_mats_x, reg_eigR):
        def one(b, w, m):
            AtWA_x, AtWb_x, btWb_x, N = solve.suff_stats_x(A_x, b, w, m)
            R_x = tuple(wd[0] for wd in reg_mats_x)
            eigR = (tuple(wd[0] for wd in reg_eigR[0]), reg_eigR[1][0])
            eigA = solve.normalized_eigh_x(AtWA_x)
            root, anchor, _fb = regparam.chi2_reg_param(
                AtWA_x, AtWb_x, btWb_x, N, R_x, eigA=eigA, eigR=eigR,
                want_anchor=True)
            C, dC, chi2, (kC, kH) = solve.final_solve_anchor_x(
                anchor, root, AtWA_x, AtWb_x, btWb_x, want_keep=True)
            bad = jnp.isnan(root)
            return (jnp.where(bad, jnp.nan, C), jnp.where(bad, jnp.nan, dC),
                    jnp.where(bad, jnp.nan, chi2), root,
                    kC.astype(jnp.int32), kH.astype(jnp.int32))

        return jax.vmap(one)(b_x, W_x, mask)

    @partial(jax.jit)
    def core_at(b_x, W_x, mask, A_x, reg_mats_x, roots):
        def one(b, w, m, a_log):
            AtWA_x, AtWb_x, btWb_x, N = solve.suff_stats_x(A_x, b, w, m)
            R_x = tuple(wd[0] for wd in reg_mats_x)
            eigA = solve.normalized_eigh_x(AtWA_x)
            mm, kk = solve.pow10_split(a_log)
            Xx = solve.exp_add(AtWA_x, solve.exp_mul_split(R_x, mm, kk))
            eig2 = solve.normalized_eigh_boot_x(Xx, eigA[1], tail="mid")
            anchor = solve.make_anchor_x(a_log, eig2, R_x, AtWb_x)
            C, dC, chi2, (kC, kH) = solve.final_solve_anchor_x(
                anchor, a_log, AtWA_x, AtWb_x, btWb_x, want_keep=True)
            return (C, dC, chi2, a_log,
                    kC.astype(jnp.int32), kH.astype(jnp.int32))

        return jax.vmap(one)(b_x, W_x, mask, roots)

    t0 = time.perf_counter()
    if at_roots is not None:
        dt = b_x[0].dtype
        roots = jnp.asarray(np.asarray(at_roots), dt)
        C, dC, chi2, root, kC, kH = core_at(b_x, W_x, mask, A_x,
                                            reg_mats_x, roots)
    else:
        C, dC, chi2, root, kC, kH = core(b_x, W_x, mask, A_x, reg_mats_x,
                                         reg_eigR)
    C = np.asarray(C, np.float64)
    wall = time.perf_counter() - t0
    import jax as _j
    from volumetricinterp_tpu.ops.fit import cov_to_f64
    out = dict(C=C, dC=cov_to_f64(dC),
               chi2=np.asarray(chi2, np.float64),
               root=np.asarray(root, np.float64),
               kC=np.asarray(kC), kH=np.asarray(kH), wall=wall,
               backend=_j.default_backend())
    np.savez(os.path.join(CACHE, f"keep_{tag}.npz"), **out)
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--oracle", action="store_true")
    ap.add_argument("--nrec", type=int, default=64)
    ap.add_argument("--tag", default="tpu")
    ap.add_argument("--same-alpha", action="store_true",
                    help="final-solve at the CACHED ORACLE roots instead "
                    "of searching (extraction-quality receipts)")
    args = ap.parse_args()

    os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                          "/root/repo/.jax_cache")
    import jax
    jax.config.update("jax_compilation_cache_dir",
                      os.environ["JAX_COMPILATION_CACHE_DIR"])
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    if args.oracle:
        jax.config.update("jax_platforms", "cpu")
        jax.config.update("jax_enable_x64", True)

    values, errors, A, reg_mats = build_records(args.nrec)
    tag = "oracle" if args.oracle else args.tag
    at_roots = None
    if args.same_alpha:
        at_roots = np.load(os.path.join(CACHE, "keep_oracle.npz"))["root"]
        at_roots = at_roots[: args.nrec]
        tag = tag + "_samealpha"
    out = run_leg(values, errors, A, reg_mats, tag, at_roots=at_roots)
    rep = {f"{tag}_wall_s": round(out["wall"], 2),
           "backend": out["backend"],
           "nan_frac": float(np.isnan(out["chi2"]).mean())}

    opath = os.path.join(CACHE, "keep_oracle.npz")
    if not args.oracle and os.path.exists(opath):
        o = np.load(opath)
        both = np.isfinite(out["chi2"]) & np.isfinite(o["chi2"])
        dkC = (out["kC"] - o["kC"])[both]
        dkH = (out["kH"] - o["kH"])[both]
        # SAME-ALPHA comparison: root scatter along the chi2 staircase
        # plateau is legitimate reference-grade noise (PARITY_NOTES #7),
        # so also compare the device keep against the f64 keep of
        # X(root_device) — this isolates the ladder's extraction quality
        dkC_same, dkH_same = [], []
        n = A.shape[1]
        for r in np.where(both)[0]:
            rt = out["root"][r]
            alpha = 0.0 if np.isneginf(rt) else 10.0 ** rt
            mask = np.isfinite(values[r])
            W = np.where(mask, errors[r], 1.0) ** -2.0 * mask
            X = (A.T * W) @ A + alpha * reg_mats[0]
            aw = np.abs(np.linalg.eigvalsh(X))
            kC64 = int((aw > 2.220446049250313e-16 * aw.max()).sum())
            kH64 = int((aw > n * 2.220446049250313e-16 * aw.max()).sum())
            dkC_same.append(out["kC"][r] - kC64)
            dkH_same.append(out["kH"][r] - kH64)
        dkC_same = np.asarray(dkC_same)
        dkH_same = np.asarray(dkH_same)
        # dC diagonal and field-variance error vs the oracle
        dg_t = np.diagonal(out["dC"], axis1=1, axis2=2)
        dg_o = np.diagonal(o["dC"], axis1=1, axis2=2)
        rel_diag, rel_var, wfield = [], [], []
        for r in np.where(both)[0]:
            m = dg_o[r] > 0
            rel_diag.append(np.median(
                np.abs(dg_t[r][m] - dg_o[r][m]) / dg_o[r][m]))
            va = np.einsum("pi,ij,pj->p", A, o["dC"][r], A)
            vt = np.einsum("pi,ij,pj->p", A, out["dC"][r], A)
            ok = va > 0
            rel_var.append(np.median(np.abs(vt[ok] - va[ok]) / va[ok]))
            mask = np.isfinite(values[r])
            W = np.where(mask, errors[r], 1.0) ** -2.0 * mask
            sw = np.sqrt(W)
            num = np.linalg.norm(sw * (A @ (out["C"][r] - o["C"][r])))
            den = np.linalg.norm(sw * (A @ o["C"][r]))
            wfield.append(num / max(den, 1e-300))
        rep.update({
            "n_compared": int(both.sum()),
            "keepC_absdiff_median": float(np.median(np.abs(dkC))),
            "keepC_absdiff_p95": float(np.percentile(np.abs(dkC), 95)),
            "keepC_absdiff_max": int(np.max(np.abs(dkC))),
            "keepH_absdiff_max": int(np.max(np.abs(dkH))),
            "keepC_within1_frac": float((np.abs(dkC) <= 1).mean()),
            "keepC_samealpha_median": float(np.median(np.abs(dkC_same))),
            "keepC_samealpha_max": int(np.max(np.abs(dkC_same))),
            "keepC_samealpha_within1": float(
                (np.abs(dkC_same) <= 1).mean()),
            "keepH_samealpha_max": int(np.max(np.abs(dkH_same))),
            "dC_diag_relerr_median": float(np.median(rel_diag)),
            "dC_diag_relerr_p95": float(np.percentile(rel_diag, 95)),
            "field_var_relerr_median": float(np.median(rel_var)),
            "wfield_rel_median": float(np.median(wfield)),
            "wfield_rel_max": float(np.max(wfield)),
        })
    print(json.dumps(rep))


if __name__ == "__main__":
    sys.path.insert(0, "/root/repo")
    main()
