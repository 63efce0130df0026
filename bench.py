#!/usr/bin/env python
"""Benchmark: prints ONE JSON line with the headline metric.

Headline: dense grid-evaluation points/s/chip at the reference default basis
order (MAXL=6, MAXK=4 -> nbasis=144) through the fused float32 Pallas path —
BASELINE.md target: >= 1e9 points/s/chip on TPU v5e (vs_baseline is measured
against that target; the reference itself publishes no numbers and its
serial scipy pipeline is ~6 orders of magnitude slower).

Extras: batched record fits/s (chi2 regularization search included) and the
per-phase timings.
"""

import json
import os
import time

import numpy as np


def main():
    os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
    import jax

    jax.config.update("jax_compilation_cache_dir",
                      os.environ["JAX_COMPILATION_CACHE_DIR"])
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

    import jax.numpy as jnp
    from volumetricinterp_tpu.config import Config
    from volumetricinterp_tpu.models.sphharmlag import Model
    from volumetricinterp_tpu.ops.fit import fit_records
    from volumetricinterp_tpu.ops.grid_eval import GridEvaluator
    from volumetricinterp_tpu import coords

    backend = jax.default_backend()
    cfg_text = """
[DEFAULT]
REGULARIZATION_LIST = 0thorder
REGULARIZATION_METHOD = chi2
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
    model = Model(Config.from_text(cfg_text))
    rng = np.random.default_rng(0)

    # ---- headline: dense grid evaluation (BASELINE config 4 shape) -------
    nlat, nlon, nalt = 512, 512, 32  # 8.4M points per call
    glat, glon, galt = np.meshgrid(
        np.linspace(74.0, 82.0, nlat),
        np.linspace(252.0, 272.0, nlon),
        np.linspace(1.0e5, 6.0e5, nalt),
    )
    n = glat.size
    z, t, p = coords.np_geodetic_to_cap(
        glat.ravel(), glon.ravel(), galt.ravel(), model.latcp, model.loncp
    )
    ev = GridEvaluator(model, (float(t.min()), float(t.max())), impl="auto")
    C = rng.normal(size=model.nbasis) * 1e11
    ceff = ev.fold_coeffs(C)
    lat_d = jnp.asarray(glat.ravel(), dtype=ev.dtype)
    lon_d = jnp.asarray(glon.ravel(), dtype=ev.dtype)
    alt_d = jnp.asarray(galt.ravel(), dtype=ev.dtype)

    def sync(x):
        # through the axon tunnel block_until_ready can return before the
        # computation finishes; a value fetch is the reliable fence
        return float(np.asarray(x.ravel()[:1])[0])

    out = ev._jit_eval(ceff, lat_d, lon_d, alt_d)
    sync(out)  # compile + warm
    # the tunnel costs a ~30 ms round trip per host-side fetch, so timing
    # must amortize: dispatch reps back-to-back, fence once, subtract the
    # measured RTT of a trivial fetch
    t0 = time.perf_counter()
    sync(out)
    rtt = time.perf_counter() - t0
    reps = 50
    t0 = time.perf_counter()
    for _ in range(reps):
        out = ev._jit_eval(ceff, lat_d, lon_d, alt_d)
    sync(out)
    dt_eval = (time.perf_counter() - t0 - rtt) / reps
    pts_per_s = n / dt_eval

    # ---- secondary: batched fits/s (chi2 search, nbasis=144) -------------
    npts, nrec = 2400, 128
    lat = rng.uniform(74.0, 82.0, npts)
    lon = rng.uniform(252.0, 272.0, npts)
    alt = rng.uniform(1.0e5, 6.0e5, npts)
    A = np.asarray(model.basis(lat, lon, alt))
    target = 4e11 * np.exp(-(((alt - 3e5) / 1.2e5) ** 2))
    C_true = np.linalg.lstsq(A, target, rcond=1e-10)[0]
    ne = A @ C_true
    noise = 2e10 + 0.05 * np.abs(ne)
    values = ne[None] + rng.normal(0, 1, (nrec, npts)) * noise[None]
    errors = np.broadcast_to(1.15 * noise, (nrec, npts)).copy()
    psi = np.asarray(model.eval_psi())
    reg_mats = psi[None]

    fit_ok = {}

    def fit_rate(mode, reps=3):
        r0 = fit_records(values, errors, A, reg_mats, method="chi2",
                         regparam_mode=mode)
        # silent-NaN guard: a broken numerical path must show in the JSON
        fit_ok[mode] = float(np.isfinite(np.asarray(r0[2])).mean())
        sync(r0[2])
        t0 = time.perf_counter()
        sync(r0[2])
        rtt = time.perf_counter() - t0
        t0 = time.perf_counter()
        for _ in range(reps):
            # host_alphas=False = the production dispatch path (the day
            # pipeline converts alphas at materialize time); the default
            # host conversion fences every call and would serialize the
            # back-to-back dispatches this loop exists to measure
            r1 = fit_records(values, errors, A, reg_mats, method="chi2",
                             regparam_mode=mode, host_alphas=False)
        sync(r1[2])
        return nrec * reps / (time.perf_counter() - t0 - rtt)

    fits_fast = fit_rate("fast")
    fits_per_s = fit_rate("exact")

    # ---- sharded grid evaluation (the multi-chip product path, measured
    # through the mesh machinery; on one chip this quantifies sharding
    # overhead, on a pod it scales the headline) --------------------------
    from volumetricinterp_tpu.parallel import grid_eval_sharded, make_mesh

    mesh1 = make_mesh(1, len(jax.devices()))
    # steady-state product path: the grid lives on device (uploading
    # 200 MB of f64 coordinates per call through the dev tunnel would
    # measure the link, not the kernel)
    out_sh = grid_eval_sharded(ev, C, lat_d, lon_d, alt_d, mesh1)
    sync(jnp.asarray(out_sh).ravel()[:1])
    t0 = time.perf_counter()
    for _ in range(10):
        out_sh = grid_eval_sharded(ev, C, lat_d, lon_d, alt_d, mesh1)
    sync(jnp.asarray(out_sh).ravel()[:1])
    pts_sharded = n * 10 / (time.perf_counter() - t0 - rtt)

    # ---- end-to-end full day: 1000 records through the WHOLE pipeline ----
    # (read + QC + hull + design matrix + chi2 search + solve + HDF5 write;
    # BASELINE north star: < 10 s for a ~1000-record day)
    import tempfile
    from volumetricinterp_tpu import Interpolate
    from volumetricinterp_tpu.io.synth import write_synthetic_amisr

    tmp = tempfile.mkdtemp()
    raw = os.path.join(tmp, "day.h5")
    out_h5 = os.path.join(tmp, "coef.h5")
    write_synthetic_amisr(raw, nrec=1000, seed=1, smooth_in_model=model,
                          nan_frac=0.03, bad_frac=0.01)
    # NOTE: the full-day leg runs the SHIPPED DEFAULT config — exact-mode
    # regularization search (regparam_mode='exact'), no speed overrides
    e2e_cfg = cfg_text.replace(
        "[DEFAULT]",
        f"[DEFAULT]\nFILENAME = {raw}\nOUTPUTFILENAME = {out_h5}",
    )
    interp = Interpolate(e2e_cfg)
    interp.calc_coeffs()  # includes one-time compiles (cached across runs)
    t0 = time.perf_counter()
    interp.calc_coeffs()
    interp.saveh5()
    full_day_s = time.perf_counter() - t0
    # DAY-PATH OVERHEAD GATE (round 5, VERDICT r4 item 8): the day wall
    # relative to the fit-leg rate measured in THIS process — immune to
    # run-to-run tunnel variance, so a silent day-path regression (extra
    # per-chunk fences, transfer bloat) can never again hide behind
    # "the whole run was slow".  Healthy pipeline: ~1.1-1.3 (pipeline
    # ends + h5 finalize); BENCH_r04's congested run read 2.59.
    day_overhead = full_day_s * fits_per_s / 1000.0
    if day_overhead > 1.6:
        print(f"WARNING: day-path overhead ratio {day_overhead:.2f} > 1.6 "
              "— per-chunk work is leaking onto the critical path "
              "(see docs/PERF.md section 4)", flush=True)
    e2e_finite_frac = float(np.isfinite(interp.chi_sq).mean())
    # failed-record characterization against the CPU f64 oracle (the same
    # day fit by scripts/day_check.py --oracle: identical synth inputs by
    # seed).  A device-path regression cannot hide behind legitimate
    # no-bracket failures: failures the oracle does NOT share are counted
    # separately.
    e2e_failed = int(np.isnan(interp.chi_sq).sum())
    # negative chi^2 is impossible (weighted sum of squares): round 4
    # shipped one such record per day undetected because only NaN counts
    # were checked (docs/PARITY_NOTES.md #4, record 456) — count them
    # forever
    e2e_negative_chi2 = int((interp.chi_sq < 0).sum())
    e2e_failed_vs_oracle = None
    opath = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                         "tests", "oracle", "day1000_seed1_oracle.npz")
    if os.path.exists(opath) and interp.chi_sq.shape[0] == 1000:
        onan = np.isnan(np.load(opath)["chi2"])
        e2e_failed_vs_oracle = int(
            (np.isnan(interp.chi_sq) & ~onan).sum())

    # ---- keogram/volume product at BASELINE config-4 scale ---------------
    # (512 x 512 x 128 = 33.5M points per record, evaluated for a block of
    # records through Estimate.evaluate_records: includes get_C, hull mask,
    # coefficient fold/upload and the host materialization of the product)
    import datetime as _dt

    from volumetricinterp_tpu import Estimate

    est = Estimate(out_h5)
    mt = np.mean(est.time, axis=1)
    keo_times = [_dt.datetime(1970, 1, 1) + _dt.timedelta(seconds=float(s))
                 for s in mt[:8]]
    klat, klon, kalt = np.meshgrid(
        np.linspace(74.0, 82.0, 512),
        np.linspace(252.0, 272.0, 512),
        np.linspace(1.0e5, 6.0e5, 128),
    )
    n_keo = klat.size * len(keo_times)
    est.evaluate_records(keo_times, klat, klon, kalt)  # compile + warm
    t0 = time.perf_counter()
    keo = est.evaluate_records(keo_times, klat, klon, kalt)
    keogram_pts_per_s = n_keo / (time.perf_counter() - t0)
    keo_finite = float(np.isfinite(keo).mean())
    del keo

    target_pts = 1.0e9
    print(json.dumps({
        "metric": "grid-evaluation points/s/chip (lmax=6, nbasis=144, f32 fused)",
        "value": round(pts_per_s, 1),
        "unit": "points/s/chip",
        "vs_baseline": round(pts_per_s / target_pts, 4),
        "extras": {
            "backend": backend,
            "grid_points_per_call": n,
            "grid_eval_s": round(dt_eval, 5),
            "record_fits_per_s_chi2_exact": round(fits_per_s, 2),
            "record_fits_per_s_chi2_fast": round(fits_fast, 2),
            "fit_finite_frac": fit_ok,
            "grid_eval_sharded_pts_per_s": round(pts_sharded, 1),
            "full_day_1000rec_e2e_s": round(full_day_s, 2),
            "day_fit_overhead_ratio": round(day_overhead, 3),
            "e2e_finite_frac": round(e2e_finite_frac, 4),
            "e2e_failed": e2e_failed,
            "e2e_negative_chi2": e2e_negative_chi2,
            "e2e_failed_vs_oracle": e2e_failed_vs_oracle,
            "fit_batch": [nrec, npts],
            "keogram_pts_per_s": round(keogram_pts_per_s, 1),
            "keogram_finite_frac": round(keo_finite, 4),
            "eval_impl": ev.impl,
            "cheb_degree_eval": ev.degree,
        },
    }))


if __name__ == "__main__":
    main()
