"""Interpolate — the batched fit engine (public API parity with the
reference class of the same name, interpolate.py:16-708).

Differences under the hood (all TPU-first, see SURVEY.md section 7):
* the serial per-record loop (interpolate.py:511) is a vmapped, jit-compiled
  batch, shardable over a device mesh (parallel/fit.py);
* regularization matrices come from separable 1-D integral tables instead of
  O(nbasis^2) triple quadratures — numerically identical in 'quad' mode;
* NaN points are weight-masked instead of row-deleted, keeping shapes
  static for XLA;
* results can be flushed incrementally per record chunk and resumed
  (io.coeffs.IncrementalCoeffWriter).

Attribute parity: configfile, regularization_list, reg_method, filename,
outputfilename, param, errlim, chi2lim, goodfitcode, model_name, model,
hull_vert, time, Coeffs, Covariance, chi_sq.
"""

from __future__ import annotations

import datetime as dt
import os

import numpy as np
import jax.numpy as jnp

from .config import Config
from . import models
from .io.amisr import read_datafile
from .io.coeffs import (IncrementalCoeffWriter, finalize_checkpoint,
                        save_coeff_file)
from .ops.fit import fit_records
from .ops import regparam as regparam_mod
from .ops.solve import final_solve, suff_stats
from .utils.hull import compute_hull_vertices
from .utils.logging import PhaseTimer, fit_quality_report, logger


class Interpolate:
    def __init__(self, config_file):
        if isinstance(config_file, Config):
            self.config = config_file
            self.configfile = self.config.path or ""
        else:
            self.configfile = config_file if isinstance(config_file, str) else ""
            self.config = Config.from_file(config_file)
        self.read_config(self.config)
        self.model = models.make_model(self.model_name, self.config)
        self.timer = PhaseTimer()
        self.reg_params = None

    def read_config(self, config):
        """Populate reference-parity attributes (interpolate.py:64-88)."""
        if not isinstance(config, Config):
            config = Config.from_file(config)
            self.config = config
        f = config.fit
        self.regularization_list = list(f.regularization_list)
        self.reg_method = f.regularization_method
        self.filename = f.filename
        self.outputfilename = f.outputfilename
        self.param = f.param
        self.errlim = list(f.errlim)
        self.chi2lim = list(f.chi2lim)
        self.goodfitcode = list(f.goodfitcode)
        self.model_name = config.model.name

    # ------------------------------------------------------------------
    # reference-parity numerical methods (library surface)
    # ------------------------------------------------------------------

    def eval_C(self, A, b, W, reg_matrices, reg_params, calccov=False):
        """Reference interpolate.py:432-469 with dict-style reg arguments."""
        A = jnp.asarray(A)
        b = jnp.asarray(b).ravel()
        W = jnp.asarray(W).ravel()
        mask = jnp.isfinite(b)
        AtWA, AtWb, btWb, _ = suff_stats(A, b, W, mask.astype(A.dtype))
        names = self.regularization_list
        mats = jnp.stack([jnp.asarray(reg_matrices[r]) for r in names]) if names \
            else jnp.zeros((0, A.shape[1], A.shape[1]), dtype=A.dtype)
        alphas = jnp.asarray([reg_params[r] for r in names], dtype=A.dtype)
        C, dC, _ = final_solve(AtWA, AtWb, btWb, mats, alphas)
        if calccov:
            return C, dC
        return C

    def find_reg_param(self, A, b, W, reg_matrices, method=None):
        """Reference interpolate.py:97-147: dict of parameters per reg."""
        if method is None:
            method = "chi2"
        A = jnp.asarray(A)
        b = jnp.asarray(b).ravel()
        W = jnp.asarray(W).ravel()
        mask = jnp.isfinite(b).astype(A.dtype)
        AtWA, AtWb, btWb, N = suff_stats(A, b, W, mask)
        from .ops.solve import _plain_to_x

        out = {}
        for name in self.regularization_list:
            R = jnp.asarray(reg_matrices[name])
            if method == "chi2":
                root = float(
                    regparam_mod.chi2_reg_param(
                        _plain_to_x(AtWA), _plain_to_x(AtWb),
                        _plain_to_x(jnp.asarray(btWb)), N, _plain_to_x(R))
                )
                out[name] = 10.0 ** root if np.isfinite(root) else (
                    0.0 if root == -np.inf else np.nan)
            elif method == "gcv":
                Wm = jnp.where(mask > 0, W, 0.0)
                root = float(
                    regparam_mod.gcv_reg_param(AtWA, AtWb, R, A, b, Wm, mask)
                )
                out[name] = 10.0 ** root if np.isfinite(root) else np.nan
            elif method == "manual":
                out[name] = regparam_mod.manual_reg_param(name)
            elif method == "prompt":
                out[name] = float(input(f"Enter {name} regularization parameter: "))
            else:
                raise ValueError(f"unknown regularization method {method!r}")
            if np.isnan(out[name]):
                logger.warning(
                    "Could not find any roots to the objective function "
                    "chi^2-nu in the range (1e-100,1). Returning NANs for "
                    "regularization parameters."
                )
        return out

    # thin reference-surface aliases (interpolate.py:152,263,353,383): the
    # per-method entry points all route through find_reg_param's machinery
    def chi2(self, A, b, W, reg_matrices, reg):
        return self.find_reg_param(A, b, W, reg_matrices, method="chi2")[reg]

    def gcv(self, A, b, W, reg_matrices, reg):
        return self.find_reg_param(A, b, W, reg_matrices, method="gcv")[reg]

    def manual(self, A, b, W, reg_matrices, reg):
        return regparam_mod.manual_reg_param(reg)

    def prompt(self, A, b, W, reg_matrices, reg):
        return float(input(f"Enter {reg} regularization parameter: "))

    def chi2objfunct(self, alpha, A, b, W, reg_matrices, nu, reg):
        """chi^2(10^alpha) - nu with all other regs at zero
        (interpolate.py:220-261)."""
        from .ops.solve import cutoff_chi2

        A = jnp.asarray(A)
        b = jnp.asarray(b).ravel()
        W = jnp.asarray(W).ravel()
        mask = jnp.isfinite(b).astype(A.dtype)
        AtWA, AtWb, btWb, _ = suff_stats(A, b, W, mask)
        R = jnp.asarray(reg_matrices[reg])
        return float(cutoff_chi2(10.0**alpha, AtWA, AtWb, btWb, R)) - nu

    def compute_hull(self, lat, lon, alt):
        """Reference interpolate.py:409-426; sets self.hull_vert."""
        self.hull_vert = compute_hull_vertices(lat, lon, alt)

    def read_datafile(self, filename):
        """Reference interpolate.py:582-667."""
        return read_datafile(
            filename, self.param, self.errlim, self.chi2lim, self.goodfitcode
        )

    # ------------------------------------------------------------------
    # the batched fit
    # ------------------------------------------------------------------

    def _reg_matrices(self):
        # memoized: the matrices depend only on the model config, so
        # repeated calc_coeffs calls (multi-parameter fits, resumes) skip
        # the one-time quadrature tables
        cached = getattr(self, "_reg_matrices_cache", None)
        if cached is not None:
            return cached
        reg_matricies = {}
        for reg in self.regularization_list:
            try:
                reg_matricies[reg] = np.asarray(
                    self.model.eval_reg_matricies[reg]()
                )
            except KeyError as e:
                # message parity with interpolate.py:490-493
                logger.warning(
                    "The model %s does not support %s regularization! "
                    "If you would like to use %s regularization, please "
                    "modify %s.py so that it includes functions to calculate "
                    "the appropriate regularization matrix.",
                    self.model_name, reg, reg, self.model_name,
                )
                raise e
        self._reg_matrices_cache = reg_matricies
        return reg_matricies

    def _reg_taus(self, names, nb):
        """Optional data-informed regularization targets (tau vectors)
        from [DEFAULT] REGULARIZATION_PROFILE.

        "chapman,<nmax>,<hmax_km>,<scale_km>" builds a Chapman-layer
        density profile n(z) = nmax exp(0.5 (1 - y - e^-y)),
        y = (z - z0)/H in the model's scaled altitude z = 100 alt/RE, and
        pulls every '0thorder'-regularized parameter toward it (penalty
        alpha (C'Psi C - 2 tau'C), tau from Model.eval_tau).  The
        reference hints at exactly this with IRI profiles
        (sphharmlag.py:186) but never implements it.  Rows for other
        regularization types are zero (no pull)."""
        spec = self.config.fit.regularization_profile.strip()
        if not spec or not names:
            return None
        kind, *params = [s.strip() for s in spec.split(",")]
        if kind.lower() != "chapman":
            raise ValueError(
                f"unknown REGULARIZATION_PROFILE kind {kind!r} "
                "(supported: chapman,<nmax>,<hmax_km>,<scale_km>)")
        nmax, hmax_km, scale_km = (float(p) for p in params)
        from .constants import RE
        z0 = 100.0 * hmax_km * 1000.0 / RE
        hz = 100.0 * scale_km * 1000.0 / RE

        def profile(z):
            y = (np.asarray(z) - z0) / hz
            return nmax * np.exp(0.5 * (1.0 - y - np.exp(-y)))

        if "0thorder" not in names:
            logger.warning(
                "REGULARIZATION_PROFILE is set but '0thorder' is not in "
                "REGULARIZATION_LIST; the profile pull only applies to "
                "0thorder regularization and will be ignored.")
            return None
        tau_vec = np.asarray(self.model.eval_tau(profile)).reshape(-1)
        taus = np.zeros((len(names), nb))
        for i, r in enumerate(names):
            if r == "0thorder":
                taus[i] = tau_vec
        return taus

    def calc_coeffs(self, starttime=None, endtime=None, resume=False):
        """Fit every record in the file (optionally a time window), batched.

        Reference flow (interpolate.py:472-579) with chunked device batches.
        With resume=True and an existing partial output file, completed
        chunks are skipped (checkpoint/resume, SURVEY.md section 5.4).
        """
        with self.timer.phase("reg_matrices"):
            # reference progress message (interpolate.py:485), via the
            # logger so stdout stays clean for machine consumers (bench)
            logger.info(
                "Evaluating Regularization matricies.  This may take a few minutes."
            )
            reg_mats_dict = self._reg_matrices()
            names = self.regularization_list
            nb = self.model.nbasis
            reg_mats = (
                jnp.asarray(np.stack([reg_mats_dict[r] for r in names]))
                if names
                else jnp.zeros((0, nb, nb))
            )
            reg_taus = self._reg_taus(names, nb)

        with self.timer.phase("read_datafile"):
            utime, lat, lon, alt, value, error = self.read_datafile(self.filename)

        with self.timer.phase("compute_hull"):
            self.compute_hull(lat, lon, alt)

        if starttime and endtime:
            epoch = dt.datetime(1970, 1, 1)  # naive UTC (utcfromtimestamp
            # is deprecated; reference semantics are naive UTC datetimes)
            idx = np.argwhere(
                (utime[:, 0] >= (starttime - epoch).total_seconds())
                & (utime[:, 1] <= (endtime - epoch).total_seconds())
            ).flatten()
            utime = utime[idx, :]
            value = value[idx]
            error = error[idx]

        nrec = value.shape[0]

        method, manual_params = self._resolve_method(names)

        # make sure the Legendre tables cover the data's colatitude range
        if hasattr(self.model, "transform_coord") and nrec > 0:
            _, t, _ = self.model.transform_coord(lat, lon, alt)
            self.model.ensure_theta_domain(float(np.max(np.asarray(t))))

        with self.timer.phase("design_matrix"):
            A = self.model.basis(lat, lon, alt)

        writer = None
        start0 = 0
        import jax as _jax0

        is_writer_proc = _jax0.process_index() == 0
        self._flushed_output = None
        if self.outputfilename and is_writer_proc:
            # per-chunk flush, ALWAYS on when an output file is configured:
            # the h5 writes hide under the next chunk's device compute, the
            # run is checkpointed for free, and saveh5() becomes a
            # metadata-only finalize instead of a 166 MB rewrite.  With
            # resume=True a pre-existing partial file restarts at its last
            # completed chunk; otherwise the file is recreated.
            writer = self._make_writer(nrec, fresh=not resume)
            if resume:
                start0 = writer.nrec_done
                if start0:
                    logger.info("resuming at record %d / %d", start0, nrec)

        C_all, dC_all, c2_all, rp_all = self._run_fit_pipeline(
            value, error, np.asarray(A), reg_mats, reg_taus, method,
            manual_params, utime, writer=writer, start0=start0)
        if writer is not None:
            writer.close()
            self._flushed_output = self.outputfilename

        self.time = utime
        self.Coeffs = C_all
        self.Covariance = dC_all
        self.chi_sq = c2_all
        self.reg_params = rp_all

        if self.config.fit.time_coupling:
            # jointly time-regularized re-solve at the searched alphas
            # (ops/timejoint.py): updates Coeffs/chi_sq; the per-record
            # covariance keeps the independent-fit error bars (honest
            # uncertainty — the coupling trades variance for bias)
            with self.timer.phase("time_coupled_solve"):
                from .ops.timejoint import fit_time_coupled

                with np.errstate(divide="ignore"):
                    la = np.log10(np.where(rp_all > 0, rp_all, 0.0))
                C_j, c2_j = fit_time_coupled(
                    value, error, np.asarray(A), np.asarray(reg_mats), la,
                    self.config.fit.time_coupling)
                n_filled = int((np.isnan(c2_all) & np.isfinite(c2_j)).sum())
                self.Coeffs = C_j
                self.chi_sq = c2_j
                logger.info(
                    "time-coupled solve: beta_rel=%.3g, %d failed records "
                    "carried by neighbors", self.config.fit.time_coupling,
                    n_filled)
                # the incrementally-flushed file holds the INDEPENDENT
                # coefficients; force saveh5 to rewrite with the joint ones
                self._flushed_output = None

        self.timefit = None
        if self.config.fit.time_smoothing:
            with self.timer.phase("time_spline"):
                from .ops.timesmooth import fit_time_spline

                lam = self.config.fit.time_smoothing
                if lam != "gcv":
                    lam = float(lam)
                self.timefit = fit_time_spline(
                    np.mean(utime, axis=1), C_all, lam=lam,
                    nseg=self.config.fit.time_knots or None,
                )
                logger.info("time spline: lam=%.3g, K=%d",
                            self.timefit["lam"], self.timefit["S"].shape[0])

        nvalid = np.isfinite(value).sum(axis=1)
        fit_quality_report(c2_all, nvalid, rp_all, names)

    def _resolve_method(self, names):
        """Reference method dispatch incl. the py3 prompt fix
        (interpolate.py:383-407: asked once per regularization type)."""
        method = self.reg_method
        manual_params = None
        if method == "manual":
            manual_params = [regparam_mod.manual_reg_param(r) for r in names]
        elif method == "prompt":
            # python-3 fix of interpolate.py:383-407 (raw_input); asked once
            # per regularization type, not once per record
            manual_params = [
                float(input("Enter {} regularization parameter: ".format(r)))
                for r in names
            ]
            method = "manual"
        return method, manual_params

    def _run_fit_pipeline(self, value, error, A_np, reg_mats, reg_taus,
                          method, manual_params, utime, writer=None,
                          start0=0):
        """The chunked, pipelined batched fit (shared by calc_coeffs and
        the single-pass multiparameter fit).  Returns (C_all, dC_all,
        c2_all, rp_all) host arrays for ALL nrec records."""
        names = self.regularization_list
        nrec = value.shape[0]
        nb = self.model.nbasis
        # POINT-AXIS BUCKETING (round 5): pad the measurement-point axis
        # to a POINT_BUCKET multiple with fully-masked points (NaN value,
        # unit error, zero design row) — exact zero contributions through
        # the existing weight-zero QC masking (results agree inside the
        # summation-order envelope, PARITY_NOTES #7/#8: a different
        # point count changes XLA's reduction tree exactly like a
        # different BLAS order), and every file geometry
        # inside a bucket shares ONE compiled fit graph (a fresh
        # (chunk, npoints) shape costs a minutes-long cold remote
        # compile, docs/PERF.md section 3).  2400 (the receipts shape)
        # is itself a bucket boundary at the default 480.
        bucket = self.config.tpu.point_bucket
        if bucket and nrec > 0:
            ppad = (-value.shape[1]) % bucket
            if ppad:
                value = np.concatenate(
                    [value, np.full((nrec, ppad), np.nan)], axis=1)
                error = np.concatenate(
                    [error, np.ones((nrec, ppad))], axis=1)
                A_np = np.concatenate(
                    [A_np, np.zeros((ppad, nb), dtype=A_np.dtype)], axis=0)
        # default chunk bounds peak memory of the batched alpha search and
        # sets the pipeline grain: smaller chunks shrink the un-overlapped
        # tail (the LAST chunk's fetch + unpack + flush hides under
        # nothing).  128 measured best on the 1000-record day: 9.79 s vs
        # 10.04 s at 256 (scripts/e2e_check.py receipts).
        chunk = self.config.tpu.chunk_size or min(nrec, 128) or 1

        C_all = np.zeros((nrec, nb))
        # np.empty: the covariance block is 166 MB for a 1000-record day
        # and every row is fully assigned (worker-thread scatter or the
        # resume preload) — zeroing it costs ~0.2 s of pure page faults
        dC_all = np.empty((nrec, nb, nb))
        c2_all = np.zeros(nrec)
        rp_all = np.zeros((nrec, len(names)))
        if writer is not None and start0 > 0:
            C_all[:start0] = writer.f["Coeffs/C"][:start0]
            dC_all[:start0] = writer.f["Coeffs/dC"][:start0]
            c2_all[:start0] = writer.f["FitParams/chi2"][:start0]
            if names:
                rp_all[:start0] = writer.f["FitParams/reg_params"][:start0]

        # mesh-parallel path when multiple devices are available/configured;
        # multi-process (jax.distributed) runs shard records across
        # processes/slices with a DCN-aware global mesh (SURVEY.md 5.8)
        import jax as _jax

        mesh = None
        multiproc = _jax.process_count() > 1
        ndev = len(_jax.devices())
        if multiproc:
            from .parallel.distributed import make_global_mesh

            mesh = make_global_mesh(self.config.tpu.mesh_records,
                                    self.config.tpu.mesh_points)
        elif ndev > 1 or self.config.tpu.mesh_records > 1 \
                or self.config.tpu.mesh_points > 1:
            from .parallel import make_mesh

            mesh = make_mesh(self.config.tpu.mesh_records,
                             self.config.tpu.mesh_points)

        with self.timer.phase("fit_records"):
            mp = (
                np.asarray(manual_params, np.float64)
                if manual_params is not None else None
            )
            # one host copy of the reg matrices for the whole day: the
            # per-chunk np.asarray(reg_mats) inside fit_records is a
            # device->host fetch + content hash on the critical path
            reg_mats = np.asarray(reg_mats)

            def chunk_inputs(s, e):
                # TAIL-CHUNK PADDING: a day of 1000 records at chunk 128
                # ends with a 104-record chunk, which would compile a
                # SECOND whole fit graph (minutes cold through the dev
                # tunnel) for one dispatch.  Pad the tail with all-NaN
                # records instead: fully-masked rows produce NaN fits
                # (the existing no-bracket path) at ~24/128 of one
                # chunk's compute — and the padded rows are sliced off
                # below.  Only the tail of a MULTI-chunk run pads (a
                # short single-chunk run compiles its own size anyway).
                pad = chunk - (e - s) if (e - s) < chunk and nrec > chunk \
                    else 0
                if pad:
                    v_in = np.full((chunk, value.shape[1]), np.nan)
                    v_in[: e - s] = value[s:e]
                    e_in = np.ones((chunk, error.shape[1]))
                    e_in[: e - s] = error[s:e]
                else:
                    v_in, e_in = value[s:e], error[s:e]
                return v_in, e_in, pad

            def dispatch(s, e, prepared=None):
                v_in, e_in, pad = chunk_inputs(s, e)
                if multiproc:
                    from .parallel.distributed import fit_records_distributed

                    C, dC, c2, rp = fit_records_distributed(
                        v_in, e_in, A_np, reg_mats,
                        mesh, method=method, manual_params=mp,
                        regparam_mode=self.config.tpu.regparam_mode,
                        reg_taus=reg_taus,
                    )
                    if pad:
                        C, dC, c2, rp = (C[: e - s], dC[: e - s],
                                         c2[: e - s], rp[: e - s])
                    return C, dC[:, :, iu[0], iu[1]], c2, rp
                if mesh is not None:
                    from .parallel import fit_records_sharded

                    C, dC, c2, rp = fit_records_sharded(
                        v_in, e_in, A_np, reg_mats, mesh,
                        method=method, manual_params=mp,
                        regparam_mode=self.config.tpu.regparam_mode,
                        reg_taus=reg_taus,
                    )
                else:
                    C, dC, c2, rp = fit_records(
                        v_in,
                        e_in,
                        A_np,
                        reg_mats,
                        method=method,
                        manual_params=mp,
                        regparam_mode=self.config.tpu.regparam_mode,
                        reg_taus=reg_taus,
                        prepared=prepared,
                        host_alphas=False,  # converted in materialize
                    )
                tri = _pack_tri(dC)
                if pad:
                    C, tri, c2, rp = (C[: e - s], tri[: e - s],
                                      c2[: e - s], rp[: e - s])
                return C, tri, c2, rp

            # dC is symmetric, so only its upper triangle crosses the
            # device->host link (the [chunk, 2, nb, nb] covariance
            # dominates transfer volume; halving it keeps the pipelined
            # copies hidden under the next chunk's compute, incl. over
            # the dev tunnel).  The leading 2 is the covariance's 2-word
            # f32 expansion (ops/fit.cov_to_f64 semantics): the field
            # variance diag(A dC A') cancels ~11 decades at physical
            # scales and single-f32-word entries break it ~300x
            # (PARITY_NOTES #8) — the words are combined into the host
            # f64 dC_all on the worker thread below.
            iu = np.triu_indices(nb)

            @_jax.jit
            def _pack_tri(dC):
                return dC[:, :, iu[0], iu[1]]

            # Covariance unpacking + per-chunk HDF5 flush run on a worker
            # THREAD: the main thread's per-chunk budget is consumed by the
            # tunnel fetch (which RELEASES the GIL), so the numpy scatter
            # and the h5py/OS I/O (also GIL-releasing) hide under it —
            # inline, they land straight on the critical path (measured
            # +1.8 s on the 1000-record day).  All h5py calls stay on the
            # one worker thread; each chunk range is produced exactly once,
            # so slices are final when enqueued.
            import queue as _queue
            import threading as _threading

            # unbounded: if the worker dies, producers must not block (the
            # error is re-raised at join); total queued payload is bounded
            # by the day's packed triangles (~83 MB for 1000 records)
            wq = _queue.Queue()
            werr = []

            def _worker_loop():
                while True:
                    job = wq.get()
                    if job is None:
                        return
                    try:
                        s, e, tri = job
                        # combine the 2-word expansion in f64 (exact:
                        # each word is an f32-representable value)
                        t64 = (tri[:, 0].astype(np.float64)
                               + tri[:, 1].astype(np.float64))
                        dC_all[s:e][:, iu[0], iu[1]] = t64
                        dC_all[s:e][:, iu[1], iu[0]] = t64
                        if writer is not None:
                            writer.write_chunk(s, utime[s:e], C_all[s:e],
                                               dC_all[s:e], c2_all[s:e],
                                               rp_all[s:e])
                    except BaseException as exc:  # re-raised at join
                        werr.append(exc)
                        return

            wthread = _threading.Thread(target=_worker_loop, daemon=True)
            wthread.start()

            def materialize(s, e, res):
                from .ops.fit import log_alphas_to_raw

                C, dC_tri, c2, rp = res
                C_all[s:e] = np.asarray(C)
                tri = np.asarray(dC_tri)
                c2_all[s:e] = np.asarray(c2)
                if isinstance(rp, np.ndarray):  # sharded/multiproc paths
                    rp_all[s:e] = rp
                else:  # plain path: device log10 alphas, fenced HERE
                    rp_all[s:e] = log_alphas_to_raw(rp)
                wq.put((s, e, tri))

            # pipeline: the (large) device->host covariance transfer of
            # chunk i overlaps chunk i+1's compute, AND chunk i+1's host
            # prep + ~6 MB upload is staged on a second worker thread
            # under chunk i's compute (unoverlapped, the bandwidth-bound
            # tunnel transfer costs ~140 ms of every ~920 ms dispatch —
            # scripts/profile_exact.py round 3).  Single-process plain
            # path only; the sharded/multiproc paths stage internally.
            starts = list(range(start0, nrec, chunk))
            prep_pool = None
            prep_fut = None
            if starts and not multiproc and mesh is None:
                from concurrent.futures import ThreadPoolExecutor

                from .ops.fit import prepare_fit_inputs as _prep

                prep_pool = ThreadPoolExecutor(1)

                def _prepare(s, e):
                    v_in, e_in, _ = chunk_inputs(s, e)
                    return _prep(v_in, e_in, A_np, reg_mats)

                prep_fut = prep_pool.submit(_prepare, starts[0],
                                            min(starts[0] + chunk, nrec))
            try:
                pending = None
                for i, s in enumerate(starts):
                    e = min(s + chunk, nrec)
                    prepared = None
                    if prep_fut is not None:
                        prepared = prep_fut.result()
                        if i + 1 < len(starts):
                            s2 = starts[i + 1]
                            prep_fut = prep_pool.submit(
                                _prepare, s2, min(s2 + chunk, nrec))
                        else:
                            prep_fut = None
                    res = dispatch(s, e, prepared=prepared)
                    if pending is not None:
                        materialize(*pending)
                    pending = (s, e, res)
                if pending is not None:
                    materialize(*pending)
            finally:
                if prep_pool is not None:
                    prep_pool.shutdown(wait=False)
            wq.put(None)
            wthread.join()
            if werr:
                raise werr[0]
        return C_all, dC_all, c2_all, rp_all

    def calc_coeffs_multiparam(self, params, starttime=None, endtime=None):
        """SINGLE-PASS fits of several parameters (e.g. ['dens', 'temp_e']).

        All parameters' records ride ONE fit stream: the file is read once,
        the design matrix / Legendre tables / regularization eigenbases /
        compiled fit graph are shared, and the k * nrec record batch runs
        through the chunked pipeline back to back — so only the per-record
        solve work scales with k, with no per-parameter pipeline bubbles or
        recompiles (the reference would re-run its whole serial pipeline
        per PARAM, interpolate.py:472-579).

        Writes one coefficient file per parameter (OUTPUTFILENAME with a
        `.{param}` suffix before the extension) and returns
        {param: (time, Coeffs, Covariance, chi_sq)}.
        """
        base_param = self.param
        base_out = self.outputfilename
        root, ext = os.path.splitext(base_out)
        try:
            reg_mats_dict = self._reg_matrices()
            names = self.regularization_list
            nb = self.model.nbasis
            reg_mats = (
                jnp.asarray(np.stack([reg_mats_dict[r] for r in names]))
                if names else jnp.zeros((0, nb, nb))
            )
            reg_taus = self._reg_taus(names, nb)
            method, manual_params = self._resolve_method(names)

            # one read per parameter (values/errors differ; geometry is
            # file-level and shared)
            utime = lat = lon = alt = None
            vals, errs = [], []
            with self.timer.phase("read_datafile"):
                for prm in params:
                    self.param = prm
                    utime, lat, lon, alt, v, e = self.read_datafile(
                        self.filename)
                    vals.append(v)
                    errs.append(e)
            with self.timer.phase("compute_hull"):
                self.compute_hull(lat, lon, alt)
            if starttime and endtime:
                epoch = dt.datetime(1970, 1, 1)
                idx = np.argwhere(
                    (utime[:, 0] >= (starttime - epoch).total_seconds())
                    & (utime[:, 1] <= (endtime - epoch).total_seconds())
                ).flatten()
                utime = utime[idx, :]
                vals = [v[idx] for v in vals]
                errs = [e[idx] for e in errs]
            nrec = vals[0].shape[0]

            if hasattr(self.model, "transform_coord") and nrec > 0:
                _, t, _ = self.model.transform_coord(lat, lon, alt)
                self.model.ensure_theta_domain(float(np.max(np.asarray(t))))
            with self.timer.phase("design_matrix"):
                A_np = np.asarray(self.model.basis(lat, lon, alt))

            value = np.concatenate(vals, axis=0)   # [k * nrec, npoints]
            error = np.concatenate(errs, axis=0)
            ut_rep = np.concatenate([utime] * len(params), axis=0)
            self._flushed_output = None
            C, dC, c2, rp = self._run_fit_pipeline(
                value, error, A_np, reg_mats, reg_taus, method,
                manual_params, ut_rep)

            results = {}
            import jax as _jax

            for i, prm in enumerate(params):
                sl = slice(i * nrec, (i + 1) * nrec)
                self.param = prm
                self.outputfilename = f"{root}.{prm}{ext}"
                self.time = utime
                self.Coeffs = C[sl]
                self.Covariance = dC[sl]
                self.chi_sq = c2[sl]
                self.reg_params = rp[sl]
                self.timefit = None
                if _jax.process_index() == 0:
                    self.saveh5()
                nvalid = np.isfinite(vals[i]).sum(axis=1)
                fit_quality_report(c2[sl], nvalid, rp[sl], names)
                results[prm] = (
                    self.time, self.Coeffs, self.Covariance, self.chi_sq
                )
        finally:
            self.param = base_param
            self.outputfilename = base_out
        return results

    def _make_writer(self, nrec, fresh=False):
        meta = dict(
            reg_list=self.regularization_list,
            reg_method=self.reg_method,
            hull_vert=self.hull_vert,
            raw_filename=self.filename,
            config_name=os.path.basename(self.configfile) if self.configfile else "",
            config_path=(
                os.path.dirname(os.path.abspath(self.configfile))
                if self.configfile else ""
            ),
            config_contents=self.config.raw_text,
        )
        return IncrementalCoeffWriter(
            self.outputfilename, nrec, self.model.nbasis, meta, fresh=fresh
        )

    def saveh5(self):
        """Write the coefficient file (reference interpolate.py:671-708).

        When calc_coeffs already flushed this run chunk-by-chunk to
        OUTPUTFILENAME (the default whenever an output file is
        configured), the heavy datasets are on disk and this finalizes
        the schema in place (drops the checkpoint counter, adds
        /TimeFit) — metadata-only I/O.  Mutating Coeffs/Covariance
        between calc_coeffs and saveh5 voids the fast path's assumption;
        delete self._flushed_output first to force a full rewrite.

        Multi-process runs: every process holds the full (allgathered)
        results, only process 0 writes."""
        import jax as _jax

        if _jax.process_index() != 0:
            return
        if getattr(self, "_flushed_output", None) == self.outputfilename \
                and self.outputfilename:
            finalize_checkpoint(self.outputfilename,
                                timefit=getattr(self, "timefit", None))
            return
        name = os.path.basename(self.configfile) if self.configfile else ""
        path = (
            os.path.dirname(os.path.abspath(self.configfile))
            if self.configfile else ""
        )
        save_coeff_file(
            self.outputfilename,
            self.time,
            self.Coeffs,
            self.Covariance,
            self.chi_sq,
            self.hull_vert,
            self.regularization_list,
            self.reg_method,
            self.filename,
            name,
            path,
            self.config.raw_text,
            reg_params=self.reg_params,
            timefit=getattr(self, "timefit", None),
        )
