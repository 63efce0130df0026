"""Estimate — coefficient-file evaluation engine (API parity with the
reference estimate.py:13-221).

TPU-first differences:
* the per-point qhull-rebuild hull check (estimate.py:153-178, "horribly
  inefficient") becomes one host qhull build + a half-space matmul
  (utils/hull.py);
* calcgrad/calcerr are implemented for real (the reference accepts the
  flags but its evaluation paths are commented out, estimate.py:125-147);
* `__call__` (the point API) runs entirely on HOST numpy in true float64
  on every backend — this TPU has no real f64 (device "f64" is f32-grade,
  ops/xprec.py receipts; envelope measured in scripts/precision_probe.py),
  and eager device ops through the tunnel cost a remote compile each;
* dense-grid evaluation runs through the fused float32 Pallas kernel
  (grid_eval / evaluate_records, ops/grid_eval.py) at >1e9 points/s/chip.
"""

from __future__ import annotations

import datetime as dt

import numpy as np
import jax.numpy as jnp

from .config import Config
from . import models
from .io.coeffs import load_coeff_file
from .utils.hull import check_hull as hull_mask  # noqa: F401 (device path)
from .utils.hull import np_check_hull as np_hull_mask
from .utils.hull import hull_equations

import jax as _jax


@_jax.jit
def _mask_records_device(blk, inside):
    """NaN outside-FoV points of a [nrec, npts] block ON DEVICE: one fused
    jnp.where at HBM speed, replacing the host fancy-index write that cost
    seconds per call at keogram scale."""
    return jnp.where(inside[None, :], blk, jnp.nan)


@_jax.jit
def _mask_one_device(out, inside):
    return jnp.where(inside, out, jnp.nan)


class Estimate:
    def __init__(self, coeff_filename, timetol=60.0, timeinterp=False):
        """timeinterp: False (nearest record within timetol, reference
        default), True (linear between bracketing records), or 'spline'
        (continuous time-smoothed coefficients from the file's /TimeFit
        payload — requires a fit run with TIME_SMOOTHING set)."""
        self.timetol = timetol
        self.timeinterp = timeinterp

        self.loadh5(filename=coeff_filename)
        if timeinterp == "spline" and self.timefit is None:
            raise ValueError(
                "timeinterp='spline' needs a /TimeFit payload; re-run the "
                "fit with [DEFAULT] TIME_SMOOTHING set (gcv or a number)")

        # reconstruct the identical Model from the embedded config text
        # (reference estimate.py:41-50)
        text = self.config_file_text
        if isinstance(text, bytes):
            text = text.decode("utf-8")
        self.config = Config.from_text(text)
        self.model_name = self.config.model.name
        self.model = models.make_model(self.model_name, self.config)

        self._hull_eqs = hull_equations(self.hull_vert)

    def loadh5(self, filename=None):
        """Load the coefficient file (reference estimate.py:53-70)."""
        d = load_coeff_file(filename)
        self.Coeffs = d["Coeffs"]
        self.Covariance = d["Covariance"]
        self.time = d["UnixTime"]
        self.hull_vert = d["hull_vert"]
        self.config_file_text = d["config_file_text"]
        self.chi2 = d.get("chi2")
        self.raw_filename = d.get("raw_filename")
        self.timefit = d.get("timefit")

    def __call__(self, time, gdlat, gdlon, gdalt, calcgrad=False, calcerr=False,
                 check_hull=True):
        """Evaluate the reconstruction at geodetic points for one time.

        Returns:
            P                       (calcgrad=False, calcerr=False)
            P, dP                   (calcgrad=True) — dP[..., 3] gradient in
                                    cap components (z-hat, theta-hat, phi-hat)
            P, err                  (calcerr=True)
            P, dP, err, graderr     (both)
        """
        C, dC = self.get_C(time)
        C = np.asarray(C, np.float64)

        # Entirely HOST float64: the design matrix, einsums and hull mask
        # run in numpy.  On this TPU, device "f64" arithmetic is f32-grade
        # (ops/xprec.py receipts) and every eager op through the tunnel is
        # a remote compile — the host path is both the exact one and the
        # fast one for point queries.  Dense grids go through grid_eval /
        # evaluate_records (device fast paths).
        A = np.asarray(self.model.basis(gdlat, gdlon, gdalt), np.float64)
        parameter = A @ C

        if check_hull:
            inside = np_hull_mask(self._hull_eqs, gdlat, gdlon, gdalt)
            parameter = np.where(inside, parameter, np.nan)

        outs = [parameter]
        if calcgrad:
            G = np.asarray(
                self.model.grad_basis(gdlat, gdlon, gdalt), np.float64
            )  # [..., 3, nbasis]
            dP = G @ C
            if check_hull:
                dP = np.where(inside[..., None], dP, np.nan)
            outs.append(dP)
        if calcerr:
            dC = np.asarray(dC, np.float64)
            err = np.sqrt(np.einsum("...i,ij,...j->...", A, dC, A))
            if check_hull:
                err = np.where(inside, err, np.nan)
            outs.append(err)
            if calcgrad:
                graderr = np.sqrt(
                    np.einsum("...ci,ij,...cj->...c", G, dC, G)
                )
                if check_hull:
                    graderr = np.where(inside[..., None], graderr, np.nan)
                outs.append(graderr)

        if len(outs) == 1:
            return outs[0]
        return tuple(outs)

    def check_hull(self, lat0, lon0, alt0):
        """Inside-FoV mask (reference estimate.py:153-178 semantics via the
        half-space test; see utils/hull.py for the equivalence argument)."""
        return np.asarray(hull_mask(self._hull_eqs, lat0, lon0, alt0))

    def get_C(self, t):
        """Coefficients for a requested time (reference estimate.py:180-221).

        Nearest record within timetol, linear interpolation between the
        two bracketing record mid-times when timeinterp=True, or the
        continuous time spline when timeinterp='spline' (covariance then
        comes from the nearest record: the spline smooths the coefficient
        TRAJECTORY; per-record error bars remain the honest uncertainty).

        Accepts naive datetimes (interpreted as UTC, the reference
        convention) or timezone-aware datetimes (converted to UTC)."""
        if t.tzinfo is not None:
            t = t.astimezone(dt.timezone.utc).replace(tzinfo=None)
        t0 = (t - dt.datetime(1970, 1, 1)).total_seconds()
        mt = np.mean(self.time, axis=1)

        if self.timeinterp == "spline":
            from .ops.timesmooth import eval_time_spline

            C = eval_time_spline(self.timefit, t0)  # raises out of range
            dC = self.Covariance[np.argmin(np.abs(mt - t0))]
            return C, dC

        try:
            if self.timeinterp:
                i = np.argwhere((t0 >= mt[:-1]) & (t0 < mt[1:])).flatten()[0]
                T = (t0 - mt[i]) / (mt[i + 1] - mt[i])
                C = (1 - T) * self.Coeffs[i, :] + T * self.Coeffs[i + 1, :]
                dC = (1 - T) * self.Covariance[i, :, :] + T * self.Covariance[
                    i + 1, :, :
                ]
            else:
                i = np.argmin(np.abs(mt - t0))
                if np.abs(mt[i] - t0) > self.timetol:
                    raise IndexError
                C = self.Coeffs[i]
                dC = self.Covariance[i]
        except IndexError:
            raise ValueError("Requested time out of range of data file.")

        return C, dC

    # ------------------------------------------------------------------
    # dense-grid fast path
    # ------------------------------------------------------------------

    def _grid_fingerprint(self, *arrays):
        """Cheap content fingerprint of the evaluation grid: shape, dtype
        and a strided sample (~1M elements/axis, always incl. first/last)
        of each coordinate array.  Used to key the prepared-grid cache —
        hashing the full ~800 MB of f64 coordinates at keogram scale
        would cost ~1 s/call, the very overhead the cache removes."""
        import hashlib

        h = hashlib.sha1()
        for a in arrays:
            a = np.asarray(a)
            h.update(str(a.shape).encode())
            h.update(str(a.dtype).encode())
            flat = a.ravel()
            step = max(1, flat.size // (1 << 20))
            h.update(np.ascontiguousarray(flat[::step]).tobytes())
            if flat.size:
                h.update(flat[-1:].tobytes())
                # full-array reductions (~15 ms at 33.5M): catch
                # single-element edits the strided sample steps over
                h.update(np.asarray(
                    [flat.sum(), flat.min(), flat.max()]).tobytes())
        return h.digest()

    def _prepare_grid(self, gdlat, gdlon, gdalt, dtype, need_hull):
        """Per-instance cache of everything about ONE evaluation grid that
        is record-independent: the device-resident f32 coordinates (the
        ~400 MB host->device upload), the FoV hull mask (host half-space
        test + its device copy), and the colatitude band (the host f64
        cap transform of the full grid).  Repeated evaluate_records /
        grid_eval calls on the same grid — the keogram/volume product
        loop, reference validate.py:102-104 — skip all three.

        Returns a dict with keys: shape, npts, lat_d/lon_d/alt_d,
        band (lo, hi) or None, inside (host bool or None), inside_d.
        Only the most recent grid is kept (the device buffers pin HBM)."""
        key = (self._grid_fingerprint(gdlat, gdlon, gdalt),
               np.dtype(dtype).str)
        cached = getattr(self, "_prepared_grid", None)
        if cached is not None and cached["key"] == key:
            if need_hull and cached["inside"] is None:
                inside = np_hull_mask(self._hull_eqs, gdlat, gdlon, gdalt)
                cached["inside"] = inside
                cached["inside_d"] = jnp.asarray(inside.ravel())
            return cached
        shape = np.shape(gdlat)
        band = None
        if hasattr(self.model, "tables"):  # band-limited (sphharmlag)
            from . import coords as _coords

            _, t, _ = _coords.np_geodetic_to_cap(
                np.asarray(gdlat, np.float64).ravel(),
                np.asarray(gdlon).ravel(), np.asarray(gdalt).ravel(),
                self.model.latcp, self.model.loncp,
            )
            band = (float(t.min()), float(t.max()))
        inside = inside_d = None
        if need_hull:
            inside = np_hull_mask(self._hull_eqs, gdlat, gdlon, gdalt)
            inside_d = jnp.asarray(inside.ravel())
        prepared = {
            "key": key,
            "shape": shape,
            "npts": int(np.prod(shape)) if shape else 1,
            "lat_d": jnp.asarray(np.ravel(gdlat), dtype=dtype),
            "lon_d": jnp.asarray(np.ravel(gdlon), dtype=dtype),
            "alt_d": jnp.asarray(np.ravel(gdalt), dtype=dtype),
            "band": band,
            "inside": inside,
            "inside_d": inside_d,
        }
        self._prepared_grid = prepared
        return prepared

    def _band_evaluator(self, band, impl):
        """Evaluator cache shared by grid_eval / evaluate_records (one
        compiled kernel per colatitude band family)."""
        from .ops.grid_eval import make_grid_evaluator

        lo, hi = band if band is not None else (0.0, float(np.pi))
        ev = getattr(self, "_grid_ev", None)
        if ev is None or ev.impl_requested != impl or not (
            ev.theta_lo <= lo and hi <= ev.theta_hi
        ):
            if hasattr(self.model, "ensure_theta_domain"):
                self.model.ensure_theta_domain(hi)
            ev = make_grid_evaluator(self.model, (lo, hi), impl=impl)
            ev.impl_requested = impl
            self._grid_ev = ev
        return ev

    def grid_eval(self, time, gdlat, gdlon, gdalt, check_hull=True,
                  impl=None):
        """Dense-grid evaluation through the float32 Pallas fast path.

        Same result as __call__ to ~1e-5 relative (float32); use __call__
        for float64 accuracy.  impl: None/'auto' -> pallas on TPU else XLA.
        The fused evaluator is cached per colatitude band, and the grid's
        device upload / hull mask / band are cached per grid (see
        _prepare_grid), so repeated calls on the same grid (per-record
        keogram products) pay only the evaluation and the output fetch.
        """
        C, _ = self.get_C(time)
        # dtype resolution must precede _prepare_grid; the evaluator itself
        # is band-dependent, so build it from the prepared band below
        dtype = jnp.float32
        g = self._prepare_grid(gdlat, gdlon, gdalt, dtype,
                               need_hull=check_hull)
        ev = self._band_evaluator(g["band"], impl)
        out = ev._jit_eval(ev.fold_coeffs(C), g["lat_d"], g["lon_d"],
                           g["alt_d"])
        if check_hull:
            out = _mask_one_device(out, g["inside_d"])
        return np.asarray(out).reshape(g["shape"])

    def evaluate_records(self, times, gdlat, gdlon, gdalt, check_hull=True,
                         impl=None):
        """Evaluate the same grid for many times (keogram/volume products,
        BASELINE config 4).

        times: sequence of datetimes.  Returns [ntimes, *grid.shape].

        Per-instance caching makes the product loop transfer-bound, not
        setup-bound (round 5, VERDICT r4 item 2): the device grid upload
        (~400 MB f32 at config-4 scale), the host hull mask + its device
        copy, and the colatitude band (a host f64 cap transform of the
        full grid) are computed ONCE per grid (_prepare_grid) and reused
        by every later call; the NaN masking of outside-FoV points runs
        ON DEVICE fused into the output block (one jnp.where at HBM
        speed) instead of a host fancy-index write; and output chunks
        are fetched into a preallocated host array while the NEXT
        chunk's evaluation is already dispatched (the device->host fetch
        is the dominant cost through a tunnelled device — see
        docs/PERF.md section "Keogram/volume products").
        """
        times = list(times)
        dtype = jnp.float32
        g = self._prepare_grid(gdlat, gdlon, gdalt, dtype,
                               need_hull=check_hull)
        ev = self._band_evaluator(g["band"], impl)
        shape, npts = g["shape"], g["npts"]
        lat_d, lon_d, alt_d = g["lat_d"], g["lon_d"], g["alt_d"]
        Cs = np.stack([np.asarray(self.get_C(t)[0]) for t in times])
        # chunk records so the [chunk, npoints] f32 output block stays
        # ~<=0.5 GB of HBM: the fetch pipeline holds up to TWO blocks
        # (pending + in-flight), and the round-5 bench caught a
        # ResourceExhausted at a 1 GB budget with the rest of the bench's
        # buffers resident (config 4 is 33.5M points/record x a day of
        # records: stacking every record in one dispatch would exhaust
        # device memory outright)
        chunk = max(1, int(2 ** 27 // max(1, npts)))

        # hull masking is FUSED into the jitted evaluation (sphharmlag
        # batched path) so only ONE [chunk, npoints] output buffer ever
        # materializes — a separate jnp.where held two 1 GB blocks alive
        # at config-4 scale (the bench OOM above)
        fused = getattr(self, "_jit_records_masked", None)
        if fused is None or getattr(self, "_jit_records_masked_ev", None) \
                is not ev:
            if hasattr(ev, "_eval_records_flat"):
                def _run(ceff_all, la, lo, al, inside):
                    o = ev._eval_records_flat(ceff_all, la, lo, al)
                    o = jnp.reshape(o, (o.shape[0], -1))
                    if inside is not None:
                        o = jnp.where(inside[None, :], o, jnp.nan)
                    return o
                fused = _jax.jit(_run, static_argnames=())
            else:
                fused = None
            self._jit_records_masked = fused
            self._jit_records_masked_ev = ev

        def dispatch(s):
            Cb = Cs[s:s + chunk]
            if fused is not None:
                ceff_all = jnp.stack(
                    [ev.fold_coeffs(C) for C in np.asarray(Cb)])
                return fused(ceff_all, lat_d, lon_d, alt_d,
                             g["inside_d"] if check_hull else None)
            # RBF evaluator: per-record calls (a single matmul each)
            blk = jnp.stack(
                [ev._jit_eval(ev.fold_coeffs(C), lat_d, lon_d, alt_d)
                 for C in Cb]
            )
            blk = jnp.reshape(blk, (len(Cb), npts))
            if check_hull:
                blk = _mask_records_device(blk, g["inside_d"])
            return blk

        out = np.empty((len(Cs),) + shape, dtype=np.dtype(dtype))
        flat = out.reshape(len(Cs), npts) if npts else out
        starts = list(range(0, len(Cs), chunk))
        pending = None  # (start, device block): fetch overlaps dispatch
        for s in starts:
            blk = dispatch(s)
            if pending is not None:
                s0, b0 = pending
                pending = None  # drop the tuple's ref so del frees HBM
                flat[s0:s0 + chunk] = np.asarray(b0).reshape(-1, npts)
                del b0
            pending = (s, blk)
        if pending is not None:
            s0, b0 = pending
            flat[s0:s0 + chunk] = np.asarray(b0).reshape(-1, npts)
        return out
