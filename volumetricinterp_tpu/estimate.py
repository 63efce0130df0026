"""Estimate — coefficient-file evaluation engine (API parity with the
reference estimate.py:13-221).

TPU-first differences:
* the per-point qhull-rebuild hull check (estimate.py:153-178, "horribly
  inefficient") becomes one host qhull build + a jittable half-space matmul
  (utils/hull.py);
* calcgrad/calcerr are implemented for real (the reference accepts the
  flags but its evaluation paths are commented out, estimate.py:125-147);
* dense-grid evaluation can run through the fused float32 Pallas kernel
  (grid_eval method / ops/grid_eval.py) at >1e9 points/s/chip.
"""

from __future__ import annotations

import datetime as dt

import numpy as np
import jax.numpy as jnp

from .config import Config
from . import models
from .io.coeffs import load_coeff_file
from .utils.hull import check_hull as hull_mask
from .utils.hull import hull_equations


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

        gdlat = jnp.asarray(gdlat, dtype=jnp.float64)
        A = self.model.basis(gdlat, gdlon, gdalt)
        parameter = jnp.einsum("...i,i->...", A, jnp.asarray(C))

        if check_hull:
            inside = hull_mask(self._hull_eqs, gdlat, gdlon, gdalt)
            parameter = jnp.where(inside, parameter, jnp.nan)

        outs = [parameter]
        if calcgrad:
            G = self.model.grad_basis(gdlat, gdlon, gdalt)  # [..., 3, nbasis]
            dP = jnp.einsum("...ci,i->...c", G, jnp.asarray(C))
            if check_hull:
                dP = jnp.where(inside[..., None], dP, jnp.nan)
            outs.append(dP)
        if calcerr:
            err = jnp.sqrt(
                jnp.einsum("...i,ij,...j->...", A, jnp.asarray(dC), A)
            )
            if check_hull:
                err = jnp.where(inside, err, jnp.nan)
            outs.append(err)
            if calcgrad:
                graderr = jnp.sqrt(
                    jnp.einsum("...ci,ij,...cj->...c", G, jnp.asarray(dC), G)
                )
                if check_hull:
                    graderr = jnp.where(inside[..., None], graderr, jnp.nan)
                outs.append(graderr)

        if len(outs) == 1:
            return np.asarray(outs[0])
        return tuple(np.asarray(o) for o in outs)

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

    def grid_eval(self, time, gdlat, gdlon, gdalt, check_hull=True,
                  impl=None):
        """Dense-grid evaluation through the float32 Pallas fast path.

        Same result as __call__ to ~1e-5 relative (float32); use __call__
        for float64 accuracy.  impl: None/'auto' -> pallas on TPU else XLA.
        The fused evaluator is cached per colatitude band, so repeated calls
        on the same grid family (e.g. per-record keogram products) reuse the
        compiled kernel.
        """
        from . import coords as _coords
        from .ops.grid_eval import make_grid_evaluator

        C, _ = self.get_C(time)
        if hasattr(self.model, "tables"):  # band-limited (sphharmlag)
            lat = np.asarray(gdlat, dtype=np.float64)
            _, t, _ = _coords.np_geodetic_to_cap(
                lat.ravel(), np.asarray(gdlon).ravel(),
                np.asarray(gdalt).ravel(),
                self.model.latcp, self.model.loncp,
            )
            lo, hi = float(t.min()), float(t.max())
        else:  # RBF models have no colatitude band
            lo, hi = 0.0, float(np.pi)
        ev = getattr(self, "_grid_ev", None)
        if ev is None or ev.impl_requested != impl or not (
            ev.theta_lo <= lo and hi <= ev.theta_hi
        ):
            if hasattr(self.model, "ensure_theta_domain"):
                self.model.ensure_theta_domain(hi)
            ev = make_grid_evaluator(self.model, (lo, hi), impl=impl)
            ev.impl_requested = impl
            self._grid_ev = ev
        out = ev(C, gdlat, gdlon, gdalt)
        if check_hull:
            inside = hull_mask(self._hull_eqs, gdlat, gdlon, gdalt)
            out = jnp.where(inside, np.asarray(out), jnp.nan)
        return np.asarray(out)

    def evaluate_records(self, times, gdlat, gdlon, gdalt, check_hull=True,
                         impl=None):
        """Evaluate the same grid for many times (keogram/volume products,
        BASELINE config 4).

        times: sequence of datetimes.  Returns [ntimes, *grid.shape].  The
        fused evaluator and compiled kernel are shared across records; the
        hull mask is computed once.
        """
        times = list(times)
        inside = None
        if check_hull:
            inside = np.asarray(hull_mask(self._hull_eqs, gdlat, gdlon, gdalt))

        # prime/reuse the cached evaluator through a first-grid call
        self.grid_eval(times[0], gdlat, gdlon, gdalt, check_hull=False,
                       impl=impl)
        ev = self._grid_ev
        Cs = np.stack([np.asarray(self.get_C(t)[0]) for t in times])
        if hasattr(ev, "eval_records"):
            out = np.asarray(ev.eval_records(Cs, gdlat, gdlon, gdalt))
        else:  # RBF evaluator: per-record calls (a single matmul each)
            out = np.stack(
                [np.asarray(ev(C, gdlat, gdlon, gdalt)) for C in Cs]
            )
        if inside is not None:
            out = np.where(inside[None], out, np.nan)
        return out
