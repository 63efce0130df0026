"""Validate — fit a time window and render reconstruction-vs-data maps
(API parity with the reference validate.py:16-132).

cartopy is optional (not installed in minimal environments): when absent,
panels fall back to plain lat/lon axes with the same contour + scatter
content.  matplotlib uses the Agg backend so the workflow is headless-safe.
"""

from __future__ import annotations

import datetime as dt

import numpy as np

from .config import Config
from .interpolate import Interpolate
from .estimate import Estimate
from . import coords


class Validate:
    def __init__(self, config_file):
        if isinstance(config_file, Config):
            self.config = config_file
            self.configfile = self.config.path or ""
        else:
            self.configfile = config_file if isinstance(config_file, str) else ""
            self.config = Config.from_file(config_file)
        self.read_config(self.config)

    def read_config(self, config):
        """[VALIDATE] section (reference validate.py:32-51)."""
        if not isinstance(config, Config):
            config = Config.from_file(config)
            self.config = config
        v = config.validate
        self.starttime = v.starttime
        self.endtime = v.endtime
        self.altitudes = list(v.altitudes)
        self.colorlim = list(v.colorlim)
        self.outputpng = v.outpngname

    def interpolate(self):
        """Windowed fit with the standard engine (reference validate.py:53-61)."""
        interp = Interpolate(self.config)
        interp.calc_coeffs(starttime=self.starttime, endtime=self.endtime)
        interp.saveh5()
        self.outputfilename = interp.outputfilename

    def create_plots(self):
        """Reconstruction maps with raw data overlaid
        (reference validate.py:64-132)."""
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
        import matplotlib.gridspec as gridspec
        import h5py

        try:
            import cartopy.crs as ccrs

            have_cartopy = True
        except ImportError:
            have_cartopy = False

        est_param = Estimate(self.outputfilename)

        hull_lat, hull_lon, hull_alt = (
            np.asarray(q)
            for q in coords.ecef2geodetic(
                est_param.hull_vert[:, 0],
                est_param.hull_vert[:, 1],
                est_param.hull_vert[:, 2],
            )
        )

        gdlat, gdlon, gdalt = np.meshgrid(
            np.linspace(np.nanmin(hull_lat), np.nanmax(hull_lat), 100),
            np.linspace(np.nanmin(hull_lon), np.nanmax(hull_lon), 100),
            np.array(self.altitudes) * 1000.0,
        )

        with h5py.File(self.outputfilename, "r") as f:
            raw_filename = f["/RawData/filename"][()]
        if isinstance(raw_filename, bytes):
            raw_filename = raw_filename.decode("utf-8")

        epoch = dt.datetime.utcfromtimestamp(0)
        with h5py.File(raw_filename, "r") as f:
            raw_alt = f["/Geomag/Altitude"][:]
            raw_lat = f["/Geomag/Latitude"][:]
            raw_lon = f["/Geomag/Longitude"][:]
            utime = f["Time/UnixTime"][:]
            idx = np.argwhere(
                (utime[:, 0] >= (self.starttime - epoch).total_seconds())
                & (utime[:, 1] <= (self.endtime - epoch).total_seconds())
            ).flatten()
            raw_time = np.array(
                [dt.datetime.utcfromtimestamp(t) for t in np.mean(utime, axis=1)[idx]]
            )
            raw_dens = f["FittedParams/Ne"][idx, :, :]

        fig = plt.figure(figsize=(len(self.altitudes) * 2, len(raw_time) * 2))
        gs = gridspec.GridSpec(len(raw_time), len(self.altitudes))
        gs.update(left=0.05, right=0.9, bottom=0.01, top=0.95)

        if have_cartopy:
            map_proj = ccrs.LambertConformal(
                central_latitude=np.nanmean(hull_lat),
                central_longitude=np.nanmean(hull_lon),
            )

        levels = np.linspace(self.colorlim[0], self.colorlim[1], 31)

        for i, time in enumerate(raw_time):
            dens = est_param(time, gdlat, gdlon, gdalt)

            for j, alt in enumerate(self.altitudes):
                aidx = np.nanargmin(np.abs(raw_alt - alt * 1000.0), axis=1)
                rows = tuple(np.arange(raw_alt.shape[0]))
                rlat = raw_lat[rows, tuple(aidx)]
                rlon = raw_lon[rows, tuple(aidx)]
                rdens = raw_dens[i][rows, tuple(aidx)]

                if have_cartopy:
                    ax = fig.add_subplot(gs[i, j], projection=map_proj)
                    ax.coastlines()
                    ax.gridlines()
                    tf = dict(transform=ccrs.PlateCarree())
                    sc_tf = dict(transform=ccrs.Geodetic())
                else:
                    ax = fig.add_subplot(gs[i, j])
                    tf = {}
                    sc_tf = {}

                c = ax.contourf(
                    gdlon[:, :, j], gdlat[:, :, j], dens[:, :, j], levels,
                    extend="both", **tf,
                )
                ax.scatter(rlon, rlat, c="white", s=20, **sc_tf)
                ax.scatter(
                    rlon, rlat, c=rdens, s=10,
                    vmin=self.colorlim[0], vmax=self.colorlim[1], **sc_tf,
                )
                ax.set_title("{} km".format(alt))

            pos = ax.get_position()
            plt.text(
                0.03, (pos.y0 + pos.y1) / 2.0, time.time(), rotation="vertical",
                verticalalignment="center", horizontalalignment="center",
                transform=fig.transFigure,
            )
            cax = fig.add_axes([0.91, pos.y0, 0.03, pos.height])
            cbar = plt.colorbar(c, cax=cax)
            cbar.set_label(r"Ne (m$^{-3}$)")

        plt.savefig(self.outputpng)
        plt.close(fig)
