"""Processed-AMISR HDF5 reader with full QC semantics.

h5py implementation of the reference reader (interpolate.py:582-667),
byte-identical in behaviour:

* PARAM routing: 'dens' -> /FittedParams/{Ne,dNe}; otherwise
  '<quantity>_<species>' indexes /FittedParams/{Fits,Errors}[..., m, i] with
  i from {'frac':0,'temp':1,'colfreq':2} and m from the IonMass match
  (m = -1, i.e. electrons, when the species mass is absent)
  (interpolate.py:605-632).
* the chi2-369 legacy correction when nanmedian(chi2) > 100
  (interpolate.py:645-646).
* QC masking: a point survives only if
  errlim[0] < error < errlim[1], chi2lim[0] < chi2 < chi2lim[1], and
  fitcode in goodfitcode; failures become NaN in value AND error
  (interpolate.py:652-657).
* rows where the (flattened) altitude coordinate is NaN are dropped
  (interpolate.py:660-664).
"""

from __future__ import annotations

import numpy as np
import h5py

INDEX_DICT = {"frac": 0, "temp": 1, "colfreq": 2}
MASS_DICT = {"O": 16, "O2": 32, "NO": 30, "N2": 28, "N": 14}


def read_datafile(filename, param, errlim, chi2lim, goodfitcode):
    """Returns (utime [nrec,2], lat [npts], lon, alt, value [nrec,npts],
    error [nrec,npts])."""
    with h5py.File(filename, "r") as f:
        utime = f["/Time/UnixTime"][:]
        alt = f["/Geomag/Altitude"][:]
        lat = f["/Geomag/Latitude"][:]
        lon = f["/Geomag/Longitude"][:]
        c2 = f["/FittedParams/FitInfo/chi2"][:]
        fc = f["/FittedParams/FitInfo/fitcode"][:]
        imass = f["/FittedParams/IonMass"][:]

        if param == "dens":
            val = f["/FittedParams/Ne"][:]
            err = f["/FittedParams/dNe"][:]
        else:
            p = param.split("_")
            i = INDEX_DICT[p[0]]
            try:
                m = int(np.where(imass == MASS_DICT[p[1]])[0][0])
            except IndexError:
                m = -1
            val = f["/FittedParams/Fits"][:, :, :, m, i]
            err = f["/FittedParams/Errors"][:, :, :, m, i]

    altitude = alt.flatten()
    latitude = lat.flatten()
    longitude = lon.flatten()
    chi2 = c2.reshape(c2.shape[0], -1)
    fitcode = fc.reshape(fc.shape[0], -1)
    value = val.reshape(val.shape[0], -1).astype(np.float64)
    error = err.reshape(err.shape[0], -1).astype(np.float64)

    # legacy chi2 overestimation correction (interpolate.py:645-646)
    if np.nanmedian(chi2) > 100.0:
        chi2 = chi2 - 369.0

    data_check = np.array(
        [
            error > errlim[0],
            error < errlim[1],
            chi2 > chi2lim[0],
            chi2 < chi2lim[1],
            np.isin(fitcode, goodfitcode),
        ]
    )
    bad_data = np.squeeze(np.any(data_check == False, axis=0, keepdims=True))  # noqa: E712
    value[bad_data] = np.nan
    error[bad_data] = np.nan

    finite_coord = np.isfinite(altitude)
    value = value[:, finite_coord]
    error = error[:, finite_coord]
    latitude = latitude[finite_coord]
    longitude = longitude[finite_coord]
    altitude = altitude[finite_coord]

    return utime, latitude, longitude, altitude, value, error


def beam_index(filename):
    """Per-point beam index aligned with read_datafile's point axis.

    AMISR geometry arrays are [nbeam, nrange]; the reader flattens them and
    drops NaN-coordinate columns (interpolate.py:635,660-664).  This helper
    applies the same flatten+filter to the beam row index, enabling
    beam-structured workflows (leave-one-beam-out CV, sweep.py).
    """
    with h5py.File(filename, "r") as f:
        alt = f["/Geomag/Altitude"][:]
    nbeam, nrange = alt.shape
    idx = np.repeat(np.arange(nbeam), nrange)
    finite_coord = np.isfinite(alt.flatten())
    return idx[finite_coord]
