"""Dependency shims that let the ACTUAL reference package run in this
environment (pymap3d / pytables / cartopy are not installed here).

Used by tests/test_against_reference.py to execute the reference
implementation IN PLACE from /root/reference (read-only import, no code
copied) as the ground-truth oracle.  The shims implement exactly the API
surface the reference touches:

* pymap3d.geodetic2ecef / ecef2geodetic  (WGS-84; numpy closed forms)
* tables.open_file with get_node/create_group/create_array over h5py
* cartopy.crs.{LambertConformal, PlateCarree, Geodetic} dummies (only
  needed at validate.py import time)
"""

from __future__ import annotations

import sys
import types

import numpy as np


def _make_pymap3d():
    m = types.ModuleType("pymap3d")
    from volumetricinterp_tpu.coords import np_geodetic2ecef

    def geodetic2ecef(lat, lon, alt, **kw):
        return np_geodetic2ecef(lat, lon, alt)

    def ecef2geodetic(x, y, z, **kw):
        import jax

        from volumetricinterp_tpu import coords

        la, lo, al = coords.ecef2geodetic(
            np.asarray(x, dtype=np.float64),
            np.asarray(y, dtype=np.float64),
            np.asarray(z, dtype=np.float64),
        )
        return np.asarray(la), np.asarray(lo), np.asarray(al)

    m.geodetic2ecef = geodetic2ecef
    m.ecef2geodetic = ecef2geodetic
    return m


def _make_tables():
    """The `tables` shim is the faithful pytables writer replica
    (tests/pytables_replica.py), so reference-written files carry the real
    pytables system attributes (CLASS/VERSION/TITLE/FLAVOR/
    PYTABLES_FORMAT_VERSION) instead of bare h5py datasets."""
    import types as _types

    from tests import pytables_replica

    m = _types.ModuleType("tables")
    m.open_file = pytables_replica.open_file
    m.File = pytables_replica.File
    return m


def _make_cartopy():
    pkg = types.ModuleType("cartopy")
    crs = types.ModuleType("cartopy.crs")

    class _Proj:
        def __init__(self, *a, **kw):
            pass

    crs.LambertConformal = _Proj
    crs.PlateCarree = _Proj
    crs.Geodetic = _Proj
    pkg.crs = crs
    return pkg, crs


def install_reference(path="/root/reference"):
    """Install shims and import the reference package from `path`.

    Returns the imported reference `volumetricinterp` module.  The repo's
    own package is volumetricinterp_tpu, so the names never collide.
    """
    if "pymap3d" not in sys.modules:
        sys.modules["pymap3d"] = _make_pymap3d()
    if "tables" not in sys.modules:
        sys.modules["tables"] = _make_tables()
    fake_cartopy = "cartopy" not in sys.modules
    if fake_cartopy:
        pkg, crs = _make_cartopy()
        sys.modules["cartopy"] = pkg
        sys.modules["cartopy.crs"] = crs

    if path not in sys.path:
        sys.path.insert(0, path)
    import importlib

    try:
        return importlib.import_module("volumetricinterp")
    finally:
        # the reference's validate module holds its binding to the dummy
        # cartopy; REMOVE the shim from sys.modules so OUR Validate (which
        # feature-detects cartopy) does not mistake the dummy for the real
        # thing in later tests of the same session
        if fake_cartopy:
            sys.modules.pop("cartopy", None)
            sys.modules.pop("cartopy.crs", None)
