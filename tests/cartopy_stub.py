"""Minimal cartopy stand-in so the Validate map-projection branch can run
under test in environments without cartopy (the reference's actual product
is the Lambert-conformal panel, /root/reference/volumetricinterp/
validate.py:99,115-122; only the plain-axes fallback executes when cartopy
is absent).

Same pattern as tests/pytables_replica.py: replicate exactly the surface
the production code touches —

* ``cartopy.crs.LambertConformal(central_latitude=, central_longitude=)``
  and ``cartopy.crs.PlateCarree()``;
* projection objects consumed by matplotlib via the ``_as_mpl_axes``
  protocol (how real cartopy hooks GeoAxes into ``plt.subplots``);
* ``transform=<crs>`` kwargs consumed via the ``_as_mpl_transform``
  protocol (real cartopy CRS objects implement it too);
* GeoAxes ``coastlines()`` / ``gridlines()``.

The stub projection is an identity map (lon/lat plotted as-is), which is
fine: the branch under test is the plotting CODE PATH, not the cartographic
math."""

import sys
import types

from matplotlib.axes import Axes


class _StubCRS:
    """Base CRS: usable both as a subplot projection and as a transform."""

    def _as_mpl_axes(self):
        return _StubGeoAxes, {"stub_crs": self}

    def _as_mpl_transform(self, axes=None):
        # identity projection: data coordinates are lon/lat already
        return axes.transData


class PlateCarree(_StubCRS):
    def __init__(self, central_longitude=0.0):
        self.central_longitude = central_longitude


class LambertConformal(_StubCRS):
    def __init__(self, central_latitude=39.0, central_longitude=-96.0,
                 **kwargs):
        self.central_latitude = central_latitude
        self.central_longitude = central_longitude


class _StubGeoAxes(Axes):
    """Axes with the GeoAxes surface Validate touches.  Instrumented so
    tests can assert the projection branch actually executed."""

    name = "vitpu_stub_geoaxes"
    coastlines_calls = 0
    gridlines_calls = 0

    def __init__(self, *args, stub_crs=None, **kwargs):
        self.projection = stub_crs
        super().__init__(*args, **kwargs)

    def coastlines(self, resolution="110m", color="black", **kwargs):
        _StubGeoAxes.coastlines_calls += 1
        return None

    def gridlines(self, crs=None, draw_labels=False, **kwargs):
        _StubGeoAxes.gridlines_calls += 1
        return None


def install():
    """Register the stub as ``cartopy`` / ``cartopy.crs`` in sys.modules.
    Returns the modules it installed (pass to :func:`uninstall`)."""
    cartopy = types.ModuleType("cartopy")
    crs = types.ModuleType("cartopy.crs")
    crs.PlateCarree = PlateCarree
    crs.LambertConformal = LambertConformal
    cartopy.crs = crs
    sys.modules["cartopy"] = cartopy
    sys.modules["cartopy.crs"] = crs
    _StubGeoAxes.coastlines_calls = 0
    _StubGeoAxes.gridlines_calls = 0
    return ("cartopy", "cartopy.crs")


def uninstall(names=("cartopy", "cartopy.crs")):
    for n in names:
        sys.modules.pop(n, None)
