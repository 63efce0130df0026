"""volumetricinterp_tpu — TPU-native volumetric interpolation of AMISR scalar fields.

A ground-up JAX/XLA/Pallas re-design of the capabilities of
``amisr/volumetricinterp`` (reference: /root/reference/volumetricinterp):
regularized weighted least-squares fits of sparse radar point measurements to
truncated 3-D analytic basis expansions (spherical-cap harmonics x weighted
Laguerre radial functions, or Gaussian RBFs), with coefficient storage in
self-describing HDF5 files and evaluation of the fitted analytic model on
arbitrary geodetic grids.

Public API parity (reference volumetricinterp/__init__.py:1-5):
    Interpolate  -- batched, device-vmapped fit engine
    Estimate     -- coefficient-file evaluation engine
    Validate     -- fit-a-window-and-plot validation workflow

TPU-first design notes
----------------------
* Everything numeric runs under jit: the per-record fit is vmapped and
  shardable over a ``jax.sharding.Mesh`` (records axis = data parallel,
  measurement-point axis = psum-reduced partial normal equations).
* float64 is enabled globally (required for normal-equation conditioning at
  high basis order); the dense grid-evaluation fast path runs in float32
  through a fused Pallas kernel.
* The associated Legendre functions of non-integer degree are evaluated on
  device via precomputed Chebyshev tables (host-built once per model config
  from machine-accurate seeds), turning the reference's per-point scipy
  special-function loop (models/sphharmlag.py:138-144) into MXU matmuls.
"""

import os as _os

if _os.environ.get("VITPU_NO_X64", "0") != "1":
    import jax as _jax

    _jax.config.update("jax_enable_x64", True)

from .interpolate import Interpolate
from .estimate import Estimate
from .validate import Validate

__version__ = "1.0.0"

__all__ = ["Interpolate", "Estimate", "Validate", "__version__"]
