"""Device-mesh construction for sharded fitting and evaluation.

The reference is single-process and serial (SURVEY.md section 2); here the
two parallel axes are:

* 'records' — data parallelism over time records (embarrassingly parallel,
  no communication; the record loop at interpolate.py:511).
* 'points'  — measurement-point parallelism: A'WA and A'Wb are sums over
  points (interpolate.py:456-458), so point shards reduce with one psum of
  the small [nbasis, nbasis] partials over ICI (SURVEY.md sections 5.7-5.8).
"""

from __future__ import annotations

import numpy as np
import jax
from jax.sharding import Mesh


def make_mesh(mesh_records: int = 0, mesh_points: int = 1,
              devices=None) -> Mesh:
    """2-D mesh ('records', 'points').  mesh_records=0 uses all remaining
    devices on the records axis."""
    if devices is None:
        devices = jax.devices()
    n = len(devices)
    p = max(mesh_points, 1)
    r = mesh_records or max(n // p, 1)
    if r * p > n:
        raise ValueError(f"mesh {r}x{p} needs {r*p} devices, have {n}")
    arr = np.array(devices[: r * p]).reshape(r, p)
    return Mesh(arr, ("records", "points"))
