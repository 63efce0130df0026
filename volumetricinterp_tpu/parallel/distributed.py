"""Multi-process / multi-slice bring-up (SURVEY.md section 5.8).

The reference is a single serial process (interpolate.py:511).  The TPU
scale-out maps the two parallel axes of the problem onto the hardware
hierarchy:

* records  — embarrassingly parallel (each time record's fit is
  independent) -> sharded across PROCESSES / SLICES over DCN with ZERO
  cross-slice traffic;
* points   — the A'WA / A'Wb reductions -> sharded across the chips of one
  slice, psum over ICI (parallel/fit.py).

This module provides the jax.distributed bring-up, a DCN-aware global mesh,
and a multi-process fit wrapper.  Everything also runs single-process (the
functions degrade to the local-mesh path), and the multi-process path is
tested with local CPU processes (tests/test_distributed.py) — the standard
JAX pattern for validating multi-host code without a pod.

Launch pattern (one command per host, e.g. under SLURM/GKE):

    VITPU_COORDINATOR=host0:8476 VITPU_NUM_PROCESSES=4 \
    VITPU_PROCESS_ID=$RANK volumetricinterp --distributed config.ini
"""

from __future__ import annotations

import os

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh

_initialized = False


def initialize_distributed(coordinator=None, num_processes=None,
                           process_id=None, local_device_ids=None):
    """jax.distributed bring-up, env-driven by default.

    Reads VITPU_COORDINATOR / VITPU_NUM_PROCESSES / VITPU_PROCESS_ID when
    arguments are None (falling back to jax's own auto-detection for
    TPU pods, where all three can be omitted).  Safe to call twice.

    Returns (process_id, num_processes) after initialization.
    """
    global _initialized
    coordinator = coordinator or os.environ.get("VITPU_COORDINATOR")
    if num_processes is None and "VITPU_NUM_PROCESSES" in os.environ:
        num_processes = int(os.environ["VITPU_NUM_PROCESSES"])
    if process_id is None and "VITPU_PROCESS_ID" in os.environ:
        process_id = int(os.environ["VITPU_PROCESS_ID"])
    if not _initialized and (coordinator or num_processes):
        jax.distributed.initialize(
            coordinator_address=coordinator,
            num_processes=num_processes,
            process_id=process_id,
            local_device_ids=local_device_ids,
        )
        _initialized = True
    return jax.process_index(), jax.process_count()


def _slice_groups(devices):
    """Group devices by slice: slice_index where the platform exposes it
    (multi-slice TPU), else by process (one 'slice' per host), else one
    group."""
    keyed = {}
    for d in devices:
        key = getattr(d, "slice_index", None)
        if key is None:
            key = d.process_index
        keyed.setdefault(key, []).append(d)
    return [keyed[k] for k in sorted(keyed)]


def make_global_mesh(mesh_records: int = 0, mesh_points: int = 1) -> Mesh:
    """DCN-aware global ('records', 'points') mesh over ALL processes.

    Layout rule: the records axis varies slowest across SLICES (or hosts),
    so record shards never communicate across DCN; the points axis (psum
    traffic) stays inside a slice on ICI.  Single-process: defers to the
    local make_mesh.
    """
    devices = jax.devices()
    groups = _slice_groups(devices)
    if len(groups) == 1:
        from .mesh import make_mesh

        return make_mesh(mesh_records, mesh_points, devices=devices)

    per = len(groups[0])
    if any(len(g) != per for g in groups):
        raise ValueError(
            "uneven slices: " + str([len(g) for g in groups])
        )
    p = max(mesh_points, 1)
    if per % p:
        raise ValueError(
            f"points axis {p} must divide the {per} devices of one slice"
        )
    r_in = per // p  # records axis inside each slice
    # [nslices, r_in, p] -> records axis = (slice, r_in) flattened: the
    # slice stride is the SLOW axis, so a record shard lives entirely
    # inside one slice
    arr = np.array([g for g in groups]).reshape(len(groups), r_in, p)
    arr = arr.reshape(len(groups) * r_in, p)
    return Mesh(arr, ("records", "points"))


def make_global(x, mesh: Mesh, spec):
    """Build a global device array from a process-local FULL copy of x.

    Every process reads the same HDF5 file (records are file-level arrays),
    so each can serve its addressable shards directly — no host-to-host
    data movement."""
    from jax.sharding import NamedSharding

    x = np.asarray(x)
    sh = NamedSharding(mesh, spec)
    return jax.make_array_from_callback(x.shape, sh, lambda idx: x[idx])


def fit_records_distributed(values, errors, A, reg_mats, mesh: Mesh,
                            method: str = "chi2", manual_params=None,
                            regparam_mode: str = "exact", reg_taus=None):
    """Multi-process batched fit: every process passes the FULL data arrays
    (each read from the shared file); returns fully-replicated numpy results
    on every process.

    Pads records to the mesh size, shards them across the global mesh
    (records across slices/processes over DCN, points inside a slice), runs
    the standard two sharded stages, and allgathers the outputs so every
    process can proceed identically (process 0 writes the HDF5 file).
    """
    from jax.experimental import multihost_utils
    from jax.sharding import PartitionSpec as P

    from .fit import _stats_then_solve
    from ..ops.fit import prepare_fit_inputs
    from ..ops.xprec import stack_x, unstack_x

    values = np.asarray(values, np.float64)
    errors = np.asarray(errors, np.float64)
    A = np.asarray(A, np.float64)
    nrec, npts = values.shape
    r_ax = mesh.shape["records"]
    p_ax = mesh.shape["points"]
    nrec_p = -(-nrec // (r_ax * p_ax)) * (r_ax * p_ax)
    npts_p = -(-npts // p_ax) * p_ax

    def pad(x, n, axis, fill):
        w = [(0, 0)] * x.ndim
        w[axis] = (0, n - x.shape[axis])
        return np.pad(x, w, constant_values=fill) if n > x.shape[axis] else x

    v = pad(pad(values, nrec_p, 0, np.nan), npts_p, 1, np.nan)
    e = pad(pad(errors, nrec_p, 0, np.nan), npts_p, 1, np.nan)
    Ap = pad(A, npts_p, 0, 0.0)

    b_x, W_x, mask, A_x, reg_x = prepare_fit_inputs(v, e, Ap, reg_mats)
    nw = len(b_x)

    def glob(exp, spec):
        arr = np.asarray(stack_x(exp))
        return unstack_x(make_global(arr, mesh, spec), nw)

    b_x = glob(b_x, P(None, "records", "points"))
    W_x = glob(W_x, P(None, "records", "points"))
    mask = make_global(np.asarray(mask), mesh, P("records", "points"))
    A_x = glob(A_x, P(None, "points", None))
    reg_x = glob(reg_x, P(None))

    mlp = None
    if manual_params is not None:
        with np.errstate(divide="ignore"):
            mlp = np.log10(np.asarray(manual_params, np.float64))
        mlp = jnp.asarray(mlp)

    from .fit import _split_taus
    C, dC, chi2, log_a = _stats_then_solve(
        b_x, W_x, mask, A_x, reg_x, mesh, method, mlp, regparam_mode,
        reg_taus_x=_split_taus(reg_taus))

    if jax.process_count() > 1:
        C, dC, chi2, log_a = (
            multihost_utils.process_allgather(x, tiled=True)
            for x in (C, dC, chi2, log_a)
        )
    la = np.asarray(log_a, np.float64)[:nrec]
    with np.errstate(over="ignore"):
        alphas = 10.0 ** la
    return (np.asarray(C)[:nrec], np.asarray(dC)[:nrec],
            np.asarray(chi2)[:nrec], alphas)
