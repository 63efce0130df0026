"""Multi-process scale-out bring-up (parallel/distributed.py, SURVEY.md
section 5.8).

Validates the jax.distributed path with two LOCAL CPU processes (2 virtual
devices each -> a 4-device global mesh with the records axis across
processes), the standard JAX pattern for testing multi-host code without a
pod.  The children fit the same synthetic ensemble through
fit_records_distributed; the parent compares against the single-process
fit_records result.
"""

import os
import socket
import subprocess
import sys

import numpy as np
import pytest

CHILD = r"""
import os, sys
import numpy as np

pid = int(sys.argv[1])
port = sys.argv[2]
data_file = sys.argv[3]
out_file = sys.argv[4]

os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
import jax
jax.config.update("jax_platforms", "cpu")
try:
    jax.config.update("jax_cpu_collectives_implementation", "gloo")
except Exception:
    pass

import volumetricinterp_tpu  # noqa: F401  (enables x64)
from volumetricinterp_tpu.parallel.distributed import (
    initialize_distributed, make_global_mesh, fit_records_distributed)

ppid, nproc = initialize_distributed(
    coordinator=f"localhost:{port}", num_processes=2, process_id=pid)
assert nproc == 2, nproc
assert len(jax.devices()) == 4

mesh = make_global_mesh(mesh_records=0, mesh_points=2)
assert mesh.shape["records"] == 2 and mesh.shape["points"] == 2
# the records axis must be the slow (cross-process) axis: each record row
# of the mesh lives inside one process
for row in mesh.devices:
    assert len({d.process_index for d in row}) == 1, mesh.devices

d = np.load(data_file)
C, dC, chi2, alphas = fit_records_distributed(
    d["values"], d["errors"], d["A"], d["reg_mats"], mesh, method="chi2",
    regparam_mode="exact",
)
if pid == 0:
    np.savez(out_file, C=C, dC=dC, chi2=chi2, alphas=alphas)
print("child", pid, "ok", flush=True)
"""


def _free_port():
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    return port


@pytest.fixture(scope="module")
def small_fit_problem(small_config_text):
    from volumetricinterp_tpu.config import Config
    from volumetricinterp_tpu.models.sphharmlag import Model

    rng = np.random.default_rng(11)
    model = Model(Config.from_text(small_config_text))
    npts, nrec = 300, 6
    lat = rng.uniform(74.0, 82.0, npts)
    lon = rng.uniform(252.0, 272.0, npts)
    alt = rng.uniform(1.0e5, 6.0e5, npts)
    A = np.asarray(model.basis(lat, lon, alt))
    target = 4e11 * np.exp(-(((alt - 3e5) / 1.2e5) ** 2))
    C_true = np.linalg.lstsq(A, target, rcond=1e-10)[0]
    ne = A @ C_true
    noise = 2e10 + 0.05 * np.abs(ne)
    values = ne[None] + rng.normal(0, 1, (nrec, npts)) * noise[None]
    errors = np.broadcast_to(1.15 * noise, (nrec, npts)).copy()
    values[0, :5] = np.nan
    errors[0, :5] = np.nan
    psi = np.asarray(model.eval_psi())
    return values, errors, A, psi[None]


def test_multiprocess_fit_matches_single(small_fit_problem, tmp_path):
    values, errors, A, reg_mats = small_fit_problem

    data_file = tmp_path / "data.npz"
    np.savez(data_file, values=values, errors=errors, A=A,
             reg_mats=reg_mats)
    child_py = tmp_path / "child.py"
    child_py.write_text(CHILD)
    out_file = tmp_path / "result.npz"
    port = _free_port()

    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)  # children set their own device count
    env["PYTHONPATH"] = "/root/repo" + os.pathsep + env.get("PYTHONPATH", "")
    procs = [
        subprocess.Popen(
            [sys.executable, str(child_py), str(pid), str(port),
             str(data_file), str(out_file)],
            env=env, cwd="/root/repo",
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        )
        for pid in (0, 1)
    ]
    outs = [p.communicate(timeout=600)[0] for p in procs]
    for p, o in zip(procs, outs):
        assert p.returncode == 0, o[-3000:]

    got = np.load(out_file)

    # single-process reference on the same data
    import jax.numpy as jnp
    from volumetricinterp_tpu.ops.fit import fit_records

    C, dC, chi2, alphas = fit_records(
        jnp.asarray(values), jnp.asarray(errors), jnp.asarray(A),
        jnp.asarray(reg_mats), method="chi2", regparam_mode="exact",
    )
    # reduction-order (points psum) noise bounds as in test_sharding.py
    np.testing.assert_allclose(got["chi2"], np.asarray(chi2), rtol=1e-3)
    ok = np.isfinite(np.asarray(alphas))
    np.testing.assert_allclose(
        np.log10(got["alphas"][ok]), np.log10(np.asarray(alphas)[ok]),
        atol=1e-3,
    )
    y1 = got["C"] @ A.T
    y2 = np.asarray(C) @ A.T
    assert np.nanmax(np.abs(y1 - y2)) <= 1e-3 * np.nanmax(np.abs(y2))


def test_make_global_mesh_single_process_fallback():
    """Single-process: make_global_mesh defers to the local make_mesh (8
    virtual CPU devices from conftest)."""
    from volumetricinterp_tpu.parallel.distributed import make_global_mesh

    mesh = make_global_mesh(mesh_records=0, mesh_points=2)
    assert mesh.shape["points"] == 2
    assert mesh.shape["records"] * 2 == 8
