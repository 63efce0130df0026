"""Test configuration: run JAX on 8 virtual CPU devices, float64 enabled.

Environment variables must be set before jax is first imported anywhere, so
this conftest performs the setup at collection time (SURVEY.md section 4,
item 4: mesh-sharded code is testable without a TPU via
--xla_force_host_platform_device_count).
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

# The axon environment force-registers the TPU plugin from sitecustomize (jax
# is already imported by the time any conftest runs), so selecting the test
# platform must go through jax.config rather than JAX_PLATFORMS.
if os.environ.get("VITPU_TESTS_ON_TPU", "0") != "1":
    import jax

    jax.config.update("jax_platforms", "cpu")

# Persistent compile cache: the expansion/ladder graphs compile slowly on
# this 1-core host and dominate suite wall time; caching them on disk makes
# re-runs start warm (first run populates).  Separate dir from the TPU
# cache (.jax_cache) so TPU executables and CPU test executables never
# share an eviction budget.  Subprocess-spawning tests (CLI, distributed)
# inherit it through the environment.
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.join(os.path.dirname(os.path.dirname(
                          os.path.abspath(__file__))), ".jax_cache_tests"))
import jax as _jax_cc  # noqa: E402

_jax_cc.config.update("jax_compilation_cache_dir",
                      os.environ["JAX_COMPILATION_CACHE_DIR"])
_jax_cc.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

import numpy as np
import pytest


def pytest_configure(config):
    config.addinivalue_line(
        "markers",
        "slow: heavy opt-in coverage, gated behind VITPU_SLOW_TESTS=1 "
        "(redundant parametrizations and compile-heavy shard graphs; the "
        "kept default variants cover every code path)")


def pytest_collection_modifyitems(config, items):
    if os.environ.get("VITPU_SLOW_TESTS"):
        return
    skip = pytest.mark.skip(reason="slow; set VITPU_SLOW_TESTS=1")
    for item in items:
        if "slow" in item.keywords:
            item.add_marker(skip)


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(1234)


@pytest.fixture(scope="session")
def small_config_text():
    """A small sphharmlag configuration (fast tests): nbasis = 2*3^2 = 18."""
    return """
[DEFAULT]
PARAM = dens
FILENAME = test_input.h5
OUTPUTFILENAME = test_output.h5
REGULARIZATION_LIST = 0thorder
REGULARIZATION_METHOD = chi2
ERRLIM = 1e10,1e13
GOODFITCODE = 1,2,3,4
CHI2LIM = 0.1,10

[MODEL]
NAME = sphharmlag
MAXK = 2
MAXL = 3
CAP_LIM = 10
MAX_Z_INT = INF
LATCP = 78
LONCP = 262

[VALIDATE]
STARTTIME = 2016-11-27T22:45:00
ENDTIME = 2016-11-27T22:50:00
ALTITUDES = 250.0,300.0
COLORLIM = 0.0,5.0e11
OUTPNGNAME = test_fig.png
"""
