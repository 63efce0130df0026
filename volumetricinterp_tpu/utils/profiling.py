"""Profiling and debug instrumentation (SURVEY.md sections 5.1-5.2).

The reference has no tracing, profiling, or sanitizer hooks.  Here:

* `trace(logdir)` — context manager around any pipeline section producing a
  perfetto/tensorboard-loadable device trace (jax.profiler).
* `debug_mode()` — context manager enabling jax_debug_nans +
  jax_disable_most_optimizations-style checks for numerical forensics; the
  TPU analogue of running under a sanitizer (nothing racy exists: the
  pipeline is functional and deterministic).
"""

from __future__ import annotations

import contextlib


@contextlib.contextmanager
def trace(logdir="/tmp/vitpu_trace"):
    import jax.profiler

    jax.profiler.start_trace(logdir)
    try:
        yield logdir
    finally:
        jax.profiler.stop_trace()


@contextlib.contextmanager
def debug_mode(nans=True, checks=True):
    import jax

    old_nans = jax.config.jax_debug_nans
    old_checks = jax.config.jax_enable_checks
    jax.config.update("jax_debug_nans", bool(nans))
    jax.config.update("jax_enable_checks", bool(checks))
    try:
        yield
    finally:
        jax.config.update("jax_debug_nans", old_nans)
        jax.config.update("jax_enable_checks", old_checks)
