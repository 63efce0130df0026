#!/usr/bin/env python
"""Batch-size scaling of the TPU f32 eigh at ladder-relevant shapes.

If the batched QDWH eigh is latency-bound (flat in batch), the exact
search can evaluate several alphas per sequential round for free."""
import os
import time

import numpy as np

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir",
                  os.environ["JAX_COMPILATION_CACHE_DIR"])
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

rng = np.random.default_rng(0)


def sync(x):
    return float(np.asarray(x[0].ravel()[:1])[0])


@jax.jit
def eigh(M):
    return jnp.linalg.eigh(M)


for n in (36, 48, 72, 144):
    for b in (128, 256, 384, 512, 1024):
        M = rng.normal(size=(b, n, n)).astype(np.float32)
        M = jnp.asarray(M + np.swapaxes(M, -1, -2))
        w = eigh(M)
        sync(w)
        t0 = time.perf_counter()
        sync(w)
        rtt = time.perf_counter() - t0
        reps = 5
        t0 = time.perf_counter()
        for _ in range(reps):
            w = eigh(M)
        sync(w)
        dt = (time.perf_counter() - t0 - rtt) / reps
        print(f"eigh [{b:5d},{n:3d},{n:3d}]  {dt*1e3:8.2f} ms")
