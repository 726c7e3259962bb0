"""TPU probe: 1-D vs 2-D sort throughput (dev tool)."""
import sys
import time

import numpy as np

t00 = time.time()
import jax
import jax.numpy as jnp


def log(m):
    print(f"[{time.time()-t00:6.1f}s] {m}", flush=True)


def timed(label, fn, *args):
    t0 = time.time()
    out = fn(*args)
    jax.block_until_ready(out)
    log(f"{label} cold {time.time()-t0:.1f}s")
    t0 = time.time()
    out = fn(*args)
    jax.block_until_ready(out)
    log(f"{label} warm {time.time()-t0:.2f}s")


rng = np.random.default_rng(0)
for n in (1 << 22, 1 << 24, 1 << 26):
    x = jnp.asarray(rng.integers(0, 1 << 31, n, dtype=np.int64
                                 ).astype(np.uint32))
    timed(f"sort 1-D n={n}", jax.jit(jnp.sort), x)

x2 = jnp.asarray(rng.integers(0, 1 << 31, (1 << 13, 1 << 13),
                              dtype=np.int64).astype(np.uint32))
timed("sort 2-D 8192x8192 rows", jax.jit(lambda a: jnp.sort(a, axis=1)), x2)

x3 = jnp.asarray(rng.integers(0, 1 << 31, (256, 1 << 18),
                              dtype=np.int64).astype(np.uint32))
timed("sort 2-D 256x262144 rows", jax.jit(lambda a: jnp.sort(a, axis=1)),
      x3)
