"""Measure device<->host transfer bandwidth (dev tool)."""
import time

import jax
import jax.numpy as jnp
import numpy as np

x = jnp.ones((1024, 1024, 16), jnp.float32)  # 64MB
jax.block_until_ready(x)
t0 = time.time()
h = np.asarray(x)
dt = time.time() - t0
print(f"device->host 64MB: {dt:.2f}s = {64/dt:.1f} MB/s", flush=True)

h2 = np.ones((1024, 1024, 16), np.float32)
t0 = time.time()
d = jnp.asarray(h2)
jax.block_until_ready(d)
dt = time.time() - t0
print(f"host->device 64MB: {dt:.2f}s = {64/dt:.1f} MB/s", flush=True)

t0 = time.time()
s = float(x.sum())
print(f"reduce-to-scalar pull: {time.time()-t0:.3f}s", flush=True)
