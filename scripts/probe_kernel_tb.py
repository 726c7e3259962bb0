"""TPU probe: fused hidden kernel program-tile (tb) sweep."""
import os
import sys
import time

import numpy as np

t00 = time.time()
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir",
                  os.path.expanduser("~/.cache/jax_bench_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def log(m):
    print(f"[{time.time()-t00:6.1f}s] {m}", flush=True)


sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from surel_plus_tpu.ops.pallas.hidden_sum_kernel import (
    NEG, fused_key_hidden_sum, u_core_rows)

NW, NS, B, L, H, STEPS = 100, 3, 4096, 301, 96, 64
rng = np.random.default_rng(0)
kown = jnp.asarray(rng.integers(0, 1 << 22, size=(2, B, L)).astype(np.uint32))
mask = jnp.asarray(rng.random((2, B, L)) < 0.8)
kcross = jnp.asarray(
    rng.integers(0, 1 << 22, size=(B, 2 * L)).astype(np.uint32))
pick = rng.integers(0, 3, size=(B, 2 * L))
mc = jnp.asarray(np.stack([pick == 0, pick == 1]))
w1 = jnp.asarray(rng.normal(size=(NS + 1, H)).astype(np.float32) * 0.3)
b1 = jnp.asarray(rng.normal(size=(H,)).astype(np.float32) * 0.1)
u_ext = jnp.concatenate(
    [u_core_rows(w1, NW, NS), jnp.full((1, H), NEG, jnp.float32),
     b1[None]], axis=0)
SHIFT = int(NW).bit_length()


def bench_tb(tb):
    @jax.jit
    def fwd(ko, u):
        def body(acc, i):
            k = jnp.bitwise_xor(ko, i.astype(jnp.uint32) & jnp.uint32(1))
            return acc + fused_key_hidden_sum(k, mask, kcross, mc, u, SHIFT,
                                              tb=tb).sum(), None
        acc, _ = jax.lax.scan(body, jnp.float32(0),
                              jnp.arange(STEPS, dtype=jnp.int32))
        return acc

    @jax.jit
    def fb(ko, u):
        def body(acc, i):
            k = jnp.bitwise_xor(ko, i.astype(jnp.uint32) & jnp.uint32(1))
            f = lambda uu: fused_key_hidden_sum(k, mask, kcross, mc, uu, SHIFT,
                                                tb=tb).sum()
            l, du = jax.value_and_grad(f)(u)
            return acc + l + du.sum(), None
        acc, _ = jax.lax.scan(body, jnp.float32(0),
                              jnp.arange(STEPS, dtype=jnp.int32))
        return acc

    for label, fn in (("fwd", fwd), ("fwd+bwd", fb)):
        try:
            t0 = time.time()
            _ = float(fn(kown, u_ext))
            cold = time.time() - t0
            t0 = time.time()
            _ = float(fn(kown, u_ext))
            dt = time.time() - t0
            log(f"tb={tb} {label}: cold {cold:.1f}s warm "
                f"{dt/STEPS*1000:.2f}ms/iter")
        except Exception as ex:  # noqa: BLE001 - report and continue sweep
            log(f"tb={tb} {label}: FAILED {str(ex)[:200]}")


u_ext_f32 = u_ext
for tb in (8, 16):
    bench_tb(tb)
log("--- bf16 compute ---")
u_ext = u_ext_f32.astype(jnp.bfloat16)
for tb in (8, 16):
    bench_tb(tb)
