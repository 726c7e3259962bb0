"""TPU probe: decompose the fused forward step into its parts.

Times 64-iteration scans of (a) SpG row gathers, (b) the 2-operand merge
sort, (c) the fused hidden kernel on fixed planes, (d) the full join,
(e) the full forward — to rank the remaining levers.
"""
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

from surel_plus_tpu.graph.synthetic import rmat_graph
from surel_plus_tpu.models import Net
from surel_plus_tpu.ops.join import make_keys_join
from surel_plus_tpu.ops.sampler import sample_gsets_device_keys
from surel_plus_tpu.ops.pallas.hidden_sum_kernel import (
    NEG, fused_key_hidden_sum, u_core_rows)

N, bs, STEPS, NW, NS = 100_000, 4096, 64, 100, 3
g = rmat_graph(N, 10 * N, seed=0)
spgk = sample_gsets_device_keys(g, np.arange(N, dtype=np.int32),
                                num_walks=NW, num_steps=NS, seed=0)
_ = int(spgk.sizes.max())
L = int(spgk.nodes.shape[1])
log(f"sampled L={L}")

rng = np.random.default_rng(0)
edges8 = jnp.asarray(rng.integers(0, N, size=(2, bs * 8)).astype(np.int32))
edges = edges8[:, :bs]
join = make_keys_join(NW, NS)


def slc(i, a):
    """Real data dependence on the scan index: slice window (i%8)*bs."""
    return jax.lax.dynamic_slice_in_dim(a, (i % 8) * bs, bs, axis=1)


def scan64(f, *args):
    @jax.jit
    def run(*a):
        def body(acc, i):
            return acc + f(i, *a), None
        acc, _ = jax.lax.scan(body, jnp.float32(0),
                              jnp.arange(STEPS, dtype=jnp.int32))
        return acc
    return run, args


def timed(label, f, *args):
    run, a = scan64(f, *args)
    t0 = time.time()
    _ = float(run(*a))
    log(f"{label} cold {time.time()-t0:.1f}s")
    t0 = time.time()
    _ = float(run(*a))
    dt = time.time() - t0
    log(f"{label} warm {dt:.2f}s -> {dt/STEPS*1000:.2f}ms/iter")


# (a) row gathers only
def gathers(i, nodes, khi, klo, sizes, edges):
    e = slc(i, edges)
    return (nodes[e].sum() + khi[e].astype(jnp.float32).sum()
            + klo[e].astype(jnp.float32).sum()
            + sizes[e].sum()).astype(jnp.float32)


timed("row gathers", gathers, spgk.nodes, spgk.khi, spgk.klo, spgk.sizes,
      edges8)


# (b) merge sort only (2-operand, [B, 2L])
rn = np.asarray(spgk.nodes)[np.asarray(edges8)]   # [2, 8bs, L]
rl = np.asarray(spgk.klo)[np.asarray(edges8)]
nu_, nv_ = jnp.asarray(rn[0]), jnp.asarray(rn[1])
lu_, lv_ = jnp.asarray(rl[0]), jnp.asarray(rl[1])


def sort_only(i, nu8, nv8, lu8, lv8):
    nu = jax.lax.dynamic_slice_in_dim(nu8, (i % 8) * bs, bs, axis=0)
    nv = jax.lax.dynamic_slice_in_dim(nv8, (i % 8) * bs, bs, axis=0)
    lu = jax.lax.dynamic_slice_in_dim(lu8, (i % 8) * bs, bs, axis=0)
    lv = jax.lax.dynamic_slice_in_dim(lv8, (i % 8) * bs, bs, axis=0)
    vals = jnp.concatenate([nv, nu], axis=1)
    tag = jnp.concatenate([jnp.zeros_like(nv, jnp.uint32),
                           jnp.ones_like(nu, jnp.uint32)], axis=1)
    packed = (vals.astype(jnp.uint32) << 1) | tag
    pay = jnp.concatenate([lv, lu], axis=1)
    spk, sp = jax.lax.sort((packed, pay), num_keys=1)
    return sp.astype(jnp.float32).sum() + spk.astype(jnp.float32).sum()


timed("merge sort", sort_only, nu_, nv_, lu_, lv_)


# (c) fused hidden kernel only on fixed planes
joined0 = jax.jit(lambda e: join(spgk.nodes, spgk.khi, spgk.klo,
                                 spgk.sizes, e))(edges)
kown = jax.device_get(joined0.kown)
H = 96
w1 = jnp.asarray(rng.normal(size=(NS + 1, H)).astype(np.float32) * 0.3)
b1 = jnp.asarray(rng.normal(size=(H,)).astype(np.float32) * 0.1)
u_ext = jnp.concatenate(
    [u_core_rows(w1, NW, NS), jnp.full((1, H), NEG, jnp.float32),
     b1[None]], axis=0)
SHIFT = int(NW).bit_length()


def kernel_only(i, ko, mo, kc, mc, u):
    ko = jnp.bitwise_xor(ko, i.astype(jnp.uint32) & jnp.uint32(1))
    s = fused_key_hidden_sum(ko, mo, kc, mc, u, SHIFT)
    return s.sum()


timed("hidden kernel fwd", kernel_only, joined0.kown, joined0.mask,
      joined0.kcross, joined0.kcross_mask, u_ext)


def kernel_grad(i, ko, mo, kc, mc, u):
    ko = jnp.bitwise_xor(ko, i.astype(jnp.uint32) & jnp.uint32(1))
    f = lambda uu: fused_key_hidden_sum(ko, mo, kc, mc, uu, SHIFT).sum()
    l, du = jax.value_and_grad(f)(u)
    return l + du.sum()


timed("hidden kernel fwd+bwd", kernel_grad, joined0.kown, joined0.mask,
      joined0.kcross, joined0.kcross_mask, u_ext)


# (d) full join (gathers + sort + planes)
def join_only(i, nodes, khi, klo, sizes, edges):
    jb = join(nodes, khi, klo, sizes, slc(i, edges))
    return (jb.kown.astype(jnp.float32).sum()
            + jb.kcross.astype(jnp.float32).sum()
            + jb.kcross_mask.sum() + jb.mask.sum())


timed("full join", join_only, spgk.nodes, spgk.khi, spgk.klo, spgk.sizes,
      edges8)
