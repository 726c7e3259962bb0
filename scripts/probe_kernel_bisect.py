"""TPU probe: bisect the fused hidden kernel's forward cost.

Variants (each a standalone pallas kernel on the same operands):
  full        — the real forward
  no_bits     — bits replaced by a broadcast constant (keeps matmuls)
  no_mm       — matmuls replaced by a broadcast (keeps bits + reduce)
  no_reduce   — matmul + relu, sum replaced with row 0 slice
  bits_only   — only bits construction
"""
import os
import sys
import time

import numpy as np

t00 = time.time()
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

jax.config.update("jax_compilation_cache_dir",
                  os.path.expanduser("~/.cache/jax_bench_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def log(m):
    print(f"[{time.time()-t00:6.1f}s] {m}", flush=True)


sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from surel_plus_tpu.ops.pallas.hidden_sum_kernel import (
    _bits_ext, _CONTRACT_BITS)

B, L, H, NBX, STEPS, TB = 4096, 304, 96, 24, 64, 8
LC = 2 * L
rng = np.random.default_rng(0)
ko = jnp.asarray(rng.integers(0, 1 << 22,
                              size=(2, B * L)).astype(np.uint32))
mo = jnp.asarray(rng.integers(0, 2, size=(2, B * L)).astype(np.int32))
kc = jnp.asarray(rng.integers(0, 1 << 22,
                              size=(1, B * LC)).astype(np.uint32))
mc = jnp.asarray(rng.integers(0, 2, size=(2, B * LC)).astype(np.int32))
u = jnp.asarray(rng.normal(size=(NBX, H)).astype(np.float32))


def make_kernel(variant):
    def kern(ko_ref, mo_ref, kc_ref, mc_ref, u_ref, out_ref):
        uu = u_ref[:]
        tbl_o = TB * L
        tbl_c = TB * LC
        for pi in range(2):
            if variant == "bits_only":
                be = _bits_ext(ko_ref[pi],
                               1.0 - mo_ref[pi].astype(jnp.float32),
                               NBX - 2)
                out_ref[pi] = jnp.broadcast_to(
                    be[:1, :1] * 0.0 + be.sum() * 1e-9, (TB, H))
                continue
            if variant == "no_bits":
                be = jnp.broadcast_to(
                    (1.0 - mo_ref[pi].astype(jnp.float32))[None, :1],
                    (NBX, tbl_o)) + 0.5
            else:
                be = _bits_ext(ko_ref[pi],
                               1.0 - mo_ref[pi].astype(jnp.float32),
                               NBX - 2)
            if variant == "no_mm":
                z = jnp.broadcast_to(be[:1, :, None] * 1e-9,
                                     (1, tbl_o, H)).reshape(tbl_o, H)
            else:
                z = jax.lax.dot_general(
                    be, uu, dimension_numbers=_CONTRACT_BITS,
                    preferred_element_type=jnp.float32)
            r = jnp.maximum(z, 0.0)
            if variant == "no_reduce":
                out_ref[pi] = r.reshape(TB, L, H)[:, 0, :]
            else:
                out_ref[pi] = r.reshape(TB, L, H).sum(axis=1)
        # shared cross side
        if variant not in ("bits_only",):
            if variant == "no_bits":
                bec = jnp.broadcast_to(
                    (1.0 - mc_ref[0].astype(jnp.float32))[None, :1],
                    (NBX, tbl_c)) + 0.5
            else:
                bec = _bits_ext(kc_ref[0],
                                jnp.zeros((tbl_c,), jnp.float32),
                                NBX - 2)
            if variant == "no_mm":
                rc = jnp.broadcast_to(bec[:1, :, None] * 1e-9,
                                      (1, tbl_c, H)).reshape(tbl_c, H)
            else:
                rc = jnp.maximum(jax.lax.dot_general(
                    bec, uu, dimension_numbers=_CONTRACT_BITS,
                    preferred_element_type=jnp.float32), 0.0)
            for pi in range(2):
                if variant == "no_reduce":
                    out_ref[pi] += rc.reshape(TB, LC, H)[:, 0, :]
                else:
                    mcp = mc_ref[pi].astype(jnp.float32)
                    gi = jax.lax.broadcasted_iota(jnp.int32, (TB, tbl_c), 0)
                    li = jax.lax.broadcasted_iota(jnp.int32, (TB, tbl_c), 1)
                    sel = jnp.where((li // LC) == gi,
                                    jnp.broadcast_to(mcp[None, :],
                                                     (TB, tbl_c)), 0.0)
                    out_ref[pi] += jnp.dot(
                        sel, rc, preferred_element_type=jnp.float32)
    return kern


def bench(variant):
    blk = lambda shape, imap: pl.BlockSpec(shape, imap,
                                           memory_space=pltpu.VMEM)
    call = pl.pallas_call(
        make_kernel(variant),
        grid=(B // TB,),
        in_specs=[blk((2, TB * L), lambda i: (0, i)),
                  blk((2, TB * L), lambda i: (0, i)),
                  blk((1, TB * LC), lambda i: (0, i)),
                  blk((2, TB * LC), lambda i: (0, i)),
                  blk((NBX, H), lambda i: (0, 0))],
        out_specs=blk((2, TB, H), lambda i: (0, i, 0)),
        out_shape=jax.ShapeDtypeStruct((2, B, H), jnp.float32),
    )

    @jax.jit
    def run(ko, u):
        def body(acc, i):
            k = jnp.bitwise_xor(ko, i.astype(jnp.uint32) & jnp.uint32(1))
            return acc + call(k, mo, kc, mc, u).sum(), None
        acc, _ = jax.lax.scan(body, jnp.float32(0),
                              jnp.arange(STEPS, dtype=jnp.int32))
        return acc

    try:
        t0 = time.time()
        _ = float(run(ko, u))
        cold = time.time() - t0
        t0 = time.time()
        _ = float(run(ko, u))
        dt = time.time() - t0
        log(f"{variant}: cold {cold:.1f}s warm {dt/STEPS*1000:.2f}ms/iter")
    except Exception as ex:  # noqa: BLE001
        log(f"{variant}: FAILED {str(ex)[:300]}")


for v in ("full", "no_bits", "no_mm", "no_reduce", "bits_only"):
    bench(v)
