"""Probe: which dynamic-index patterns does Mosaic accept on real TPU?

The keys-LSTM kernel failed hardware compile on a dynamic-LANE mask read
(mk_ref[:, pl.ds(t, 1)] over a [tb, ell] block: "cannot statically prove
that index in dimension 1 is a multiple of 128"). Before restructuring,
verify on hardware:
  p1: dynamic-SUBLANE read of a 3-D ref   x_ref[:, pl.ds(t,1), :]
  p2: dynamic-SUBLANE store of a 3-D ref  o_ref[:, pl.ds(t,1), :] = v
  p3: static width-1 lane slice at unaligned offset  x2[:, hd:hd+1]
  p4: leading-dim dynamic store on 3-D scratch  s_ref[pl.ds(j,1)] = v

python scripts/probe_mosaic_dyn.py
"""
import functools
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import numpy as np  # noqa: E402
import jax  # noqa: E402

jax.config.update("jax_compilation_cache_dir",
                  os.path.expanduser("~/.cache/jax_bench_cache"))
import jax.numpy as jnp  # noqa: E402
from jax.experimental import pallas as pl  # noqa: E402
from jax.experimental.pallas import tpu as pltpu  # noqa: E402

TB, ELL, HD = 32, 384, 97


def k_read(x_ref, o_ref):
    def step(t, acc):
        xt = x_ref[:, pl.ds(t, 1), :].reshape(TB, HD)
        return acc + xt

    o_ref[:] = jax.lax.fori_loop(0, ELL, step,
                                 jnp.zeros((TB, HD), jnp.float32))


def k_store(x_ref, o_ref):
    def step(t, _):
        xt = x_ref[:, pl.ds(t, 1), :].reshape(TB, HD)
        o_ref[:, pl.ds(t, 1), :] = (xt * 2.0)[:, None, :]
        return 0

    jax.lax.fori_loop(0, ELL, step, 0)


def k_slice(x_ref, o_ref):
    def step(t, acc):
        xt = x_ref[:, pl.ds(t, 1), :].reshape(TB, HD)
        keep = xt[:, HD - 1:HD] > 0.0
        return acc + jnp.where(keep, xt[:, :HD - 1].sum(
            axis=1, keepdims=True), 0.0)

    o_ref[:] = jax.lax.fori_loop(0, ELL, step,
                                 jnp.zeros((TB, 1), jnp.float32))


def k_lead(x_ref, o_ref, s_ref):
    def step(j, _):
        xt = x_ref[:, pl.ds(j, 1), :].reshape(TB, HD)
        s_ref[pl.ds(j, 1)] = xt[None]
        return 0

    jax.lax.fori_loop(0, 8, step, 0)
    o_ref[:] = s_ref[0]


def run(name, kern, out_shape, scratch=()):
    x = jnp.asarray(np.random.default_rng(0).normal(
        size=(TB, ELL, HD)).astype(np.float32))
    try:
        f = pl.pallas_call(
            kern,
            in_specs=[pl.BlockSpec((TB, ELL, HD), lambda: (0, 0, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(out_shape, lambda: tuple(
                0 for _ in out_shape), memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct(out_shape, jnp.float32),
            scratch_shapes=list(scratch),
        )
        r = f(x)
        v = float(jnp.asarray(r).ravel()[0])
        print(f"{name}: OK (v={v:.3f})", flush=True)
    except Exception as e:
        msg = str(e).split("\n")[0][:200]
        print(f"{name}: FAIL {msg}", flush=True)


run("p1 dyn-sublane read", k_read, (TB, HD))
run("p2 dyn-sublane store", k_store, (TB, ELL, HD))
run("p3 static lane slice w1@96", k_slice, (TB, 1))
run("p4 leading-dim dyn store", k_lead, (TB, HD),
    scratch=[pltpu.VMEM((8, TB, HD), jnp.float32)])
