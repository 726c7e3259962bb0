"""What bounds the keys-LSTM forward at [2,4096,301]? (VERDICT r4 item 2)

Hypotheses for the 12.8 ms fwd (vs ~5-6 ms claimed dependent-issue
floor):
  H1 latency: each step's wh matmul waits on the previous step's
     elementwise chain -> interleaving independent WAVES (sub-row-blocks
     with separate carries) inside the step should overlap MXU and VPU.
  H2 VPU transcendentals: ~0.95G sigmoid/tanh evaluations dominate ->
     waves change nothing; the cheap-activation variant (probe-only,
     wrong numerics) collapses the time.
  H3 masked tail: ~45% of (row, step) work is beyond the row's valid
     prefix -> a per-tile dynamic loop bound over size-sorted rows
     recovers that fraction (only helps if H2/H1 leave VPU/MXU busy).

Variants (fwd only, production shapes, synthetic keys):
  base        lstm_from_keys production kernel
  waves2/4    per-step issue split into independent sub-block chains
  cheapact    sigmoid/tanh -> affine clip (NOT correct; bound probe)
  dynbound    fori_loop bound = per-tile max valid step (sorted rows)

python scripts/probe_lstm_waves.py [variants...]

r5 RESULTS (v5e, [2,4096,301], 2026-08-20): base 13.2 / waves1 12.8 /
waves2 12.6 / waves4 15.1 / cheapact 15.1 / justz 5.64 ms.
-> H2 REFUTED (removing transcendentals does not help), H1 marginal
(~2%), and the decisive finding: the per-step key->hidden recompute
alone is 44% of the forward (single-sublane [1, tb] extraction +
per-step dynamic slices). This motivated the t2 kernels
(lstm_kernel.py: chunked extraction + transposed state + sorted
early-exit chunks): fwd 3.9 ms, fwd+bwd 20.4 ms — x3.3/x2.9.
"""
import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import numpy as np  # noqa: E402
import jax  # noqa: E402

jax.config.update("jax_compilation_cache_dir",
                  os.path.expanduser("~/.cache/jax_bench_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp  # noqa: E402
from jax.experimental import pallas as pl  # noqa: E402
from jax.experimental.pallas import tpu as pltpu  # noqa: E402

from surel_plus_tpu.ops.pallas.hidden_sum_kernel import (  # noqa: E402
    NEG, u_core_rows)
from surel_plus_tpu.ops.pallas import lstm_kernel as LK  # noqa: E402

M, S = 100, 3
SHIFT = int(M).bit_length()
Q = 2
B = int(os.environ.get("B", "4096"))
L = int(os.environ.get("L", "301"))
H = 96
ITERS = int(os.environ.get("ITERS", "8"))


def log(m):
    print(m, flush=True)


def _rand_keys(rng, shape):
    ks = np.zeros(shape, np.uint32)
    for j in range(S):
        ks |= rng.integers(0, M + 1, size=shape).astype(
            np.uint32) << np.uint32(j * SHIFT)
    ks |= (rng.random(shape) < 0.3).astype(np.uint32) << np.uint32(
        S * SHIFT)
    return ks


def make_inputs(sort_rows=False):
    rng = np.random.default_rng(0)
    kown = _rand_keys(rng, (Q, B, L))
    kc = _rand_keys(rng, (Q, B, L))
    # skewed sizes like the production RMAT batch (p50 ~ 0.56 L)
    sizes = np.minimum(
        (np.exp(rng.normal(np.log(0.56 * L), 0.45, size=(Q, B))))
        .astype(np.int32), L)
    sizes = np.maximum(sizes, 1)
    if sort_rows:
        order = np.argsort(sizes, axis=1)
        sizes = np.take_along_axis(sizes, order, axis=1)
        kown = np.take_along_axis(kown, order[..., None], axis=1)
        kc = np.take_along_axis(kc, order[..., None], axis=1)
    mask = np.arange(L)[None, None, :] < sizes[..., None]
    w1 = rng.normal(size=(S + 1, H)).astype(np.float32) * 0.3
    b1 = rng.normal(size=(H,)).astype(np.float32) * 0.1
    u = u_core_rows(jnp.asarray(w1), M, S)
    u_ext = jnp.concatenate(
        [u, jnp.full((1, H), NEG, jnp.float32),
         jnp.asarray(b1)[None]], axis=0)
    wi = rng.normal(size=(H, 4 * H)).astype(np.float32) * 0.1
    wh = rng.normal(size=(H, 4 * H)).astype(np.float32) * 0.1
    bh = rng.normal(size=(4 * H,)).astype(np.float32) * 0.1
    return (jnp.asarray(kown), jnp.asarray(kc), jnp.asarray(mask),
            u_ext, jnp.asarray(wi), jnp.asarray(wh), jnp.asarray(bh),
            sizes)


def timeit(label, fn, *args):
    out = fn(*args)
    _ = float(jnp.asarray(out).ravel()[0])       # compile+sync
    t0 = time.time()
    for _i in range(ITERS):
        out = fn(*args)
    _ = float(jnp.asarray(out).ravel()[0])
    dt = (time.time() - t0) / ITERS * 1e3
    log(f"{label:12s} {dt:8.2f} ms")
    return dt


# --------------------------------------------------------------------------
# variant kernel: waves + optional cheap activations + optional dynamic
# loop bound (tmax scalar per tile). Mirrors LK._klstm_t_fwd_kernel.

def _var_fwd_kernel(ell, shift, waves, cheap, dyn, noz, justz, *refs):
    if dyn:
        tmax_ref, *refs = refs
    (ko_ref, kc_ref, mk_ref, u_ref, wi_ref, wh_ref, bh_ref,
     out_ref) = refs
    tb = ko_ref.shape[1]
    hh = wh_ref.shape[0]
    hdp = u_ref.shape[1]
    u2 = u_ref[:]
    wi = wi_ref[:]
    wh = wh_ref[:]
    bh = bh_ref[:]
    tbw = tb // waves

    sig = ((lambda v: jnp.clip(0.25 * v + 0.5, 0.0, 1.0)) if cheap
           else jax.nn.sigmoid)
    tnh = ((lambda v: jnp.clip(v, -1.0, 1.0)) if cheap else jnp.tanh)

    if justz:
        # ONLY the per-step key->hidden recompute, no recurrence math
        def stepz(t, acc):
            (_, zo), (_, zc) = LK._kt_z(ko_ref, kc_ref, None, None,
                                        mk_ref, u2, shift, t)
            return acc + jnp.maximum(zo, 0.0) + jnp.maximum(zc, 0.0)

        acc = jax.lax.fori_loop(0, ell, stepz,
                                jnp.zeros((tb, hdp), jnp.float32))
        out_ref[:] = acc[:, :out_ref.shape[1]]
        return

    def step(t, carry):
        if noz:
            # recurrence math only: xt = a loop-dependent constant row
            xt = jnp.full((tb, hdp), 0.1, jnp.float32) \
                + jax.lax.broadcast(t.astype(jnp.float32) * 1e-6,
                                    (tb, hdp))
        else:
            (zo0, zc0) = LK._kt_z(ko_ref, kc_ref, None, None, mk_ref,
                                  u2, shift, t)
            zo, zc = zo0[1], zc0[1]
            xt = jnp.maximum(zo, 0.0) + jnp.maximum(zc, 0.0)
        new = []
        for k in range(waves):
            c, hid = carry[k]
            xk = xt[k * tbw:(k + 1) * tbw]
            gates = (jnp.dot(xk, wi,
                             preferred_element_type=jnp.float32)
                     + jnp.dot(hid, wh,
                               preferred_element_type=jnp.float32)
                     + bh)
            gi = sig(gates[:, :hh])
            gf = sig(gates[:, hh:2 * hh])
            gg = tnh(gates[:, 2 * hh:3 * hh])
            go = sig(gates[:, 3 * hh:])
            nc = gf * c + gi * gg
            nh = go * tnh(nc)
            keep = xk[:, hdp - 1:hdp] > 0
            new.append((jnp.where(keep, nc, c),
                        jnp.where(keep, nh, hid)))
        return tuple(new)

    zero = jnp.zeros((tbw, hh), jnp.float32)
    init = tuple((zero, zero) for _ in range(waves))
    bound = tmax_ref[0, 0] if dyn else ell
    out = jax.lax.fori_loop(0, bound, step, init)
    for k in range(waves):
        out_ref[k * tbw:(k + 1) * tbw] = out[k][1]


def var_fwd(kown, kc, mask, u_ext, wi, wh, bh, sizes, tb=512, waves=1,
            cheap=False, dyn=False, noz=False, justz=False):
    b2 = Q * B
    ell = L
    nbx, hd = u_ext.shape
    hh = wh.shape[0]
    ellp = -(-ell // 8) * 8
    bp = -(-b2 // tb) * tb

    def prep(a, fill=0):
        a = a.reshape(b2, ell)
        if bp != b2 or ellp != ell:
            a = jnp.pad(a, [(0, bp - b2), (0, ellp - ell)],
                        constant_values=fill)
        return a.T

    ko = prep(kown)
    kcp = prep(kc)
    mk = prep(mask.astype(jnp.int32))
    u2 = jnp.pad(u_ext.astype(jnp.float32), [(0, 1), (0, 1)])
    u2 = u2.at[nbx, hd].set(1.0)
    wi2 = jnp.pad(wi.astype(jnp.float32), [(0, 1), (0, 0)])
    ins = [pl.BlockSpec((ellp, tb), lambda i: (0, i),
                        memory_space=pltpu.VMEM) for _ in range(3)]
    ins += [pl.BlockSpec(s, lambda i: (0, 0), memory_space=pltpu.VMEM)
            for s in ((nbx + 1, hd + 1), (hd + 1, 4 * hh),
                      (hh, 4 * hh), (1, 4 * hh))]
    args = [ko, kcp, mk, u2, wi2, wh.astype(jnp.float32),
            bh.reshape(1, -1).astype(jnp.float32)]
    if dyn:
        # per-tile max valid step (host-computed, passed in as `sizes`
        # = tmax [bp // tb] when dyn)
        ins = [pl.BlockSpec((1, 1), lambda i: (i, 0),
                            memory_space=pltpu.SMEM)] + ins
        args = [sizes.reshape(-1, 1)] + args
    return pl.pallas_call(
        functools.partial(_var_fwd_kernel, ellp, SHIFT, waves, cheap,
                          dyn, noz, justz),
        grid=(bp // tb,),
        in_specs=ins,
        out_specs=pl.BlockSpec((tb, hh), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((bp, hh), jnp.float32),
        interpret=LK._default_interpret(),
    )(*args)[:b2]


def main():
    which = sys.argv[1:] or ["base", "waves2", "waves4", "cheapact",
                             "dynbound"]
    inp = make_inputs()
    kown, kc, mask, u_ext, wi, wh, bh, sizes = inp
    log(f"device={jax.devices()[0].device_kind} shape=[{Q},{B},{L}] "
        f"H={H} mean_size={sizes.mean():.0f}")

    base_out = None
    if "base" in which:
        f = jax.jit(lambda *a: LK.lstm_from_keys(*a, shift=SHIFT))
        timeit("base", f, kown, kc, mask, u_ext, wi, wh, bh)
        base_out = np.asarray(f(kown, kc, mask, u_ext, wi, wh, bh))

    for name, kw in (("waves1", dict(waves=1)),
                     ("waves2", dict(waves=2)),
                     ("waves4", dict(waves=4)),
                     ("cheapact", dict(cheap=True)),
                     ("noz", dict(noz=True)),
                     ("justz", dict(justz=True)),
                     ("dynbound", dict(dyn=True))):
        if name not in which and not (name == "waves1"
                                      and "base" in which):
            continue
        if name == "dynbound":
            si = make_inputs(sort_rows=True)
            tb = 512
            sz = si[7].reshape(Q * B)
            szp = np.zeros(-(-(Q * B) // tb) * tb, np.int32)
            szp[:Q * B] = sz
            tmax = szp.reshape(-1, tb).max(axis=1).astype(np.int32)
            a = si[:7] + (jnp.asarray(tmax),)
        else:
            a = inp
        f = jax.jit(functools.partial(var_fwd, **kw), static_argnums=())
        try:
            dt = timeit(name, f, *a)
        except Exception as ex:
            log(f"{name}: FAILED {type(ex).__name__}: {str(ex)[:300]}")
            continue
        if base_out is not None and name.startswith("waves"):
            got = np.asarray(f(*a)).reshape(Q, B, H)
            err = np.abs(got - base_out).max()
            log(f"  {name} vs base max|d| = {err:.2e}")
        elif name == "dynbound":
            # steps beyond tmax only pass the carry through, so the
            # dynamic bound must be exact vs the full loop on the SAME
            # sorted inputs
            full = np.asarray(jax.jit(var_fwd)(*a[:7], a[7]))
            got = np.asarray(f(*a))
            err = np.abs(got - full).max()
            log(f"  dynbound vs full max|d| = {err:.2e}")


if __name__ == "__main__":
    main()
