"""Decompose the HONet fused step at M=200 S'=3 (L=801): where do the
~430 ms/step go? Times, on HW, each stage standalone inside one jitted
fori_loop (dispatch amortized):
  a) the hjoin (two merge sorts + cross planes) alone
  b) one fused q=2 set-sum kernel call on the part shapes, fwd
  c) same, fwd+bwd (custom VJP)
  d) HONet full fwd+bwd via the group-split fused path
  e) HONet full fwd+bwd via the XLA template path

python scripts/probe_honet_parts.py   (env M/S/BS override)
"""
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

from surel_plus_tpu.graph.synthetic import rmat_graph  # noqa: E402
from surel_plus_tpu.models import HONet  # noqa: E402
from surel_plus_tpu.ops.join import make_keys_hjoin  # noqa: E402
from surel_plus_tpu.ops.pallas.hidden_sum_kernel import (  # noqa: E402
    NEG, fused_key_hidden_sum, u_core_rows)
from surel_plus_tpu.ops.sampler import sample_gsets_device_keys  # noqa

t00 = time.time()
ITERS = 16


def log(m):
    print(f"[{time.time()-t00:6.1f}s] {m}", flush=True)


def timeit(label, fn, *args):
    """fn(*args, i, c) -> c; MUST consume i (e.g. slice a window by it)
    so XLA cannot hoist the body out of the loop as loop-invariant."""
    f = jax.jit(lambda *a: jax.lax.fori_loop(
        0, ITERS, lambda i, c: fn(*a, i, c), jnp.float32(0.0)))
    _ = float(f(*args))
    t0 = time.time()
    _ = float(f(*args))
    dt = (time.time() - t0) / ITERS
    log(f"{label}: {dt*1e3:.2f} ms/iter")
    return dt


def main():
    num_nodes = 50_000
    M = int(os.environ.get("M", "200"))
    S = int(os.environ.get("S", "4"))
    bs = int(os.environ.get("BS", "2048"))

    g = rmat_graph(num_nodes, 10 * num_nodes, seed=0)
    spgk = sample_gsets_device_keys(
        g, np.arange(num_nodes, dtype=np.int32), num_walks=M,
        num_steps=S, seed=0)
    _ = int(spgk.sizes.max())
    L = spgk.nodes.shape[1]
    log(f"sampled L={L}; device={jax.devices()[0].device_kind}")

    rng = np.random.default_rng(0)
    he8 = jnp.asarray(rng.integers(0, num_nodes,
                                   (3, 8 * bs)).astype(np.int32))
    hjoin = make_keys_hjoin(spgk.num_walks, spgk.num_steps)
    sarr = (spgk.nodes, spgk.khi, spgk.klo, spgk.sizes)

    def window(e, i):
        return jax.lax.dynamic_slice(e, (0, (i % 8) * bs), (3, bs))

    # a) hjoin alone
    def do_join(n, h, lo, sz, e, i, c):
        j = hjoin(n, h, lo, sz, window(e, i))
        return c + j.kcross[0, 0].astype(jnp.float32)

    timeit("hjoin", do_join, *sarr, he8)

    joined = jax.jit(lambda *a: hjoin(*a))(*sarr, he8[:, :bs])
    kown, mask = joined.kown, joined.mask
    kcross, kcmask = joined.kcross, joined.kcross_mask
    half = kcross.shape[-1] // 2
    nw, ns = spgk.num_walks, spgk.num_steps
    shift = int(nw).bit_length()
    h = 96
    w1 = jnp.asarray(rng.standard_normal((ns + 1, h)).astype(np.float32))
    u = u_core_rows(w1, nw, ns)
    u_ext = jnp.concatenate(
        [u, jnp.full((1, h), NEG, jnp.float32), w1[:1] * 0.1], axis=0)

    ko, mo = kown[:2], mask[:2]
    kc, mc = kcross[:, :half], kcmask[:2, :, :half]
    log(f"part shapes: kown {ko.shape} kcross {kc.shape}")

    # b) one q=2 part, fwd (xor the loop index into the keys so the
    # kernel call is not loop-invariant; masks keep the work identical)
    def part_fwd(ko_, mo_, kc_, mc_, u_, i, c):
        kk = ko_ ^ (i % 2).astype(jnp.uint32)
        s = fused_key_hidden_sum(kk, mo_, kc_, mc_, u_, shift)
        return c + s[0, 0, 0]

    timeit("q=2 part kernel fwd", part_fwd, ko, mo, kc, mc, u_ext)

    # c) fwd + bwd wrt u_ext
    def part_fb(ko_, mo_, kc_, mc_, u_, i, c):
        kk = ko_ ^ (i % 2).astype(jnp.uint32)

        def f(uu):
            return fused_key_hidden_sum(kk, mo_, kc_, mc_, uu,
                                        shift).sum()
        val, gr = jax.value_and_grad(f)(u_)
        return c + val + gr[0, 0]

    timeit("q=2 part kernel fwd+bwd", part_fb, ko, mo, kc, mc, u_ext)

    # d/e) HONet full fwd+bwd
    enc = jnp.zeros((1, 1), jnp.float32)
    for fused in (True, False):
        m = HONet(input_dim=S, hidden_dim=h, dropout=0.0,
                  fused_hidden=fused,
                  key_layout=(nw, ns) if fused else None)
        params = m.init(jax.random.PRNGKey(0), enc, joined)

        def full_fb(p, n, hh, lo, sz, e, i, c):
            j = hjoin(n, hh, lo, sz, window(e, i))

            def f(q):
                return (m.apply(q, enc, j) ** 2).sum()
            val, gr = jax.value_and_grad(f)(p)
            lv = jax.tree_util.tree_leaves(gr)[0]
            return c + val + lv.astype(jnp.float32).ravel()[0]

        timeit(f"HONet fwd+bwd fused={fused}", full_fb, params, *sarr,
               he8)


if __name__ == "__main__":
    main()
