"""Merge-network poisoning bisection (VERDICT r3 item 5; run LAST in a
session — CLAUDE.md protocol). One experiment per process invocation so
the process-local poison cannot leak between cases:

  python scripts/probe_merge_poison.py <case> [execs]

cases:
  alone      jit(merge_pairs_xla) on join-shaped operands, exec N times
  after_other  a small unrelated jitted matmul first, then `alone`
  in_scan    the merge inside a lax.scan over 8 windows, exec N times
  with_pallas  merge + fused_key_hidden_sum in ONE program, exec N
  join_step  the production fused-mean train path with SUREL_MERGE_NET=1
             (the original r4 repro: probe_fused_ab mean:1 failed on
             its SECOND fit execution with INVALID_ARGUMENT)
  rot_only   only the rotate-concat chain (no compare/select)
  sel_only   data-dependent selects with static shifts (no rotation)

Each exec ends with a scalar pull; errors are printed verbatim. Exit
code 0 = all execs succeeded.
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

# MERGE_IMPL=rot|xor selects the network wiring (default rot); join
# cases forward it via SUREL_MERGE_NET so the r5 xor reformulation
# can run the same bisect matrix
MERGE_IMPL = os.environ.get("MERGE_IMPL", "rot")
from surel_plus_tpu.ops.merge_net import MERGE_FNS  # noqa: E402
merge_pairs_xla = MERGE_FNS[MERGE_IMPL]  # noqa: N816


def operands(b=4096, l=301, seed=0):
    rng = np.random.default_rng(seed)
    ka = np.sort(rng.integers(0, 1 << 30, (b, l)).astype(np.uint32),
                 axis=1) << 1
    kb = (np.sort(rng.integers(0, 1 << 30, (b, l)).astype(np.uint32),
                  axis=1) << 1) | 1
    pa = rng.integers(0, 1 << 31, (b, l)).astype(np.uint32)
    pb = rng.integers(0, 1 << 31, (b, l)).astype(np.uint32)
    return tuple(jnp.asarray(x) for x in (ka, pa, kb, pb))


def run_case(case: str, execs: int) -> None:
    ka, pa, kb, pb = operands()

    if case == "after_other":
        w = jnp.ones((256, 256), jnp.float32)
        other = jax.jit(lambda x: (x @ x).sum())
        print("other:", float(other(w)), flush=True)
        case = "alone"

    if case == "alone":
        f = jax.jit(lambda a, p, b_, q: merge_pairs_xla(a, p, b_, q))
    elif case == "in_scan":
        def body(c, i):
            mk, mp = merge_pairs_xla(ka ^ i, pa, kb, pb)
            return c + mk[0, 0].astype(jnp.float32), None

        f = jax.jit(lambda a, p, b_, q: jax.lax.scan(
            body, jnp.float32(0), jnp.arange(8, dtype=jnp.uint32))[0])
    elif case == "with_pallas":
        from surel_plus_tpu.ops.pallas.hidden_sum_kernel import (
            NEG, fused_key_hidden_sum, u_core_rows)
        rng = np.random.default_rng(1)
        w1 = jnp.asarray(rng.standard_normal((4, 16)).astype(np.float32))
        u = u_core_rows(w1, 8, 3)
        u_ext = jnp.concatenate(
            [u, jnp.full((1, 16), NEG, jnp.float32), w1[:1]], axis=0)
        ko = jnp.asarray(rng.integers(0, 1 << 12, (2, 64, 33))
                         .astype(np.uint32))
        kc = jnp.asarray(rng.integers(0, 1 << 12, (64, 66))
                         .astype(np.uint32))
        mo = jnp.ones((2, 64, 33), bool)
        mc = jnp.ones((2, 64, 66), bool)

        def g(a, p, b_, q):
            mk, mp = merge_pairs_xla(a, p, b_, q)
            s = fused_key_hidden_sum(ko, mo, kc, mc, u_ext, 4)
            return mk, mp, s

        f = jax.jit(g)
    elif case == "rot_only":
        def g(a, p, b_, q):
            k = jnp.concatenate([a, jnp.flip(b_, axis=1)], axis=1)
            for d in (512, 256, 128, 64, 32, 16, 8, 4, 2, 1):
                k = jnp.concatenate([k[:, d:], k[:, :d]], axis=1) + 1
            return k, p

        f = jax.jit(g)
    elif case == "sel_only":
        def g(a, p, b_, q):
            k = jnp.concatenate([a, jnp.flip(b_, axis=1)], axis=1)
            lanes = jax.lax.broadcasted_iota(jnp.int32, (1, k.shape[1]),
                                             1)
            for d in (512, 256, 128, 64, 32, 16, 8, 4, 2, 1):
                m = (lanes & d) == 0
                k = jnp.where(m & (k > d), k - 1, k)
            return k, p

        f = jax.jit(g)
    elif case in ("join_only", "join_scan", "join_scan2", "with_sort"):
        os.environ["SUREL_MERGE_NET"] = MERGE_IMPL
        from surel_plus_tpu.graph.synthetic import rmat_graph
        from surel_plus_tpu.ops.join import make_keys_join
        from surel_plus_tpu.ops.sampler import sample_gsets_device_keys
        g = rmat_graph(100_000, 1_000_000, seed=0)
        spgk = sample_gsets_device_keys(
            g, np.arange(100_000, dtype=np.int32), num_walks=100,
            num_steps=3, seed=0)
        _ = int(spgk.sizes.max())
        join = make_keys_join(100, 3)
        rng = np.random.default_rng(0)
        e8 = jnp.asarray(rng.integers(0, 100_000, (2, 8 * 4096))
                         .astype(np.int32))
        sarr = (spgk.nodes, spgk.khi, spgk.klo, spgk.sizes)

        if case == "join_only":
            def g1(n, h, lo, sz, e):
                j = join(n, h, lo, sz, e[:, :4096])
                return j.kcross.astype(jnp.float32).sum()

            f = jax.jit(g1)
        elif case == "join_scan2":
            # nested scans (epochs x steps) like DeviceTrainer.fit
            def g3(n, h, lo, sz, e):
                def step(c, i):
                    be = jax.lax.dynamic_slice(
                        e, (0, (i % 8) * 4096), (2, 4096))
                    j = join(n, h, lo, sz, be)
                    return c + j.kcross.astype(jnp.float32).sum(), None

                def epoch(c, _):
                    c2, _ = jax.lax.scan(step, c,
                                         jnp.arange(8, dtype=jnp.int32))
                    return c2, None

                return jax.lax.scan(epoch, jnp.float32(0),
                                    jnp.arange(4, dtype=jnp.int32))[0]

            f = jax.jit(g3)
        elif case == "with_sort":
            # one scan, but each step ALSO runs a riffle-style lax.sort
            # (the fit's epoch shuffle) in the same program as the
            # merge network
            from surel_plus_tpu.train.device import riffle_permutation

            def g4(n, h, lo, sz, e):
                def step(c, i):
                    perm = riffle_permutation(
                        jax.random.fold_in(jax.random.PRNGKey(0), i),
                        8, 4096)
                    be = e[:, perm[i % 8]]
                    j = join(n, h, lo, sz, be)
                    return c + j.kcross.astype(jnp.float32).sum(), None

                return jax.lax.scan(step, jnp.float32(0),
                                    jnp.arange(8, dtype=jnp.int32))[0]

            f = jax.jit(g4)
        else:
            def g2(n, h, lo, sz, e):
                def body(c, i):
                    be = jax.lax.dynamic_slice(
                        e, (0, (i % 8) * 4096), (2, 4096))
                    j = join(n, h, lo, sz, be)
                    return c + j.kcross.astype(jnp.float32).sum(), None

                return jax.lax.scan(body, jnp.float32(0),
                                    jnp.arange(8, dtype=jnp.int32))[0]

            f = jax.jit(g2)

        for i in range(execs):
            t0 = time.time()
            try:
                s = float(f(*sarr, e8))
                print(f"exec {i}: ok ({time.time()-t0:.2f}s, v={s:.3g})",
                      flush=True)
            except Exception as ex:
                print(f"exec {i}: FAILED after {time.time()-t0:.2f}s\n"
                      f"{type(ex).__name__}: {str(ex)[:500]}", flush=True)
                sys.exit(2)
        print("case passed", flush=True)
        return
    elif case == "join_step":
        os.environ["SUREL_MERGE_NET"] = MERGE_IMPL
        import subprocess
        r = subprocess.run(
            [sys.executable, "scripts/probe_fused_ab.py", "mean:1"],
            env=dict(os.environ), capture_output=True, text=True)
        print(r.stdout[-2000:])
        print(r.stderr[-2000:])
        sys.exit(0 if r.returncode == 0 else 1)
    else:
        raise SystemExit(f"unknown case {case}")

    for i in range(execs):
        t0 = time.time()
        try:
            out = f(ka, pa, kb, pb)
            leaf = out[0] if isinstance(out, tuple) else out
            s = float(jnp.asarray(leaf).ravel()[0].astype(jnp.float32))
            print(f"exec {i}: ok ({time.time()-t0:.2f}s, v={s:.1f})",
                  flush=True)
        except Exception as ex:
            print(f"exec {i}: FAILED after {time.time()-t0:.2f}s\n"
                  f"{type(ex).__name__}: {str(ex)[:500]}", flush=True)
            sys.exit(2)
    print("case passed", flush=True)


if __name__ == "__main__":
    run_case(sys.argv[1] if len(sys.argv) > 1 else "alone",
             int(sys.argv[2]) if len(sys.argv) > 2 else 3)
