"""Hardware check of the transposed keys-LSTM kernel (lstm_from_keys):
numerics (fwd + grads vs the XLA scan on the same hidden rows) at a
moderate shape, then fwd / fwd+bwd timing at the production shape
[2, 4096, 301] h=H=96.

python scripts/probe_klstm_hw.py
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

from surel_plus_tpu.models.layers import LSTMAggregation  # noqa: E402
from surel_plus_tpu.ops.pallas.lstm_kernel import lstm_from_keys  # noqa
from surel_plus_tpu.ops.pallas.hidden_sum_kernel import (  # noqa: E402
    NEG, u_core_rows)

M, S = 100, 3
SHIFT = int(M).bit_length()
NS = S


def _rand_keys(rng, shape):
    # valid packed keys: fields in [0, M], root bit sometimes set
    ks = np.zeros(shape, np.uint32)
    for j in range(NS):
        ks |= rng.integers(0, M + 1, size=shape).astype(
            np.uint32) << np.uint32(j * SHIFT)
    ks |= (rng.random(shape) < 0.3).astype(np.uint32) << np.uint32(
        NS * SHIFT)
    return ks


def _u_ext(w1, b1):
    u = u_core_rows(w1, M, NS)
    return jnp.concatenate(
        [u, jnp.full((1, w1.shape[1]), NEG, jnp.float32),
         b1.astype(jnp.float32)[None]], axis=0)


def _hid_rows(kown, kc, u_ext):
    """XLA reference: unpack fields, add bias/invalid rows, relu-sum."""
    def fields(k):
        cols = [((k >> np.uint32(j * SHIFT))
                 & np.uint32((1 << SHIFT) - 1)).astype(jnp.float32)
                for j in range(NS)]
        cols.append(((k >> np.uint32(NS * SHIFT))
                     & np.uint32(1)).astype(jnp.float32))
        f = jnp.stack(cols, axis=-1)                     # [..., NS+1]
        inv = jnp.zeros(k.shape + (1,), jnp.float32)
        one = jnp.ones(k.shape + (1,), jnp.float32)
        return jnp.concatenate([f, inv, one], axis=-1)   # [..., NS+3]
    zo = fields(kown) @ u_ext
    zc = fields(kc) @ u_ext
    return jnp.maximum(zo, 0.0) + jnp.maximum(zc, 0.0)


def numerics():
    rng = np.random.default_rng(3)
    Q, B, L, H = 2, 192, 45, 96
    kown = jnp.asarray(_rand_keys(rng, (Q, B, L)))
    kc = jnp.asarray(_rand_keys(rng, (Q, B, L)))
    sizes = rng.integers(1, L + 1, size=(Q, B))
    mask = jnp.asarray(np.arange(L)[None, None, :] < sizes[..., None])
    w1 = jnp.asarray(rng.normal(size=(NS + 1, H)).astype(np.float32)
                     * 0.3)
    b1 = jnp.asarray(rng.normal(size=(H,)).astype(np.float32) * 0.1)
    u_ext = _u_ext(w1, b1)

    agg = LSTMAggregation(H, chunk=16)
    x = _hid_rows(kown, kc, u_ext).reshape(Q * B, L, H)
    mf = mask.reshape(Q * B, L)
    params = agg.init(jax.random.PRNGKey(0), x, mf)
    p = params["params"]
    g = jnp.asarray(rng.normal(size=(Q, B, H)).astype(np.float32))

    def f_kernel(u_ext, wi, wh, bh):
        out = lstm_from_keys(kown, kc, mask, u_ext, wi, wh, bh, SHIFT)
        return (out * g).sum()

    def f_ref(u_ext, wi, wh, bh):
        xr = _hid_rows(kown, kc, u_ext).reshape(Q * B, L, H)
        out = agg.apply(
            {"params": {"wi": wi, "wh": wh, "bh": bh}}, xr, mf)
        return (out.reshape(Q, B, H) * g).sum()

    argnums = (0, 1, 2, 3)
    vk, gk = jax.value_and_grad(f_kernel, argnums)(
        u_ext, p["wi"], p["wh"], p["bh"])
    vr, gr = jax.value_and_grad(f_ref, argnums)(
        u_ext, p["wi"], p["wh"], p["bh"])
    print(f"value: kernel={float(vk):.6f} ref={float(vr):.6f} "
          f"d={abs(float(vk) - float(vr)):.2e}", flush=True)
    names = ["dU", "dwi", "dwh", "dbh"]
    ok = abs(float(vk) - float(vr)) < 1e-2
    for n, a, b in zip(names, gk, gr):
        a, b = np.asarray(a), np.asarray(b)
        d = np.abs(a - b).max()
        rel = d / max(np.abs(b).max(), 1e-6)
        print(f"grad {n}: max|d|={d:.3e} rel={rel:.3e}", flush=True)
        # dU tolerance: on TPU the MXU's default f32 precision rounds
        # matmul INPUTS through bf16 (~4e-3 rel); the kernel and the
        # XLA reference round different intermediates (per-step dz vs
        # one big fields^T dz), so dU disagrees at that order while CPU
        # interpret matches at 3e-7. This is the same rounding the
        # model's bf16 compute dtype applies everywhere else.
        ok = ok and rel < 2e-2
    print("numerics:", "PARITY OK" if ok else "*** MISMATCH ***",
          flush=True)


def timing():
    rng = np.random.default_rng(5)
    Q, B, L, H = 2, 4096, 301, 96
    kown = jnp.asarray(_rand_keys(rng, (Q, B, L)))
    kc = jnp.asarray(_rand_keys(rng, (Q, B, L)))
    sizes = rng.integers(L // 2, L + 1, size=(Q, B))
    mask = jnp.asarray(np.arange(L)[None, None, :] < sizes[..., None])
    w1 = jnp.asarray(rng.normal(size=(NS + 1, H)).astype(np.float32)
                     * 0.3)
    b1 = jnp.asarray(rng.normal(size=(H,)).astype(np.float32) * 0.1)
    u_ext = _u_ext(w1, b1)
    wi = jnp.asarray(rng.normal(size=(H, 4 * H)).astype(np.float32)
                     * 0.1)
    wh = jnp.asarray(rng.normal(size=(H, 4 * H)).astype(np.float32)
                     * 0.1)
    bh = jnp.zeros((4 * H,), jnp.float32)

    # time N sequential kernel calls inside ONE dispatch (host pulls
    # cost ~0.4 s through the tunnel; per-call rate = the two-length
    # difference). The carry dependency stops XLA hoisting the call.
    def loss(u, a, b, c):
        return lstm_from_keys(kown, kc, mask, u, a, b, c, SHIFT).sum()

    import functools

    @functools.partial(jax.jit, static_argnums=(4, 5))
    def many(u, a, b, c, n, with_grad):
        def body(carry, _):
            if with_grad:
                du = jax.grad(loss)(carry, a, b, c)
                return carry + 1e-30 * du, ()
            s = loss(carry, a, b, c)
            return carry * (1.0 + 1e-30 * s), ()
        u2, _ = jax.lax.scan(body, u, None, length=n)
        return u2.sum()

    for with_grad, tag in ((False, "fwd"), (True, "fwd+bwd")):
        _ = float(many(u_ext, wi, wh, bh, 2, with_grad))
        _ = float(many(u_ext, wi, wh, bh, 10, with_grad))
        t0 = time.time()
        _ = float(many(u_ext, wi, wh, bh, 2, with_grad))
        t2 = time.time() - t0
        t0 = time.time()
        _ = float(many(u_ext, wi, wh, bh, 10, with_grad))
        t10 = time.time() - t0
        print(f"{tag} [2,4096,301]: {(t10 - t2)/8*1e3:.1f} ms/call "
              f"(t2={t2:.2f}s t10={t10:.2f}s)", flush=True)


if __name__ == "__main__":
    print(f"device: {jax.devices()[0].device_kind}", flush=True)
    numerics()
    timing()
