"""Dedup merge-tree timing across unique-table widths (TPU): shows the
>65,536-unique path no longer cliffs (round-1's flat fallback used
serializing 1-D sorts; the tree now widens with pairwise merges).

python scripts/probe_dedup_width.py
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

from surel_plus_tpu.ops.sampler import _dedup_device_tree  # noqa: E402


def main():
    n, bucket = 65536, 301
    rng = np.random.default_rng(0)
    # adversarial keys: mostly unique (worst case for the table width)
    hi = rng.integers(0, 1 << 20, size=(n, bucket)).astype(np.uint32)
    lo = rng.integers(0, 1 << 32, size=(n, bucket),
                      dtype=np.uint64).astype(np.uint32)
    sizes = rng.integers(bucket // 2, bucket + 1,
                         size=n).astype(np.int32)
    nodes = np.zeros((n, bucket), np.int32)
    import jax.numpy as jnp

    args = tuple(jnp.asarray(x) for x in (nodes, sizes, hi, lo))

    for width in (4096, 65536, 262144, 1 << 20, 1 << 22):
        try:
            t0 = time.time()
            out = _dedup_device_tree(*args, bucket=bucket, width=width)
            over = bool(out[4])
            u = int(out[3])
            cold = time.time() - t0
            t0 = time.time()
            out = _dedup_device_tree(*args, bucket=bucket, width=width)
            _ = int(out[3])
            warm = time.time() - t0
            print(f"width {width:>8}: cold {cold:6.1f}s warm {warm:6.2f}s "
                  f"unique={u} overflow={over}", flush=True)
        except Exception as e:  # noqa: BLE001
            print(f"width {width:>8}: FAILED {type(e).__name__}: {e}",
                  flush=True)


if __name__ == "__main__":
    main()
