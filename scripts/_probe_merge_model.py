import os, time, sys
import numpy as np
import jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", os.path.expanduser("~/.cache/jax_bench_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import optax
from surel_plus_tpu.graph.synthetic import rmat_graph
from surel_plus_tpu.models import Net
from surel_plus_tpu.ops.join import make_keys_join
from surel_plus_tpu.ops.sampler import sample_gsets_device_keys

N, bs, STEPS = 100_000, 4096, 64
g = rmat_graph(N, 10 * N, seed=0)
spgk = sample_gsets_device_keys(g, np.arange(N, dtype=np.int32),
                                num_walks=100, num_steps=3, seed=0)
_ = int(spgk.sizes.max())
print("sampled", flush=True)
rng = np.random.default_rng(0)
edges8 = jnp.asarray(rng.integers(0, N, size=(2, bs * 8)).astype(np.int32))
labels8 = jnp.asarray((rng.random(bs * 8) < 0.5).astype(np.float32))
join = make_keys_join(100, 3)

def run_case(tag, fused, dtype):
    model = Net(input_dim=4, hidden_dim=96, aggrs="mean", dropout=0.1,
                dtype=dtype, fused_hidden=fused, key_layout=(100, 3))
    jb0 = jax.jit(lambda e: join(spgk.nodes, spgk.khi, spgk.klo,
                                 spgk.sizes, e))(edges8[:, :bs])
    params = model.init(jax.random.PRNGKey(0),
                        jnp.zeros((1, 1), jnp.float32), jb0)
    @jax.jit
    def scan_fb(params, edges, labels):
        def loss(p, e, y):
            jb = join(spgk.nodes, spgk.khi, spgk.klo, spgk.sizes, e)
            logits = model.apply(p, jnp.zeros((1, 1)), jb, None, train=True,
                                 rngs={"dropout": jax.random.PRNGKey(0)})
            return optax.sigmoid_binary_cross_entropy(logits, y).mean()
        def body(acc, i):
            e = jax.lax.dynamic_slice_in_dim(edges, (i % 8) * bs, bs, axis=1)
            y = jax.lax.dynamic_slice_in_dim(labels, (i % 8) * bs, bs)
            l, gr = jax.value_and_grad(loss)(params, e, y)
            return acc + l + sum(x.sum() for x in jax.tree.leaves(gr)), None
        acc, _ = jax.lax.scan(body, jnp.float32(0),
                              jnp.arange(STEPS, dtype=jnp.int32))
        return acc
    try:
        t0 = time.time()
        v = float(scan_fb(params, edges8, labels8))
        print(f"{tag}: cold ok {v:.4f} {time.time()-t0:.1f}s", flush=True)
        t0 = time.time()
        v = float(scan_fb(params, edges8, labels8))
        print(f"{tag}: warm ok {time.time()-t0:.2f}s", flush=True)
    except Exception as ex:
        print(f"{tag}: FAILED {str(ex)[:120]}", flush=True)

run_case("unfused-f32", False, "float32")
run_case("unfused-bf16", False, "bfloat16")
run_case("fused-bf16", True, "bfloat16")
