import time, jax, jax.numpy as jnp, numpy as np
from embiggen_tpu.graph import erdos_renyi, kernel_coo
from embiggen_tpu.ops.spmm import spmm
from embiggen_tpu.ops.walks import random_walks
from embiggen_tpu.models.embedders import SkipGram

def timeit(f, n=5):
    out = f(); jax.block_until_ready(out)
    t0=time.perf_counter()
    for _ in range(n): out=f()
    jax.block_until_ready(out)
    return (time.perf_counter()-t0)/n

g = erdos_renyi(1_000_000, 10_000_000, seed=0)
dg = g.device()
key = jax.random.PRNGKey(0)
E = g.number_of_directed_edges
rows, cols, vals = kernel_coo(g, "Symmetric Normalized Laplacian")
rows_d, cols_d, vals_d = jnp.asarray(rows, jnp.int32), jnp.asarray(cols, jnp.int32), jnp.asarray(vals, jnp.float32)

for dtype, name in ((jnp.float32,"f32"), (jnp.bfloat16,"bf16")):
    x = jax.random.normal(key, (g.number_of_nodes, 128), dtype)
    for sorted_rows in (False, True):
        f = jax.jit(lambda x: spmm(rows_d, cols_d, vals_d, x, g.number_of_nodes, "sum", sorted_rows))
        dt = timeit(lambda: f(x))
        print(f"spmm {name} sorted={sorted_rows}: {dt*1e3:.1f} ms  {E/dt/1e6:.0f} M edges/s", flush=True)

# gather-only baseline
x = jax.random.normal(key, (g.number_of_nodes, 128), jnp.float32)
f_gather = jax.jit(lambda x: x[cols_d].sum(axis=0))
dt = timeit(lambda: f_gather(x))
print(f"gather-only: {dt*1e3:.1f} ms  {E*128*4/dt/1e9:.0f} GB/s", flush=True)

# walk batch scaling
for B in (1024, 4096, 8192):
    starts = jnp.arange(B, dtype=jnp.int32)
    f_w = jax.jit(lambda k: random_walks(dg, starts, 64, k))
    dt = timeit(lambda: f_w(key))
    print(f"walks B={B}: {dt*1e3:.2f} ms  {B*63/dt/1e6:.0f} M steps/s", flush=True)

# skipgram step batch scaling
for B in (1024, 4096):
    model = SkipGram(embedding_size=128, epochs=1, batch_size=B, walk_length=64, window_size=5, number_of_negative_samples=10, random_state=0)
    params = model._init_params(g, key)
    f_step = jax.jit(lambda p, k: model._step(dg, p, k, jnp.float32(0.05)))
    dt = timeit(lambda: f_step(dict(params), key))
    print(f"skipgram step B={B}: {dt*1e3:.2f} ms  {B*54/dt/1e6:.2f} M centers/s", flush=True)
