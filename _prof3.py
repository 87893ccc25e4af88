import time, jax, jax.numpy as jnp, numpy as np
from embiggen_tpu.graph import erdos_renyi, kernel_coo
from embiggen_tpu.ops.spmm import spmm
from embiggen_tpu.models.embedders import SkipGram

def timeit(f, n=5):
    out = f(); jax.block_until_ready(out)
    t0=time.perf_counter()
    for _ in range(n): out=f()
    jax.block_until_ready(out)
    return (time.perf_counter()-t0)/n

t0=time.time()
g = erdos_renyi(1_000_000, 10_000_000, seed=0)
dg = g.device()
print("build", round(time.time()-t0,1), flush=True)
key = jax.random.PRNGKey(0)
E = g.number_of_directed_edges
rows, cols, vals = kernel_coo(g, "Symmetric Normalized Laplacian")
rows_d, cols_d, vals_d = jnp.asarray(rows, jnp.int32), jnp.asarray(cols, jnp.int32), jnp.asarray(vals, jnp.float32)

x32 = jax.random.normal(key, (g.number_of_nodes, 128), jnp.float32)
t0=time.time()
dt = timeit(lambda: spmm(rows_d, cols_d, vals_d, x32, g.number_of_nodes, "sum", True))
print(f"spmm f32 sorted: {dt*1e3:.1f} ms  {E/dt/1e6:.0f} M edges/s (compile {time.time()-t0:.0f}s)", flush=True)
x16 = x32.astype(jnp.bfloat16)
t0=time.time()
dt = timeit(lambda: spmm(rows_d, cols_d, vals_d, x16, g.number_of_nodes, "sum", True))
print(f"spmm bf16 sorted: {dt*1e3:.1f} ms  {E/dt/1e6:.0f} M edges/s (compile {time.time()-t0:.0f}s)", flush=True)

model = SkipGram(embedding_size=128, epochs=1, batch_size=4096, walk_length=64, window_size=5, number_of_negative_samples=10, random_state=0)
params = model._init_params(g, key)
f_step = jax.jit(lambda p, k: model._step(dg, p, k, jnp.float32(0.05)))
t0=time.time()
dt = timeit(lambda: f_step(dict(params), key))
print(f"skipgram step B=4096: {dt*1e3:.2f} ms  {4096*54/dt/1e6:.2f} M centers/s (compile {time.time()-t0:.0f}s)", flush=True)
