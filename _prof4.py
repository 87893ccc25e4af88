import time, jax, jax.numpy as jnp, numpy as np
from jax import lax
from embiggen_tpu.graph import erdos_renyi, kernel_coo
from embiggen_tpu.ops.spmm import spmm
from embiggen_tpu.ops.walks import random_walks

g = erdos_renyi(1_000_000, 10_000_000, seed=0)
dg = g.device()
key = jax.random.PRNGKey(0)
E = g.number_of_directed_edges
print("built", flush=True)

# ---- in-jit scan: K spmm iterations in one call
rows, cols, vals = kernel_coo(g, "Symmetric Normalized Laplacian")
rows_d, cols_d, vals_d = jnp.asarray(rows, jnp.int32), jnp.asarray(cols, jnp.int32), jnp.asarray(vals, jnp.float32)
x0 = jax.random.normal(key, (g.number_of_nodes, 128), jnp.float32)
K = 10

@jax.jit
def spmm_chain(rows, cols, vals, x):
    def body(x, _):
        out = spmm(rows, cols, vals, x, x.shape[0], "sum")
        return out / jnp.maximum(jnp.abs(out).max(), 1e-9), None
    x, _ = lax.scan(body, x, None, length=K)
    return x

out = spmm_chain(rows_d, cols_d, vals_d, x0); jax.block_until_ready(out)
t0=time.perf_counter(); out = spmm_chain(rows_d, cols_d, vals_d, out); jax.block_until_ready(out)
float(np.asarray(out)[0,0])
dt=(time.perf_counter()-t0)/K
print(f"spmm in-jit chain: {dt*1e3:.1f} ms/iter  {E/dt/1e6:.0f} M edges/s", flush=True)

# ---- in-jit scan: K walk batches in one call
B, L = 8192, 128
@jax.jit
def walk_chain(dg, starts, k):
    def body(carry, _):
        s, kk = carry
        k1, k2 = jax.random.split(kk)
        w = random_walks(dg, s, L, k1)
        return (w[:, -1], k2), None
    (s, kk), _ = lax.scan(body, (starts, k), None, length=K)
    return s

starts0 = jnp.arange(B, dtype=jnp.int32) % g.number_of_nodes
s = walk_chain(dg, starts0, key); jax.block_until_ready(s)
t0=time.perf_counter(); s = walk_chain(dg, s, jax.random.fold_in(key,7)); jax.block_until_ready(s)
int(np.asarray(s)[0])
dt=(time.perf_counter()-t0)/K
print(f"walks in-jit chain: {dt*1e3:.1f} ms/iter  {B*(L-1)/dt/1e6:.1f} M steps/s", flush=True)

# ---- single chained python-level call for comparison
t0=time.perf_counter()
w = random_walks(dg, s, L, jax.random.fold_in(key, 9)); jax.block_until_ready(w)
print(f"single eager walk call: {(time.perf_counter()-t0)*1e3:.0f} ms", flush=True)
t0=time.perf_counter()
o = spmm(rows_d, cols_d, vals_d, out, g.number_of_nodes, "sum"); jax.block_until_ready(o)
print(f"single eager spmm call: {(time.perf_counter()-t0)*1e3:.0f} ms", flush=True)
