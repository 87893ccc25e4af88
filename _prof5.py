import time, jax, jax.numpy as jnp, numpy as np
from jax import lax

def run(fn, *args, iters=127):
    out = fn(*args); jax.block_until_ready(out)
    t0=time.perf_counter(); out = fn(*args); jax.block_until_ready(out)
    int(np.asarray(jax.tree_util.tree_leaves(out)[0]).reshape(-1)[0])
    return (time.perf_counter()-t0)/iters

key = jax.random.PRNGKey(0)
B = 8192

# control: rng only
@jax.jit
def rng_chain(idx, k):
    def body(carry, _):
        idx, kk = carry
        k1, k2 = jax.random.split(kk)
        r = jax.random.randint(k1, idx.shape, 0, 1000000)
        return ((idx + r) % 1000000, k2), None
    carry, _ = lax.scan(body, (idx, k), None, length=127)
    return carry[0]

idx0 = jnp.arange(B, dtype=jnp.int32)
print(f"rng-only scan: {run(rng_chain, idx0, key)*1e3:.2f} ms/iter", flush=True)

for n in (1_000_000, 20_000_000):
    table = jnp.arange(n, dtype=jnp.int32)
    @jax.jit
    def gather_chain(table, idx, k):
        nn = table.shape[0]
        def body(carry, _):
            idx, kk = carry
            k1, k2 = jax.random.split(kk)
            r = jax.random.randint(k1, idx.shape, 0, nn)
            v = table[(idx + r) % nn]
            return (v % nn, k2), None
        carry, _ = lax.scan(body, (idx, k), None, length=127)
        return carry[0]
    print(f"gather scan n={n}: {run(gather_chain, table, idx0, key)*1e3:.2f} ms/iter", flush=True)

# big batch single gather (not in scan)
table = jnp.arange(20_000_000, dtype=jnp.int32)
@jax.jit
def one_gather(table, idx):
    return table[idx]
idx_big = jax.random.randint(key, (8192*127,), 0, 20_000_000)
t = run(one_gather, table, idx_big, iters=1)
print(f"single gather of 1.04M from 20M: {t*1e3:.1f} ms", flush=True)
