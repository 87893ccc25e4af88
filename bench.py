"""Benchmark: on-device random-walk + SkipGram training throughput and SpMM
edges/s on one TPU chip (BASELINE.json metric: "walk-steps/s and edges/s per
chip").

Prints ONE JSON line:
  {"metric": "walk_steps_per_s", "value": N, "unit": "steps/s",
   "vs_baseline": R, ...extras}

Measurement methodology: every timed iteration feeds the previous iteration's
OUTPUT back as input (chained), and the loop ends by pulling a scalar to the
host — so no execution caching or async dispatch can fake the numbers.

`vs_baseline` compares against a vectorized numpy CPU walk implementation
measured in the same run (the reference's engine is a CPU library; its Rust
walker is faster than numpy but unavailable here — the proxy is recorded in
`cpu_proxy_steps_per_s`).
"""
import json
import time

import numpy as np


def _build_graph(n_nodes=1_000_000, n_edges=10_000_000, seed=0):
    from embiggen_tpu.graph import erdos_renyi

    return erdos_renyi(n_nodes, n_edges, seed=seed)


def _time_chained(step, state, iters=5, warmup=2):
    """step(state, i) -> state; returns seconds/iter with the chain forced to
    the host at the end."""
    import jax

    for i in range(warmup):
        state = step(state, i)
    jax.block_until_ready(state)
    t0 = time.perf_counter()
    for i in range(iters):
        state = step(state, warmup + i)
    jax.block_until_ready(state)
    # force a real value to the host off the final state
    leaf = jax.tree_util.tree_leaves(state)[0]
    float(np.asarray(leaf).reshape(-1)[0])
    return (time.perf_counter() - t0) / iters


def cpu_walk_proxy(graph, batch=8192, length=32, seed=0):
    """Vectorized numpy first-order walks (host CPU baseline)."""
    rng = np.random.default_rng(seed)
    row_ptr = graph.row_ptr
    col_idx = graph.col_idx
    deg = graph.degrees
    curr = rng.integers(0, graph.number_of_nodes, size=batch)
    t0 = time.perf_counter()
    for _ in range(length - 1):
        d = deg[curr]
        off = (rng.random(batch) * d).astype(np.int64)
        off = np.minimum(off, np.maximum(d - 1, 0))
        nxt = col_idx[np.minimum(row_ptr[curr] + off, len(col_idx) - 1)]
        curr = np.where(d > 0, nxt, curr)
    dt = time.perf_counter() - t0
    return batch * (length - 1) / dt


def main():
    import jax
    import jax.numpy as jnp

    from embiggen_tpu.ops.walks import random_walks
    from embiggen_tpu.ops.spmm import spmm
    from embiggen_tpu.graph import kernel_coo

    dev = jax.devices()[0]
    graph = _build_graph()
    dg = graph.device()
    key = jax.random.PRNGKey(0)

    batch, length = 8192, 128

    # --- first-order walk throughput (chained: restart from final nodes)
    def walk_step(state, i):
        starts, k = state
        k1, k2 = jax.random.split(k)
        walks = random_walks(dg, starts, length, k1)
        return (walks[:, -1], k2)

    starts0 = jnp.arange(batch, dtype=jnp.int32) % graph.number_of_nodes
    dt = _time_chained(walk_step, (starts0, key), iters=10)
    walk_steps_per_s = batch * (length - 1) / dt

    # --- second-order (p/q) walk throughput
    def walk2_step(state, i):
        starts, k = state
        k1, k2 = jax.random.split(k)
        walks = random_walks(
            dg, starts, 32, k1, return_weight=2.0, explore_weight=0.5,
            max_neighbours=32,
        )
        return (walks[:, -1], k2)

    dt_so = _time_chained(walk2_step, (starts0, key), iters=5, warmup=1)
    walk2_steps_per_s = batch * 31 / dt_so

    # --- fused SkipGram train step throughput (centers/s); params chain
    from embiggen_tpu.models.embedders import SkipGram

    model = SkipGram(
        embedding_size=128, epochs=1, batch_size=1024, walk_length=64,
        window_size=5, number_of_negative_samples=10, random_state=0,
    )
    params = model._init_params(graph, key)
    step = jax.jit(model._step)

    def train_step(state, i):
        p, k = state
        k1, k2 = jax.random.split(k)
        p, loss = step(dg, p, k1, jnp.float32(0.05))
        return (p, k2)

    dt_train = _time_chained(train_step, (params, key), iters=10)
    centers = 1024 * (64 - 10)
    train_centers_per_s = centers / dt_train

    # --- SpMM edges/s (D=128, output chained into next input)
    rows, cols, vals = kernel_coo(graph, "Symmetric Normalized Laplacian")
    rows_d = jnp.asarray(rows, jnp.int32)
    cols_d = jnp.asarray(cols, jnp.int32)
    vals_d = jnp.asarray(vals, jnp.float32)
    x0 = jax.random.normal(key, (graph.number_of_nodes, 128), jnp.float32)

    @jax.jit
    def spmm_step(rows, cols, vals, x):
        out = spmm(rows, cols, vals, x, x.shape[0], "sum")
        # renormalize so the chain stays finite
        return out / jnp.maximum(jnp.abs(out).max(), 1e-9)

    dt_spmm = _time_chained(
        lambda x, i: spmm_step(rows_d, cols_d, vals_d, x), x0, iters=5
    )
    spmm_edges_per_s = graph.number_of_directed_edges / dt_spmm

    cpu_proxy = cpu_walk_proxy(graph)

    print(
        json.dumps(
            {
                "metric": "walk_steps_per_s",
                "value": round(walk_steps_per_s),
                "unit": "steps/s",
                "vs_baseline": round(walk_steps_per_s / cpu_proxy, 3),
                "device": str(dev),
                "graph": f"ER(n={graph.number_of_nodes},arcs={graph.number_of_directed_edges})",
                "walk2_steps_per_s": round(walk2_steps_per_s),
                "skipgram_train_centers_per_s": round(train_centers_per_s),
                "spmm_edges_per_s": round(spmm_edges_per_s),
                "cpu_proxy_steps_per_s": round(cpu_proxy),
            }
        )
    )


if __name__ == "__main__":
    main()
