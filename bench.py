"""Benchmark: on-device random-walk + SkipGram training throughput and SpMM
edges/s on one TPU chip (BASELINE.json metric: "walk-steps/s and edges/s per
chip").

Prints ONE JSON line:
  {"metric": "walk_steps_per_s", "value": N, "unit": "steps/s",
   "vs_baseline": R, ...extras}

`vs_baseline` compares against a vectorized numpy CPU walk implementation
measured in the same run (the reference's engine is a CPU library; its Rust
walker is faster than numpy but not available in this environment — the CPU
proxy is documented in `cpu_proxy_steps_per_s`).
"""
import json
import time

import numpy as np


def _build_graph(n_nodes=1_000_000, n_edges=10_000_000, seed=0):
    from embiggen_tpu.graph import erdos_renyi

    return erdos_renyi(n_nodes, n_edges, seed=seed)


def _time(fn, warmup=2, iters=5):
    import jax

    for _ in range(warmup):
        out = fn()
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn()
    jax.block_until_ready(out)
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
    starts = jnp.arange(batch, dtype=jnp.int32) % graph.number_of_nodes

    # --- first-order walk throughput
    def walk_fo():
        return random_walks(dg, starts, length, key)

    dt = _time(walk_fo)
    walk_steps_per_s = batch * (length - 1) / dt

    # --- second-order (p/q) walk throughput
    def walk_so():
        return random_walks(
            dg, starts, 32, key, return_weight=2.0, explore_weight=0.5,
            max_neighbours=32,
        )

    dt_so = _time(walk_so, warmup=1, iters=3)
    walk2_steps_per_s = batch * 31 / dt_so

    # --- fused SkipGram train step throughput (pairs/s)
    from embiggen_tpu.models.embedders import SkipGram

    model = SkipGram(
        embedding_size=128, epochs=1, batch_size=1024, walk_length=64,
        window_size=5, number_of_negative_samples=10, random_state=0,
    )
    params = model._init_params(graph, key)
    step = jax.jit(lambda p, k: model._step(dg, p, k, jnp.float32(0.05)))

    def train_step():
        nonlocal params
        params, loss = step(params, key)
        return loss

    dt_train = _time(train_step, warmup=2, iters=5)
    pairs = 1024 * (64 - 10)
    train_pairs_per_s = pairs / dt_train

    # --- SpMM edges/s (D=128)
    rows, cols, vals = kernel_coo(graph, "Symmetric Normalized Laplacian")
    rows_d = jnp.asarray(rows, jnp.int32)
    cols_d = jnp.asarray(cols, jnp.int32)
    vals_d = jnp.asarray(vals, jnp.float32)
    x = jax.random.normal(key, (graph.number_of_nodes, 128), jnp.float32)

    def run_spmm():
        return spmm(rows_d, cols_d, vals_d, x, graph.number_of_nodes, "sum")

    dt_spmm = _time(run_spmm, warmup=2, iters=5)
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
                "skipgram_train_pairs_per_s": round(train_pairs_per_s),
                "spmm_edges_per_s": round(spmm_edges_per_s),
                "cpu_proxy_steps_per_s": round(cpu_proxy),
            }
        )
    )


if __name__ == "__main__":
    main()
