"""Benchmark: on-device random-walk + SkipGram training throughput and SpMM
edges/s on one TPU chip (BASELINE.json metric: "walk-steps/s and edges/s per
chip").

Prints ONE JSON line:
  {"metric": "walk_steps_per_s", "value": N, "unit": "steps/s",
   "vs_baseline": R, ...extras}

Measurement methodology: each metric runs K data-dependent iterations INSIDE
one jit (`lax.scan`), i.e. the production shape of the training loops, and
the result is forced to the host — so dispatch overhead, execution caching
and async illusions cannot distort the numbers.

`vs_baseline` compares against the best-effort multicore CPU walker
measured in the same run: the native multithreaded C++ kernel in
`embiggen_tpu/native/graph_algos.cpp` (the in-repo stand-in for GRAPE's
Rust walker — same algorithm: uniform/rejection-sampled p/q steps over
CSR). First-order is `cpu_proxy_steps_per_s`, second-order (p=0.5, q=2)
is `cpu_proxy2_steps_per_s`.
"""
import json
import time

import numpy as np


def _build_graph(n_nodes=1_000_000, n_edges=10_000_000, seed=0):
    from embiggen_tpu.graph import erdos_renyi

    return erdos_renyi(n_nodes, n_edges, seed=seed)


def _run_timed(fn, *args, reps=3):
    """Compile+warm, then take the minimum over `reps` timed executions
    (the axon tunnel has a long, noisy warm-up; min filters it) and force a
    scalar to host."""
    import jax

    out = fn(*args)
    jax.block_until_ready(out)
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn(*args)
        jax.block_until_ready(out)
        leaf = jax.tree_util.tree_leaves(out)[0]
        float(np.asarray(leaf).reshape(-1)[0])
        best = min(best, time.perf_counter() - t0)
    return best


def cpu_walk_proxy(
    graph, batch=8192, length=32, seed=0,
    return_weight=1.0, explore_weight=1.0,
):
    """Best-effort multicore CPU walk baseline: the native C++ kernel
    (embiggen_tpu/native/graph_algos.cpp::random_walks_cpu — the in-repo
    stand-in for GRAPE's Rust walker), numpy fallback when no compiler."""
    from embiggen_tpu.native import native_random_walks

    rng = np.random.default_rng(seed)
    starts = rng.integers(0, graph.number_of_nodes, size=batch).astype(
        np.int32
    )
    col_idx = np.asarray(graph.col_idx)
    out = native_random_walks(
        graph.row_ptr, col_idx, starts, length,
        return_weight=return_weight, explore_weight=explore_weight,
        seed=seed,
    )
    if out is not None:
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            native_random_walks(
                graph.row_ptr, col_idx, starts, length,
                return_weight=return_weight,
                explore_weight=explore_weight, seed=seed,
            )
            best = min(best, time.perf_counter() - t0)
        return batch * (length - 1) / best

    row_ptr = graph.row_ptr
    deg = graph.degrees
    curr = starts.astype(np.int64)
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
    import sys

    def _mark(s):
        print(f'[bench] {s}', file=sys.stderr, flush=True)

    import jax
    import jax.numpy as jnp
    from jax import lax

    from embiggen_tpu.ops.walks import random_walks
    from embiggen_tpu.ops.spmm import pad_coo, spmm, spmm_padded
    from embiggen_tpu.graph import kernel_coo

    dev = jax.devices()[0]
    _mark('device ' + str(dev))
    graph = _build_graph()
    _mark('graph built')
    dg = graph.device()
    key = jax.random.PRNGKey(0)
    n_nodes = graph.number_of_nodes

    batch, length, k_iters = 8192, 128, 10

    # --- first-order walk throughput: K chained batches inside one jit
    @jax.jit
    def walk_chain(dg, starts, k):
        def body(carry, _):
            s, kk = carry
            k1, k2 = jax.random.split(kk)
            w = random_walks(dg, s, length, k1)
            return (w[:, -1], k2), None

        carry, _ = lax.scan(body, (starts, k), None, length=k_iters)
        return carry[0]

    starts0 = jnp.arange(batch, dtype=jnp.int32) % n_nodes
    dt = _run_timed(walk_chain, dg, starts0, key) / k_iters
    _mark('walk1 done')
    walk_steps_per_s = batch * (length - 1) / dt

    # --- second-order (p/q) walk throughput
    @jax.jit
    def walk2_chain(dg, starts, k):
        def body(carry, _):
            s, kk = carry
            k1, k2 = jax.random.split(kk)
            w = random_walks(
                dg, s, 32, k1, return_weight=2.0, explore_weight=0.5,
                max_neighbours=32,
            )
            return (w[:, -1], k2), None

        carry, _ = lax.scan(body, (starts, k), None, length=k_iters)
        return carry[0]

    dt_so = _run_timed(walk2_chain, dg, starts0, key) / k_iters
    _mark('walk2 done')
    walk2_steps_per_s = batch * 31 / dt_so

    # --- fused SkipGram train: K steps scanned inside one jit
    from embiggen_tpu.models.embedders import SkipGram

    model = SkipGram(
        embedding_size=128, epochs=1, batch_size=1024, walk_length=64,
        window_size=5, number_of_negative_samples=10, random_state=0,
    )
    params = model._init_params(graph, key)

    @jax.jit
    def train_chain(dg, params, k):
        def body(p, kk):
            p, loss = model._step(dg, p, kk, jnp.float32(0.05))
            return p, loss

        params, losses = lax.scan(
            body, params, jax.random.split(k, k_iters)
        )
        # Return ONLY a scalar: `_run_timed` forces the first output leaf to
        # host, and pulling a [N,128] table through the axon tunnel would
        # dominate the measurement.
        first_leaf = jax.tree_util.tree_leaves(params)[0]
        return jnp.sum(losses) + jnp.sum(first_leaf.reshape(-1)[:8])

    dt_train = _run_timed(train_chain, dg, params, key) / k_iters
    _mark('train done')
    centers = 1024 * (64 - 10)
    train_centers_per_s = centers / dt_train

    # --- SpMM edges/s: K chained multiplies inside one jit, through the
    # production bucketed-ELLPACK path GCNEncoder uses (spmm_padded). The
    # slow COO segment-sum path is also measured for reference.
    rows, cols, vals = kernel_coo(graph, "Symmetric Normalized Laplacian")
    pk = pad_coo(rows, cols, vals, n_nodes)
    x0 = jax.random.normal(key, (n_nodes, 128), jnp.float32)
    spmm_iters = 5

    @jax.jit
    def spmm_pad_chain(pk, x):
        def body(x, _):
            out = spmm_padded(pk, x, "sum")
            return out / jnp.maximum(jnp.abs(out).max(), 1e-9), None

        x, _ = lax.scan(body, x, None, length=spmm_iters)
        return jnp.sum(x[0])  # scalar out: keep D2H out of the timing

    dt_spmm = _run_timed(spmm_pad_chain, pk, x0) / spmm_iters
    _mark('spmm_pad done')
    spmm_edges_per_s = graph.number_of_directed_edges / dt_spmm
    # effective HBM traffic of the gather-contract: ~N*K*D*4 bytes/pass
    pad_elems = sum(int(np.prod(c.shape)) for c in pk.bucket_cols)
    spmm_gbytes_per_s = pad_elems * 128 * 4 * 2 / dt_spmm / 1e9

    rows_d = jnp.asarray(rows, jnp.int32)
    cols_d = jnp.asarray(cols, jnp.int32)
    vals_d = jnp.asarray(vals, jnp.float32)

    @jax.jit
    def spmm_coo_chain(rows, cols, vals, x):
        def body(x, _):
            out = spmm(rows, cols, vals, x, n_nodes, "sum")
            return out / jnp.maximum(jnp.abs(out).max(), 1e-9), None

        x, _ = lax.scan(body, x, None, length=spmm_iters)
        return jnp.sum(x[0])  # scalar out: keep D2H out of the timing

    dt_coo = _run_timed(spmm_coo_chain, rows_d, cols_d, vals_d, x0) / spmm_iters
    _mark('spmm_coo done')
    spmm_coo_edges_per_s = graph.number_of_directed_edges / dt_coo

    cpu_proxy = cpu_walk_proxy(graph)
    cpu_proxy2 = cpu_walk_proxy(
        graph, return_weight=2.0, explore_weight=0.5
    )

    print(
        json.dumps(
            {
                "metric": "walk_steps_per_s",
                "value": round(walk_steps_per_s),
                "unit": "steps/s",
                "vs_baseline": round(walk_steps_per_s / cpu_proxy, 3),
                "device": str(dev),
                "graph": f"ER(n={n_nodes},arcs={graph.number_of_directed_edges})",
                "walk2_steps_per_s": round(walk2_steps_per_s),
                "skipgram_train_centers_per_s": round(train_centers_per_s),
                "spmm_edges_per_s": round(spmm_edges_per_s),
                "spmm_gbytes_per_s": round(spmm_gbytes_per_s, 1),
                "spmm_coo_edges_per_s": round(spmm_coo_edges_per_s),
                "cpu_proxy_steps_per_s": round(cpu_proxy),
                "cpu_proxy2_steps_per_s": round(cpu_proxy2),
            }
        )
    )


if __name__ == "__main__":
    main()
