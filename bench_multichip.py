"""Multi-chip scaling harness (BASELINE north star: >=75% edges/s scaling
efficiency 1 -> N devices).

Measures, at n_devices in {1, 2, 4, 8}:
  * halo-SpMM edges/s (node-partitioned convolution, `parallel/halo.py`)
    plus the exchanged boundary-row count (comm volume ∝ boundary, not N);
  * data-parallel SkipGram steps/s through the PUBLIC model path
    (`SkipGram(mesh=...)._make_dp_step`).

Prints ONE JSON line in the same shape as bench.py. On this host the mesh
is virtual (xla_force_host_platform_device_count over CPU), so absolute
scaling saturates at the physical core count — the harness validates the
partitioning/collective structure and comm-volume trend, and runs
unchanged on a real TPU slice (it auto-uses real devices when more than
one is present).
"""
import json
import os
import sys
import time


def _force_virtual_mesh(n: int) -> None:
    """Pin an n-device virtual CPU mesh. Set EMBIGGEN_BENCH_PLATFORM=tpu
    (or any platform name) to run on real devices instead — e.g. on a pod
    slice, where the numbers become true scaling measurements."""
    platform = os.environ.get("EMBIGGEN_BENCH_PLATFORM", "cpu")
    flags = os.environ.get("XLA_FLAGS", "")
    if platform == "cpu" and (
        "xla_force_host_platform_device_count" not in flags
    ):
        os.environ["XLA_FLAGS"] = (
            flags + f" --xla_force_host_platform_device_count={n}"
        ).strip()
    os.environ["JAX_PLATFORMS"] = platform


def _mark(s):
    print(f"[bench_multichip] {s}", file=sys.stderr, flush=True)


def timed(fn, *args, reps=3):
    import jax

    out = fn(*args)
    jax.block_until_ready(out)
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn(*args)
        jax.block_until_ready(out)
        best = min(best, time.perf_counter() - t0)
    return best


def main():
    import jax

    if len(jax.devices()) <= 1:
        raise SystemExit(
            "JAX initialized with one device before the virtual mesh could "
            "be configured — run this script standalone."
        )
    import jax.numpy as jnp
    import numpy as np
    from jax import lax

    from embiggen_tpu.graph import erdos_renyi, kernel_coo
    from embiggen_tpu.models.embedders import SkipGram
    from embiggen_tpu.parallel import (
        build_halo_partition,
        halo_spmm,
        make_mesh,
        shard_features,
    )

    devices = jax.devices()
    counts = [c for c in (1, 2, 4, 8) if c <= len(devices)]

    # CPU-sized graph: the structure (partitioning, collectives) is what is
    # under test; on a real slice bump to the bench.py scale.
    n_nodes, n_edges, d = 200_000, 2_000_000, 64
    graph = erdos_renyi(n_nodes, n_edges, seed=0)
    rows, cols, vals = kernel_coo(graph, "Symmetric Normalized Laplacian")
    n_arcs = graph.number_of_directed_edges
    _mark(f"graph ER(n={n_nodes}, arcs={n_arcs}) built")

    halo_results = {}
    spmm_iters = 4
    for p in counts:
        mesh = make_mesh(("nodes",), devices=devices[:p])
        part = build_halo_partition(rows, cols, vals, n_nodes, p)
        x = shard_features(
            np.random.default_rng(0)
            .normal(size=(n_nodes, d))
            .astype(np.float32),
            part, mesh, "nodes",
        )

        @jax.jit
        def chain(x):
            def body(h, _):
                out = halo_spmm(mesh, "nodes", part, h, "sum")
                return out / jnp.maximum(jnp.abs(out).max(), 1e-9), None

            h, _ = lax.scan(body, x, None, length=spmm_iters)
            return h.sum()

        dt = timed(chain, x) / spmm_iters
        halo_results[p] = {
            "edges_per_s": round(n_arcs / dt),
            "comm_rows": part.comm_rows,
            "halo_width": part.halo_width,
        }
        _mark(f"halo p={p}: {halo_results[p]}")

    # DP SkipGram steps/s through the public model path.
    dp_results = {}
    batch, length = 4096, 32
    dg = graph.device()
    for p in counts:
        mesh = make_mesh(("data",), devices=devices[:p])
        model = SkipGram(
            embedding_size=128, epochs=1, batch_size=batch, walk_length=length,
            window_size=5, number_of_negative_samples=10, random_state=0,
            mesh=mesh, distribution="data",
        )
        model._run_batch_size = batch
        params = model._init_params(graph, jax.random.PRNGKey(0))
        from jax.sharding import NamedSharding, PartitionSpec as P

        repl = NamedSharding(mesh, P())
        params = jax.device_put(params, repl)
        dg_p = jax.device_put(dg, repl)
        step = model._make_dp_step(mesh, batch)

        k_steps = 4

        @jax.jit
        def train_chain(dg, params, k):
            def body(prm, kk):
                prm, loss = step(dg, prm, kk, jnp.float32(0.05))
                return prm, loss

            params, losses = lax.scan(
                body, params, jax.random.split(k, k_steps)
            )
            first = jax.tree_util.tree_leaves(params)[0]
            return jnp.sum(losses) + first.reshape(-1)[:4].sum()

        dt = timed(train_chain, dg_p, params, jax.random.PRNGKey(1)) / k_steps
        centers = batch * (length - 10)
        dp_results[p] = {"steps_per_s": round(1.0 / dt, 2),
                         "centers_per_s": round(centers / dt)}
        _mark(f"dp p={p}: {dp_results[p]}")

    # Minibatch-family DP (round 4: every SGD embedder takes mesh=) —
    # triples/s through the public TransE path on the shared Update
    # protocol (`models/embedders/minibatch.py`).
    import dataclasses

    from embiggen_tpu.models.embedders import TransE

    typed_graph = dataclasses.replace(
        graph,
        edge_types=(np.arange(n_arcs) % 4).astype(np.int32),
    )
    mb_results = {}
    mb_batch = 8192
    dg_t = typed_graph.device(with_sources=True)
    for p in counts:
        mesh = make_mesh(("data",), devices=devices[:p])
        model = TransE(
            embedding_size=64, epochs=1, batch_size=mb_batch,
            random_state=0, mesh=mesh, distribution="data",
        )
        model._run_batch_size = mb_batch
        params = model._init_params(typed_graph, jax.random.PRNGKey(0))
        from jax.sharding import NamedSharding, PartitionSpec as P

        repl = NamedSharding(mesh, P())
        params = jax.device_put(params, repl)
        dg_p = jax.device_put(dg_t, repl)
        step = model._make_dp_step(mesh, mb_batch)

        k_steps = 4

        @jax.jit
        def mb_chain(dg, params, k):
            def body(prm, kk):
                prm, loss = step(dg, prm, kk, jnp.float32(0.05))
                return prm, loss

            params, losses = lax.scan(
                body, params, jax.random.split(k, k_steps)
            )
            first = jax.tree_util.tree_leaves(params)[0]
            return jnp.sum(losses) + first.reshape(-1)[:4].sum()

        dt = timed(mb_chain, dg_p, params, jax.random.PRNGKey(1)) / k_steps
        mb_results[p] = {"triples_per_s": round(mb_batch / dt)}
        _mark(f"transe p={p}: {mb_results[p]}")

    base = halo_results[counts[0]]["edges_per_s"]
    virtual = len(jax.devices()) > (os.cpu_count() or 1)
    # On a virtual mesh, device counts beyond the physical cores measure
    # oversubscription, not scaling: headline the largest count that still
    # maps 1:1 onto real compute; the full per-count table is always
    # emitted. On a real slice every count is genuine.
    honest = [
        p for p in counts if (not virtual) or p <= (os.cpu_count() or 1)
    ] or counts[:1]
    head = honest[-1]
    top = halo_results[head]["edges_per_s"]
    eff = top / (base * head)
    print(
        json.dumps(
            {
                "metric": "halo_spmm_edges_per_s",
                "value": top,
                "unit": "edges/s",
                "vs_baseline": round(top / base, 3),
                "n_devices": head,
                "scaling_efficiency": round(eff, 3),
                "physical_cpus": os.cpu_count(),
                "virtual_mesh": virtual,
                "virtual_mesh_caveat": (
                    "virtual CPU mesh: counts beyond physical_cpus measure "
                    "core oversubscription, not scaling; this host validates "
                    "partitioning/collective structure and comm volume only"
                ) if virtual else None,
                "graph": f"ER(n={n_nodes},arcs={n_arcs})",
                "halo": halo_results,
                "dp_skipgram": dp_results,
                "dp_transe": mb_results,
            }
        )
    )


if __name__ == "__main__":
    # Env + config must land before any JAX backend initializes (the axon
    # sitecustomize pins JAX_PLATFORMS, so both are needed).
    _force_virtual_mesh(8)
    import jax

    try:
        jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])
    except RuntimeError:
        pass
    main()
