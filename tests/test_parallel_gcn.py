"""Sharded GCN train step (halo SpMM convolution) and data-parallel SkipGram
on the 8-CPU virtual mesh."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from embiggen_tpu.graph import erdos_renyi, kernel_coo
from embiggen_tpu.parallel import (
    build_halo_partition,
    make_dp_skipgram_step,
    make_mesh,
    make_sharded_gcn_edge_step,
    shard_features,
)


@pytest.fixture(scope="module")
def mesh():
    return make_mesh(("nodes",), devices=jax.devices()[:8])


def test_sharded_gcn_edge_step_trains(mesh):
    # Karate club has real community structure a link predictor can learn
    # (an ER graph would be pure noise).
    from embiggen_tpu.graph import karate_club

    g = karate_club()
    rows, cols, vals = kernel_coo(g, "Symmetric Normalized Laplacian")
    part = build_halo_partition(rows, cols, vals, g.number_of_nodes, 8)
    rng = np.random.default_rng(0)
    x = shard_features(
        rng.normal(size=(g.number_of_nodes, 16)).astype(np.float32),
        part, mesh, "nodes",
    )
    init, step = make_sharded_gcn_edge_step(
        mesh, "nodes", part, x, g.device(), units=[16, 8],
        batch_size=128, learning_rate=0.1,
    )
    params, opt_state = init(jax.random.PRNGKey(0))
    losses = []
    key = jax.random.PRNGKey(1)
    for _ in range(60):
        key, sub = jax.random.split(key)
        params, opt_state, loss = step(params, opt_state, sub)
        losses.append(float(loss))
    assert np.isfinite(losses).all()
    assert np.mean(losses[-10:]) < np.mean(losses[:10]) - 0.01, (
        losses[:5], losses[-5:]
    )


def test_dp_skipgram_step_matches_replication_invariant(mesh):
    """Tables must stay numerically identical across devices after a DP
    step (every device applies the same global sparse update)."""
    mesh_dp = make_mesh(("data",), devices=jax.devices()[:8])
    g = erdos_renyi(120, 700, seed=2)
    dg = g.device()
    d = 16
    key = jax.random.PRNGKey(0)
    k1, k2 = jax.random.split(key)
    params = {
        "node_embedding": jax.random.normal(
            k1, (g.number_of_nodes, d), jnp.float32
        ),
        "context_embedding": jax.random.normal(
            k2, (g.number_of_nodes, d), jnp.float32
        ),
        "context_bias": jnp.zeros((g.number_of_nodes,), jnp.float32),
    }
    step = make_dp_skipgram_step(
        mesh_dp, dg, batch_size=64, walk_length=12, window_size=2,
        number_of_negative_samples=6,
    )
    losses = []
    for i in range(8):
        params, loss = step(params, jax.random.PRNGKey(10 + i),
                            jnp.float32(0.1))
        losses.append(float(loss))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0], losses
    emb = np.asarray(params["node_embedding"])
    assert np.isfinite(emb).all()
