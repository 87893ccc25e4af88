"""Halo-exchange node-partitioned SpMM: equality with the single-device
COO SpMM on the 8-CPU virtual mesh, communication volume ∝ boundary nodes,
and the sharded GCN step (VERDICT round-1 item 3 / SURVEY §7 step 7)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from embiggen_tpu.graph import erdos_renyi, kernel_coo
from embiggen_tpu.ops.spmm import spmm
from embiggen_tpu.parallel import (
    build_halo_partition,
    halo_spmm,
    make_mesh,
    shard_features,
)


@pytest.fixture(scope="module")
def mesh():
    return make_mesh(("nodes",), devices=jax.devices()[:8])


@pytest.mark.parametrize("combiner", ["sum", "mean", "sqrtn"])
def test_halo_spmm_matches_single_device(mesh, combiner):
    g = erdos_renyi(200, 1500, seed=3, weighted=True)
    rows, cols, vals = kernel_coo(g, "Symmetric Normalized Laplacian")
    n = g.number_of_nodes
    rng = np.random.default_rng(0)
    x = rng.normal(size=(n, 16)).astype(np.float32)

    expect = np.asarray(
        spmm(
            jnp.asarray(rows, jnp.int32), jnp.asarray(cols, jnp.int32),
            jnp.asarray(vals, jnp.float32), jnp.asarray(x), n, combiner,
        )
    )
    part = build_halo_partition(rows, cols, vals, n, n_shards=8)
    xs = shard_features(x, part, mesh, "nodes")
    out = np.asarray(halo_spmm(mesh, "nodes", part, xs, combiner))[:n]
    np.testing.assert_allclose(out, expect, rtol=1e-4, atol=1e-5)


def test_comm_volume_tracks_boundary_not_n(mesh):
    """A graph of 8 near-disjoint communities aligned with the shards has a
    tiny boundary; comm_rows must reflect that, not O(N)."""
    n, per = 400, 50
    rng = np.random.default_rng(1)
    # dense edges within each contiguous block of 50 (aligned to shards)
    src, dst = [], []
    for b in range(8):
        s = rng.integers(b * per, (b + 1) * per, 400)
        d = rng.integers(b * per, (b + 1) * per, 400)
        src.append(s)
        dst.append(d)
    # a handful of cross-community edges
    src.append(np.arange(8) * per)
    dst.append(((np.arange(8) + 1) % 8) * per)
    src = np.concatenate(src)
    dst = np.concatenate(dst)
    vals = np.ones(len(src), np.float32)
    part = build_halo_partition(src, dst, vals, n, n_shards=8)
    assert part.comm_rows <= 16, part.comm_rows  # ∝ boundary, not N=400

    dense_part = build_halo_partition(
        rng.integers(0, n, 2000), rng.integers(0, n, 2000),
        np.ones(2000, np.float32), n, n_shards=8,
    )
    assert dense_part.comm_rows > part.comm_rows

    x = rng.normal(size=(n, 8)).astype(np.float32)
    expect = np.asarray(
        spmm(
            jnp.asarray(src, jnp.int32)[np.argsort(src, kind="stable")],
            jnp.asarray(dst, jnp.int32)[np.argsort(src, kind="stable")],
            jnp.asarray(vals), jnp.asarray(x), n, "sum",
        )
    )
    xs = shard_features(x, part, mesh, "nodes")
    out = np.asarray(halo_spmm(mesh, "nodes", part, xs, "sum"))[:n]
    np.testing.assert_allclose(out, expect, rtol=1e-4, atol=1e-5)


def test_halo_spmm_uneven_last_shard(mesh):
    """n_nodes not divisible by the mesh: padded rows must stay zero."""
    g = erdos_renyi(107, 900, seed=5)
    rows, cols, vals = kernel_coo(g, "Left Normalized Laplacian")
    n = g.number_of_nodes
    rng = np.random.default_rng(2)
    x = rng.normal(size=(n, 8)).astype(np.float32)
    part = build_halo_partition(rows, cols, vals, n, n_shards=8)
    xs = shard_features(x, part, mesh, "nodes")
    out = np.asarray(halo_spmm(mesh, "nodes", part, xs, "sum"))
    expect = np.asarray(
        spmm(
            jnp.asarray(rows, jnp.int32), jnp.asarray(cols, jnp.int32),
            jnp.asarray(vals, jnp.float32), jnp.asarray(x), n, "sum",
        )
    )
    np.testing.assert_allclose(out[:n], expect, rtol=1e-4, atol=1e-5)
    assert np.allclose(out[n:], 0.0)
