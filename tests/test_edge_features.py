"""HyperSketching HLL sketches: cardinality accuracy + edge-feature sanity."""
import numpy as np
import pytest

from embiggen_tpu.graph import karate_club


def test_hll_cardinality_accuracy():
    import jax.numpy as jnp

    from embiggen_tpu.ops.hll import hll_cardinality, singleton_registers

    # Union many singleton sketches and compare the estimate to the truth.
    n = 5000
    regs = np.asarray(singleton_registers(n, precision=8, bits=6))
    union = regs.max(axis=0)
    est = float(hll_cardinality(jnp.asarray(union[None]), 8)[0])
    assert abs(est - n) / n < 0.15, est
    # small set: linear counting regime
    small = regs[:20].max(axis=0)
    est_small = float(hll_cardinality(jnp.asarray(small[None]), 8)[0])
    assert abs(est_small - 20) <= 5, est_small


def test_khop_sketch_growth():
    import jax.numpy as jnp

    from embiggen_tpu.ops.hll import (
        hll_cardinality,
        khop_sketches,
        singleton_registers,
    )

    g = karate_club()
    dg = g.device(with_weights=False)
    base = singleton_registers(34, precision=8, bits=6)
    sketches = khop_sketches(dg, base, 3)  # [3, N, M]
    cards = np.asarray(hll_cardinality(sketches, 8))  # [3, N]
    # ball sizes are monotone in hops, and the 3-hop ball of the hub covers
    # most of the (diameter-5) karate graph
    assert (cards[1] >= cards[0] - 1e-3).all()
    assert (cards[2] >= cards[1] - 1e-3).all()
    hub = int(np.argmax(g.degrees))
    assert cards[2, hub] > 20


def test_hyper_sketching_edge_features():
    from embiggen_tpu.models.edge_features import HyperSketching

    g = karate_club()
    model = HyperSketching(number_of_hops=2, precision=6, random_state=0)
    model.fit(g)
    assert model.is_fit()
    feats = model.get_edge_feature_from_edge_node_ids(
        np.array([0, 1, 33]), np.array([1, 2, 32])
    )["edge_features"]
    assert feats.shape == (3, 2 * 2 + 2 * 2)
    assert np.isfinite(feats).all()
    # adjacent high-degree pair (32, 33) overlaps more at hop-1 than a
    # cross-community pair
    f_close = model.get_edge_feature_from_edge_node_ids(
        np.array([33]), np.array([32])
    )["edge_features"][0, 0]
    f_far = model.get_edge_feature_from_edge_node_ids(
        np.array([16]), np.array([9])
    )["edge_features"][0, 0]
    assert f_close > f_far


def test_hyper_sketching_as_embedder():
    from embiggen_tpu.models.edge_features import HyperSketching

    g = karate_club()
    result = HyperSketching.into_smoke_test(random_state=0).fit_transform(g)
    assert len(result.edge_embeddings) == 1
    assert result.edge_embeddings[0].shape == (
        g.number_of_directed_edges, 2 * 2 + 2 * 2
    )
