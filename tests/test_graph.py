"""Graph core: construction, queries, transforms, kernels, holdouts, sampling."""
import numpy as np
import pytest

from embiggen_tpu.graph import (
    Graph,
    KERNELS,
    all_edge_metrics,
    barabasi_albert,
    connected_holdout,
    edge_label_holdout,
    edge_metrics,
    edge_prediction_kfold,
    erdos_renyi,
    karate_club,
    kernel_coo,
    node_label_holdout,
    node_label_kfold,
    random_holdout,
    sample_negative_graph,
    small_ppi,
)


def test_karate_basic(karate):
    assert karate.number_of_nodes == 34
    assert karate.number_of_edges == 78
    assert karate.number_of_directed_edges == 156
    assert not karate.directed
    # degree of node 33 (the Officer) is 17
    assert karate.degrees[33] == 17
    assert karate.degrees.sum() == 156


def test_ppi_loading(ppi):
    assert ppi.number_of_nodes > 100
    assert ppi.has_edge_weights
    assert ppi.has_edge_types
    assert ppi.number_of_edge_types >= 1
    names = ppi.get_node_names()
    assert names[0].startswith("ENSP")
    ids = ppi.get_node_ids_from_names(names[:5])
    assert list(ids) == [0, 1, 2, 3, 4]


def test_has_edges(karate):
    assert karate.has_edges_fast(np.array([0]), np.array([1]))[0]
    assert karate.has_edges_fast(np.array([1]), np.array([0]))[0]  # symmetrized
    assert not karate.has_edges_fast(np.array([0]), np.array([33]))[0]
    np.testing.assert_array_equal(
        karate.has_edges(np.array([0, 0]), np.array([1, 33])),
        np.array([True, False]),
    )


def test_degree_sort(karate):
    s = karate.sort_by_decreasing_outbound_node_degree()
    assert s.is_sorted_by_decreasing_outbound_node_degree()
    assert not karate.is_sorted_by_decreasing_outbound_node_degree()
    assert s.number_of_directed_edges == karate.number_of_directed_edges
    # degree multiset preserved
    np.testing.assert_array_equal(
        np.sort(s.degrees), np.sort(karate.degrees)
    )
    # node names follow the relabelling
    hub_old = int(np.argmax(karate.degrees))
    assert s.get_node_names()[0] == karate.get_node_names()[hub_old]


def test_set_algebra(karate):
    train, test = random_holdout(karate, train_size=0.7, random_state=3)
    inter = karate & train
    assert inter.number_of_directed_edges == train.number_of_directed_edges
    diff = karate.difference(train)
    assert (
        diff.number_of_directed_edges + train.number_of_directed_edges
        == karate.number_of_directed_edges
    )


def test_edge_ids(karate):
    eid = karate.get_edge_ids(np.array([0, 0]), np.array([1, 33]))
    assert eid[0] >= 0 and eid[1] == -1
    assert karate.col_idx[eid[0]] == 1


def test_kernels(karate, er_graph):
    for kernel in KERNELS:
        g = er_graph if "Weight" in kernel else karate
        rows, cols, vals = kernel_coo(g, kernel)
        assert len(rows) == g.number_of_directed_edges
        assert not np.isnan(vals).any()
    # Left-normalized rows sum to 1
    rows, cols, vals = kernel_coo(karate, "Left Normalized Laplacian")
    sums = np.zeros(karate.number_of_nodes)
    np.add.at(sums, rows, vals)
    np.testing.assert_allclose(sums, 1.0, rtol=1e-5)
    # Symmetric normalization matches D^-1/2 A D^-1/2
    rows, cols, vals = kernel_coo(karate, "Symmetric Normalized Laplacian")
    d = karate.degrees.astype(float)
    expected = 1.0 / np.sqrt(d[rows] * d[cols])
    np.testing.assert_allclose(vals, expected, rtol=1e-5)
    # typo'd reference spelling accepted
    kernel_coo(karate, "Trasposed Left Normalized Laplacian")


def test_connected_holdout_preserves_connectivity(karate):
    train, test = connected_holdout(karate, train_size=0.8, random_state=0)
    assert (
        train.number_of_edges + test.number_of_edges == karate.number_of_edges
    )
    # train graph remains connected (karate is connected): BFS from 0
    visited = np.zeros(train.number_of_nodes, dtype=bool)
    stack = [0]
    visited[0] = True
    while stack:
        v = stack.pop()
        for u in train.neighbors(v):
            if not visited[u]:
                visited[u] = True
                stack.append(int(u))
    assert visited.all()


def test_random_holdout_sizes(ppi):
    train, test = random_holdout(ppi, train_size=0.75, random_state=1)
    total = ppi.number_of_edges
    assert abs(train.number_of_edges - 0.75 * total) <= 1
    # disjoint edge sets
    inter = train & test
    assert inter.number_of_directed_edges == 0


def test_kfold_partition(karate):
    seen = 0
    for fold in range(5):
        train, test = edge_prediction_kfold(karate, 5, fold, random_state=2)
        seen += test.number_of_edges
        inter = train & test
        assert inter.number_of_directed_edges == 0
    assert seen == karate.number_of_edges


def test_node_label_holdout(er_graph):
    train, test = node_label_holdout(er_graph, train_size=0.8, random_state=0)
    tr = train.get_known_node_types_mask()
    te = test.get_known_node_types_mask()
    assert not (tr & te).any()
    assert (tr | te).sum() == er_graph.get_known_node_types_mask().sum()
    # stratified: per-class proportions roughly preserved
    for fold in range(3):
        a, b = node_label_kfold(er_graph, 3, fold)
        assert not (a.get_known_node_types_mask() & b.get_known_node_types_mask()).any()


def test_edge_label_holdout(er_graph):
    train, test = edge_label_holdout(er_graph, train_size=0.8, random_state=0)
    tr = train.get_known_edge_types_mask()
    te = test.get_known_edge_types_mask()
    assert not (tr & te).any()
    assert train.number_of_directed_edges == er_graph.number_of_directed_edges


def test_negative_sampling(karate):
    neg = sample_negative_graph(karate, 40, random_state=5)
    assert neg.number_of_edges == 40
    # none of the negative edges exist in the original
    assert not karate.has_edges_fast(neg.sources, neg.col_idx).any()


def test_negative_sampling_scale_free_bias(ppi):
    neg_sf = sample_negative_graph(ppi, 500, random_state=5)
    neg_uni = sample_negative_graph(
        ppi, 500, random_state=5, use_scale_free_distribution=False
    )
    deg = ppi.degrees
    mean_sf = deg[neg_sf.sources].mean() + deg[neg_sf.col_idx].mean()
    mean_uni = deg[neg_uni.sources].mean() + deg[neg_uni.col_idx].mean()
    assert mean_sf > mean_uni  # scale-free sampling hits higher-degree nodes


def test_edge_metrics(karate):
    m = edge_metrics(karate, np.array([0, 0]), np.array([1, 33]))
    assert m.shape == (2, 4)
    # nodes 0,1 share many neighbours; 0,33 share few relative to degree
    assert m[0, 1] > m[1, 1]  # Jaccard
    full = all_edge_metrics(karate)
    assert full.shape == (karate.number_of_directed_edges, 4)
    # preferential attachment of (0,1) = deg0*deg1
    assert m[0, 3] == karate.degrees[0] * karate.degrees[1]


def test_one_hot_node_types(er_graph):
    oh = er_graph.get_one_hot_encoded_node_types()
    assert oh.shape == (er_graph.number_of_nodes, er_graph.number_of_node_types)
    assert (oh.sum(axis=1) == 1).all()


def test_generators():
    ba = barabasi_albert(500, 5, seed=1)
    assert ba.number_of_nodes == 500
    # scale-free: max degree much larger than median
    assert ba.degrees.max() > 5 * np.median(ba.degrees)
    er = erdos_renyi(100, 300, seed=2, weighted=True)
    assert er.has_edge_weights


def test_device_export(karate):
    dg = karate.device()
    assert dg.n_nodes == 34
    assert int(dg.row_ptr[-1]) == karate.number_of_directed_edges
    import jax

    leaves = jax.tree_util.tree_leaves(dg)
    assert len(leaves) >= 3


def test_alias_tables(er_graph):
    from embiggen_tpu.graph import build_alias_tables

    prob, alias = build_alias_tables(er_graph.row_ptr, er_graph.weights)
    assert prob.shape == er_graph.weights.shape
    assert (prob >= 0).all() and (prob <= 1.0 + 1e-6).all()
    # sampling from the alias table reproduces the weight distribution
    rng = np.random.default_rng(0)
    node = int(np.argmax(er_graph.degrees))
    s, e = er_graph.row_ptr[node], er_graph.row_ptr[node + 1]
    d = e - s
    n_samp = 200_000
    j = rng.integers(0, d, size=n_samp)
    coin = rng.uniform(size=n_samp)
    picked = np.where(coin < prob[s + j], j, alias[s + j])
    counts = np.bincount(picked, minlength=d)
    w = er_graph.weights[s:e].astype(np.float64)
    np.testing.assert_allclose(counts / n_samp, w / w.sum(), atol=0.01)


def test_relabel_preserves_node_types(er_graph):
    s = er_graph.sort_by_decreasing_outbound_node_degree()
    # type multiset preserved
    np.testing.assert_array_equal(
        np.sort(s.node_type_ids), np.sort(er_graph.node_type_ids)
    )
    oh_old = er_graph.get_one_hot_encoded_node_types()
    oh_new = s.get_one_hot_encoded_node_types()
    order = np.argsort(-er_graph.degrees, kind="stable")
    np.testing.assert_array_equal(oh_new, oh_old[order])


def test_device_edge_metrics_match_host(ppi):
    """On-device edge metrics (ops/edge_metrics.py) match the host path."""
    import jax.numpy as jnp

    from embiggen_tpu.ops.edge_metrics import edge_metrics as device_metrics

    rng = np.random.default_rng(3)
    idx = rng.integers(0, ppi.number_of_directed_edges, size=64)
    src = ppi.sources[idx]
    dst = ppi.col_idx[idx]
    host = edge_metrics(ppi, src, dst)
    cap = int(ppi.degrees.max())
    dev = np.asarray(
        device_metrics(ppi.device(), jnp.asarray(src), jnp.asarray(dst), cap=cap)
    )
    np.testing.assert_allclose(dev, host, atol=1e-4)


def test_vectorized_edge_ids_and_membership(ppi):
    """get_edge_ids / has_edges are batched searchsorted (no per-query loop)."""
    ids = ppi.get_edge_ids(ppi.sources, ppi.col_idx)
    np.testing.assert_array_equal(ids, np.arange(ppi.number_of_directed_edges))
    # shuffled queries + guaranteed non-edges
    rng = np.random.default_rng(0)
    perm = rng.permutation(ppi.number_of_directed_edges)[:500]
    np.testing.assert_array_equal(
        ppi.get_edge_ids(ppi.sources[perm], ppi.col_idx[perm]), perm
    )
    non_src = ppi.sources[perm]
    non_dst = ppi.col_idx[perm]
    mask = ~ppi.has_edges(non_dst, non_src)  # reversed arcs not all present
    assert ppi.has_edges(ppi.sources[perm], ppi.col_idx[perm]).all()
    assert (ppi.get_edge_ids(non_dst[mask], non_src[mask]) == -1).all()


def test_connected_components_scale():
    """Components on a 100k-node graph resolve in well under a second and
    find planted components exactly."""
    import time

    parts = []
    offset = 0
    for i in range(3):
        g = erdos_renyi(30_000, 150_000, seed=i)
        parts.append((g.sources + offset, g.col_idx + offset))
        offset += g.number_of_nodes
    src = np.concatenate([p[0] for p in parts])
    dst = np.concatenate([p[1] for p in parts])
    big = Graph.from_edge_arrays(src, dst, n_nodes=offset, directed=True)
    t0 = time.time()
    comp, n = big.connected_components()
    assert time.time() - t0 < 5.0
    # the three ER blocks never merge (plus a handful of isolated nodes)
    assert 3 <= n < 30
    assert len({comp[0], comp[30_000], comp[60_000]}) == 3
    # each block's giant component covers almost all of it
    for b in range(3):
        block = comp[b * 30_000 : (b + 1) * 30_000]
        top = np.bincount(block).max()
        assert top > 29_900


def test_get_dataset_registry():
    """Named-corpus resolution mirrors `ensmallen.datasets.get_dataset`
    (reference `utils/pipeline.py:97-102`): bundled graphs load, registered
    corpora resolve to local files or explicit synthetic stand-ins, and
    failure modes are informative (no silent substitution)."""
    import pytest

    from embiggen_tpu.graph.loaders import get_dataset

    assert get_dataset("KarateClub").number_of_nodes == 34
    g = get_dataset("Cora", synthetic_fallback=True)
    assert g.name == "CoraSyntheticStandIn"
    assert g.number_of_nodes == 2708 and g.has_node_types
    w = get_dataset("Usair97", synthetic_fallback=True)
    assert w.name == "Usair97SyntheticStandIn" and w.weights is not None
    with pytest.raises(FileNotFoundError, match="cannot be downloaded"):
        get_dataset("Cora")
    with pytest.raises(KeyError, match="repository"):
        get_dataset("Cora", repository="kgobo")
    with pytest.raises(KeyError, match="Unknown dataset"):
        get_dataset("definitely-not-a-graph")


def test_get_dataset_local_file(tmp_path, monkeypatch):
    """A local $EMBIGGEN_DATA_DIR/<Name>.tsv takes precedence for a
    registered corpus."""
    import numpy as np

    from embiggen_tpu.graph.loaders import get_dataset

    p = tmp_path / "CIO.tsv"
    p.write_text("subject\tobject\na\tb\nb\tc\nc\ta\n")
    monkeypatch.setenv("EMBIGGEN_DATA_DIR", str(tmp_path))
    g = get_dataset("CIO")
    assert g.name == "CIO"
    assert g.number_of_nodes == 3


def test_planted_partition_edges_scalable_generator():
    """O(E) SBM generator: edge count (up to duplicate collapse),
    within-community fraction, community node types."""
    from embiggen_tpu.graph import planted_partition_edges

    g = planted_partition_edges(5000, 40000, n_communities=5,
                                within_fraction=0.8, seed=1)
    assert g.number_of_nodes == 5000
    assert 0.98 * 40000 <= g.number_of_edges <= 40000
    comm = g.get_single_label_node_type_ids()
    within = (comm[g.sources] == comm[g.col_idx]).mean()
    assert 0.75 < within < 0.85
    assert g.number_of_node_types == 5


def test_negative_sampler_no_duplicates_across_rounds():
    """Requesting most of a small graph's non-edges forces many top-up
    rounds; the result must still be globally duplicate-free, never a
    positive edge, and exactly the requested size (top-up rounds used to
    dedupe only within themselves)."""
    import numpy as np

    from embiggen_tpu.graph.generators import erdos_renyi
    from embiggen_tpu.graph.sampling import _sample_negative_graph

    g = erdos_renyi(300, 4000, seed=5)
    non_edges = 300 * 299 // 2 - (g.number_of_directed_edges // 2)
    want = int(non_edges * 0.9)
    neg = _sample_negative_graph(g, want, 9, True, g, 256)
    s, d = neg.sources, neg.col_idx
    assert not g.has_edges_fast(s.astype(np.int64), d.astype(np.int64)).any()
    canon = np.minimum(s, d).astype(np.int64) * 300 + np.maximum(s, d)
    canon = canon[s < d]
    assert len(canon) == want
    assert len(np.unique(canon)) == want


def test_pull_to_host_matches_asarray():
    import jax
    import numpy as np

    from embiggen_tpu.utils.transfer import pull_to_host

    x = jax.random.normal(jax.random.PRNGKey(0), (70_000, 128))
    np.testing.assert_array_equal(pull_to_host(x, streams=8), np.asarray(x))
    host = np.ones((4, 3))
    assert pull_to_host(host) is not host or True  # plain ndarray path runs
    np.testing.assert_array_equal(pull_to_host(host), host)
