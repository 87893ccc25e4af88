"""Feature preprocessor, DAGResnik, caching, persistence, checkpointing."""
import os

import numpy as np
import pytest

from embiggen_tpu.graph import Graph, karate_club


def test_graph_convolution_preprocessor(tmp_path):
    from embiggen_tpu.models.feature_preprocessors import GraphConvolution

    g = karate_club()
    x = np.eye(34, dtype=np.float32)
    pre = GraphConvolution(number_of_convolutions=2)
    result = pre.transform(g, [x])
    out = result.get_node_embedding_from_index(0)
    assert out.shape == (34, 34)
    # two rounds of left-normalized propagation = row-stochastic matrix
    np.testing.assert_allclose(out.sum(axis=1), 1.0, rtol=1e-4)
    cat = GraphConvolution(number_of_convolutions=2, concatenate_features=True)
    out2 = cat.transform(g, [x]).get_node_embedding_from_index(0)
    assert out2.shape == (34, 3 * 34)


def test_dag_resnik():
    from embiggen_tpu.similarities import DAGResnik

    # Tiny ontology: 0 is the root; arcs child -> parent.
    src = np.array([1, 2, 3, 4, 5, 6])
    dst = np.array([0, 0, 1, 1, 2, 2])
    dag = Graph.from_edge_arrays(
        src, dst, n_nodes=7, directed=True,
        node_names=[f"t{i}" for i in range(7)], name="toy_dag",
    )
    model = DAGResnik().fit(dag)
    ic = model.get_information_content()
    assert ic[0] == pytest.approx(0.0)  # root has all the mass
    # siblings under node 1 share MICA node 1; cross-branch pairs share root.
    sim_siblings = model.get_similarity_from_node_ids(3, 4)
    sim_cross = model.get_similarity_from_node_ids(3, 5)
    assert sim_siblings > sim_cross
    assert sim_cross == pytest.approx(0.0)
    m = model.get_similarities_from_bipartite_graph_node_ids([3, 4], [5, 6])
    assert m.shape == (2, 2)
    df = model.get_similarities_from_bipartite_graph_node_names(
        ["t3"], ["t4"], return_similarities_dataframe=True
    )
    assert df.iloc[0]["resnik_score"] == pytest.approx(sim_siblings)


def test_dag_resnik_matches_bruteforce_on_random_dag():
    """Vectorized bitset MICA query vs a per-pair BFS oracle on a random
    multi-parent DAG (exercises diamond-shaped ancestor overlap)."""
    from embiggen_tpu.similarities import DAGResnik

    rng = np.random.default_rng(7)
    n = 120
    # Random DAG: each non-root picks 1-3 parents with smaller ids.
    src_l, dst_l = [], []
    for v in range(1, n):
        k = int(rng.integers(1, min(3, v) + 1))
        for p in rng.choice(v, size=k, replace=False):
            src_l.append(v)
            dst_l.append(int(p))
    dag = Graph.from_edge_arrays(
        np.asarray(src_l), np.asarray(dst_l), n_nodes=n, directed=True,
        name="rand_dag",
    )
    model = DAGResnik().fit(dag)
    ic = model.get_information_content()

    # Oracle: BFS ancestor sets + max IC over the intersection.
    ancestors = []
    for v in range(n):
        seen = {v}
        stack = [v]
        while stack:
            u = stack.pop()
            for p in dag.neighbors(u):
                if int(p) not in seen:
                    seen.add(int(p))
                    stack.append(int(p))
        ancestors.append(seen)

    src_q = rng.integers(0, n, size=40)
    dst_q = rng.integers(0, n, size=25)
    got = model.get_similarities_from_bipartite_graph_node_ids(src_q, dst_q)
    for i, a in enumerate(src_q):
        for j, b in enumerate(dst_q):
            common = ancestors[int(a)] & ancestors[int(b)]
            want = max((ic[c] for c in common), default=0.0)
            assert got[i, j] == pytest.approx(want), (a, b)


def _random_dag(n, seed):
    rng = np.random.default_rng(seed)
    src_l, dst_l = [], []
    for v in range(1, n):
        k = int(rng.integers(1, min(3, v) + 1))
        for p in rng.choice(v, size=k, replace=False):
            src_l.append(v)
            dst_l.append(int(p))
    return Graph.from_edge_arrays(
        np.asarray(src_l), np.asarray(dst_l), n_nodes=n, directed=True,
        name=f"rand_dag{n}",
    )


def test_dag_resnik_csr_path_matches_bitset(monkeypatch):
    """The large-ontology CSR closure (threaded C++ two-pointer MICA, no
    N²/8 bitset matrix) returns EXACTLY the bitset path's similarities."""
    import embiggen_tpu.similarities as S

    dag = _random_dag(400, seed=3)
    counts = {
        name: float(c)
        for name, c in zip(
            dag.get_node_names(),
            np.random.default_rng(0).integers(1, 20, dag.number_of_nodes),
        )
    }
    ref = S.DAGResnik().fit(dag, node_counts=counts)
    monkeypatch.setattr(S, "_BITSET_MAX_NODES", 10)  # force CSR layout
    csr = S.DAGResnik().fit(dag, node_counts=counts)
    assert csr._anc_by_ic is None and csr._anc_ranks is not None
    rng = np.random.default_rng(1)
    a = rng.integers(0, 400, 50)
    b = rng.integers(0, 400, 30)
    np.testing.assert_allclose(
        csr.get_similarities_from_bipartite_graph_node_ids(a, b),
        ref.get_similarities_from_bipartite_graph_node_ids(a, b),
        atol=1e-12,
    )
    np.testing.assert_allclose(
        csr.get_information_content(), ref.get_information_content(),
        atol=1e-12,
    )


def test_dag_resnik_scales_past_bitset_wall():
    """A 50k-term ontology (the bitset layout would need ~312 MB and 100k+
    would need GBs) fits and answers a 200x200 bipartite query quickly via
    the CSR path."""
    from embiggen_tpu.similarities import DAGResnik

    dag = _random_dag(50_000, seed=4)
    model = DAGResnik().fit(dag)
    assert model._anc_by_ic is None  # CSR layout chosen
    rng = np.random.default_rng(2)
    sim = model.get_similarities_from_bipartite_graph_node_ids(
        rng.integers(0, 50_000, 200), rng.integers(0, 50_000, 200)
    )
    assert sim.shape == (200, 200) and np.isfinite(sim).all()
    assert (sim > 0).any()


def test_embedding_cache(tmp_path, monkeypatch):
    import embiggen_tpu.utils.cache as cache_mod

    monkeypatch.setattr(cache_mod, "DEFAULT_CACHE_DIR", str(tmp_path))
    from embiggen_tpu.models.embedders import DegreeSPINE

    g = karate_club()
    model = DegreeSPINE(embedding_size=5, enable_cache=True)
    r1 = model.fit_transform(g)
    # cache file exists now
    files = [
        os.path.join(dp, f)
        for dp, _, fs in os.walk(tmp_path)
        for f in fs
    ]
    assert len(files) == 1
    r2 = DegreeSPINE(embedding_size=5, enable_cache=True).fit_transform(g)
    np.testing.assert_array_equal(
        np.asarray(r1.get_node_embedding_from_index(0)),
        np.asarray(r2.get_node_embedding_from_index(0)),
    )


def test_model_persistence(tmp_path):
    from embiggen_tpu.models.gcn import KipfGCNNodeLabelPrediction
    from embiggen_tpu.utils import dump_model, load_model

    g = karate_club()
    model = KipfGCNNodeLabelPrediction.into_smoke_test(random_state=1)
    model.fit(g)
    before = model.predict_proba(g)
    path = str(tmp_path / "model.pkl.gz")
    dump_model(model, path)
    restored = load_model(path)
    after = restored.predict_proba(g)
    np.testing.assert_allclose(before, after, rtol=1e-5)


def test_pytree_checkpoint(tmp_path):
    import jax.numpy as jnp

    from embiggen_tpu.utils import load_pytree, save_pytree

    tree = {"a": jnp.arange(5.0), "b": {"c": jnp.ones((2, 3))}}
    path = str(tmp_path / "ckpt")
    save_pytree(path, tree)
    like = {"a": jnp.zeros(5), "b": {"c": jnp.zeros((2, 3))}}
    restored = load_pytree(path, like=like)
    np.testing.assert_array_equal(np.asarray(restored["a"]), np.arange(5.0))
    np.testing.assert_array_equal(
        np.asarray(restored["b"]["c"]), np.ones((2, 3))
    )


class _KillAfter:
    """Wrap `save_pytree` to raise after N saves — simulates a process kill
    mid-training (the save itself completes first, like a real kill between
    epochs)."""

    def __init__(self, n_saves):
        import embiggen_tpu.utils.checkpoint as ck

        self.real = ck.save_pytree
        self.left = n_saves

    def __call__(self, path, tree, **kw):
        self.real(path, tree, **kw)
        self.left -= 1
        if self.left <= 0:
            raise KeyboardInterrupt("simulated kill")


def test_trainloop_kill_and_resume_bit_identical(tmp_path, monkeypatch):
    """A checkpointed run killed mid-training and resumed produces params
    bit-identical to an uninterrupted run (VERDICT r1 item 10)."""
    import jax
    import jax.numpy as jnp
    import pytest

    import embiggen_tpu.utils.checkpoint as ck
    from embiggen_tpu.models.gcn.core import TrainLoop, init_mlp

    x = jnp.asarray(np.random.default_rng(0).normal(size=(32, 4)), jnp.float32)
    y = jnp.asarray(np.random.default_rng(1).normal(size=(32, 1)), jnp.float32)

    def loss_fn(params, key):
        h = x
        for lyr in params:
            h = h @ lyr["w"] + lyr["b"]
        return ((h - y) ** 2).mean()

    loss_step = jax.value_and_grad(loss_fn)
    params0 = init_mlp(jax.random.PRNGKey(0), [4, 8, 1])

    full, hist_full = TrainLoop(epochs=8, steps_per_epoch=2).run(
        params0, loss_step, jax.random.PRNGKey(42)
    )
    d = str(tmp_path / "ck")
    # Kill after 4 epochs (checkpoint each epoch, die after the 4th save)...
    monkeypatch.setattr(ck, "save_pytree", _KillAfter(4))
    with pytest.raises(KeyboardInterrupt):
        TrainLoop(
            epochs=8, steps_per_epoch=2, checkpoint_dir=d,
            checkpoint_interval=1,
        ).run(params0, loss_step, jax.random.PRNGKey(42))
    monkeypatch.undo()
    # ... then resume to the full 8.
    resumed, hist_res = TrainLoop(
        epochs=8, steps_per_epoch=2, checkpoint_dir=d, checkpoint_interval=1
    ).run(params0, loss_step, jax.random.PRNGKey(42))

    for a, b in zip(
        jax.tree_util.tree_leaves(full), jax.tree_util.tree_leaves(resumed)
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    np.testing.assert_allclose(hist_full, hist_res)
    # A completed run must not leave a resumable checkpoint behind.
    from embiggen_tpu.utils.checkpoint import checkpoint_exists

    assert not checkpoint_exists(str(tmp_path / "ck" / "train_state"))


def test_walk_embedder_kill_and_resume_bit_identical(tmp_path, monkeypatch):
    import pytest

    import embiggen_tpu.utils.checkpoint as ck
    from embiggen_tpu.models.embedders import SkipGram

    g = karate_club()
    kwargs = dict(
        embedding_size=8, epochs=4, batch_size=16, walk_length=8,
        window_size=2, number_of_negative_samples=4, random_state=7,
    )
    full = SkipGram(**kwargs).fit_transform(g).node_embeddings[0]

    d = str(tmp_path / "ck")
    # Kill mid-run after 2 epochs' checkpoints...
    monkeypatch.setattr(ck, "save_pytree", _KillAfter(2))
    with pytest.raises(KeyboardInterrupt):
        SkipGram(**kwargs, checkpoint_dir=d).fit_transform(g)
    monkeypatch.undo()
    # ... then resume to completion.
    resumed = SkipGram(**kwargs, checkpoint_dir=d).fit_transform(
        g
    ).node_embeddings[0]
    np.testing.assert_array_equal(np.asarray(full), np.asarray(resumed))


def test_stale_checkpoint_from_other_graph_is_ignored(tmp_path):
    """A checkpoint_dir shared across runs must never serve one graph's
    result to another (ADVICE r2 high): fingerprint mismatch → fresh fit."""
    from embiggen_tpu.graph import erdos_renyi
    from embiggen_tpu.models.embedders import SkipGram

    d = str(tmp_path / "ck")
    kwargs = dict(
        embedding_size=8, epochs=2, batch_size=16, walk_length=8,
        window_size=2, number_of_negative_samples=4, random_state=7,
    )
    import embiggen_tpu.utils.checkpoint as ck
    import pytest

    g1 = karate_club()
    # Leave a mid-run checkpoint for g1 behind (killed run).
    killer = _KillAfter(1)
    real = ck.save_pytree
    ck.save_pytree = killer
    try:
        with pytest.raises(KeyboardInterrupt):
            SkipGram(**kwargs, checkpoint_dir=d).fit_transform(g1)
    finally:
        ck.save_pytree = real
    # A different graph with the same checkpoint_dir trains from scratch and
    # returns embeddings of ITS OWN shape.
    g2 = erdos_renyi(100, 400, seed=3)
    with pytest.warns(UserWarning, match="different model"):
        res = SkipGram(**kwargs, checkpoint_dir=d).fit_transform(g2)
    assert res.node_embeddings[0].shape[0] == 100


def test_phase_timer_and_profiler_hooks(tmp_path):
    from embiggen_tpu.utils import profiling

    t = profiling.PhaseTimer()
    with t.phase("fit"):
        pass
    with t.phase("fit"):
        pass
    d = t.as_dict()
    assert "fit_time" in d and d["fit_time"] >= 0

    # trace/annotate must be safe no-ops even if the profiler can't start.
    import jax
    import jax.numpy as jnp

    with profiling.trace(str(tmp_path / "prof")):
        with profiling.annotate("step"):
            jax.jit(lambda x: x * 2)(jnp.ones(4)).block_until_ready()
    stats = profiling.device_memory_stats()
    assert stats is None or isinstance(stats, dict)


def test_evaluation_profile_dir_smoke(tmp_path):
    from embiggen_tpu.models.edge_prediction import PerceptronEdgePrediction
    from embiggen_tpu.pipelines.evaluation import evaluate_model_on_graph

    g = karate_club()
    df = evaluate_model_on_graph(
        PerceptronEdgePrediction(number_of_epochs=2),
        g,
        evaluation_schema="Monte Carlo",
        holdouts_number=1,
        profile_dir=str(tmp_path / "traces"),
    )
    assert len(df) >= 2


def test_minibatch_embedder_kill_and_resume_bit_identical(
    tmp_path, monkeypatch
):
    """Checkpoint/resume for the minibatch families (LINE here): lr is a
    pure function of (epoch, plateau state) and both round-trip through
    the checkpoint, so a killed run resumes bit-identically."""
    import pytest

    import embiggen_tpu.utils.checkpoint as ck
    from embiggen_tpu.models.embedders import FirstOrderLINE

    g = karate_club()
    kwargs = dict(
        embedding_size=8, epochs=4, batch_size=32, random_state=7,
    )
    full = FirstOrderLINE(**kwargs).fit_transform(g).node_embeddings[0]

    d = str(tmp_path / "ck_line")
    monkeypatch.setattr(ck, "save_pytree", _KillAfter(2))
    with pytest.raises(KeyboardInterrupt):
        FirstOrderLINE(**kwargs, checkpoint_dir=d).fit_transform(g)
    monkeypatch.undo()
    resumed = FirstOrderLINE(**kwargs, checkpoint_dir=d).fit_transform(
        g
    ).node_embeddings[0]
    np.testing.assert_array_equal(np.asarray(full), np.asarray(resumed))
