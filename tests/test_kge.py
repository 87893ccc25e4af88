"""KGE family: every scoring function trains and learns to rank positive
triples above corrupted ones (native counterpart of the reference's PyKEEN
adapter sweep, `embiggen/embedders/pykeen_embedders/*.py`)."""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from embiggen_tpu.graph import karate_club
from embiggen_tpu.models.embedders import KGE_MODELS, ConvE, NodePiece, RotatE


def _typed_karate():
    g = karate_club()
    labels = g.get_single_label_node_type_ids()
    etypes = (labels[g.sources] != labels[g.col_idx]).astype(np.int32)
    return dataclasses.replace(g, edge_types=etypes)


GRAPH = _typed_karate()


# Smoke-scale (d=8) learning rates: the MLP-scored models need a larger
# step than the shallow bilinear/translation scorers.
_TEST_LR = {"ERMLP": 0.3, "ERMLPE": 0.2, "ConvE": 0.2}


@pytest.mark.parametrize("cls", KGE_MODELS, ids=lambda c: c.model_name())
def test_kge_ranks_positive_triples(cls):
    """After training, the mean distance of true triples must be lower than
    that of corrupted triples (the margin objective, measured directly)."""
    model = cls.into_smoke_test(random_state=7)
    dg = model._prepare_data(GRAPH)  # DeviceGraph, or dict for NodePiece
    key = jax.random.PRNGKey(7)
    params = model._init_params(GRAPH, key)

    def mean_distances(params):
        src = jnp.asarray(GRAPH.sources.astype(np.int32))
        dst = jnp.asarray(GRAPH.col_idx.astype(np.int32))
        et = jnp.asarray(GRAPH.edge_types.astype(np.int32))
        rng = np.random.default_rng(3)
        cdst = jnp.asarray(
            rng.integers(0, GRAPH.number_of_nodes, len(src), dtype=np.int32)
        )
        if isinstance(model, NodePiece):
            glob = {n: params[n] for n in model.GLOBAL_KEYS}
            rel = {"edge_type_embedding": params["edge_type_embedding"][et]}
            toks = jnp.asarray(model._tokens)
            score = lambda a, b: -jnp.sum(
                model._encode(a, glob, toks)
                * rel["edge_type_embedding"]
                * model._encode(b, glob, toks),
                axis=-1,
            )
            return float(score(src, dst).mean()), float(
                score(src, cdst).mean()
            )
        idx_pos = jnp.stack([src, dst, src, cdst])
        ent = {n: params[n][idx_pos] for n in model.ENTITY_KEYS}
        rel = {n: params[n][et] for n in model.REL_KEYS}
        glob = {n: params[n] for n in model.GLOBAL_KEYS}
        row = lambda i: {n: v[i] for n, v in ent.items()}
        pos = model._triple_distance(row(0), row(1), rel, glob)
        neg = model._triple_distance(row(2), row(3), rel, glob)
        return float(pos.mean()), float(neg.mean())

    result = model._fit_transform(GRAPH)
    # The public result gives shape guarantees; for the ranking check run
    # the training step directly so the learned tables are inspectable.
    params = model._init_params(GRAPH, key)
    step = jax.jit(lambda dg, p, k, lr: model._step(dg, p, k, lr))
    lr = jnp.float32(_TEST_LR.get(cls.model_name(), 0.1))
    for i in range(300):
        params, loss = step(dg, params, jax.random.fold_in(key, i), lr)
    pos, neg = mean_distances(params)
    assert np.isfinite(pos) and np.isfinite(neg)
    assert pos < neg, (cls.model_name(), pos, neg)

    emb = np.asarray(result.node_embeddings[0])
    assert emb.shape[0] == GRAPH.number_of_nodes
    assert np.isfinite(emb).all()


def test_dim_multiple_validation():
    with pytest.raises(ValueError, match="divisible"):
        RotatE(embedding_size=7)


def test_conve_small_dim_rejected():
    with pytest.raises(ValueError, match="3x3"):
        ConvE(embedding_size=4)


def test_nodepiece_tokenization():
    model = NodePiece(
        embedding_size=8, number_of_anchors=5, tokens_per_node=3
    )
    tokens = model._tokenize(GRAPH)
    assert tokens.shape == (GRAPH.number_of_nodes, 3)
    # anchors tokenize to themselves first (distance 0)
    anchors = np.argsort(-GRAPH.degrees, kind="stable")[:5]
    for a_i, a in enumerate(anchors):
        assert tokens[a, 0] == a_i
    # all tokens within [0, n_anchors] (padding id == n_anchors)
    assert tokens.min() >= 0 and tokens.max() <= 5


def test_kge_requires_edge_types():
    from embiggen_tpu.models.embedders import DistMult

    with pytest.raises(ValueError, match="edge types"):
        DistMult.into_smoke_test()._fit_transform(karate_club())


def test_models_dataframe_lists_kge_surface():
    from embiggen_tpu.models.registry import get_models_dataframe

    df = get_models_dataframe()
    names = set(df[df.task_name == "Node Embedding"].model_name)
    for expected in (
        "TransR", "TransD", "TransF", "RotatE", "ComplEx", "DistMult",
        "HolE", "ConvE", "BoxE", "CrossE", "DistMA", "ERMLP", "ERMLPE",
        "NodePiece", "PairRE", "ProjE", "QuatE", "RESCAL", "TorusE",
        "TuckER", "AutoSF",
    ):
        assert expected in names, expected
    kge_rows = df[df.model_name == "RotatE"]
    assert (kge_rows.requires_edge_types == True).all()  # noqa: E712
