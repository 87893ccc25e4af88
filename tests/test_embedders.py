"""Walk-based embedders: end-to-end training + embedding quality checks."""
import numpy as np
import pytest

from embiggen_tpu.graph import karate_club
from embiggen_tpu.models.embedders import CBOW, DeepWalkSkipGram, SkipGram


def _community_separation(emb, labels):
    """Mean cosine similarity within communities minus across communities."""
    emb = np.asarray(emb, dtype=np.float64)
    emb = emb / np.maximum(np.linalg.norm(emb, axis=1, keepdims=True), 1e-9)
    sim = emb @ emb.T
    same = labels[:, None] == labels[None, :]
    off_diag = ~np.eye(len(labels), dtype=bool)
    return sim[same & off_diag].mean() - sim[~same].mean()


@pytest.fixture(scope="module")
def karate():
    return karate_club()


@pytest.fixture(scope="module")
def labels(karate):
    return karate.get_single_label_node_type_ids()


def test_skipgram_trains_and_separates(karate, labels):
    model = SkipGram(
        embedding_size=16, epochs=120, batch_size=8, walk_length=20,
        window_size=4, iterations=4, learning_rate=0.05,
        learning_rate_decay=0.99, random_state=42,
    )
    result = model.fit_transform(karate)
    emb = result.get_node_embedding_from_index(0)
    assert emb.shape == (34, 16)
    assert np.isfinite(emb).all()
    sep = _community_separation(emb, labels)
    assert sep > 0.1, f"community separation too weak: {sep}"
    # loss decreased to something sane
    assert model._last_loss is not None and np.isfinite(model._last_loss)


def test_cbow_trains_and_separates(karate, labels):
    model = CBOW(
        embedding_size=16, epochs=60, batch_size=8, walk_length=20,
        window_size=4, iterations=4, learning_rate=0.05,
        learning_rate_decay=0.99, random_state=42,
    )
    result = model.fit_transform(karate)
    emb = result.get_node_embedding_from_index(0)
    assert emb.shape == (34, 16)
    sep = _community_separation(emb, labels)
    assert sep > 0.1, f"community separation too weak: {sep}"


def test_deepwalk_preset(karate):
    model = DeepWalkSkipGram(
        embedding_size=8, epochs=1, batch_size=16, walk_length=10,
        window_size=2, random_state=1,
    )
    params = model.parameters()
    assert "return_weight" not in params
    with pytest.raises(ValueError):
        DeepWalkSkipGram(return_weight=2.0, random_state=1)
    result = model.fit_transform(karate)
    assert result.get_node_embedding_from_index(0).shape == (34, 8)


def test_smoke_test_params(karate):
    model = SkipGram.into_smoke_test(random_state=3)
    result = model.fit_transform(karate)
    assert result.get_node_embedding_from_index(0).shape == (34, 5)


def test_reproducibility(karate):
    kwargs = dict(
        embedding_size=8, epochs=2, batch_size=16, walk_length=12,
        window_size=2, random_state=7,
    )
    e1 = SkipGram(**kwargs).fit_transform(karate).get_node_embedding_from_index(0)
    e2 = SkipGram(**kwargs).fit_transform(karate).get_node_embedding_from_index(0)
    np.testing.assert_array_equal(np.asarray(e1), np.asarray(e2))


def test_return_dataframe(karate):
    model = SkipGram.into_smoke_test(random_state=3)
    result = model.fit_transform(karate, return_dataframe=True)
    df = result.get_node_embedding_from_index(0)
    assert hasattr(df, "loc")
    assert df.shape == (34, 5)


def test_model_recreation(karate):
    model = SkipGram(embedding_size=8, epochs=2, random_state=5, walk_length=12)
    clone = SkipGram(**model.parameters())
    assert clone.consistent_hash() == model.consistent_hash()


def test_registry_resolution():
    from embiggen_tpu.models import get_model_from_library

    cls = get_model_from_library("Node2Vec SkipGram")
    assert cls is SkipGram
    cls = get_model_from_library("deepwalk cbow")
    assert cls.model_name() == "DeepWalk CBOW"
    with pytest.raises(ValueError):
        get_model_from_library("No Such Model")
