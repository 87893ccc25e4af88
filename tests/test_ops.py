"""SpMM/SDDMM, edge operators, metrics: numerical correctness."""
import numpy as np
import pytest

from embiggen_tpu.graph import karate_club, kernel_coo
from embiggen_tpu.ops.edge_ops import (
    EDGE_GCN_METHODS,
    EDGE_TRANSFORMER_METHODS,
    output_dim,
    resolve,
)
from embiggen_tpu.ops.metrics import (
    all_binary_metrics,
    binary_auprc,
    binary_auroc,
    multiclass_metrics,
)
from embiggen_tpu.ops.spmm import coo_to_device, sddmm, spmm


def test_spmm_matches_dense(karate):
    rng = np.random.default_rng(0)
    x = rng.normal(size=(34, 8)).astype(np.float32)
    rows, cols, vals = kernel_coo(karate, "Symmetric Normalized Laplacian")
    dense = np.zeros((34, 34), dtype=np.float64)
    dense[rows, cols] = vals
    for combiner in ("sum", "mean", "sqrtn"):
        out = np.asarray(
            spmm(*coo_to_device(rows, cols, vals), x, 34, combiner)
        )
        expected = dense @ x
        if combiner == "mean":
            expected = expected / np.abs(dense).sum(axis=1, keepdims=True)
        elif combiner == "sqrtn":
            expected = expected / np.sqrt((dense ** 2).sum(axis=1, keepdims=True))
        np.testing.assert_allclose(out, expected, rtol=1e-4, atol=1e-5)


def test_sddmm(karate):
    rng = np.random.default_rng(1)
    a = rng.normal(size=(34, 8)).astype(np.float32)
    b = rng.normal(size=(34, 8)).astype(np.float32)
    rows, cols, _ = kernel_coo(karate, "Left Normalized Laplacian")
    out = np.asarray(sddmm(rows.astype(np.int32), cols.astype(np.int32), a, b))
    expected = (a[rows] * b[cols]).sum(axis=1)
    np.testing.assert_allclose(out, expected, rtol=1e-4)


def test_edge_operators_match_reference_semantics():
    rng = np.random.default_rng(2)
    src = rng.normal(size=(10, 6)).astype(np.float32)
    dst = rng.normal(size=(10, 6)).astype(np.float32)
    cases = {
        "Hadamard": src * dst,
        "Sum": src + dst,
        "Average": (src + dst) / 2,
        "L1": src - dst,
        "AbsoluteL1": np.abs(src - dst),
        "SquaredL2": (src - dst) ** 2,
        "L2": np.abs(src - dst),
        "Concatenate": np.concatenate([src, dst], axis=1),
        "Min": np.minimum(src, dst),
        "Max": np.maximum(src, dst),
        "L2Distance": np.sqrt(((src - dst) ** 2).sum(1, keepdims=True)),
        "L1Norm": np.abs(src - dst).sum(1, keepdims=True),
        "L2Norm": np.sqrt(((src - dst) ** 2).sum(1, keepdims=True)),
    }
    for name, expected in cases.items():
        got = np.asarray(resolve(name)(src, dst))
        np.testing.assert_allclose(got, expected, rtol=1e-5, err_msg=name)
        assert got.shape[1] == output_dim(name, 6)
    cos = np.asarray(resolve("CosineSimilarity")(src, dst))
    expected = (src * dst).sum(1) / (
        np.linalg.norm(src, axis=1) * np.linalg.norm(dst, axis=1)
    )
    np.testing.assert_allclose(cos[:, 0], expected, rtol=1e-4)
    assert set(EDGE_GCN_METHODS) == {
        "Concatenate", "Average", "Hadamard", "Maximum", "Minimum",
        "Add", "Subtract", "L1", "L2", "Dot",
    }
    # Reference 12-method table + its L1Norm/L2Norm module helpers.
    assert len(EDGE_TRANSFORMER_METHODS) == 14


def test_auroc_auprc_match_sklearn():
    from sklearn import metrics as skm

    rng = np.random.default_rng(3)
    for _ in range(5):
        labels = rng.integers(0, 2, size=500).astype(bool)
        scores = rng.normal(size=500) + labels * rng.uniform(0, 2)
        # add ties
        scores = np.round(scores, 1)
        np.testing.assert_allclose(
            binary_auroc(labels, scores),
            skm.roc_auc_score(labels, scores),
            rtol=1e-10,
        )
        np.testing.assert_allclose(
            binary_auprc(labels, scores),
            skm.average_precision_score(labels, scores),
            rtol=1e-10,
        )


def test_all_binary_metrics():
    labels = np.array([1, 1, 1, 0, 0, 0, 0, 0])
    scores = np.array([0.9, 0.8, 0.3, 0.7, 0.2, 0.1, 0.4, 0.35])
    m = all_binary_metrics(labels, scores)
    assert m["true_positives"] == 2
    assert m["false_positives"] == 1
    assert m["false_negatives"] == 1
    assert m["true_negatives"] == 4
    assert 0 < m["auroc"] < 1
    from sklearn.metrics import matthews_corrcoef

    np.testing.assert_allclose(
        m["matthews_correlation_coefficient"],
        matthews_corrcoef(labels, scores > 0.5),
        rtol=1e-10,
    )


def test_multiclass_metrics():
    rng = np.random.default_rng(4)
    labels = rng.integers(0, 3, size=200)
    logits = rng.normal(size=(200, 3)) + np.eye(3)[labels] * 1.5
    probs = np.exp(logits) / np.exp(logits).sum(1, keepdims=True)
    m = multiclass_metrics(labels, probs)
    assert m["accuracy"] > 0.5
    assert 0.5 < m["auroc_macro_ovr"] <= 1.0
    # multilabel panel
    ml_labels = rng.integers(0, 2, size=(100, 4))
    ml_probs = np.clip(ml_labels * 0.6 + rng.uniform(0, 0.5, (100, 4)), 0, 1)
    m2 = multiclass_metrics(ml_labels, ml_probs, multilabel=True)
    assert "hamming_loss" in m2


def test_arc_sources_matches_searchsorted(karate):
    """device(with_sources=True) must give identical arc->source recovery
    to the searchsorted fallback, end to end through the samplers."""
    import jax
    import jax.numpy as jnp

    from embiggen_tpu.ops.negatives import (
        arc_sources,
        edge_chunk,
        edge_prediction_mini_batch,
    )

    kgraph = karate
    kdev = kgraph.device()
    dgs = kgraph.device(with_sources=True)
    assert dgs.sources is not None
    arcs = jnp.arange(kdev.n_arcs, dtype=jnp.int32)
    np.testing.assert_array_equal(
        np.asarray(arc_sources(kdev, arcs)),
        np.asarray(arc_sources(dgs, arcs)),
    )
    s1, d1 = edge_chunk(kdev, 0, 64)
    s2, d2 = edge_chunk(dgs, 0, 64)
    np.testing.assert_array_equal(np.asarray(s1), np.asarray(s2))
    np.testing.assert_array_equal(np.asarray(d1), np.asarray(d2))
    key = jax.random.PRNGKey(3)
    a = edge_prediction_mini_batch(kdev, key, 64)
    b = edge_prediction_mini_batch(dgs, key, 64)
    for x, y in zip(a, b):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))
