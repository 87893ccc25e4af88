"""Experiment-result caching and the model-level evaluate() harness
(reference `abstract_classifier_model.py:2618-2680`,
`utils/pipeline.py:224-231`)."""
import os

import numpy as np
import pytest

from embiggen_tpu.models.edge_prediction import PerceptronEdgePrediction
from embiggen_tpu.pipelines import edge_prediction_evaluation


def test_model_level_evaluate(karate):
    model = PerceptronEdgePrediction(number_of_epochs=5, random_state=0)
    df = model.evaluate(karate, holdouts_number=2)
    assert len(df) == 2 * 2  # holdouts x {train, test}
    assert set(df["evaluation_mode"]) == {"train", "test"}
    assert {"auroc", "auprc", "fit_time", "holdout_number"} <= set(df.columns)
    assert (df["model_name"] == "Perceptron").all()


def test_evaluate_cache_roundtrip(karate, tmp_path):
    """Second evaluate() with the same key is served from disk: the fit
    counter must not advance, and the frames must match."""
    calls = {"n": 0}

    class CountingPerceptron(PerceptronEdgePrediction):
        def _fit(self, *args, **kwargs):
            calls["n"] += 1
            return super()._fit(*args, **kwargs)

    cache_dir = str(tmp_path / "cache")
    model = CountingPerceptron(number_of_epochs=5, random_state=0)
    df1 = model.evaluate(
        karate, holdouts_number=2, enable_cache=True, cache_dir=cache_dir
    )
    assert calls["n"] == 2
    # layout mirrors experiments/{task}/{graph}/{hash}.csv.gz
    found = []
    for root, _, files in os.walk(cache_dir):
        found.extend(os.path.join(root, f) for f in files)
    assert len(found) == 1
    assert "experiments" in found[0] and "Edge_Prediction" in found[0]
    assert found[0].endswith(".csv.gz")

    df2 = model.evaluate(
        karate, holdouts_number=2, enable_cache=True, cache_dir=cache_dir
    )
    assert calls["n"] == 2  # cache hit: no refit
    np.testing.assert_allclose(
        df1["auprc"].to_numpy(), df2["auprc"].to_numpy()
    )

    # Different hyperparameters miss the cache.
    model3 = CountingPerceptron(number_of_epochs=7, random_state=0)
    model3.evaluate(
        karate, holdouts_number=2, enable_cache=True, cache_dir=cache_dir
    )
    assert calls["n"] == 4


def test_cache_disabled_across_workers(karate, tmp_path):
    """With number_of_workers set, the top cache layer must be OFF — workers
    would race writing the same file (reference `utils/pipeline.py:224-231`)."""
    cache_dir = str(tmp_path / "wcache")
    model = PerceptronEdgePrediction(number_of_epochs=5, random_state=0)
    df = model.evaluate(
        karate, holdouts_number=2, enable_cache=True, cache_dir=cache_dir,
        number_of_workers=2, worker_id=0,
    )
    assert len(df) == 1 * 2  # this worker owns holdout 0 only
    assert not os.path.exists(cache_dir)


def test_pipeline_uses_cache(karate, tmp_path):
    cache_dir = str(tmp_path / "pcache")
    kwargs = dict(
        holdouts_number=2,
        models=["Perceptron"],
        graphs=karate,
        enable_cache=True,
        cache_dir=cache_dir,
        random_state=3,
    )
    df1 = edge_prediction_evaluation(**kwargs)
    df2 = edge_prediction_evaluation(**kwargs)
    np.testing.assert_allclose(
        df1["auprc"].to_numpy(), df2["auprc"].to_numpy()
    )
    # smoke_test disables caching entirely (reference pipeline.py:206)
    df3 = edge_prediction_evaluation(
        holdouts_number=1, models=["Perceptron"], graphs=karate,
        enable_cache=True, cache_dir=str(tmp_path / "scache"),
        smoke_test=True,
    )
    assert not os.path.exists(str(tmp_path / "scache"))
    assert len(df3) == 2
