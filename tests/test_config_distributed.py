"""normalize_kwargs coercion + worker-level holdout parallelism."""
import numpy as np
import pytest

from embiggen_tpu.parallel.distributed import holdout_belongs_to_this_worker
from embiggen_tpu.utils.normalize_kwargs import (
    normalize_kwargs,
    normalize_model_list_parameter,
)


def test_normalize_kwargs():
    out = normalize_kwargs(
        {
            "epochs": "30",
            "learning_rate": "0.01",
            "embedding_size": 100.0,
            "use_scale_free_distribution": "true",
            "max_neighbours": None,
            "unknown_param": object(),
        }
    )
    assert out["epochs"] == 30 and isinstance(out["epochs"], int)
    assert out["learning_rate"] == pytest.approx(0.01)
    assert out["embedding_size"] == 100
    assert out["use_scale_free_distribution"] is True
    assert out["max_neighbours"] is None
    with pytest.raises(ValueError, match="coerce"):
        normalize_kwargs({"epochs": "not-a-number"})


def test_normalize_model_list_parameter():
    assert normalize_model_list_parameter(128, 3) == [128, 128, 128]
    assert normalize_model_list_parameter([1, 2], 2) == [1, 2]
    with pytest.raises(ValueError):
        normalize_model_list_parameter([1, 2, 3], 2)


def test_holdout_round_robin():
    assigned = [
        h
        for h in range(10)
        if holdout_belongs_to_this_worker(h, number_of_workers=3, worker_id=1)
    ]
    assert assigned == [1, 4, 7]
    # all workers together cover every holdout exactly once
    cover = sorted(
        h
        for w in range(3)
        for h in range(10)
        if holdout_belongs_to_this_worker(h, 3, w)
    )
    assert cover == list(range(10))
    # single worker default: everything
    assert holdout_belongs_to_this_worker(5)


def test_pipeline_worker_filter(tmp_path):
    from embiggen_tpu import edge_prediction_evaluation
    from embiggen_tpu.graph import karate_club
    from embiggen_tpu.models.edge_prediction import PerceptronEdgePrediction

    df = edge_prediction_evaluation(
        holdouts_number=4,
        models=PerceptronEdgePrediction(
            edge_features=["Degree"], number_of_epochs=5, random_state=0
        ),
        graphs=karate_club(),
        evaluation_schema="Monte Carlo",
        random_state=3,
        number_of_workers=2,
        worker_id=0,
    )
    assert sorted(df["holdout_number"].unique()) == [0, 2]
