"""Holdout evaluation pipelines — reference
`embiggen/utils/pipeline.py:108-244` (`classification_evaluation_pipeline`)
and the per-task facades (`edge_prediction_evaluation.py:12-44`, node/edge
label analogues), with the reference's per-holdout semantics
(`abstract_classifier_model.py:2398-2615`): split → re-fit holdout-biased
feature models ON THE TRAIN GRAPH → fit classifiers → metric rows tagged
with holdout / split / model metadata.
"""
from __future__ import annotations

import time
from typing import Any, Dict, List, Optional, Sequence, Union

import numpy as np

from ..graph.graph import Graph
from ..graph.loaders import get_dataset
from ..models.classifier import AbstractClassifierModel
from ..models.registry import get_model_from_library

TASK_ABSTRACTS = {
    "Edge Prediction": "embiggen_tpu.models.edge_prediction.model",
    "Node Label Prediction": "embiggen_tpu.models.node_label_prediction.model",
    "Edge Label Prediction": "embiggen_tpu.models.edge_label_prediction.model",
}


def _resolve_models(
    models, task_name: str, library_name: Optional[str], smoke_test: bool
) -> List[AbstractClassifierModel]:
    if not isinstance(models, (list, tuple)):
        models = [models]
    out = []
    for m in models:
        if isinstance(m, str):
            cls = get_model_from_library(
                m, task_name=task_name, library_name=library_name
            )
            m = cls.into_smoke_test() if smoke_test else cls()
        elif isinstance(m, type):
            m = m.into_smoke_test() if smoke_test else m()
        out.append(m)
    return out


def classification_evaluation_pipeline(
    evaluation_schema: str,
    holdouts_number: int,
    graphs: Union[Graph, str, Sequence[Union[Graph, str]]],
    models,
    task_name: str,
    library_names: Optional[str] = None,
    node_features=None,
    smoke_test: bool = False,
    random_state: int = 42,
    holdouts_kwargs: Optional[Dict[str, Any]] = None,
    number_of_workers: Optional[int] = None,
    worker_id: Optional[int] = None,
    verbose: bool = True,
    **evaluation_kwargs,
):
    """Run every model on every graph over `holdouts_number` holdouts and
    return the tidy metric DataFrame. With number_of_workers set, holdouts
    are round-robin assigned across workers (the reference's SLURM-level
    parallelism, `abstract_classifier_model.py:2788-2804`)."""
    import pandas as pd

    from ..parallel.distributed import holdout_belongs_to_this_worker

    if not isinstance(graphs, (list, tuple)):
        graphs = [graphs]
    all_rows: List[Dict[str, Any]] = []
    for graph in graphs:
        if isinstance(graph, str):
            graph = get_dataset(graph)
        models_resolved = _resolve_models(
            models, task_name, library_names, smoke_test
        )
        meta = AbstractClassifierModel.run_metadata()
        for holdout_number in range(holdouts_number):
            if not holdout_belongs_to_this_worker(
                holdout_number, number_of_workers, worker_id
            ):
                continue
            split_cls = models_resolved[0]
            t_split = time.perf_counter()
            train, test = split_cls.split_graph_following_evaluation_schema(
                graph,
                evaluation_schema,
                holdout_number,
                random_state=random_state,
                holdouts_kwargs=holdouts_kwargs,
            )
            split_time = time.perf_counter() - t_split

            # Re-fit any feature models on the TRAIN graph only (deferred
            # holdout-bias semantics).
            t_feat = time.perf_counter()
            normalized = split_cls.normalize_node_features(
                train, node_features, skip_evaluation_biased_feature=True
            )
            holdout_features = AbstractClassifierModel.fit_deferred_features(
                normalized, train
            )
            feature_time = time.perf_counter() - t_feat

            for model in models_resolved:
                model = model.clone()
                if model.is_stochastic():
                    model.set_random_state(random_state + holdout_number)
                t_fit = time.perf_counter()
                model.fit(
                    train, support=train, node_features=holdout_features
                )
                fit_time = time.perf_counter() - t_fit
                t_eval = time.perf_counter()
                rows = model._evaluate(
                    graph,
                    train,
                    test,
                    support=train,
                    random_state=random_state + holdout_number,
                    **evaluation_kwargs,
                )
                eval_time = time.perf_counter() - t_eval
                for row in rows:
                    row.update(
                        {
                            "task_name": task_name,
                            "model_name": model.model_name(),
                            "library_name": model.library_name(),
                            "graph_name": graph.name,
                            "holdout_number": holdout_number,
                            "evaluation_schema": evaluation_schema,
                            "split_time": split_time,
                            "feature_time": feature_time,
                            "fit_time": fit_time,
                            "evaluation_time": eval_time,
                            **meta,
                        }
                    )
                all_rows.extend(rows)
    return pd.DataFrame(all_rows)


def edge_prediction_evaluation(
    holdouts_number: int,
    models,
    graphs,
    evaluation_schema: str = "Connected Monte Carlo",
    node_features=None,
    library_names: Optional[str] = None,
    smoke_test: bool = False,
    random_state: int = 42,
    holdouts_kwargs: Optional[Dict[str, Any]] = None,
    unbalance_rates: Sequence[float] = (1.0,),
    use_scale_free_distribution: bool = True,
    **kwargs,
):
    """Reference facade `edge_prediction_evaluation.py:12-44`."""
    return classification_evaluation_pipeline(
        evaluation_schema,
        holdouts_number,
        graphs,
        models,
        task_name="Edge Prediction",
        library_names=library_names,
        node_features=node_features,
        smoke_test=smoke_test,
        random_state=random_state,
        holdouts_kwargs=holdouts_kwargs,
        unbalance_rates=unbalance_rates,
        use_scale_free_distribution=use_scale_free_distribution,
        **kwargs,
    )


def node_label_prediction_evaluation(
    holdouts_number: int,
    models,
    graphs,
    evaluation_schema: str = "Stratified Monte Carlo",
    node_features=None,
    library_names: Optional[str] = None,
    smoke_test: bool = False,
    random_state: int = 42,
    holdouts_kwargs: Optional[Dict[str, Any]] = None,
    **kwargs,
):
    return classification_evaluation_pipeline(
        evaluation_schema,
        holdouts_number,
        graphs,
        models,
        task_name="Node Label Prediction",
        library_names=library_names,
        node_features=node_features,
        smoke_test=smoke_test,
        random_state=random_state,
        holdouts_kwargs=holdouts_kwargs,
        **kwargs,
    )


def edge_label_prediction_evaluation(
    holdouts_number: int,
    models,
    graphs,
    evaluation_schema: str = "Stratified Monte Carlo",
    node_features=None,
    library_names: Optional[str] = None,
    smoke_test: bool = False,
    random_state: int = 42,
    holdouts_kwargs: Optional[Dict[str, Any]] = None,
    **kwargs,
):
    return classification_evaluation_pipeline(
        evaluation_schema,
        holdouts_number,
        graphs,
        models,
        task_name="Edge Label Prediction",
        library_names=library_names,
        node_features=node_features,
        smoke_test=smoke_test,
        random_state=random_state,
        holdouts_kwargs=holdouts_kwargs,
        **kwargs,
    )
