"""Holdout evaluation pipelines — reference
`embiggen/utils/pipeline.py:108-244` (`classification_evaluation_pipeline`)
and the per-task facades (`edge_prediction_evaluation.py:12-44`, node/edge
label analogues), with the reference's per-holdout semantics
(`abstract_classifier_model.py:2398-2615`): split → re-fit holdout-biased
feature models ON THE TRAIN GRAPH → fit classifiers → metric rows tagged
with holdout / split / model metadata.

Experiment caching mirrors the reference's `@Cache` on `evaluate`
(`abstract_classifier_model.py:2618-2625`): one `experiments/{task}/{graph}/
{hash}.csv.gz` per (model, graph, schema, holdouts, features, kwargs) — and
the top cache layer is disabled when running under multiple workers so
round-robin workers never race on the same file (`utils/pipeline.py:224-231`).
"""
from __future__ import annotations

import contextlib
import hashlib
import os
import time
from typing import Any, Dict, List, Optional, Sequence, Union

import numpy as np

from ..graph.graph import Graph
from ..graph.loaders import get_dataset
from ..models.classifier import AbstractClassifierModel
from ..models.registry import get_model_from_library
from ..utils.cache import DEFAULT_CACHE_DIR

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


def _describe_features(features) -> str:
    """Stable content descriptor of a feature spec for the experiment-cache
    key (strings/models hash by parameters, arrays by content)."""
    if features is None:
        return "none"
    if not isinstance(features, (list, tuple)):
        features = [features]
    h = hashlib.sha256()
    for f in features:
        if isinstance(f, str):
            h.update(f.encode())
        elif hasattr(f, "consistent_hash"):
            h.update(f.consistent_hash().encode())
        elif hasattr(f, "to_numpy"):
            h.update(np.ascontiguousarray(f.to_numpy()).tobytes())
        else:
            h.update(np.ascontiguousarray(np.asarray(f)).tobytes())
    return h.hexdigest()[:32]


def experiment_cache_path(
    model: AbstractClassifierModel,
    graph: Graph,
    evaluation_schema: str,
    holdouts_number: int,
    random_state: int,
    features_key: str,
    evaluation_kwargs: Dict[str, Any],
    cache_dir: Optional[str] = None,
) -> str:
    """`experiments/{task}/{graph}/{hash}.csv.gz` (reference layout,
    `abstract_classifier_model.py:2618-2625`)."""
    h = hashlib.sha256()
    for part in (
        model.consistent_hash(), graph.consistent_hash(), evaluation_schema,
        holdouts_number, random_state, features_key,
        repr(sorted(evaluation_kwargs.items())),
    ):
        h.update(str(part).encode())
    return os.path.join(
        cache_dir or DEFAULT_CACHE_DIR,
        "experiments",
        model.task_name().replace(" ", "_"),
        graph.name.replace(" ", "_"),
        f"{h.hexdigest()[:32]}.csv.gz",
    )


class _HoldoutMemo:
    """Shares the (split, re-fitted features) work across models evaluated
    on the same graph/holdout."""

    def __init__(self, graph, evaluation_schema, random_state,
                 holdouts_kwargs, node_features):
        self.graph = graph
        self.schema = evaluation_schema
        self.random_state = random_state
        self.holdouts_kwargs = holdouts_kwargs
        self.node_features = node_features
        self._memo: Dict[int, Any] = {}

    def get(self, split_cls, holdout_number: int):
        if holdout_number not in self._memo:
            t_split = time.perf_counter()
            train, test = split_cls.split_graph_following_evaluation_schema(
                self.graph,
                self.schema,
                holdout_number,
                random_state=self.random_state,
                holdouts_kwargs=self.holdouts_kwargs,
            )
            split_time = time.perf_counter() - t_split
            t_feat = time.perf_counter()
            normalized = split_cls.normalize_node_features(
                train, self.node_features,
                skip_evaluation_biased_feature=True,
            )
            features = AbstractClassifierModel.fit_deferred_features(
                normalized, train
            )
            feature_time = time.perf_counter() - t_feat
            self._memo[holdout_number] = (
                train, test, features, split_time, feature_time
            )
        return self._memo[holdout_number]


def _align_subgraph(graph: Graph, subgraph: Graph) -> Graph:
    """Bring a subgraph of interest into `graph`'s node-id space.

    The reference remaps ids and re-aligns features when the subgraph has a
    different node dictionary (`abstract_classifier_model.py:2510-2535`);
    keeping the full graph's id space instead makes the intersection, the
    holdout features, and the restricted negative sampler all share one
    vocabulary with no remapping. Unknown node names raise."""
    g_names = graph.get_node_names()
    s_names = subgraph.get_node_names()
    if len(g_names) == len(s_names) and bool(
        np.all(np.asarray(g_names) == np.asarray(s_names))
    ):
        return subgraph
    ids = graph.get_node_ids_from_names(list(s_names)).astype(np.int64)
    return Graph.from_edge_arrays(
        ids[subgraph.sources],
        ids[subgraph.col_idx],
        n_nodes=graph.number_of_nodes,
        weights=subgraph.weights,
        edge_types=subgraph.edge_types,
        directed=True,
        directed_flag=subgraph.directed,
        name=subgraph.name,
        node_names=g_names,
        edge_type_names=subgraph.edge_type_names,
    )


def evaluate_model_on_graph(
    model: AbstractClassifierModel,
    graph: Graph,
    evaluation_schema: str,
    holdouts_number: int,
    memo: Optional[_HoldoutMemo] = None,
    node_features=None,
    node_type_features=None,
    edge_type_features=None,
    edge_features=None,
    random_state: int = 42,
    holdouts_kwargs: Optional[Dict[str, Any]] = None,
    number_of_workers: Optional[int] = None,
    worker_id: Optional[int] = None,
    enable_cache: bool = False,
    cache_dir: Optional[str] = None,
    profile_dir: Optional[str] = None,
    subgraph_of_interest: Optional[Graph] = None,
    use_subgraph_as_support: bool = False,
    **evaluation_kwargs,
):
    """The model-level holdout harness (reference
    `AbstractClassifierModel.evaluate`, `abstract_classifier_model.py:2626`):
    rows = holdouts × {train, test} [× unbalances] for ONE model on ONE
    graph, cached as a whole when `enable_cache`. With `profile_dir`, each
    holdout's fit runs under a JAX profiler trace (TensorBoard format).

    With `subgraph_of_interest`, every holdout's train/test is restricted to
    the subgraph's edge set (e.g. evaluate only disease-gene edges of a big
    KG); the model fits on the restricted train with the UNRESTRICTED train
    as support (unless `use_subgraph_as_support`), and for edge prediction
    the evaluation negatives are drawn from the subgraph's node/degree
    distribution — reference `abstract_classifier_model.py:2135,2405-2561`,
    `edge_prediction_model.py:138-141`."""
    import pandas as pd

    from ..parallel.distributed import holdout_belongs_to_this_worker
    from ..utils import profiling

    sub_aligned = (
        _align_subgraph(graph, subgraph_of_interest)
        if subgraph_of_interest is not None
        else None
    )
    # The top cache layer must be off across workers: they'd race writing
    # the same file (reference `utils/pipeline.py:224-231`).
    use_cache = enable_cache and number_of_workers is None
    path = None
    if use_cache:
        feat_key = "|".join(
            _describe_features(f)
            for f in (node_features, node_type_features,
                      edge_type_features, edge_features)
        )
        key_kwargs = dict(evaluation_kwargs)
        if sub_aligned is not None:
            key_kwargs["subgraph_of_interest"] = sub_aligned.consistent_hash()
            key_kwargs["use_subgraph_as_support"] = use_subgraph_as_support
        path = experiment_cache_path(
            model, graph, evaluation_schema, holdouts_number, random_state,
            feat_key, key_kwargs, cache_dir,
        )
        if os.path.exists(path):
            return pd.read_csv(path, compression="gzip")

    if memo is None:
        memo = _HoldoutMemo(
            graph, evaluation_schema, random_state, holdouts_kwargs,
            node_features,
        )
    meta = AbstractClassifierModel.run_metadata()
    all_rows: List[Dict[str, Any]] = []
    for holdout_number in range(holdouts_number):
        if not holdout_belongs_to_this_worker(
            holdout_number, number_of_workers, worker_id
        ):
            continue
        train, test, features, split_time, feature_time = memo.get(
            model, holdout_number
        )
        if sub_aligned is not None:
            train_oi = train & sub_aligned
            test_oi = test & sub_aligned
            if model.task_name() in (
                "Edge Prediction", "Edge Label Prediction"
            ):
                for part, part_name in (
                    (train_oi, "train"), (test_oi, "test")
                ):
                    if part.number_of_directed_edges == 0:
                        raise ValueError(
                            f"The {part_name} graph of holdout "
                            f"{holdout_number}, once restricted to the "
                            f"subgraph of interest "
                            f"{sub_aligned.name!r}, has no edges left — "
                            f"essential for a {model.task_name()} task "
                            "(reference "
                            "abstract_classifier_model.py:2541-2556)."
                        )
        else:
            train_oi, test_oi = train, test
        fit_support = (
            train_oi
            if (sub_aligned is not None and use_subgraph_as_support)
            else train
        )
        m = model.clone()
        if m.is_stochastic():
            m.set_random_state(random_state + holdout_number)
        t_fit = time.perf_counter()
        fit_ctx = (
            profiling.trace(os.path.join(profile_dir, f"holdout_{holdout_number}"))
            if profile_dir
            else contextlib.nullcontext()
        )
        with fit_ctx, profiling.annotate(f"fit:{m.model_name()}"):
            m.fit(
                train_oi, support=fit_support, node_features=features,
                node_type_features=node_type_features,
                edge_type_features=edge_type_features,
                edge_features=edge_features,
            )
        fit_time = time.perf_counter() - t_fit
        t_eval = time.perf_counter()
        rows = m._evaluate(
            graph,
            train_oi,
            test_oi,
            support=fit_support,
            random_state=random_state + holdout_number,
            subgraph_of_interest=sub_aligned,
            **evaluation_kwargs,
        )
        eval_time = time.perf_counter() - t_eval
        for row in rows:
            row.update(
                {
                    "task_name": m.task_name(),
                    "model_name": m.model_name(),
                    "library_name": m.library_name(),
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
    df = pd.DataFrame(all_rows)
    if use_cache:
        os.makedirs(os.path.dirname(path), exist_ok=True)
        df.to_csv(path, index=False, compression="gzip")
    return df


def classification_evaluation_pipeline(
    evaluation_schema: str,
    holdouts_number: int,
    graphs: Union[Graph, str, Sequence[Union[Graph, str]]],
    models,
    task_name: str,
    library_names: Optional[str] = None,
    node_features=None,
    node_type_features=None,
    edge_type_features=None,
    edge_features=None,
    smoke_test: bool = False,
    random_state: int = 42,
    holdouts_kwargs: Optional[Dict[str, Any]] = None,
    number_of_workers: Optional[int] = None,
    worker_id: Optional[int] = None,
    enable_cache: bool = False,
    cache_dir: Optional[str] = None,
    verbose: bool = True,
    **evaluation_kwargs,
):
    """Run every model on every graph over `holdouts_number` holdouts and
    return the tidy metric DataFrame. With number_of_workers set, holdouts
    are round-robin assigned across workers (the reference's SLURM-level
    parallelism, `abstract_classifier_model.py:2788-2804`). With
    `enable_cache` (and a single worker) each (model, graph) experiment is
    persisted and reloaded on re-runs."""
    import pandas as pd

    enable_cache = enable_cache and not smoke_test
    if not isinstance(graphs, (list, tuple)):
        graphs = [graphs]
    frames = []
    for graph in graphs:
        if isinstance(graph, str):
            graph = get_dataset(graph)
        models_resolved = _resolve_models(
            models, task_name, library_names, smoke_test
        )
        memo = _HoldoutMemo(
            graph, evaluation_schema, random_state, holdouts_kwargs,
            node_features,
        )
        for model in models_resolved:
            frames.append(
                evaluate_model_on_graph(
                    model,
                    graph,
                    evaluation_schema,
                    holdouts_number,
                    memo=memo,
                    node_features=node_features,
                    node_type_features=node_type_features,
                    edge_type_features=edge_type_features,
                    edge_features=edge_features,
                    random_state=random_state,
                    holdouts_kwargs=holdouts_kwargs,
                    number_of_workers=number_of_workers,
                    worker_id=worker_id,
                    enable_cache=enable_cache,
                    cache_dir=cache_dir,
                    **evaluation_kwargs,
                )
            )
    return pd.concat(frames, ignore_index=True) if frames else pd.DataFrame()


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
