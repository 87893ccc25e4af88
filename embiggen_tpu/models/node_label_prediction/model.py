"""AbstractNodeLabelPredictionModel — reference
`embiggen/node_label_prediction/node_label_prediction_model.py:34-104`:
schemas {Stratified Monte Carlo, Stratified Kfold, Monte Carlo, Kfold},
multilabel + binary support, evaluation over known-label nodes per split.
"""
from __future__ import annotations

from typing import Any, Dict, List, Optional, Tuple

import numpy as np

from ...graph.graph import Graph
from ...graph.holdouts import node_label_holdout, node_label_kfold
from ..classifier import AbstractClassifierModel


class AbstractNodeLabelPredictionModel(AbstractClassifierModel):
    @classmethod
    def task_name(cls) -> str:
        return "Node Label Prediction"

    @classmethod
    def requires_node_types(cls) -> bool:
        return True

    @classmethod
    def get_available_evaluation_schemas(cls) -> List[str]:
        return [
            "Stratified Monte Carlo",
            "Stratified Kfold",
            "Monte Carlo",
            "Kfold",
        ]

    @classmethod
    def split_graph_following_evaluation_schema(
        cls,
        graph: Graph,
        evaluation_schema: str,
        holdout_number: int,
        random_state: int = 42,
        holdouts_kwargs: Optional[Dict[str, Any]] = None,
    ) -> Tuple[Graph, Graph]:
        kwargs = dict(holdouts_kwargs or {})
        schema = evaluation_schema.lower()
        stratified = "stratified" in schema
        seed = random_state + holdout_number
        if "monte carlo" in schema:
            return node_label_holdout(
                graph,
                train_size=kwargs.get("train_size", 0.8),
                random_state=seed,
                use_stratification=stratified,
            )
        if "kfold" in schema:
            return node_label_kfold(
                graph,
                k=kwargs.get("k", 10),
                holdout_number=holdout_number,
                random_state=random_state,
                use_stratification=stratified,
            )
        raise ValueError(
            f"Unknown evaluation schema {evaluation_schema!r}; available: "
            f"{cls.get_available_evaluation_schemas()}"
        )

    def _evaluate(
        self,
        graph: Graph,
        train: Graph,
        test: Graph,
        support: Optional[Graph] = None,
        random_state: int = 42,
        **kwargs,
    ) -> List[Dict[str, Any]]:
        rows = []
        proba_all = self.predict_proba(graph, support=support or train)
        multilabel = graph.has_multilabel_node_types()
        for split, g in (("train", train), ("test", test)):
            mask = g.get_known_node_types_mask()
            ids = np.nonzero(mask)[0]
            if len(ids) == 0:
                continue
            if multilabel:
                labels = graph.get_one_hot_encoded_node_types()[ids]
            else:
                labels = graph.get_single_label_node_type_ids()[ids]
            metrics = self.evaluate_prediction_probabilities(
                labels, proba_all[ids]
            )
            metrics.update(
                {"evaluation_mode": split, "number_of_nodes": len(ids)}
            )
            rows.append(metrics)
        return rows
