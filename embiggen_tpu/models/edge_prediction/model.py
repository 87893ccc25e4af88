"""AbstractEdgePredictionModel — task machinery mirroring reference
`embiggen/edge_prediction/edge_prediction_model.py`: evaluation schemas
(Connected Monte Carlo / Monte Carlo / Kfold, `:36-117`), negative evaluation
graphs with scale-free destinations by default (`:119-187`), per-unbalance
train/test evaluation rows (`:231-364`), and bipartite/clique batch
prediction helpers (`:457-1875`).
"""
from __future__ import annotations

import warnings
from typing import Any, Dict, List, Optional, Sequence, Tuple

import numpy as np

from ...graph.graph import Graph
from ...graph.holdouts import (
    connected_holdout,
    edge_prediction_kfold,
    random_holdout,
)
from ...graph.sampling import sample_negative_graph
from ..classifier import AbstractClassifierModel


class AbstractEdgePredictionModel(AbstractClassifierModel):
    """Binary link prediction."""

    @classmethod
    def task_name(cls) -> str:
        return "Edge Prediction"

    def is_binary_prediction_task(self) -> bool:
        return True

    # ------------------------------------------------------------- schemas
    @classmethod
    def get_available_evaluation_schemas(cls) -> List[str]:
        return ["Connected Monte Carlo", "Monte Carlo", "Kfold"]

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
        seed = random_state + holdout_number
        schema = evaluation_schema.lower()
        if schema == "connected monte carlo":
            return connected_holdout(
                graph, random_state=seed,
                train_size=kwargs.get("train_size", 0.8),
            )
        if schema == "monte carlo":
            return random_holdout(
                graph, random_state=seed,
                train_size=kwargs.get("train_size", 0.8),
            )
        if schema == "kfold":
            return edge_prediction_kfold(
                graph, k=kwargs.get("k", 10),
                holdout_number=holdout_number, random_state=random_state,
            )
        raise ValueError(
            f"Unknown evaluation schema {evaluation_schema!r}; available: "
            f"{cls.get_available_evaluation_schemas()}"
        )

    # ------------------------------------------------------------ evaluation
    def _evaluate(
        self,
        graph: Graph,
        train: Graph,
        test: Graph,
        support: Optional[Graph] = None,
        unbalance_rates: Sequence[float] = (1.0,),
        use_scale_free_distribution: bool = True,
        random_state: int = 42,
        **kwargs,
    ) -> List[Dict[str, Any]]:
        """Rows = {train, test} × unbalance rates with the full binary panel
        (reference `edge_prediction_model.py:231-364`)."""
        if not use_scale_free_distribution:
            warnings.warn(
                "Using uniform negative sampling for evaluation; the model "
                "was likely trained with scale-free negatives — metrics will "
                "look optimistic (reference warning, "
                "edge_prediction_model.py:143-153)."
            )
        support = support or train
        rows = []
        train_scores = self.predict_proba(train, support=support)
        test_scores = self.predict_proba(test, support=support)
        for unbalance in unbalance_rates:
            for split, pos_scores, pos_graph, seed_off in (
                ("train", train_scores, train, 0),
                ("test", test_scores, test, 1),
            ):
                n_neg = max(1, int(round(pos_graph.number_of_edges * unbalance)))
                neg = sample_negative_graph(
                    graph,
                    number_of_negative_samples=n_neg,
                    random_state=random_state + seed_off,
                    use_scale_free_distribution=use_scale_free_distribution,
                    support=graph,
                )
                neg_scores = self.predict_proba(neg, support=support)
                labels = np.concatenate(
                    [np.ones(len(pos_scores)), np.zeros(len(neg_scores))]
                )
                scores = np.concatenate([pos_scores, neg_scores])
                metrics = self.evaluate_prediction_probabilities(labels, scores)
                metrics.update(
                    {
                        "evaluation_mode": split,
                        "unbalance_rate": unbalance,
                        "size_of_positive_set": len(pos_scores),
                        "size_of_negative_set": len(neg_scores),
                    }
                )
                rows.append(metrics)
        return rows

    # ----------------------------------------------- candidate-set prediction
    def predict_proba_bipartite_graph_from_edge_node_ids(
        self,
        source_node_ids: np.ndarray,
        destination_node_ids: np.ndarray,
        support: Optional[Graph] = None,
    ) -> np.ndarray:
        """[|S|, |D|] probabilities for the full bipartite candidate set
        (reference `edge_prediction_model.py:1226`)."""
        src = np.repeat(
            np.asarray(source_node_ids), len(destination_node_ids)
        )
        dst = np.tile(np.asarray(destination_node_ids), len(source_node_ids))
        scores = self.predict_proba_from_edge_node_ids(src, dst)
        return scores.reshape(len(source_node_ids), len(destination_node_ids))

    def predict_proba_bipartite_graph_from_edge_node_names(
        self, graph: Graph, source_node_names, destination_node_names,
    ) -> np.ndarray:
        return self.predict_proba_bipartite_graph_from_edge_node_ids(
            graph.get_node_ids_from_names(source_node_names),
            graph.get_node_ids_from_names(destination_node_names),
        )

    def predict_proba_clique_graph_from_node_ids(
        self, node_ids: np.ndarray
    ) -> np.ndarray:
        """[k, k] probabilities over the clique of the given nodes (reference
        clique helpers, `edge_prediction_model.py:457-1875`)."""
        return self.predict_proba_bipartite_graph_from_edge_node_ids(
            node_ids, node_ids
        )

    def predict_proba_clique_graph_from_node_names(
        self, graph: Graph, node_names
    ) -> np.ndarray:
        ids = graph.get_node_ids_from_names(node_names)
        return self.predict_proba_clique_graph_from_node_ids(ids)

    def predict_proba_from_edge_node_ids(
        self, src: np.ndarray, dst: np.ndarray
    ) -> np.ndarray:
        raise NotImplementedError(
            f"{type(self).__name__} does not implement arbitrary-pair "
            "prediction."
        )
