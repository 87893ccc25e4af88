"""Edge GCN with HyperSketching lazy edge features (the reference's
combinatorial-feature GCN pattern, `test_combinatorial_gcn_edge_prediction.py`)."""
import numpy as np
import pytest

from embiggen_tpu.graph import connected_holdout, karate_club, sample_negative_graph
from embiggen_tpu.models.edge_features import HyperSketching
from embiggen_tpu.models.gcn import KipfGCNEdgePrediction
from embiggen_tpu.ops.metrics import binary_auroc


def test_gcn_edge_prediction_with_sketch_features():
    karate = karate_club()
    train, test = connected_holdout(karate, train_size=0.8, random_state=0)
    model = KipfGCNEdgePrediction(
        units=[8], tower_units=[8], head_units=[8],
        epochs=60, learning_rate=0.05, batch_size=64,
        use_node_embedding=True, node_embedding_size=8, dropout_rate=0.1,
        edge_feature_models=[
            HyperSketching(number_of_hops=2, precision=6, random_state=0)
        ],
        random_state=0,
    )
    model.fit(train, support=train)
    neg = sample_negative_graph(karate, test.number_of_edges, random_state=1)
    pos_scores = model.predict_proba(test)
    neg_scores = model.predict_proba(neg)
    labels = np.concatenate(
        [np.ones(len(pos_scores)), np.zeros(len(neg_scores))]
    )
    auroc = binary_auroc(labels, np.concatenate([pos_scores, neg_scores]))
    assert np.isfinite(pos_scores).all()
    assert auroc > 0.6, auroc
