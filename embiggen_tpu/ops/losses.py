"""Training losses for embedding models — replaces the reference's
`NoiseContrastiveEstimation` / `SampledSoftmax` TF layers
(`embiggen/layers/tensorflow/noise_contrastive_estimation.py:8-93`,
`sampled_softmax.py:9-97`) and the siamese margin loss
(`embiggen/embedders/tensorflow_embedders/siamese.py:149-168`).

All functions are pure jnp and differentiable; they operate on *gathered*
embedding rows so gradients stay sparse (the training loops scatter-add them
back into the tables).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def _softplus(x):
    return jax.nn.softplus(x)


def nce_loss(
    center: jnp.ndarray,        # [N, D]
    pos_context: jnp.ndarray,   # [N, P, D]
    pos_bias: jnp.ndarray,      # [N, P]
    neg_context: jnp.ndarray,   # [K, D] (shared across batch)
    neg_bias: jnp.ndarray,      # [K]
) -> jnp.ndarray:
    """Noise-contrastive estimation with shared negatives — exact
    `tf.nn.nce_loss` semantics with num_true=P: each positive carries a soft
    target of 1/P (TF divides the label mass across the true classes), so
    per-positive loss is softplus(l) - l/P; negatives have target 0.
    Verified bit-for-bit against TF in tests/test_tf_parity.py."""
    return nce_loss_per_sample(
        center, pos_context, pos_bias, neg_context, neg_bias
    ).mean()


def nce_loss_per_sample(
    center: jnp.ndarray,        # [N, D]
    pos_context: jnp.ndarray,   # [N, P, D]
    pos_bias: jnp.ndarray,      # [N, P]
    neg_context: jnp.ndarray,   # [K, D]
    neg_bias: jnp.ndarray,      # [K]
) -> jnp.ndarray:
    """[N] per-sample NCE losses (see `nce_loss`) — unreduced, so callers
    slicing the batch across devices can normalize by the FULL batch size
    and keep per-slice gradients summing to the single-chip gradients."""
    p = pos_context.shape[1]
    pos_logits = jnp.einsum("nd,npd->np", center, pos_context) + pos_bias
    neg_logits = center @ neg_context.T + neg_bias[None, :]  # [N, K]
    loss_pos = (_softplus(pos_logits) - pos_logits / p).sum(axis=1)
    loss_neg = _softplus(neg_logits).sum(axis=1)
    return loss_pos + loss_neg


def sampled_softmax_loss(
    hidden: jnp.ndarray,       # [N, D]
    true_emb: jnp.ndarray,     # [N, D]
    true_bias: jnp.ndarray,    # [N]
    neg_emb: jnp.ndarray,      # [K, D]
    neg_bias: jnp.ndarray,     # [K]
) -> jnp.ndarray:
    """Sampled softmax with one true class and K shared sampled classes
    (TF `tf.nn.sampled_softmax_loss` semantics)."""
    return sampled_softmax_loss_per_sample(
        hidden, true_emb, true_bias, neg_emb, neg_bias
    ).mean()


def sampled_softmax_loss_per_sample(
    hidden: jnp.ndarray,       # [N, D]
    true_emb: jnp.ndarray,     # [N, D]
    true_bias: jnp.ndarray,    # [N]
    neg_emb: jnp.ndarray,      # [K, D]
    neg_bias: jnp.ndarray,     # [K]
) -> jnp.ndarray:
    """[N] per-sample sampled-softmax losses (see `sampled_softmax_loss`)."""
    true_logit = jnp.sum(hidden * true_emb, axis=1) + true_bias      # [N]
    neg_logits = hidden @ neg_emb.T + neg_bias[None, :]              # [N, K]
    logits = jnp.concatenate([true_logit[:, None], neg_logits], axis=1)
    return -jax.nn.log_softmax(logits, axis=1)[:, 0]


def margin_loss(
    pos_distance: jnp.ndarray,  # [N]
    neg_distance: jnp.ndarray,  # [N]
    bias: float = 1.0,
) -> jnp.ndarray:
    """Siamese margin loss: ReLU(bias + d(pos) - d(neg)) (reference
    `siamese.py:149-168`; `relu_bias` is the margin)."""
    return jnp.maximum(bias + pos_distance - neg_distance, 0.0).mean()


def bce_logits_loss(
    logits: jnp.ndarray, labels: jnp.ndarray, weights: jnp.ndarray = None
) -> jnp.ndarray:
    """Sigmoid binary cross-entropy on logits (LINE / edge-prediction
    embedders, reference `edge_prediction_based_tensorflow_embedders.py:31-33`)."""
    per = _softplus(logits) - labels * logits
    if weights is not None:
        return (per * weights).sum() / jnp.maximum(weights.sum(), 1e-9)
    return per.mean()


def glove_loss(
    w: jnp.ndarray,           # [N, D] center rows
    c: jnp.ndarray,           # [N, D] context rows
    bw: jnp.ndarray,          # [N]
    bc: jnp.ndarray,          # [N]
    log_cooc: jnp.ndarray,    # [N]
    weight: jnp.ndarray,      # [N] f(X_ij)
) -> jnp.ndarray:
    """GloVe weighted least squares on co-occurrence entries."""
    pred = jnp.sum(w * c, axis=1) + bw + bc
    return (weight * (pred - log_cooc) ** 2).mean()


def l1_distance(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    return jnp.abs(a - b).sum(axis=-1)


def l2_distance(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    return jnp.sqrt(jnp.maximum(((a - b) ** 2).sum(axis=-1), 1e-12))


def squared_l2_distance(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    return ((a - b) ** 2).sum(axis=-1)
