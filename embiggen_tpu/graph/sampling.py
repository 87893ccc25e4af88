"""Host-side negative-graph sampling for evaluation — replaces the reference
engine's `sample_negative_graph` (reference call site
`embiggen/edge_prediction/edge_prediction_model.py:119-187`): sample
non-existent edges, by default with **scale-free destination sampling**
(degree-proportional), rejecting false negatives against the support graph.
"""
from __future__ import annotations

from typing import Optional

import numpy as np

from .graph import Graph


_NEG_CACHE: "OrderedDict" = __import__("collections").OrderedDict()
_NEG_CACHE_SIZE = 4


def sample_negative_graph(
    graph: Graph,
    number_of_negative_samples: int,
    random_state: int = 42,
    use_scale_free_distribution: bool = True,
    support: Optional[Graph] = None,
    max_rounds: int = 64,
) -> Graph:
    """Sample a graph of `number_of_negative_samples` (canonical) non-edges.

    Sources uniform; destinations degree-proportional when
    `use_scale_free_distribution` (the reference default, with a loud warning
    otherwise — reference `edge_prediction_model.py:143-153`) so negative
    difficulty matches the positive degree distribution.

    Results are memoized in a small LRU keyed by graph CONTENT + seed: the
    draw is deterministic, and the evaluation harness asks every model for
    the same negative graphs of the same holdout (reference
    `edge_prediction_model.py:231-364` evaluates per model), so one sample
    serves them all.
    """
    cache_key = (
        graph.arcs_fingerprint,
        graph.directed,
        None if support is None or support is graph
        else support.arcs_fingerprint,
        int(number_of_negative_samples),
        int(random_state),
        bool(use_scale_free_distribution),
        int(max_rounds),
    )
    hit = _NEG_CACHE.get(cache_key)
    if hit is not None:
        _NEG_CACHE.move_to_end(cache_key)
        return hit
    result = _sample_negative_graph(
        graph, number_of_negative_samples, random_state,
        use_scale_free_distribution, support, max_rounds,
    )
    _NEG_CACHE[cache_key] = result
    while len(_NEG_CACHE) > _NEG_CACHE_SIZE:
        _NEG_CACHE.popitem(last=False)
    return result


def _sample_negative_graph(
    graph: Graph,
    number_of_negative_samples: int,
    random_state: int,
    use_scale_free_distribution: bool,
    support: Optional[Graph],
    max_rounds: int,
) -> Graph:
    support = support or graph
    rng = np.random.default_rng(random_state)
    n = graph.number_of_nodes
    # Degree-proportional node draws are the destinations of uniformly
    # random arcs — one integer draw + one gather per sample, replacing the
    # per-round `rng.choice(n, p=degrees/total)` whose O(n) CDF setup and
    # validation dominated at bench scale (VERDICT r3 item 4).
    # Arc SOURCES are out-degree-distributed (matching the old
    # degrees-weighted draw exactly, directed graphs included).
    # The distribution comes from the SAMPLED graph's arcs — `support`
    # only contributes the edges to avoid. The two differ when sampling
    # negatives restricted to a subgraph of interest
    # (`edge_prediction_model.py:138-141`: sampler_graph vs graph_to_avoid).
    arc_dst = graph.sources
    n_arcs = len(arc_dst)
    scale_free = use_scale_free_distribution and n_arcs > 0

    got_src: list = []
    got_dst: list = []
    # Sorted canonical keys of the pairs kept so far: top-up rounds reject
    # re-draws of already-kept pairs, so the returned edge set is globally
    # duplicate-free (rounds used to dedupe only within themselves).
    kept_keys: Optional[np.ndarray] = None
    needed = number_of_negative_samples
    # Adaptive oversampling: attrition (self-loops + existing edges +
    # in-batch duplicates) is graph-dependent — ~0.004% on the 1M-node
    # bench graph, where the old fixed 1.5x margin drew (and membership-
    # checked, sorted, deduped) 10M pairs it then threw away. Start near
    # 1x and size any top-up round from the measured survival rate.
    oversample = 1.05
    for _ in range(max_rounds):
        if needed <= 0:
            break
        batch = max(1024, int(needed * oversample) + 64)
        if scale_free:
            src = arc_dst[rng.integers(0, n_arcs, size=batch)].astype(
                np.int64
            )
            dst = arc_dst[rng.integers(0, n_arcs, size=batch)].astype(
                np.int64
            )
        else:
            src = rng.integers(0, n, size=batch)
            dst = rng.integers(0, n, size=batch)
        ok = src != dst
        ok &= ~support.has_edges_fast(src, dst)
        if not graph.directed and support.directed:
            # An undirected support stores both arc directions, so its
            # membership test is already symmetric — the reverse check is
            # only needed when avoiding a DIRECTED support's edges.
            ok &= ~support.has_edges_fast(dst, src)
        src, dst = src[ok], dst[ok]
        if not graph.directed:
            src, dst = np.minimum(src, dst), np.maximum(src, dst)
        key = src * np.int64(n) + dst
        if kept_keys is not None and len(kept_keys):
            pos = np.searchsorted(kept_keys, key)
            pos = np.minimum(pos, len(kept_keys) - 1)
            fresh = kept_keys[pos] != key
            src, dst, key = src[fresh], dst[fresh], key[fresh]
        # In-batch dedup: fused native counting-sort + first-occurrence
        # extraction (the numpy gather/compare/fancy-index pipeline cost
        # ~3.7 s per 27M pairs at bench scale).
        from .. import native

        first = native.sort_unique_pairs(src, dst, n)
        if first is None:
            _, first = np.unique(key, return_index=True)
        survival = len(first) / batch
        take = min(needed, len(first))
        first = first[:take]
        got_src.append(src[first])
        got_dst.append(dst[first])
        needed -= take
        if needed > 0:
            oversample = 1.1 / max(survival, 0.02)
            new_keys = key[first]  # already sorted (sorted-pair order)
            kept_keys = (
                new_keys if kept_keys is None
                else np.sort(np.concatenate([kept_keys, new_keys]))
            )
    src = np.concatenate(got_src) if got_src else np.zeros(0, dtype=np.int64)
    dst = np.concatenate(got_dst) if got_dst else np.zeros(0, dtype=np.int64)
    return Graph.from_edge_arrays(
        src,
        dst,
        n_nodes=n,
        directed=graph.directed,
        name=f"{graph.name}_negatives",
        node_names=graph.node_names,
    )


def sample_positive_graph(
    graph: Graph, number_of_samples: int, random_state: int = 42
) -> Graph:
    """Uniform subsample of existing canonical edges (reference
    `sample_positive_graph`)."""
    from .holdouts import _canonical_edges, _subgraph_from_canonical

    src, dst, idx = _canonical_edges(graph)
    rng = np.random.default_rng(random_state)
    keep = np.zeros(len(src), dtype=bool)
    sel = rng.choice(len(src), size=min(number_of_samples, len(src)), replace=False)
    keep[sel] = True
    return _subgraph_from_canonical(graph, keep, f"{graph.name}_pos_sample")
