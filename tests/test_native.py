"""Native C++ edge-list parser: equivalence with the pandas loader + speed."""
import os
import time

import numpy as np
import pytest

from embiggen_tpu.graph.loaders import from_csv

PPI = os.path.join(os.path.dirname(__file__), "data", "small_ppi.tsv")


def test_native_lib_builds():
    from embiggen_tpu import native

    assert native.get_lib() is not None, "native parser failed to compile"


def test_native_matches_pandas():
    g_native = from_csv(PPI, use_native_parser=True)
    g_pandas = from_csv(PPI, use_native_parser=False)
    assert g_native.number_of_nodes == g_pandas.number_of_nodes
    assert (
        g_native.number_of_directed_edges == g_pandas.number_of_directed_edges
    )
    # same edge set under name mapping
    names_n = g_native.get_node_names()
    names_p = g_pandas.get_node_names()
    assert set(names_n) == set(names_p)
    to_p = {n: i for i, n in enumerate(names_p)}
    remap = np.asarray([to_p[n] for n in names_n])
    src_n = remap[g_native.sources]
    dst_n = remap[g_native.col_idx]
    keys_n = np.sort(src_n.astype(np.int64) * len(names_p) + dst_n)
    keys_p = np.sort(
        g_pandas.sources.astype(np.int64) * len(names_p) + g_pandas.col_idx
    )
    np.testing.assert_array_equal(keys_n, keys_p)
    # weights follow edges
    eid = g_pandas.get_edge_ids(src_n[:50], dst_n[:50])
    np.testing.assert_allclose(
        g_native.weights[:50], g_pandas.weights[eid], rtol=1e-6
    )


def test_native_parser_speed(tmp_path):
    """Native parser should beat pandas on a ~200k-line file."""
    from embiggen_tpu import native

    if native.get_lib() is None:
        pytest.skip("no native lib")
    rng = np.random.default_rng(0)
    path = str(tmp_path / "big.tsv")
    n = 200_000
    with open(path, "w") as f:
        f.write("subject\tobject\tweight\n")
        src = rng.integers(0, 20_000, n)
        dst = rng.integers(0, 20_000, n)
        w = rng.random(n)
        for i in range(n):
            f.write(f"n{src[i]}\tn{dst[i]}\t{w[i]:.4f}\n")
    t0 = time.perf_counter()
    parsed = native.parse_edge_list(
        path, sep="\t", skip_header=True, src_col=0, dst_col=1, weight_col=2
    )
    t_native = time.perf_counter() - t0
    assert parsed is not None
    assert len(parsed[0]) == n
    import pandas as pd

    t0 = time.perf_counter()
    pd.read_csv(path, sep="\t")
    t_pandas = time.perf_counter() - t0
    assert t_native < t_pandas * 2, (t_native, t_pandas)


def test_native_random_walks_validity_and_pq():
    import numpy as np

    from embiggen_tpu.graph.generators import erdos_renyi
    from embiggen_tpu.native import native_random_walks

    g = erdos_renyi(500, 3000, seed=2)
    ci = np.asarray(g.col_idx)
    starts = np.arange(200, dtype=np.int32) % g.number_of_nodes
    w = native_random_walks(g.row_ptr, ci, starts, 16, seed=3)
    if w is None:  # no compiler in env
        return
    assert w.shape == (200, 16)
    for b in range(0, 200, 17):
        for t in range(1, 16):
            s, d = w[b, t - 1], w[b, t]
            nbrs = ci[g.row_ptr[s]: g.row_ptr[s + 1]]
            assert d in nbrs or (len(nbrs) == 0 and d == s)

    # p/q bias sanity: strong return weight must raise the immediate-return
    # rate far above the uniform walker's.
    big = np.repeat(starts, 40)
    w_ret = native_random_walks(
        g.row_ptr, ci, big, 16, return_weight=50.0, explore_weight=1.0,
        seed=5,
    )
    w_uni = native_random_walks(g.row_ptr, ci, big, 16, seed=5)

    def return_rate(walks):
        back = walks[:, 2:] == walks[:, :-2]
        return float(back.mean())

    assert return_rate(w_ret) > return_rate(w_uni) * 3


def test_native_arc_hash_and_sorts():
    """Native membership/sort kernels match numpy semantics exactly."""
    import numpy as np

    from embiggen_tpu import native

    if native.get_lib() is None:
        import pytest

        pytest.skip("native lib unavailable")
    rng = np.random.default_rng(3)
    keys = np.unique(rng.integers(0, 10**12, 5000).astype(np.int64))
    table = native.arc_hash_build(keys.astype(np.uint64))
    q = np.concatenate([keys[::3], rng.integers(0, 10**12, 4000)])
    np.testing.assert_array_equal(
        native.arc_hash_contains(table, q.astype(np.uint64)),
        np.isin(q, keys),
    )
    k2 = rng.integers(0, 10**13, 20000).astype(np.int64)
    order = native.radix_argsort(k2)
    np.testing.assert_array_equal(k2[order], np.sort(k2, kind="stable"))
    src = rng.integers(0, 500, 20000).astype(np.int64)
    dst = rng.integers(0, 500, 20000).astype(np.int64)
    np.testing.assert_array_equal(
        native.sort_pairs(src, dst, 500), np.lexsort((dst, src))
    )


def test_native_spanning_forest_matches_python(karate):
    import numpy as np

    from embiggen_tpu import native
    import embiggen_tpu.graph.holdouts as H

    if native.get_lib() is None:
        import pytest

        pytest.skip("native lib unavailable")
    mask_native = H.spanning_forest_arcs(karate, random_state=5)
    real = native.spanning_forest
    native.spanning_forest = lambda *a, **k: None
    try:
        mask_py = H.spanning_forest_arcs(karate, random_state=5)
    finally:
        native.spanning_forest = real
    np.testing.assert_array_equal(mask_native, mask_py)


def test_native_sort_unique_pairs():
    """Fused sort+first-occurrence extraction matches np.unique semantics:
    indices of the first occurrence of each distinct pair, in sorted pair
    order (the negative sampler's in-batch dedup)."""
    import numpy as np

    from embiggen_tpu import native

    if native.get_lib() is None:
        import pytest

        pytest.skip("native lib unavailable")
    rng = np.random.default_rng(11)
    n = 300
    src = rng.integers(0, n, 50000).astype(np.int64)
    dst = rng.integers(0, n, 50000).astype(np.int64)
    first = native.sort_unique_pairs(src, dst, n)
    key = src * n + dst
    uniq_keys, np_first = np.unique(key, return_index=True)
    np.testing.assert_array_equal(first, np_first)
    np.testing.assert_array_equal(key[first], uniq_keys)
