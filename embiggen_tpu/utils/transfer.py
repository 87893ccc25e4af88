"""Device→host transfer helpers.

A single D2H stream through a remote-TPU tunnel caps at ~20-25 MB/s
(measured; PERF_NOTES §11), so pulling a [1M, 64] f32 embedding table
costs ~12 s. Slicing the leading axis across a small thread pool lifts
aggregate bandwidth to ~35 MB/s. On directly-attached hosts (PCIe) the
transfer is GB/s either way and this degrades gracefully to one copy per
slice.
"""
from __future__ import annotations

import numpy as np

_MIN_PARALLEL_BYTES = 32 << 20  # single np.asarray below 32 MB


def pull_to_host(arr, streams: int = 8) -> np.ndarray:
    """np.asarray(arr) with the leading axis pulled in parallel slices."""
    nbytes = int(getattr(arr, "nbytes", 0) or 0)
    ndim = int(getattr(arr, "ndim", 0) or 0)
    if (
        nbytes < _MIN_PARALLEL_BYTES
        or ndim == 0
        or arr.shape[0] < streams
        or isinstance(arr, np.ndarray)
    ):
        return np.asarray(arr)
    import concurrent.futures as cf

    n = arr.shape[0]
    c = -(-n // streams)
    parts = [arr[i * c:min((i + 1) * c, n)] for i in range(streams) if i * c < n]
    with cf.ThreadPoolExecutor(len(parts)) as ex:
        outs = list(ex.map(np.asarray, parts))
    return np.concatenate(outs, axis=0)
