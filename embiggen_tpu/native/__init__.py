"""Native (C++) host components, loaded via ctypes with lazy on-demand
compilation (g++ -O3). Falls back to the pure-Python paths when no compiler
is available."""
from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional, Tuple

import numpy as np

_HERE = os.path.dirname(__file__)
_LIB_PATH = os.path.join(_HERE, "libembiggen_native.so")
_lib = None


class _ParsedEdgeList(ctypes.Structure):
    _fields_ = [
        ("n_edges", ctypes.c_int64),
        ("n_nodes", ctypes.c_int64),
        ("n_edge_types", ctypes.c_int64),
        ("sources", ctypes.POINTER(ctypes.c_int32)),
        ("destinations", ctypes.POINTER(ctypes.c_int32)),
        ("weights", ctypes.POINTER(ctypes.c_float)),
        ("edge_types", ctypes.POINTER(ctypes.c_int32)),
        ("node_names", ctypes.c_char_p),
        ("node_names_len", ctypes.c_int64),
        ("edge_type_names", ctypes.c_char_p),
        ("edge_type_names_len", ctypes.c_int64),
        ("error", ctypes.c_char * 256),
    ]


def _build() -> bool:
    src = os.path.join(_HERE, "edge_list_parser.cpp")
    try:
        subprocess.run(
            [
                "g++", "-O3", "-march=native", "-shared", "-fPIC",
                "-std=c++17", src, "-o", _LIB_PATH,
            ],
            check=True,
            capture_output=True,
            timeout=120,
        )
        return True
    except Exception:
        return False


def get_lib() -> Optional[ctypes.CDLL]:
    global _lib
    if _lib is not None:
        return _lib
    if not os.path.exists(_LIB_PATH) or (
        os.path.getmtime(_LIB_PATH)
        < os.path.getmtime(os.path.join(_HERE, "edge_list_parser.cpp"))
    ):
        if not _build():
            return None
    try:
        lib = ctypes.CDLL(_LIB_PATH)
    except OSError:
        return None
    lib.parse_edge_list.restype = ctypes.POINTER(_ParsedEdgeList)
    lib.parse_edge_list.argtypes = [
        ctypes.c_char_p, ctypes.c_char, ctypes.c_int,
        ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
    ]
    lib.free_parsed_edge_list.argtypes = [ctypes.POINTER(_ParsedEdgeList)]
    _lib = lib
    return _lib


def parse_edge_list(
    path: str,
    sep: str = "\t",
    skip_header: bool = True,
    src_col: int = 0,
    dst_col: int = 1,
    weight_col: int = -1,
    type_col: int = -1,
):
    """Returns (src, dst, weights|None, edge_types|None, node_names,
    edge_type_names|None) or None when the native lib is unavailable."""
    lib = get_lib()
    if lib is None:
        return None
    ptr = lib.parse_edge_list(
        path.encode(), sep.encode(), int(skip_header),
        src_col, dst_col, weight_col, type_col,
    )
    try:
        p = ptr.contents
        if p.error and p.error != b"":
            raise IOError(p.error.decode())
        e = p.n_edges
        src = np.ctypeslib.as_array(p.sources, shape=(e,)).copy()
        dst = np.ctypeslib.as_array(p.destinations, shape=(e,)).copy()
        weights = (
            np.ctypeslib.as_array(p.weights, shape=(e,)).copy()
            if weight_col >= 0
            else None
        )
        edge_types = (
            np.ctypeslib.as_array(p.edge_types, shape=(e,)).copy()
            if type_col >= 0
            else None
        )
        node_names = np.asarray(
            ctypes.string_at(p.node_names, p.node_names_len)
            .decode()
            .split("\n")[:-1],
            dtype=object,
        )
        edge_type_names = (
            np.asarray(
                ctypes.string_at(p.edge_type_names, p.edge_type_names_len)
                .decode()
                .split("\n")[:-1],
                dtype=object,
            )
            if type_col >= 0
            else None
        )
        return src, dst, weights, edge_types, node_names, edge_type_names
    finally:
        lib.free_parsed_edge_list(ptr)
