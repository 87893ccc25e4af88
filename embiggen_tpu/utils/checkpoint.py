"""Mid-training step checkpointing — a capability the reference LACKS
(SURVEY.md §5.4: "No mid-training checkpointing anywhere"), added here via
orbax so long embedding/GCN runs on pods can resume.
"""
from __future__ import annotations

import os
from typing import Any, Optional


def save_pytree(path: str, pytree: Any) -> None:
    """Atomically save a jax pytree (orbax if available, else npz)."""
    path = os.path.abspath(path)
    try:
        import orbax.checkpoint as ocp

        ckptr = ocp.PyTreeCheckpointer()
        ckptr.save(path, pytree, force=True)
    except Exception:
        import numpy as np
        import jax

        leaves, treedef = jax.tree_util.tree_flatten(pytree)
        os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
        np.savez(
            path + ".npz",
            treedef=np.frombuffer(repr(treedef).encode(), dtype=np.uint8),
            **{f"leaf_{i}": np.asarray(l) for i, l in enumerate(leaves)},
        )


def load_pytree(path: str, like: Optional[Any] = None) -> Any:
    path = os.path.abspath(path)
    try:
        import orbax.checkpoint as ocp

        ckptr = ocp.PyTreeCheckpointer()
        return ckptr.restore(path, item=like)
    except Exception:
        import numpy as np
        import jax

        if like is None:
            raise
        data = np.load(path + ".npz")
        leaves = [
            data[f"leaf_{i}"]
            for i in range(len([k for k in data.files if k.startswith("leaf_")]))
        ]
        treedef = jax.tree_util.tree_structure(like)
        return jax.tree_util.tree_unflatten(treedef, leaves)
