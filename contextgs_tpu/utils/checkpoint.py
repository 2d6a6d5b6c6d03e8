"""Checkpoint serialization: pytrees → single pickle of numpy leaves.

Covers the reference's three channels (SURVEY.md §5.4): full training state
(capture/restore, ref gaussian_model.py:222-286), model snapshots, and the
bitstream directory handled by compression/codec.py.
"""

from __future__ import annotations

import pickle

import jax
import numpy as np


def save_pytree(path: str, tree) -> None:
    leaves, treedef = jax.tree.flatten(tree)
    with open(path, "wb") as f:
        pickle.dump({"leaves": [np.asarray(x) for x in leaves],
                     "treedef": str(treedef)}, f)


def load_pytree(path: str, like):
    """Load leaves saved by save_pytree into the structure of `like`."""
    with open(path, "rb") as f:
        data = pickle.load(f)
    leaves, treedef = jax.tree.flatten(like)
    if len(leaves) != len(data["leaves"]):
        raise ValueError(
            f"checkpoint has {len(data['leaves'])} leaves, expected {len(leaves)}")
    return jax.tree.unflatten(treedef, data["leaves"])
