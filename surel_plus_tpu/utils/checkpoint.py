"""Checkpointing: best-on-valid model + optimizer state + epoch.

Reference saves `{state_dict, optimizer, epoch}` as `.pth.tar` on early
stop and reloads for inference-only runs (utils.py:112-122,
main.py:221-228, 249-254). Here: orbax-backed pytree checkpoints carrying
params, optimizer state, epoch, and the PRNG key (the reference cannot
resume its sampler RNG; we persist it).
"""

from __future__ import annotations

import os
from typing import Any, Dict, Optional

import jax
import numpy as np


def _to_numpy_tree(tree):
    return jax.tree.map(lambda x: np.asarray(x), tree)


def save_checkpoint(state: Dict[str, Any], path: str) -> str:
    """Save a pytree dict to `path` (directory). Returns the path."""
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    ckptr = ocp.PyTreeCheckpointer()
    ckptr.save(path, _to_numpy_tree(state), force=True)
    return path


def load_checkpoint(path: str, target: Optional[Dict[str, Any]] = None
                    ) -> Dict[str, Any]:
    """Load a pytree dict; if `target` is given, restores with its
    structure/dtypes."""
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    ckptr = ocp.PyTreeCheckpointer()
    if target is not None:
        restore_args = jax.tree.map(
            lambda _: ocp.RestoreArgs(restore_type=np.ndarray), target)
        return ckptr.restore(path, item=target, restore_args=restore_args)
    return ckptr.restore(path)
