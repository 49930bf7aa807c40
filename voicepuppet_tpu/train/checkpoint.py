"""Orbax checkpointing.

Replaces tf.train.Saver cadence semantics (save every N steps, keep last K,
restore-latest-if-present; train_bfmnet.py:73-77, 94-96, 141-145) with an
orbax ``CheckpointManager`` over the train-state pytree.  Optimizer ``tx``
fields are non-pytree static members, so only array state is serialized.
"""

from __future__ import annotations

import os
from typing import Any, Optional

import jax
import numpy as np

import orbax.checkpoint as ocp


class CheckpointManager:
    def __init__(self, directory: str, max_to_keep: int = 10,
                 save_interval: int = 5000):
        self.directory = os.path.abspath(directory)
        os.makedirs(self.directory, exist_ok=True)
        self.save_interval = save_interval
        options = ocp.CheckpointManagerOptions(max_to_keep=max_to_keep,
                                               create=True)
        self._mgr = ocp.CheckpointManager(self.directory, options=options)

    def maybe_save(self, step: int, state: Any) -> bool:
        """Save iff at a save-interval boundary (ref: train_bfmnet.py:141)."""
        if step % self.save_interval != 0 or step == 0:
            return False
        self.save(step, state)
        return True

    def save(self, step: int, state: Any):
        arrays = jax.tree_util.tree_map(np.asarray, _array_state(state))
        self._mgr.save(step, args=ocp.args.StandardSave(arrays))
        self._mgr.wait_until_finished()

    def latest_step(self) -> Optional[int]:
        return self._mgr.latest_step()

    def restore(self, state: Any, step: Optional[int] = None) -> Any:
        """Restore array state into the (template) state pytree.  Returns the
        input unchanged when no checkpoint exists (ref:
        train_bfmnet.py:94-96 restores only if a checkpoint file exists)."""
        step = step if step is not None else self.latest_step()
        if step is None:
            return state
        template = jax.tree_util.tree_map(np.asarray, _array_state(state))
        restored = self._mgr.restore(
            step, args=ocp.args.StandardRestore(template))
        return _merge_array_state(state, restored)


def _array_state(state: Any) -> Any:
    """Strip static (non-array) fields: flax.struct dataclasses serialize
    only their pytree leaves."""
    return jax.tree_util.tree_map(lambda x: x, state)


def _merge_array_state(state: Any, arrays: Any) -> Any:
    leaves, treedef = jax.tree_util.tree_flatten(state)
    new_leaves = jax.tree_util.tree_leaves(arrays)
    assert len(leaves) == len(new_leaves)
    return jax.tree_util.tree_unflatten(treedef, new_leaves)
