"""Checkpoint save/load (orbax) with the reference's module-keyed layout.

The reference saves ``{module_name: state_dict, optimizer_*, epoch, step}``
every N steps and resumes schedulers via last_epoch (ref:logger.py:44-81,
ref:train.py:107-111,245-249,379-384).  Here a checkpoint is a pytree
``{"trainable": ..., "frozen": ..., "batch_stats": ..., "opt_state": ...,
"step": ...}`` plus metadata, written atomically by orbax; ``emergent``
saves on exceptions mirror Logger.__exit__ (ref:logger.py:86-89).
"""
from __future__ import annotations

import os
from typing import Any

import jax
import numpy as np

try:
    import orbax.checkpoint as ocp
    _HAVE_ORBAX = True
except ImportError:                                    # pragma: no cover
    _HAVE_ORBAX = False


class CheckpointManager:
    def __init__(self, directory: str, max_to_keep: int = 5):
        self.directory = os.path.abspath(directory)
        os.makedirs(self.directory, exist_ok=True)
        if _HAVE_ORBAX:
            self._mgr = ocp.CheckpointManager(
                self.directory,
                options=ocp.CheckpointManagerOptions(max_to_keep=max_to_keep))
        else:
            self._mgr = None
            self.max_to_keep = max_to_keep

    def save(self, step: int, state: Any, blocking: bool = True):
        """Save the train state.

        The device->host fetch is unavoidable (and is the dominant cost on
        a remote-attached chip: ~0.5 GB of params+opt state over a
        ~30 MB/s link), so it rides the concurrent fetch streams; with
        ``blocking=False`` the disk serialization then happens on orbax's
        background thread while training continues — the train loop only
        pays the fetch, and the next save (or ``wait()``/final save)
        fences the previous write."""
        tree = state_to_tree(state)
        leaves, treedef = jax.tree.flatten(tree)
        from eamm_tpu.utils.transfer import fetch_parallel
        tree = jax.tree.unflatten(treedef, fetch_parallel(leaves))
        if self._mgr is not None:
            # orbax requires the previous async save to be finished
            self._mgr.wait_until_finished()
            self._mgr.save(step, args=ocp.args.StandardSave(tree))
            if blocking:
                self._mgr.wait_until_finished()
        else:                                          # pragma: no cover
            np.save(os.path.join(self.directory, f"ckpt_{step}.npy"),
                    np.array([tree], dtype=object), allow_pickle=True)

    def wait(self):
        """Fence any in-flight background save."""
        if self._mgr is not None:
            self._mgr.wait_until_finished()

    def latest_step(self) -> int | None:
        if self._mgr is not None:
            return self._mgr.latest_step()
        steps = [int(f.split("_")[1].split(".")[0])
                 for f in os.listdir(self.directory) if f.startswith("ckpt_")]
        return max(steps) if steps else None           # pragma: no cover

    def restore(self, step: int | None = None, like: Any = None):
        step = self.latest_step() if step is None else step
        if step is None:
            return None
        if self._mgr is not None:
            if like is not None:
                ref = jax.tree.map(np.asarray, state_to_tree(like))
                tree = self._mgr.restore(
                    step, args=ocp.args.StandardRestore(ref))
            else:
                tree = self._mgr.restore(step)
            return tree
        return np.load(os.path.join(self.directory, f"ckpt_{step}.npy"),
                       allow_pickle=True)[0]           # pragma: no cover


def state_to_tree(state) -> dict:
    """NamedTuple train state -> plain dict tree (orbax-friendly)."""
    if hasattr(state, "_asdict"):
        return {k: state_to_tree(v) for k, v in state._asdict().items()}
    return state


def tree_to_state(tree: dict, state_cls, opt_state_like=None):
    """Rebuild a train-state NamedTuple from a restored tree; ``opt_state``
    keeps the restored pytree structure re-cast onto ``opt_state_like``."""
    kwargs = dict(tree)
    if opt_state_like is not None:
        flat_like = jax.tree.structure(opt_state_like)
        leaves = jax.tree.leaves(kwargs["opt_state"])
        kwargs["opt_state"] = jax.tree.unflatten(flat_like, leaves)
    return state_cls(**kwargs)
