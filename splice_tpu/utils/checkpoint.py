"""Checkpoint/resume via orbax (NEW capability: the reference never saves
generator weights — its only artifact is out/output.png, reference
util/util.py:55-59, SURVEY.md §5). Checkpoints hold the full train state
(generator params + optimizer state), enabling crash recovery and the video
warm-start workflow.
"""
from __future__ import annotations

import os
from typing import Any, Dict, Optional

import jax
import numpy as np


class Checkpointer:
    """Thin orbax wrapper with a numpy-npz fallback.

    Orbax is the TPU-native choice (async, sharding-aware); the fallback
    keeps checkpointing working in minimal environments.
    """

    def __init__(self, directory: str, max_to_keep: int = 3):
        self.directory = os.path.abspath(directory)
        os.makedirs(self.directory, exist_ok=True)
        self.max_to_keep = max_to_keep
        try:
            import orbax.checkpoint as ocp
            self._mgr = ocp.CheckpointManager(
                self.directory,
                options=ocp.CheckpointManagerOptions(
                    max_to_keep=max_to_keep, create=True),
            )
            self._ocp = ocp
        except Exception:
            self._mgr = None
            self._ocp = None

    def save(self, step: int, state: Dict[str, Any]) -> None:
        if self._mgr is not None:
            self._mgr.save(step, args=self._ocp.args.StandardSave(state))
            return
        # Name-keyed by key-path so restore matches leaves by name, not by
        # np.savez insertion order (which silently breaks if the state tree
        # gains/reorders a key between save and restore).
        leaves = jax.tree_util.tree_flatten_with_path(state)[0]
        named = {jax.tree_util.keystr(path): np.asarray(leaf)
                 for path, leaf in leaves}
        # Atomic write: a crash mid-save must never leave a truncated zip
        # at the final path — elastic recovery resumes from latest_step(),
        # and a bricked latest checkpoint would fail every relaunch.
        final = os.path.join(self.directory, f"ckpt_{step}.npz")
        tmp = final + ".tmp"
        with open(tmp, "wb") as f:
            np.savez(f, **named)
        os.replace(tmp, final)
        self._prune()

    def _prune(self) -> None:
        """Honor max_to_keep in the npz fallback (orbax prunes itself)."""
        steps = sorted(
            int(f[5:-4]) for f in os.listdir(self.directory)
            if f.startswith("ckpt_") and f.endswith(".npz"))
        for s in steps[:-self.max_to_keep] if self.max_to_keep > 0 else []:
            try:
                os.remove(os.path.join(self.directory, f"ckpt_{s}.npz"))
            except OSError:
                pass

    def wait(self) -> None:
        if self._mgr is not None:
            self._mgr.wait_until_finished()

    def latest_step(self) -> Optional[int]:
        if self._mgr is not None:
            return self._mgr.latest_step()
        steps = [int(f[5:-4]) for f in os.listdir(self.directory)
                 if f.startswith("ckpt_") and f.endswith(".npz")]
        return max(steps) if steps else None

    def restore(self, step: Optional[int] = None,
                template: Optional[Dict[str, Any]] = None) -> Dict[str, Any]:
        step = step if step is not None else self.latest_step()
        if step is None:
            raise FileNotFoundError(f"no checkpoints in {self.directory}")
        if self._mgr is not None:
            if template is not None:
                return self._mgr.restore(
                    step, args=self._ocp.args.StandardRestore(template))
            return self._mgr.restore(step)
        if template is None:
            raise ValueError(
                "the npz checkpoint fallback requires a `template` state "
                "tree to restore into (orbax can restore without one)")
        data = np.load(os.path.join(self.directory, f"ckpt_{step}.npz"))
        paths_leaves, treedef = jax.tree_util.tree_flatten_with_path(template)
        if set(data.files) == {f"arr_{i}" for i in range(len(data.files))}:
            # Legacy positional checkpoint (pre name-keyed format).
            leaves = [data[f"arr_{i}"] for i in range(len(data.files))]
            return jax.tree_util.tree_unflatten(treedef, leaves)
        leaves = []
        for path, leaf in paths_leaves:
            name = jax.tree_util.keystr(path)
            if name not in data:
                raise KeyError(
                    f"checkpoint ckpt_{step}.npz missing leaf {name!r}; "
                    f"has {sorted(data.files)[:8]}...")
            leaves.append(data[name])
        return jax.tree_util.tree_unflatten(treedef, leaves)
