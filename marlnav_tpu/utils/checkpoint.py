"""Orbax checkpointing of the full training state, with resume.

The reference only ever saves network weights — no optimizer or env state,
and no resume path exists (reference models.py:127-129; SURVEY.md §5).
Here the complete pytree (actor/critic params, both Adam states, the env
state including its PRNG key and episode counters, the outer repeat index)
checkpoints atomically per N rollouts, and ``restore`` resumes training
exactly where it stopped.  Host-side stats logs ride along as JSON.
"""

from __future__ import annotations

import json
import os
from typing import Any, Optional, Tuple

import jax

import orbax.checkpoint as ocp


class Checkpointer:
    """Thin wrapper over an Orbax ``CheckpointManager``.

    ``save``/``restore`` operate on an arbitrary device pytree plus an
    optional JSON-serializable host dict (the stats logs).
    """

    def __init__(self, directory: str, max_to_keep: int = 3,
                 save_interval: int = 1):
        self.directory = os.path.abspath(directory)
        self.save_interval = save_interval
        self._mgr = ocp.CheckpointManager(
            self.directory,
            options=ocp.CheckpointManagerOptions(
                max_to_keep=max_to_keep, create=True
            ),
        )

    def save(self, step: int, tree: Any, host_state: Optional[dict] = None,
             force: bool = False) -> bool:
        if not force and step % self.save_interval != 0:
            return False
        if step in self._mgr.all_steps():
            # Already persisted (e.g. the final forced save landing on an
            # interval step): report "not saved" instead of letting the
            # manager silently decline or error on the duplicate.
            return False
        args = {"tree": ocp.args.StandardSave(tree)}
        if host_state is not None:
            args["host"] = ocp.args.JsonSave(host_state)
        # Forward force so a forced save bypasses the manager's own
        # should_save policy too, not just the local interval check.
        saved = self._mgr.save(step, args=ocp.args.Composite(**args),
                               force=force)
        self._mgr.wait_until_finished()
        return saved

    def latest_step(self) -> Optional[int]:
        return self._mgr.latest_step()

    def restore(self, tree_template: Any,
                step: Optional[int] = None) -> Tuple[int, Any, Optional[dict]]:
        """Restore (step, tree, host_state).  ``tree_template`` is a matching
        abstract/concrete pytree (shapes + dtypes + shardings to restore to).
        """
        step = self._mgr.latest_step() if step is None else step
        if step is None:
            raise FileNotFoundError(f"no checkpoint under {self.directory}")
        abstract = jax.tree.map(ocp.utils.to_shape_dtype_struct, tree_template)
        restored = self._mgr.restore(
            step,
            args=ocp.args.Composite(
                tree=ocp.args.StandardRestore(abstract),
                host=ocp.args.JsonRestore(),
            ),
        )
        host = restored.get("host") if hasattr(restored, "get") else restored["host"]
        return step, restored["tree"], host

    def close(self) -> None:
        self._mgr.close()
