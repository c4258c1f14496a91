"""Orbax checkpoint backend (production-scale training checkpoints).

The msgpack format (serialization.save_native) is the default for merged
models and single-host training; this module adds Orbax for the cases that
need it at deployment scale: async saves that overlap training, multi-host
sharded checkpoints (each host writes its shards), and retention policies —
replacing the reference's synchronous torch.save-per-best-epoch
(submodel_trainer.py:703-715) with a non-blocking equivalent.
"""

from __future__ import annotations

import os
from typing import Any, Dict, Optional

import jax
import numpy as np


def _manager(directory: str, max_to_keep: int = 3):
    import orbax.checkpoint as ocp

    return ocp.CheckpointManager(
        os.path.abspath(directory),
        options=ocp.CheckpointManagerOptions(
            max_to_keep=max_to_keep,
            enable_async_checkpointing=True,
        ),
    )


class OrbaxCheckpointer:
    """Async step-indexed checkpoints with retention.

    Usage:
        ckpt = OrbaxCheckpointer("ckpts/orbax")
        ckpt.save(step, {"variables": ..., "opt_state": ...}, metadata)
        tree, meta = ckpt.restore()        # latest
        ckpt.wait()                        # block until async writes land
    """

    def __init__(self, directory: str, max_to_keep: int = 3):
        self._mgr = _manager(directory, max_to_keep)

    def save(self, step: int, tree: Any, metadata: Optional[Dict] = None) -> None:
        import orbax.checkpoint as ocp

        tree = jax.tree_util.tree_map(np.asarray, tree)
        args = {"tree": ocp.args.StandardSave(tree)}
        if metadata is not None:
            args["metadata"] = ocp.args.JsonSave(metadata)
        self._mgr.save(step, args=ocp.args.Composite(**args))

    def restore(self, step: Optional[int] = None):
        import orbax.checkpoint as ocp

        if step is None:
            step = self._mgr.latest_step()
            if step is None:
                raise FileNotFoundError("no orbax checkpoints found")
        restored = self._mgr.restore(
            step,
            args=ocp.args.Composite(
                tree=ocp.args.StandardRestore(),
                metadata=ocp.args.JsonRestore(),
            ),
        )
        meta = restored.get("metadata") if hasattr(restored, "get") else restored["metadata"]
        return restored["tree"], (meta or {})

    def latest_step(self) -> Optional[int]:
        return self._mgr.latest_step()

    def wait(self) -> None:
        self._mgr.wait_until_finished()

    def close(self) -> None:
        self.wait()
        self._mgr.close()
