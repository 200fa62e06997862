"""Checkpoint / resume for SLAM state via orbax (SURVEY.md §5).

Reference counterpart: none — the reference's only resume point is its
append-only poses file. Here the full SLAM state {pose graph, keyframe
payloads, frame anchors} is checkpointed every cfg.slam.checkpoint_every
keyframes and `--resume` re-enters at the last checkpoint.
"""

from __future__ import annotations

from pathlib import Path

import jax
import numpy as np


def _to_pytree(state: dict):
    return jax.tree.map(np.asarray, state)


def save_checkpoint(path: str | Path, state: dict, step: int) -> None:
    import orbax.checkpoint as ocp

    path = Path(path).absolute()
    path.mkdir(parents=True, exist_ok=True)
    with ocp.CheckpointManager(path) as mgr:
        mgr.save(step, args=ocp.args.StandardSave(_to_pytree(state)))
        mgr.wait_until_finished()


def latest_checkpoint(path: str | Path):
    """Return (step, state) of the newest checkpoint, or (None, None)."""
    import orbax.checkpoint as ocp

    path = Path(path).absolute()
    if not path.exists():
        return None, None
    with ocp.CheckpointManager(path) as mgr:
        step = mgr.latest_step()
        if step is None:
            return None, None
        state = mgr.restore(step)
        return step, state
