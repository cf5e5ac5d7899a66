"""Orbax checkpointing with the reference's metadata and best-only policy.

The reference saves three files per checkpoint — model state, optimizer
state, and a {epoch, lr, error, time_cost} metadata dict — and only when the
validation metric improves (reference: train.py:112-122, finetune.py:127-137);
resume restores all three (reference: train.py:82-105). Here a single Orbax
composite checkpoint holds the same information, multi-host safe (only
process 0 writes; all processes restore).
"""

from __future__ import annotations

import os
from typing import Any, Dict, Optional, Tuple

import jax
import orbax.checkpoint as ocp

from lwsnet_tpu.training.state import TrainState


class CheckpointManager:
    """Best-only checkpoint manager mirroring the reference's policy."""

    def __init__(self, directory: str):
        self.directory = os.path.abspath(directory)
        os.makedirs(self.directory, exist_ok=True)
        self._ckptr = ocp.StandardCheckpointer()

    @property
    def path(self) -> str:
        return os.path.join(self.directory, "checkpoint")

    def save(self, state: TrainState, metadata: Dict[str, float],
             force: bool = False) -> None:
        """Save state + metadata, overwriting the previous best."""
        payload = {
            "state": jax.tree.map(lambda x: x, state),
            "metadata": {k: float(v) for k, v in metadata.items()},
        }
        self._ckptr.save(self.path, payload, force=True)
        self._ckptr.wait_until_finished()

    def restore(self, state_template: TrainState
                ) -> Tuple[Optional[TrainState], Dict[str, float]]:
        """Restore into the template's structure; (None, {}) if absent."""
        if not os.path.exists(self.path):
            return None, {}
        payload = self._ckptr.restore(
            self.path,
            {"state": state_template,
             "metadata": {"epoch": 0.0, "lr": 0.0, "error": 0.0,
                          "time_cost": 0.0}},
        )
        return payload["state"], payload["metadata"]

    def restore_params_only(self, state_template: TrainState
                            ) -> Optional[TrainState]:
        """Load pretrained params/batch_stats into a fresh state (the
        finetune bootstrap, reference: finetune.py:87-91)."""
        restored, _ = self.restore(state_template)
        if restored is None:
            return None
        return state_template.replace(params=restored.params,
                                      batch_stats=restored.batch_stats)
