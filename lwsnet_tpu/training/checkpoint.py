"""Checkpointing with the reference's metadata and best-only policy.

The reference saves three files per checkpoint — model state, optimizer
state, and a {epoch, lr, error, time_cost} metadata dict — and only when the
validation metric improves (reference: train.py:112-122, finetune.py:127-137);
resume restores all three (reference: train.py:82-105).

Two interchangeable storage backends behind one `CheckpointManager` API:

* **orbax** (preferred): a composite Orbax checkpoint, multi-host safe
  (every process participates in the save of sharded arrays).
* **msgpack**: flax.serialization single-file checkpoint + JSON metadata
  sidecar, zero dependencies beyond flax itself. Process-0-gated writes.

Backend selection (`backend="auto"`): orbax if it imports cleanly, else
msgpack. The probe runs `import orbax.checkpoint` in a *subprocess* first —
on a machine with a degraded package filesystem the import can die with
SIGBUS (unreadable mmap page), which no in-process try/except can contain.
Override with `LWSNET_CKPT_BACKEND=orbax|msgpack`.

Compatibility note: commit 68a62ab renamed model parameters (PreConvDW's
depthwise conv became the explicit param 'dw_kernel', shifting its pointwise
Conv's auto-number; BNReLUConv3D's 'Conv_0/kernel' became 'kernel';
RefinementHead's output conv became 'out_kernel'). Checkpoints written
before that commit do not load; none were ever published, so no migration
shim is provided — the param tree here is the v1 format going forward.
"""

from __future__ import annotations

import functools
import json
import os
import subprocess
import sys
from typing import Dict, Optional, Tuple

import jax

from lwsnet_tpu.training.state import TrainState

_META_DEFAULTS = {"epoch": 0.0, "lr": 0.0, "error": 0.0, "time_cost": 0.0}


@functools.lru_cache(maxsize=1)
def _orbax_importable() -> bool:
    """True if `import orbax.checkpoint` survives — probed in a subprocess
    because a failed mmap read during import raises SIGBUS, not ImportError."""
    try:
        r = subprocess.run(
            [sys.executable, "-c", "import orbax.checkpoint"],
            capture_output=True, timeout=120)
        return r.returncode == 0
    except Exception:
        return False


def _pick_backend(backend: str) -> str:
    backend = backend or "auto"
    env = os.environ.get("LWSNET_CKPT_BACKEND", "").strip().lower()
    if env in ("orbax", "msgpack"):
        backend = env
    if backend == "auto":
        backend = "orbax" if _orbax_importable() else "msgpack"
    assert backend in ("orbax", "msgpack"), backend
    return backend


class _OrbaxBackend:
    def __init__(self, path: str):
        import orbax.checkpoint as ocp
        self._ocp = ocp
        self._ckptr = ocp.StandardCheckpointer()
        self.path = path

    def exists(self) -> bool:
        return os.path.exists(self.path)

    def save(self, state: TrainState, metadata: Dict[str, float]) -> None:
        payload = {
            "state": jax.tree.map(lambda x: x, state),
            "metadata": {k: float(v) for k, v in metadata.items()},
        }
        self._ckptr.save(self.path, payload, force=True)
        self._ckptr.wait_until_finished()

    def restore(self, state_template: TrainState
                ) -> Tuple[TrainState, Dict[str, float]]:
        payload = self._ckptr.restore(
            self.path,
            {"state": state_template, "metadata": dict(_META_DEFAULTS)})
        return payload["state"], payload["metadata"]


class _MsgpackBackend:
    """flax.serialization msgpack file + `<path>.meta.json` sidecar.

    Writes are process-0 gated and atomic (tmp file + rename). Restoring
    sharded multi-host state re-creates fully-addressable host-local arrays;
    callers re-shard via their usual `jax.device_put` on the input sharding
    (the Trainer does this when it places the restored state).
    """

    def __init__(self, path: str):
        import flax.serialization as fs
        self._fs = fs
        self.path = path

    @property
    def _meta_path(self) -> str:
        return self.path + ".meta.json"

    def exists(self) -> bool:
        return os.path.exists(self.path)

    def save(self, state: TrainState, metadata: Dict[str, float]) -> None:
        if jax.process_index() != 0:
            return
        host_state = jax.tree.map(lambda x: jax.device_get(x), state)
        blob = self._fs.to_bytes(host_state)
        tmp = self.path + ".tmp"
        with open(tmp, "wb") as f:
            f.write(blob)
        os.replace(tmp, self.path)
        with open(self._meta_path + ".tmp", "w") as f:
            json.dump({k: float(v) for k, v in metadata.items()}, f)
        os.replace(self._meta_path + ".tmp", self._meta_path)

    def restore(self, state_template: TrainState
                ) -> Tuple[TrainState, Dict[str, float]]:
        with open(self.path, "rb") as f:
            state = self._fs.from_bytes(state_template, f.read())
        metadata = dict(_META_DEFAULTS)
        if os.path.exists(self._meta_path):
            with open(self._meta_path) as f:
                metadata.update(json.load(f))
        return state, metadata


class CheckpointManager:
    """Best-only checkpoint manager mirroring the reference's policy."""

    def __init__(self, directory: str, backend: str = "auto"):
        self.directory = os.path.abspath(directory)
        os.makedirs(self.directory, exist_ok=True)
        self.backend = _pick_backend(backend)
        cls = _OrbaxBackend if self.backend == "orbax" else _MsgpackBackend
        self._impl = cls(self.path)

    @property
    def path(self) -> str:
        return os.path.join(self.directory, "checkpoint")

    def save(self, state: TrainState, metadata: Dict[str, float],
             force: bool = False) -> None:
        """Save state + metadata, overwriting the previous best.

        Call from EVERY process in a multi-host job: the orbax backend's
        save is a collective (each host persists its addressable shards and
        process 0 commits the checkpoint); the msgpack backend gates on
        process 0 internally. Callers must NOT add their own
        process_index()==0 gate — that deadlocks the orbax path."""
        self._impl.save(state, metadata)

    def restore(self, state_template: TrainState
                ) -> Tuple[Optional[TrainState], Dict[str, float]]:
        """Restore into the template's structure; (None, {}) if absent."""
        if not self._impl.exists():
            return None, {}
        return self._impl.restore(state_template)

    def restore_params_only(self, state_template: TrainState
                            ) -> Optional[TrainState]:
        """Load pretrained params/batch_stats into a fresh state (the
        finetune bootstrap, reference: finetune.py:87-91)."""
        restored, _ = self.restore(state_template)
        if restored is None:
            return None
        return state_template.replace(params=restored.params,
                                      batch_stats=restored.batch_stats)
