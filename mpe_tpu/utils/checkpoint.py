"""Checkpoint / resume.

The reference has no serialization at all — world state lives in mutable
Python object attributes (reference core.py:82-99), so an experiment
cannot be snapshotted. Here the whole simulation state is an explicit
pytree (``WorldState`` leaves + RNG key + step counter), which makes
checkpointing trivial and exact: save the arrays, reload them, and the
rollout continues bit-identically (SURVEY.md §5 "resume-for-free").

Format: a single ``.npz`` with flattened pytree leaves plus a tiny JSON
sidecar of the treedef/metadata, readable with plain numpy — no
framework lock-in. (orbax is available in this image but is overkill for
kilobyte-scale env state; swap in ``orbax.checkpoint`` if sharded
multi-host snapshots of huge batches are ever needed.)
"""

from __future__ import annotations

import json
import os

import numpy as np
import jax


def _norm_path(path: str) -> str:
    # np.savez silently appends ".npz" when the extension is missing;
    # normalize in both directions so save("/tmp/p") / load("/tmp/p") agree.
    return path if path.endswith(".npz") else path + ".npz"


def save_checkpoint(path: str, state, key=None, step: int | None = None,
                    extra: dict | None = None) -> None:
    """Snapshot (state pytree, RNG key, step count) to ``path`` (.npz)."""
    path = _norm_path(path)
    payload = {"state": state}
    if key is not None:
        payload["key"] = key
    leaves, treedef = jax.tree.flatten(payload)
    arrays = {f"leaf_{i}": np.asarray(x) for i, x in enumerate(leaves)}
    meta = {
        "treedef": str(treedef),
        "n_leaves": len(leaves),
        "step": step,
        "extra": extra or {},
    }
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    np.savez(path, __meta__=json.dumps(meta), **arrays)


def load_checkpoint(path: str, like) -> tuple:
    """Load a snapshot.

    ``like`` is a pytree with the same structure as the saved
    ``{"state": ..., ["key": ...]}`` payload (e.g. a freshly-reset state);
    its treedef is used to unflatten. Returns ``(payload, step, extra)``
    where payload mirrors the save-time dict.
    """
    with np.load(_norm_path(path), allow_pickle=False) as z:
        meta = json.loads(str(z["__meta__"]))
        leaves = [z[f"leaf_{i}"] for i in range(meta["n_leaves"])]
    treedef = jax.tree.structure(like)
    assert treedef.num_leaves == meta["n_leaves"], (
        f"checkpoint has {meta['n_leaves']} leaves, template has "
        f"{treedef.num_leaves}")
    # equal leaf counts are not enough: a renamed/reordered field keeps
    # the count while flatten order changes, silently misassigning
    # arrays — compare the full saved structure
    if meta["treedef"] != str(treedef):
        raise ValueError(
            "checkpoint structure mismatch:\n"
            f"  saved:    {meta['treedef']}\n"
            f"  template: {treedef}")
    payload = jax.tree.unflatten(treedef, leaves)
    return payload, meta["step"], meta["extra"]


# ---------------------------------------------------------------------------
# training-state snapshots (params + optimizer + replay + env states)
# ---------------------------------------------------------------------------

def save_train_state(path: str, train_state, step: int | None = None,
                     extra: dict | None = None) -> None:
    """Snapshot a full training state mid-run. ``train_state`` is any
    pytree of arrays — e.g. for MADDPG ``{"params": ..., "targets": ...,
    "opt_states": ..., "buffer": ..., "env_states": ..., "obs": ...}``
    (optax states and the replay ring are ordinary pytrees), for PPO the
    ``(params, opt_state)`` tuple. Reloading with ``load_train_state``
    and continuing with the same keys reproduces the interrupted run
    bit-identically (tests/test_utils.py kill-and-resume test)."""
    save_checkpoint(path, train_state, step=step, extra=extra)


def load_train_state(path: str, like) -> tuple:
    """Load a training-state snapshot; ``like`` is a structurally
    identical template (e.g. a freshly initialized train state).
    Returns ``(train_state, step, extra)``."""
    payload, step, extra = load_checkpoint(path, {"state": like})
    return payload["state"], step, extra
