"""Checkpointing: orbax for pytrees + npz import/export for parity.

The reference checkpoints with ``np.savez(lasagne.layers.get_all_param_values)``
and resumes from the best-val `.npz` (``[ref: train_fcn8.py]``, SURVEY.md §6).
Rebuild: orbax-checkpoint is the durable format (async-capable, sharding-
aware); `save_npz`/`load_npz` provide a flat-npz bridge so weights can be
cross-checked against any reference-era `.npz` (e.g. Caffe-converted VGG16).
"""

from __future__ import annotations

import os
from pathlib import Path

import jax.numpy as jnp
import numpy as np


def _flatten(tree, prefix="") -> dict:
    out = {}
    if isinstance(tree, dict):
        for k in sorted(tree):
            out.update(_flatten(tree[k], f"{prefix}{k}/"))
    elif isinstance(tree, (list, tuple)):
        for i, v in enumerate(tree):
            out.update(_flatten(v, f"{prefix}{i}/"))
    else:
        out[prefix[:-1]] = np.asarray(tree)
    return out


def save_npz(path: str | os.PathLike, params) -> None:
    """Flat `name/subname -> array` npz export (reference-compatible spirit)."""
    flat = _flatten(params)
    np.savez(path, **flat)


def load_npz(path: str | os.PathLike, template) -> object:
    """Load a flat npz into the structure of ``template`` (keys must match)."""
    data = np.load(path)
    flat = {k: data[k] for k in data.files}

    def rebuild(tree, prefix=""):
        if isinstance(tree, dict):
            return {k: rebuild(v, f"{prefix}{k}/") for k, v in tree.items()}
        if isinstance(tree, (list, tuple)):
            vals = [rebuild(v, f"{prefix}{i}/") for i, v in enumerate(tree)]
            return type(tree)(vals)
        key = prefix[:-1]
        if key not in flat:
            raise KeyError(f"npz missing parameter {key!r}")
        arr = flat[key]
        if tuple(arr.shape) != tuple(np.shape(tree)):
            raise ValueError(f"shape mismatch for {key!r}: {arr.shape} vs {np.shape(tree)}")
        return jnp.asarray(arr, dtype=jnp.asarray(tree).dtype)

    return rebuild(template)


_CKPTR = None


def _checkpointer():
    """Process-wide orbax checkpointer (holds the async-save thread pool)."""
    global _CKPTR
    if _CKPTR is None:
        import orbax.checkpoint as ocp

        _CKPTR = ocp.StandardCheckpointer()
    return _CKPTR


def save_checkpoint(directory: str | os.PathLike, step: int, state, *, wait: bool = True) -> None:
    """Orbax checkpoint of an arbitrary pytree at ``directory/step``.

    ``wait=False`` backgrounds the serialization (orbax async save) so
    checkpoint I/O overlaps the next training epoch — the SURVEY §6 plan.
    Callers passing ``wait=False`` must hand over arrays that won't be
    donated/mutated (the trainers pass fresh ``jax.device_get`` copies).
    Pending saves are flushed by ``wait_for_checkpoints`` and before any
    restore.
    """
    path = Path(directory).absolute() / str(step)
    ckptr = _checkpointer()
    ckptr.save(path, state, force=True)
    if wait:
        ckptr.wait_until_finished()


def wait_for_checkpoints() -> None:
    """Block until every backgrounded ``save_checkpoint`` has committed."""
    if _CKPTR is not None:
        _CKPTR.wait_until_finished()


def restore_checkpoint(directory: str | os.PathLike, step: int, template):
    wait_for_checkpoints()  # never read past a still-writing async save
    path = Path(directory).absolute() / str(step)
    return _checkpointer().restore(path, target=template)


def latest_step(directory: str | os.PathLike) -> int | None:
    """Highest numbered checkpoint subdirectory, or None."""
    d = Path(directory)
    if not d.is_dir():
        return None
    steps = [int(p.name) for p in d.iterdir() if p.is_dir() and p.name.isdigit()]
    return max(steps) if steps else None
