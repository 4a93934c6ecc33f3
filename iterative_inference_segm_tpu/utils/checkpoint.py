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


# Flat-npz entries under this prefix carry ARCHITECTURE metadata, not
# weights. Motivation (ADVICE r2): knobs like the DAE encoder style
# ('pool' vs 'stride') change NO param shapes, so loading a checkpoint with
# the wrong flag succeeds silently and serves degraded predictions. The
# trainers stamp these keys; loaders validate them when the caller declares
# what it expects.
_META_PREFIX = "__meta__/"


def _meta_to_npz(meta: dict) -> dict:
    out = {}
    for k, v in meta.items():
        if isinstance(v, (tuple, list)):
            v = np.asarray(v)
        out[_META_PREFIX + k] = np.asarray(v)
    return out


def _npz_value_to_py(arr: np.ndarray):
    arr = np.asarray(arr)
    if arr.ndim == 0:
        v = arr[()]
        if isinstance(v, (np.str_, str)):
            return str(v)
        if isinstance(v, (np.bool_, bool)):
            return bool(v)
        if isinstance(v, np.integer):
            return int(v)
        if isinstance(v, np.floating):
            return float(v)
        return v
    if np.issubdtype(arr.dtype, np.integer):
        return tuple(int(x) for x in arr)
    return tuple(arr.tolist())


def read_npz_meta(path: str | os.PathLike) -> dict:
    """Architecture metadata stored in a flat-npz checkpoint ({} if none —
    e.g. a pre-round-3 export)."""
    data = np.load(path)
    return {
        k[len(_META_PREFIX):]: _npz_value_to_py(data[k])
        for k in data.files
        if k.startswith(_META_PREFIX)
    }


def check_npz_meta(path: str | os.PathLike, expect: dict, *, context: str = "") -> None:
    """Validate declared architecture flags against a checkpoint's stamped
    metadata. Mismatches raise; keys the checkpoint never stamped warn once
    (old exports are accepted but unverifiable)."""
    stored = read_npz_meta(path)
    missing = [k for k in expect if k not in stored]
    bad = {
        k: (stored[k], expect[k])
        for k in expect
        if k in stored and _normalize_meta(stored[k]) != _normalize_meta(expect[k])
    }
    if bad:
        detail = ", ".join(
            f"{k}: checkpoint={s!r} vs requested={e!r}" for k, (s, e) in bad.items()
        )
        raise ValueError(
            f"{context or path}: architecture flags do not match the checkpoint's "
            f"stamped metadata ({detail}). These knobs change no param shapes, so "
            "loading would succeed silently and serve degraded predictions — "
            "pass the flags the checkpoint was trained with."
        )
    if missing:
        import warnings

        warnings.warn(
            f"{context or path}: checkpoint carries no metadata for "
            f"{sorted(missing)}; cannot verify the declared architecture "
            "(old export?). Proceeding unchecked.",
            stacklevel=2,
        )


def _normalize_meta(v):
    if isinstance(v, (tuple, list)):
        return tuple(v)
    return v


def save_npz(path: str | os.PathLike, params, *, meta: dict | None = None) -> None:
    """Flat `name/subname -> array` npz export (reference-compatible spirit).

    ``meta`` (optional) stamps architecture metadata under ``__meta__/`` keys
    (strings/numbers/bools/int tuples) — see ``check_npz_meta``.
    """
    flat = _flatten(params)
    if meta:
        overlap = set(flat) & set(_meta_to_npz(meta))
        if overlap:
            raise ValueError(f"meta keys collide with param keys: {sorted(overlap)}")
        flat.update(_meta_to_npz(meta))
    np.savez(path, **flat)


def load_npz(path: str | os.PathLike, template) -> object:
    """Load a flat npz into the structure of ``template`` (keys must match).

    ``__meta__/`` entries are metadata, not weights — read them with
    ``read_npz_meta`` / validate with ``check_npz_meta``.
    """
    data = np.load(path)
    flat = {k: data[k] for k in data.files if not k.startswith(_META_PREFIX)}

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


def restore_checkpoint_sharded(
    directory: str | os.PathLike, step: int, template, shardings
):
    """Restore a checkpoint directly INTO a device-mesh layout.

    ``shardings`` is a pytree of ``jax.sharding.Sharding`` matching
    ``template``'s structure (e.g. ``parallel.tp.tp_shardings`` for the
    fc6/fc7 TP layout, or all-replicated on a DP mesh). Orbax places each
    leaf shard-by-shard as it reads — no host-side full-size materialize,
    no post-hoc reshard — so the save topology and the restore topology are
    independent: a single-chip training run restores onto a TP mesh and
    vice versa (tested in tests/test_checkpoint.py).
    """
    wait_for_checkpoints()
    import jax

    path = Path(directory).absolute() / str(step)
    abstract = jax.tree.map(
        lambda t, s: jax.ShapeDtypeStruct(
            np.shape(t), jnp.result_type(t), sharding=s
        ),
        template,
        shardings,
    )
    return _checkpointer().restore(path, target=abstract)


def latest_step(directory: str | os.PathLike) -> int | None:
    """Highest numbered checkpoint subdirectory, or None."""
    d = Path(directory)
    if not d.is_dir():
        return None
    steps = [int(p.name) for p in d.iterdir() if p.is_dir() and p.name.isdigit()]
    return max(steps) if steps else None
