"""Checkpoint save AND restore for train state.

The reference only ever *writes* checkpoints (torch.save of model+optimizer
state dicts + config + loss history every 10 iterations,
spectral_ode.py:195-202; plus a best-copy helper, utils.py:81-87) — no
loading/resume code exists anywhere in it (SURVEY.md §5). This module
provides both directions: pytrees are flattened to numpy arrays and stored
in a single .npz plus a json manifest of the tree structure, so restore
does not require unpickling arbitrary objects.
"""

from __future__ import annotations

import json
import os
import shutil
from typing import Any

import jax
import numpy as np


def _flatten_with_paths(tree):
    flat = jax.tree_util.tree_flatten_with_path(tree)[0]
    out = {}
    for path, leaf in flat:
        key = "/".join(str(getattr(p, "key", getattr(p, "idx", p))) for p in path)
        out[key] = np.asarray(leaf)
    return out


def save_checkpoint(state: dict, folder: str, is_best: bool = False,
                    filename: str = "checkpoint.npz",
                    meta: dict | None = None) -> str:
    """Save a pytree `state` (+ json-able `meta`) to folder/filename; copy
    to model_best.npz when is_best (ref utils.py:81-87 semantics)."""
    os.makedirs(folder, exist_ok=True)
    path = os.path.join(folder, filename)
    arrays = _flatten_with_paths(state)
    treedef = jax.tree_util.tree_structure(state)
    np.savez(path, __treedef__=np.frombuffer(
        str(treedef).encode(), dtype=np.uint8), **arrays)
    if meta is not None:
        with open(path + ".meta.json", "w") as f:
            json.dump(meta, f, default=str)
    if is_best:
        shutil.copyfile(path, os.path.join(folder, "model_best.npz"))
        if meta is not None:
            shutil.copyfile(path + ".meta.json",
                            os.path.join(folder, "model_best.npz.meta.json"))
    return path


def load_checkpoint(path: str, like: Any) -> Any:
    """Restore a pytree saved by save_checkpoint into the structure of
    `like` (a template pytree with the same treedef — e.g. a freshly
    initialized train state)."""
    data = np.load(path)
    if "__treedef__" in data:
        saved = bytes(data["__treedef__"]).decode()
        here = str(jax.tree_util.tree_structure(like))
        if saved != here:
            raise ValueError(
                f"checkpoint {path} tree structure does not match the "
                f"template:\n  saved:    {saved}\n  template: {here}\n"
                "(wrong model/optimizer config for this checkpoint?)")
    arrays = _flatten_with_paths(like)
    restored = {}
    for key in arrays:
        if key not in data:
            raise KeyError(f"checkpoint {path} missing leaf {key!r}")
        restored[key] = data[key]
    leaves_like, treedef = jax.tree_util.tree_flatten(like)
    flat = jax.tree_util.tree_flatten_with_path(like)[0]
    new_leaves = []
    for (pth, leaf) in flat:
        key = "/".join(str(getattr(p, "key", getattr(p, "idx", p))) for p in pth)
        arr = restored[key]
        new_leaves.append(arr.astype(np.asarray(leaf).dtype).reshape(np.shape(leaf)))
    return jax.tree_util.tree_unflatten(treedef, new_leaves)


def load_meta(path: str) -> dict:
    with open(path + ".meta.json") as f:
        return json.load(f)
