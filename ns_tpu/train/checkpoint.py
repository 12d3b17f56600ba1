"""Checkpoint save AND restore for train state.

The reference only ever *writes* checkpoints (torch.save of model+optimizer
state dicts + config + loss history every 10 iterations,
spectral_ode.py:195-202; plus a best-copy helper, utils.py:81-87) — no
loading/resume code exists anywhere in it (SURVEY.md §5). This module
provides both directions: pytrees are flattened to numpy arrays and stored
in a single .npz plus a json manifest of the tree structure, so restore
does not require unpickling arbitrary objects.

Format (CKPT_FORMAT_VERSION 2): the npz holds one array per leaf under its
key-path name, plus `__manifest__` — a JSON blob with the format version
and a {key: {shape, dtype}} table. Compatibility is checked leaf-by-leaf
against the template's key paths (stable across JAX versions, unlike the
v1 `str(treedef)` repr equality this replaces), producing an error that
names the exact missing/unexpected/mismatched leaves.
"""

from __future__ import annotations

import json
import os
import shutil
from typing import Any

import jax
import numpy as np

CKPT_FORMAT_VERSION = 2


def _path_key(path) -> str:
    return "/".join(str(getattr(p, "key", getattr(p, "idx", p))) for p in path)


def _flatten_with_paths(tree):
    from ns_tpu.utils.host import to_host
    flat = jax.tree_util.tree_flatten_with_path(tree)[0]
    out = {}
    for path, leaf in flat:
        # to_host for device leaves: train states produced by executables
        # containing complex ops (fno fft engine, spectral solvers) cannot
        # be np.asarray'd directly over the axon TPU tunnel
        out[_path_key(path)] = (to_host(leaf) if isinstance(leaf, jax.Array)
                                else np.asarray(leaf))
    return out


def save_checkpoint(state: dict, folder: str, is_best: bool = False,
                    filename: str = "checkpoint.npz",
                    meta: dict | None = None) -> str:
    """Save a pytree `state` (+ json-able `meta`) to folder/filename; copy
    to model_best.npz when is_best (ref utils.py:81-87 semantics)."""
    os.makedirs(folder, exist_ok=True)
    path = os.path.join(folder, filename)
    arrays = _flatten_with_paths(state)
    manifest = {
        "format_version": CKPT_FORMAT_VERSION,
        "leaves": {k: {"shape": list(v.shape), "dtype": str(v.dtype)}
                   for k, v in arrays.items()},
    }
    np.savez(path, __manifest__=np.frombuffer(
        json.dumps(manifest).encode(), dtype=np.uint8), **arrays)
    if meta is not None:
        with open(path + ".meta.json", "w") as f:
            json.dump(meta, f, default=str)
    if is_best:
        shutil.copyfile(path, os.path.join(folder, "model_best.npz"))
        if meta is not None:
            shutil.copyfile(path + ".meta.json",
                            os.path.join(folder, "model_best.npz.meta.json"))
    return path


class _Shaped:
    """Minimal `.shape`/`.dtype` carrier so _check_manifest never needs
    real template arrays (template leaves may live on device)."""

    def __init__(self, shape, dtype):
        self.shape = tuple(shape)
        self.dtype = np.dtype(dtype)


def _check_manifest(path: str, data, template_arrays: dict,
                    allow_cast: bool = False) -> None:
    """Leaf-by-leaf compatibility check of saved checkpoint vs template.

    Raises ValueError naming every missing / unexpected / shape-mismatched
    / dtype-mismatched leaf, so 'wrong optimizer config for this
    checkpoint' errors point at the offending entries instead of a
    whole-treedef repr diff. Dtype mismatches (e.g. an f64-trained
    checkpoint restored into an f32 template — silent precision loss) are
    errors unless `allow_cast`."""
    if "__manifest__" in data:
        manifest = json.loads(bytes(data["__manifest__"]).decode())
        version = manifest.get("format_version")
        if version != CKPT_FORMAT_VERSION:
            raise ValueError(
                f"checkpoint {path} has format_version {version}; this "
                f"build reads version {CKPT_FORMAT_VERSION}")
        saved = {k: (tuple(v["shape"]), np.dtype(v["dtype"]))
                 for k, v in manifest["leaves"].items()}
    elif "__treedef__" in data:  # v1 checkpoints: derive the table from npz
        saved = {k: (np.shape(data[k]), data[k].dtype) for k in data.files
                 if k != "__treedef__"}
    else:
        saved = {k: (np.shape(data[k]), data[k].dtype) for k in data.files}

    here = {k: (v.shape, v.dtype) for k, v in template_arrays.items()}
    missing = sorted(set(here) - set(saved))
    unexpected = sorted(set(saved) - set(here))
    both = set(here) & set(saved)
    mismatched = sorted(k for k in both
                        if tuple(saved[k][0]) != tuple(here[k][0]))
    cast_bad = [] if allow_cast else sorted(
        k for k in both if k not in mismatched
        and saved[k][1] != here[k][1])
    if missing or unexpected or mismatched or cast_bad:
        lines = [f"checkpoint {path} does not match the template pytree "
                 "(wrong model/optimizer config for this checkpoint?):"]
        if missing:
            lines.append(f"  template leaves absent from checkpoint: "
                         f"{missing}")
        if unexpected:
            lines.append(f"  checkpoint leaves absent from template: "
                         f"{unexpected}")
        for k in mismatched:
            lines.append(f"  shape mismatch at {k!r}: saved "
                         f"{tuple(saved[k][0])} vs template "
                         f"{tuple(here[k][0])}")
        for k in cast_bad:
            lines.append(f"  dtype mismatch at {k!r}: saved "
                         f"{saved[k][1]} vs template {here[k][1]} "
                         "(pass allow_cast=True to cast explicitly)")
        raise ValueError("\n".join(lines))


def _leaf_dtype(leaf) -> np.dtype:
    dt = getattr(leaf, "dtype", None)
    return np.dtype(dt) if dt is not None else np.asarray(leaf).dtype


def load_checkpoint(path: str, like: Any, allow_cast: bool = False) -> Any:
    """Restore a pytree saved by save_checkpoint into the structure of
    `like` (a template pytree with the same key paths — e.g. a freshly
    initialized train state). Reads v2 (manifest) checkpoints and v1
    (__treedef__) ones; the compatibility check is key-path based either
    way.

    Dtypes must match the template exactly unless `allow_cast=True` —
    restoring an f64-trained checkpoint into an f32 state would otherwise
    truncate silently. (Serving has its own intentional-cast loader,
    serve/engine.py::load_checkpoint_params, whose f32 contract is the
    documented conversion point.)"""
    data = np.load(path)
    flat = jax.tree_util.tree_flatten_with_path(like)[0]
    # shapes/dtypes come from the template leaves' metadata — no host
    # transfer of the (possibly device-resident) template is ever needed
    template_shapes = {_path_key(p): _Shaped(np.shape(leaf),
                                             _leaf_dtype(leaf))
                       for p, leaf in flat}
    _check_manifest(path, data, template_shapes, allow_cast=allow_cast)
    treedef = jax.tree_util.tree_structure(like)
    new_leaves = []
    for (pth, leaf) in flat:
        arr = data[_path_key(pth)]
        new_leaves.append(arr.astype(_leaf_dtype(leaf))
                          .reshape(np.shape(leaf)))
    return jax.tree_util.tree_unflatten(treedef, new_leaves)


def load_meta(path: str) -> dict:
    with open(path + ".meta.json") as f:
        return json.load(f)
