"""Portable on-disk format for converted param trees: a single .npz of
slash-joined leaf paths. Loading requires neither torch nor orbax."""

from __future__ import annotations

from typing import Any, Dict

import numpy as np
import jax.numpy as jnp


def _flatten(tree: Dict[str, Any], prefix: str = "") -> Dict[str, np.ndarray]:
    out = {}
    for k, v in tree.items():
        path = f"{prefix}/{k}" if prefix else k
        if isinstance(v, dict):
            out.update(_flatten(v, path))
        else:
            out[path] = np.asarray(v)
    return out


def _unflatten(flat: Dict[str, np.ndarray]) -> Dict[str, Any]:
    tree: Dict[str, Any] = {}
    for path, v in flat.items():
        parts = path.split("/")
        node = tree
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = jnp.asarray(v)
    return tree


def save_params(path: str, params: Dict[str, Any]) -> None:
    np.savez(path, **_flatten(params))


def load_params(path: str) -> Dict[str, Any]:
    with np.load(path) as data:
        return _unflatten({k: data[k] for k in data.files})
