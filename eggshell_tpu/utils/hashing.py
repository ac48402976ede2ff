"""Content hashing (toolkit/md5.{h,cc} equivalent) — used by the model
API for script/scene change detection (the reference hashes Lua scripts
to know when to re-run, rama usage of toolkit/md5)."""

from __future__ import annotations

import hashlib
import json
from typing import Any

import numpy as np


def md5_hex(data: bytes) -> str:
    return hashlib.md5(data).hexdigest()


def md5_file(path: str) -> str:
    h = hashlib.md5()
    with open(path, "rb") as f:
        for chunk in iter(lambda: f.read(1 << 20), b""):
            h.update(chunk)
    return h.hexdigest()


def hash_pytree(tree: Any) -> str:
    """Stable hash of a pytree of arrays/scalars (scene change detection)."""
    import jax

    h = hashlib.md5()
    leaves, treedef = jax.tree_util.tree_flatten(tree)
    h.update(str(treedef).encode())
    for leaf in leaves:
        arr = np.asarray(leaf)
        h.update(str(arr.dtype).encode())
        h.update(str(arr.shape).encode())
        h.update(arr.tobytes())
    return h.hexdigest()


def hash_config(obj: Any) -> str:
    """Hash any JSON-serialisable config."""
    return md5_hex(json.dumps(obj, sort_keys=True, default=str).encode())
