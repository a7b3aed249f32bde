"""Framework-native checkpoint store (save/load params pytrees).

Counterpart of the reference's `model.pth` convention (convert_hf_checkpoint
writes a fused-QKV torch state dict; Engine/utils.py:198-210 mmap-loads it).
Here checkpoints are a flat .npz of path-joined keys — mmap-friendly via
numpy lazy loading, no torch dependency, exact dtype round-trip (bfloat16
included via ml_dtypes).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def _flatten(params) -> dict:
    flat = {}
    for path, leaf in jax.tree_util.tree_flatten_with_path(params)[0]:
        key = "/".join(str(getattr(p, "key", getattr(p, "idx", p)))
                       for p in path)
        flat[key] = np.asarray(leaf)
    return flat


def save_params(path: str, params):
    """Write a params pytree (dicts/tuples of arrays; None leaves skipped).
    Non-native dtypes (bfloat16 & friends) are stored as uint16/uint8 bit
    views plus a `@dtype` tag (np.savez would silently void-type them)."""
    flat = {}
    for key, arr in _flatten(params).items():
        if not _native_dtype(arr.dtype):
            flat[key] = arr.view(np.uint16 if arr.dtype.itemsize == 2
                                 else np.uint8)
            flat[key + "@dtype"] = np.str_(arr.dtype.name)
        else:
            flat[key] = arr
    np.savez(path, **flat)


def _native_dtype(dt) -> bool:
    try:
        return np.dtype(dt.name) == dt and dt.kind != "V"
    except TypeError:
        return False


def _restore(data, key):
    arr = data[key]
    tag = key + "@dtype"
    if tag in data.files:
        import ml_dtypes
        name = str(data[tag])
        try:
            dt = np.dtype(name)
        except TypeError:
            dt = np.dtype(getattr(ml_dtypes, name))
        arr = arr.view(dt)
    return arr


def load_params(path: str, like=None, dtype=None):
    """Load a checkpoint.

    If `like` (a pytree of the same structure, e.g. abstract shapes from
    jax.eval_shape) is given, reconstructs that structure; otherwise returns
    the nested-dict form implied by the "/"-joined keys.
    """
    data = np.load(path)
    if like is not None:
        leaves_p, treedef = jax.tree_util.tree_flatten_with_path(like)
        leaves = []
        for p, leaf in leaves_p:
            key = "/".join(str(getattr(q, "key", getattr(q, "idx", q)))
                           for q in p)
            arr = _restore(data, key)
            leaves.append(jnp.asarray(arr, dtype or arr.dtype))
        return jax.tree_util.tree_unflatten(treedef, leaves)
    out: dict = {}
    for key in data.files:
        if key.endswith("@dtype"):
            continue
        node = out
        parts = key.split("/")
        for part in parts[:-1]:
            node = node.setdefault(part, {})
        arr = _restore(data, key)
        node[parts[-1]] = jnp.asarray(arr, dtype or arr.dtype)
    return out


def hf_download(repo_id: str, local_dir: str | None = None,
                token: str | None = None) -> str:
    """HF snapshot download wrapper (reference download.py:1-30). Raises a
    clear error in network-less environments."""
    try:
        from huggingface_hub import snapshot_download
    except Exception as e:  # pragma: no cover
        raise RuntimeError("huggingface_hub is not available; place the "
                           "checkpoint directory locally and pass its path "
                           "as --model instead") from e
    return snapshot_download(repo_id, local_dir=local_dir, token=token)
