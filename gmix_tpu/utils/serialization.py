"""Checkpoint serialization: the state pytree as a flat npz archive.

Replaces the reference's field-by-field binary dumps
(src/memory-interface.h:12-36, predictor.cpp:389-420) with a single archive
per checkpoint. The contract is the reference tester's invariant set
(src/runner/tester.cpp): save -> load -> save must be byte-identical, and an
in-memory copy must equal a disk roundtrip.

Layout: keys are '/'-joined pytree paths; dtypes and shapes are preserved
exactly. Values are raw numpy arrays, so the checkpoint is portable between
CPU and TPU backends.
"""
from __future__ import annotations

import io
import zipfile
from typing import Any, Dict

import jax
import numpy as np


def _flatten(tree: Any, prefix: str = "") -> Dict[str, np.ndarray]:
    out: Dict[str, np.ndarray] = {}
    if isinstance(tree, dict):
        for k in sorted(tree):
            out.update(_flatten(tree[k], f"{prefix}{k}/"))
    else:
        out[prefix.rstrip("/")] = np.asarray(tree)
    return out


def _unflatten(flat: Dict[str, np.ndarray]) -> Any:
    root: Dict[str, Any] = {}
    for key, val in flat.items():
        parts = key.split("/")
        d = root
        for p in parts[:-1]:
            d = d.setdefault(p, {})
        d[parts[-1]] = val
    return root


def save_state(path: str, state: Any) -> None:
    flat = _flatten(jax.device_get(state))
    # deterministic, uncompressed archive (tables are mostly incompressible
    # sentinel runs anyway and speed matters more; compression can be layered)
    with zipfile.ZipFile(path, "w", zipfile.ZIP_STORED) as zf:
        for key in sorted(flat):
            # NB: this numpy's ascontiguousarray/read_array both promote 0-d
            # arrays to (1,), so detect scalars first and mark them so
            # load_state can restore the exact shape
            ext = ".npy0" if flat[key].ndim == 0 else ".npy"
            arr = np.ascontiguousarray(flat[key])
            buf = io.BytesIO()
            np.lib.format.write_array(buf, arr)
            zi = zipfile.ZipInfo(key + ext, date_time=(1980, 1, 1, 0, 0, 0))
            zf.writestr(zi, buf.getvalue())


def load_state(path: str) -> Any:
    flat: Dict[str, np.ndarray] = {}
    with zipfile.ZipFile(path, "r") as zf:
        for name in zf.namelist():
            with zf.open(name) as f:
                arr = np.lib.format.read_array(f)
            if name.endswith(".npy0"):
                flat[name[: -len(".npy0")]] = arr.reshape(())
            else:
                flat[name[: -len(".npy")]] = arr
    return _unflatten(flat)


def copy_state(state: Any) -> Any:
    """Deep on-device copy (Predictor::Copy, predictor.cpp:42-48)."""
    return jax.tree_util.tree_map(lambda x: x.copy(), state)
