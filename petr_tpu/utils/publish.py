"""Checkpoint publishing (reference `tools/model_converters/publish_model.py`):
strip optimizer state, keep params only, append a content-hash tag.
"""

from __future__ import annotations

import hashlib
import os
import pickle

import numpy as np


def publish_checkpoint(ckpt_dir: str, out_path: str) -> str:
    """Read an orbax checkpoint dir, write a params-only pickle with a
    sha256 tag in the filename (``name-<8hex>.pkl``)."""
    import jax
    import orbax.checkpoint as ocp

    with ocp.StandardCheckpointer() as ckptr:
        restored = ckptr.restore(os.path.abspath(ckpt_dir))
    params = restored["params"] if "params" in restored else restored
    params = jax.tree.map(np.asarray, params)

    blob = pickle.dumps({"params": params})
    tag = hashlib.sha256(blob).hexdigest()[:8]
    base, ext = os.path.splitext(out_path)
    final = f"{base}-{tag}{ext or '.pkl'}"
    with open(final, "wb") as f:
        f.write(blob)
    return final


def load_published(path: str):
    with open(path, "rb") as f:
        return pickle.load(f)["params"]
