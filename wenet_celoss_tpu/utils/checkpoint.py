"""Checkpoint save/load with sidecar metadata + model averaging.

Parity with reference ``wenet/utils/checkpoint.py:24-103`` (state_dict save
with `.yaml` infos {epoch, lr, cv_loss, step}, partial warm-start by module
filter) and ``wenet/bin/average_model.py:25-101`` (val-best / last-N
averaging), plus step-level FULL-STATE checkpoints (params + optimizer +
step + executor rng) with async atomic writes for mid-epoch kill/resume
(reference step-resume: `wenet/utils/checkpoint.py:40-58`, `train.py:257`).

Storage is flax msgpack: params-only epoch files (`<n>.ckpt`) and
full-train-state step files (`step_<n>.state`). Writes go to a tempfile
then rename (crash-atomic); the device→host gather is synchronous, the
file IO runs in a background thread (`wait_pending()` to drain — called
before process exit).
"""

from __future__ import annotations

import glob
import os
import re
import threading
from typing import Any, Dict, List, Optional

import flax
import jax
import numpy as np
import yaml

_PENDING: List[threading.Thread] = []


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


def _atomic_write(payload: bytes, path: str,
                  infos: Optional[Dict]) -> None:
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        f.write(payload)
    os.replace(tmp, path)
    if infos is not None:
        info_path = re.sub(r"\.(mspk|state)$", "", path) + ".yaml"
        itmp = info_path + ".tmp"
        with open(itmp, "w") as f:
            yaml.dump(infos, f)
        os.replace(itmp, info_path)


def save_train_state(state: Any, path: str, infos: Optional[Dict] = None,
                     background: bool = True) -> None:
    """Full-state checkpoint: params + optimizer state + step counter
    (+ batch_stats). Gather to host synchronously (cheap next to a train
    step), serialize + write in a background thread, atomically."""
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    host_state = jax.device_get(state)
    payload = flax.serialization.to_bytes(host_state)

    if background:
        t = threading.Thread(target=_atomic_write,
                             args=(payload, path, infos), daemon=True)
        t.start()
        _PENDING.append(t)
    else:
        _atomic_write(payload, path, infos)


def wait_pending() -> None:
    """Block until every background checkpoint write has landed."""
    while _PENDING:
        _PENDING.pop().join()


def load_train_state(template_state: Any, path: str) -> Any:
    """Load a full TrainState written by save_train_state into the
    structure (and shardings, via the caller re-placing) of template."""
    with open(path, "rb") as f:
        return flax.serialization.from_bytes(template_state, f.read())


def load_checkpoint_infos(path: str) -> Dict:
    info_path = re.sub(r"\.(mspk|state)$", "", path) + ".yaml"
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
