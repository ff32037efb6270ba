"""YAML config loading with dotted-path overrides.

Parity with reference ``wenet/utils/config.py:18-39`` (``--override_config
a.b.c value``) plus typed coercion from the existing value.
"""

from __future__ import annotations

import copy
from typing import Any, Dict, List

import yaml


def load_config(path: str) -> Dict[str, Any]:
    with open(path, "r") as f:
        return yaml.safe_load(f)


def save_config(configs: Dict[str, Any], path: str) -> None:
    with open(path, "w") as f:
        yaml.dump(configs, f, default_flow_style=False)


def _coerce(old: Any, new: str) -> Any:
    if isinstance(old, bool):
        return new.lower() in ("1", "true", "yes", "on")
    if isinstance(old, int):
        return int(new)
    if isinstance(old, float):
        return float(new)
    if isinstance(old, list):
        item = old[0] if old else new
        return [_coerce(item, v) for v in new.split(",")]
    return new


def override_config(configs: Dict[str, Any],
                    overrides: List[str]) -> Dict[str, Any]:
    """Apply ``["a.b.c value", ...]`` overrides, coercing to existing types."""
    out = copy.deepcopy(configs)
    for item in overrides:
        parts = item.split()
        if len(parts) != 2:
            raise ValueError(f"override must be 'dotted.key value': {item!r}")
        keys, value = parts[0].split("."), parts[1]
        node = out
        for k in keys[:-1]:
            if k not in node:
                raise KeyError(f"unknown config path {parts[0]!r}")
            node = node[k]
        leaf = keys[-1]
        if leaf not in node:
            raise KeyError(f"unknown config key {parts[0]!r}")
        node[leaf] = _coerce(node[leaf], value)
    return out
