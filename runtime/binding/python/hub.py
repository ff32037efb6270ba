"""Pretrained-model hub for the Python runtime binding.

Capability parity with the reference's ``wenetruntime`` hub
(reference ``runtime/binding/python/py/hub.py``: named-model URL →
download → extract → model dir), generalized for this framework's bundle
layout and hardened: sources may be registry names, direct URLs
(http/https/file) or local paths; downloads are cached under
``~/.cache/wenet_tpu/hub`` keyed by source; optional sha256 pinning;
tar members are validated against path traversal before extraction.

A model bundle is a ``.tar.gz`` containing the serving artifacts the
C-API/worker stack consumes (``train.yaml``, ``final.ckpt``,
``units.txt``, optional ``worker_cmd.txt`` / ``lg.bin`` / ``words.txt``)
— exactly what ``examples/librispeech/run.sh`` stage 5 exports. The
registry ships empty (no published checkpoints yet); point entries at
your own artifact store, or pass URLs/paths directly::

    from wenet_tpu_runtime import Decoder
    from hub import load_model
    dec = Decoder(load_model("file:///models/conformer_rnnt.tar.gz"))
"""

from __future__ import annotations

import hashlib
import json
import os
import shutil
import tarfile
import urllib.request

# name -> {"url": ..., "sha256": ...}; populated by deployments (or via
# register_model / a hub.json next to this file).
MODELS: dict = {}


def _cache_root() -> str:
    return os.environ.get(
        "WENET_TPU_HUB_CACHE",
        os.path.join(os.path.expanduser("~"), ".cache", "wenet_tpu",
                     "hub"))


def register_model(name: str, url: str, sha256: str | None = None):
    MODELS[name] = {"url": url, "sha256": sha256}


def _load_registry():
    reg = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       "hub.json")
    if os.path.exists(reg):
        with open(reg) as f:
            for name, ent in json.load(f).items():
                MODELS.setdefault(name, ent)


def _sha256(path: str) -> str:
    h = hashlib.sha256()
    with open(path, "rb") as f:
        for chunk in iter(lambda: f.read(1 << 20), b""):
            h.update(chunk)
    return h.hexdigest()


def _safe_extract(tar: tarfile.TarFile, dest: str):
    base = os.path.realpath(dest)
    for m in tar.getmembers():
        target = os.path.realpath(os.path.join(dest, m.name))
        if not target.startswith(base + os.sep) and target != base:
            raise ValueError(f"unsafe tar member path: {m.name}")
        if m.issym() or m.islnk():
            raise ValueError(f"links not allowed in bundles: {m.name}")
    tar.extractall(dest)


def load_model(source: str, sha256: str | None = None,
               force: bool = False) -> str:
    """Resolve a model source to a local model directory.

    Args:
      source: registry name, http(s):// or file:// URL, a local
        ``.tar.gz``, or an existing model directory (returned as-is).
      sha256: optional archive digest to enforce (overrides registry).
      force: re-download/re-extract even if cached.
    Returns: path to a directory containing the serving artifacts.
    """
    _load_registry()
    if source in MODELS:
        ent = MODELS[source]
        sha256 = sha256 or ent.get("sha256")
        source = ent["url"]

    if os.path.isdir(source):
        return source

    key = hashlib.sha256(source.encode()).hexdigest()[:16]
    dest = os.path.join(_cache_root(), key)
    marker = os.path.join(dest, ".complete")
    if os.path.exists(marker) and not force:
        return _model_dir(dest)
    if os.path.exists(dest):
        shutil.rmtree(dest)
    os.makedirs(dest, exist_ok=True)

    if source.startswith(("http://", "https://", "file://")):
        archive = os.path.join(dest, "bundle.tar.gz")
        with urllib.request.urlopen(source) as r, \
                open(archive, "wb") as f:
            shutil.copyfileobj(r, f)
    elif os.path.exists(source):
        archive = source
    else:
        raise FileNotFoundError(f"unknown model source: {source}")

    if sha256 is not None:
        got = _sha256(archive)
        if got != sha256:
            raise ValueError(
                f"sha256 mismatch for {source}: {got} != {sha256}")
    with tarfile.open(archive, "r:*") as tar:
        _safe_extract(tar, dest)
    with open(marker, "w") as f:
        f.write(source + "\n")
    return _model_dir(dest)


def _model_dir(dest: str) -> str:
    """The extracted bundle root, or its single top-level directory."""
    entries = [e for e in os.listdir(dest)
               if not e.startswith(".") and e != "bundle.tar.gz"]
    if os.path.exists(os.path.join(dest, "train.yaml")):
        return dest
    if len(entries) == 1:
        sub = os.path.join(dest, entries[0])
        if os.path.isdir(sub):
            return sub
    return dest
