"""Device mesh construction and sharding rules.

Replaces the reference's DDP process choreography
(`wenet/bin/train.py:138-144`, one process per GPU + NCCL all-reduce) with
a single-program SPMD design: one `jax.sharding.Mesh` with ('data',
'model') axes; batches shard over 'data', large-encoder weight matrices may
shard over 'model'; XLA inserts the gradient reductions (the psum that DDP
did with NCCL) automatically when the jitted train step consumes sharded
inputs and produces replicated params.

Multi-host: `jax.distributed.initialize()` + the same code — the mesh spans
all hosts' devices; data loading shards per process (dataset.py
rank/world_size), which maps 1:1 onto the reference's DistributedSampler.
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(model_parallel: int = 1,
              devices: Optional[list] = None) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    assert n % model_parallel == 0, \
        f"{n} devices not divisible by model_parallel={model_parallel}"
    dev_array = np.asarray(devices).reshape(n // model_parallel,
                                            model_parallel)
    return Mesh(dev_array, axis_names=("data", "model"))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Leading (batch) axis over 'data'."""
    return NamedSharding(mesh, P("data"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, batch: dict) -> dict:
    """Place a host batch dict onto the mesh, batch-axis sharded.

    Scalar/context entries (no batch axis) are replicated.
    """
    bsh = batch_sharding(mesh)
    rep = replicated(mesh)
    out = {}
    b = None
    for k, v in batch.items():
        if k == "keys":
            continue
        arr = np.asarray(v)
        if b is None and arr.ndim >= 1:
            b = arr.shape[0]
        if arr.ndim >= 1 and arr.shape[0] == b and k not in (
                "context_list", "context_lengths"):
            out[k] = jax.device_put(arr, bsh)
        else:
            out[k] = jax.device_put(arr, rep)
    return out


def pad_batch_to_multiple(batch: dict, multiple: int) -> dict:
    """Pad the batch axis so it divides the data-mesh size; padded rows get
    zero feat/label lengths so they contribute nothing to the loss."""
    b = np.asarray(batch["feats"]).shape[0]
    pad = (-b) % multiple
    if pad == 0:
        return batch
    out = dict(batch)
    for k in ("feats", "labels", "hw_labels", "context_decoder_labels"):
        if k in batch:
            v = np.asarray(batch[k])
            out[k] = np.concatenate(
                [v, np.zeros((pad,) + v.shape[1:], v.dtype)], axis=0)
    for k in ("feat_lengths", "label_lengths"):
        if k in batch:
            v = np.asarray(batch[k])
            pad_len = np.ones((pad,), v.dtype) if k == "feat_lengths" \
                else np.zeros((pad,), v.dtype)
            out[k] = np.concatenate([v, pad_len], axis=0)
    if "keys" in batch:
        out["keys"] = list(batch["keys"]) + ["<pad>"] * pad
    return out
