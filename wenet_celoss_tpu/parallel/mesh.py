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


# Tensor-parallel layout over the 'model' axis (Megatron-style pairs: the
# expanding matmul is column-sharded, the contracting one row-sharded, so
# the only collective per block is one reduce over the residual). Applied
# by path suffix; everything unmatched is replicated. GSPMD propagates the
# activations shardings and inserts the psums.
_MODEL_AXIS_RULES = (
    # encoder / decoder FFNs
    (r"feed_forward(_macaron)?/Dense_0/kernel$", P(None, "model")),
    (r"feed_forward(_macaron)?/Dense_0/bias$", P("model")),
    (r"feed_forward(_macaron)?/Dense_1/kernel$", P("model", None)),
    # attention: heads sharded via the feature dim (h-major reshape)
    (r"(self|src)_attn/linear_[qkv]/kernel$", P(None, "model")),
    (r"(self|src)_attn/linear_[qkv]/bias$", P("model")),
    (r"(self|src)_attn/linear_pos/kernel$", P(None, "model")),
    (r"(self|src)_attn/linear_out/kernel$", P("model", None)),
    # transducer joint
    (r"joint/(enc|pred)_ffn/kernel$", P(None, "model")),
    (r"joint/(enc|pred)_ffn/bias$", P("model")),
    (r"joint/ffn_out/kernel$", P("model", None)),
    # wide vocab projections
    (r"ctc/ctc_lo/kernel$", P(None, "model")),
    (r"ctc/ctc_lo/bias$", P("model")),
    (r"output_layer/kernel$", P(None, "model")),
    (r"output_layer/bias$", P("model")),
)


def _spec_for(path: str, ndim: int) -> P:
    import re
    for pat, spec in _MODEL_AXIS_RULES:
        if re.search(pat, path):
            if len(spec) <= ndim:
                return spec
            break
    return P()


def _path_str(path) -> str:
    parts = []
    for k in path:
        parts.append(str(getattr(k, "key", getattr(k, "name", k))))
    return "/".join(parts)


def state_shardings(mesh: Mesh, tree):
    """NamedSharding pytree for a TrainState (or bare params tree).

    Works on optimizer state too: adam's mu/nu mirror the params tree, so
    the same path suffixes match; anything unmatched (step, counts,
    batch_stats) is replicated. With model_parallel == 1 every rule
    degenerates to replication over the trivial axis."""
    return jax.tree_util.tree_map_with_path(
        lambda path, leaf: NamedSharding(
            mesh, _spec_for(_path_str(path), getattr(leaf, "ndim", 0))),
        tree)


def shard_state(mesh: Mesh, state):
    """Place a TrainState on the mesh per `state_shardings`. Weight
    matrices matched by the model-axis rules land sharded; the rest
    replicated. This is the DDP-broadcast analog plus tensor-parallel
    placement in one call."""
    return jax.device_put(state, state_shardings(mesh, state))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


# Batch entries that are shared across the whole step rather than
# per-utterance (the decode-time hotword list): always replicated.
_SHARED_KEYS = frozenset({"context_list", "context_lengths"})


def shard_batch(mesh: Mesh, batch: dict) -> dict:
    """Place a host batch dict onto the mesh, batch-axis sharded.

    Replication is by SEMANTICS, not shape: entries in _SHARED_KEYS (the
    step-global hotword list) and anything without the batch leading dim
    replicate — a context_list whose row count happens to equal the batch
    size still replicates. The batch size is read from 'feats' (always
    present), never inferred from dict order. Multi-host: each process
    contributes its LOCAL batch as one shard of the global batch (the
    DistributedSampler analog), and replicated entries are broadcast from
    process 0 so every host agrees on the step's global hotword list.
    """
    bsh = batch_sharding(mesh)
    rep = replicated(mesh)
    multi = jax.process_count() > 1
    if multi:
        from jax.experimental import multihost_utils
    out = {}
    b = np.asarray(batch["feats"]).shape[0]
    for k, v in batch.items():
        if k == "keys":
            continue
        arr = np.asarray(v)
        if arr.ndim >= 1 and arr.shape[0] == b and k not in _SHARED_KEYS:
            if multi:
                out[k] = jax.make_array_from_process_local_data(bsh, arr)
            else:
                out[k] = jax.device_put(arr, bsh)
        else:
            if multi:
                out[k] = multihost_utils.broadcast_one_to_all(arr)
            else:
                out[k] = jax.device_put(arr, rep)
    return out


def pad_batch_to_multiple(batch: dict, multiple: int) -> dict:
    """Pad the batch axis so it divides the data-mesh size; padded rows get
    zero feat/label lengths so they contribute nothing to the loss.

    Paddable entries are derived by SEMANTICS, the same rule
    `shard_batch` applies: any array whose leading dim equals the batch
    size (read from 'feats') and that is not a step-global _SHARED_KEYS
    entry is padded with zeros (lengths too — a zero length means "no
    frames/labels", which masks the row out of every loss term); only
    'feat_lengths' pads with 1, because a zero-frame utterance would
    produce an all-False encoder mask whose downstream normalizations
    divide by the mask sum. A novel batch-keyed entry therefore pads
    correctly by construction instead of silently keeping size b."""
    b = np.asarray(batch["feats"]).shape[0]
    pad = (-b) % multiple
    if pad == 0:
        return batch
    out = dict(batch)
    for k, v in batch.items():
        if k == "keys":
            out[k] = list(v) + ["<pad>"] * pad
            continue
        arr = np.asarray(v)
        if arr.ndim >= 1 and arr.shape[0] == b and k not in _SHARED_KEYS:
            fill = np.ones if k == "feat_lengths" else np.zeros
            out[k] = np.concatenate(
                [arr, fill((pad,) + arr.shape[1:], arr.dtype)], axis=0)
    return out
