"""Two-process jax.distributed worker for tests/test_multihost.py.

Each process brings 2 virtual CPU devices (4 global), builds a (4,1)
mesh, and trains a tiny CTC/AED model with UNEVEN per-host batch counts
(host 0: 3 batches, host 1: 2). Executor._joined must stop both hosts at
2 steps; without it the SPMD program deadlocks at epoch end.

Run: python tests/multihost_worker.py <process_id> <port>
"""

import os
import sys

pid = int(sys.argv[1])
port = sys.argv[2]

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
os.environ.setdefault("JAX_ENABLE_X64", "0")

import jax  # noqa: E402

# jax may already be imported by a site hook with another platform latched;
# force CPU through the config (same dance as conftest.py).
jax.config.update("jax_platforms", "cpu")
jax.distributed.initialize(f"localhost:{port}", num_processes=2,
                           process_id=pid)
assert jax.process_count() == 2
assert jax.device_count() == 4

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
from wenet_celoss_tpu.configs import conformer_ctc_aed  # noqa: E402
from wenet_celoss_tpu.models.factory import init_model  # noqa: E402
from wenet_celoss_tpu.parallel import train as T  # noqa: E402
from wenet_celoss_tpu.parallel.executor import Executor  # noqa: E402
from wenet_celoss_tpu.parallel.mesh import make_mesh, shard_state  # noqa: E402

cfg = conformer_ctc_aed(input_dim=8, vocab_size=16, tiny=True)
cfg["encoder_conf"].update(num_blocks=1, output_size=8, linear_units=16,
                           attention_heads=2, cnn_module_kernel=7)
cfg["decoder_conf"].update(num_blocks=1, linear_units=16,
                           attention_heads=2)
model = init_model(cfg)

rng = np.random.default_rng(0)  # same init on both hosts
b, t, u = 2, 32, 4              # local batch per host
init_args = (jnp.asarray(rng.standard_normal((b, t, 8)), jnp.float32),
             jnp.full((b,), t, jnp.int32),
             jnp.asarray(rng.integers(1, 14, (b, u)), jnp.int32),
             jnp.full((b,), u, jnp.int32))
variables = model.init(jax.random.PRNGKey(0), *init_args)
tx, schedule = T.make_optimizer(cfg)
mesh = make_mesh(model_parallel=1)
state = shard_state(mesh, T.create_train_state(model, variables, tx))

n_batches = 3 if pid == 0 else 2   # UNEVEN on purpose
host_rng = np.random.default_rng(100 + pid)
batches = []
for _ in range(n_batches):
    batches.append({
        "keys": [f"p{pid}"] * b,
        "feats": host_rng.standard_normal((b, t, 8)).astype(np.float32),
        "feat_lengths": np.full((b,), t, np.int32),
        "labels": host_rng.integers(1, 14, (b, u)).astype(np.int32),
        "label_lengths": np.full((b,), u, np.int32),
    })

ex = Executor(model, tx, schedule, mesh, accum_grad=1, log_interval=10)
state = ex.train_epoch(state, iter(batches), epoch=0)
steps = int(state.step)
assert steps == 2, f"expected 2 joined steps, got {steps}"
print(f"proc{pid}: steps={steps} OK", flush=True)

# Cross-PROCESS sharded decode: each host brings its LOCAL utterances,
# the searches run SPMD over the 4-device mesh, and the collective
# exchange must leave EVERY process holding the identical full batch
# (the pod contract in decode/sharded.py — previously only proven on a
# single-process 8-device mesh).
from wenet_celoss_tpu.decode.sharded import ShardedDecoder  # noqa: E402

dec = ShardedDecoder(model, {"params": state.params}, mesh)
# Same global corpus on both hosts, DIFFERENT local halves; 3 utts per
# host exercises the local padding path (pad to the 2-device share of 4).
corpus_rng = np.random.default_rng(77)
all_feats = corpus_rng.standard_normal((6, t, 8)).astype(np.float32)
all_lens = np.full((6,), t, np.int32)
local = slice(0, 3) if pid == 0 else slice(3, 6)
hyps = dec.ctc_greedy_search(jnp.asarray(all_feats[local]),
                             jnp.asarray(all_lens[local]))
assert len(hyps) == 6, len(hyps)
resc = dec.attention_rescoring(jnp.asarray(all_feats[local]),
                               jnp.asarray(all_lens[local]), beam=3)
assert len(resc) == 6, len(resc)
# Every process prints the same fingerprint of the FULL result set; the
# parent test asserts the two lines are identical.
fp = repr((hyps, resc))
import hashlib  # noqa: E402
print(f"decode_fp {hashlib.sha1(fp.encode()).hexdigest()}", flush=True)
print(f"proc{pid}: decode OK", flush=True)
