"""Kill-and-resume: a full-state step checkpoint reproduces the exact
training trajectory (params + optimizer moments + rng stream), the
reference's step-resume capability (`wenet/utils/checkpoint.py:40-58`)."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from wenet_celoss_tpu.configs import conformer_ctc_aed
from wenet_celoss_tpu.models.factory import init_model
from wenet_celoss_tpu.parallel import train as T
from wenet_celoss_tpu.parallel.executor import Executor
from wenet_celoss_tpu.utils import checkpoint as ckpt


def _tiny():
    cfg = conformer_ctc_aed(input_dim=8, vocab_size=16, tiny=True)
    cfg["encoder_conf"].update(num_blocks=1, output_size=8,
                               linear_units=16, attention_heads=2,
                               cnn_module_kernel=7)
    cfg["decoder_conf"].update(num_blocks=1, linear_units=16,
                               attention_heads=2)
    return cfg


def _batches(n, b=2, t=32, u=4):
    rng = np.random.default_rng(7)
    out = []
    for i in range(n):
        out.append({
            "keys": [f"u{i}"] * b,
            "feats": rng.standard_normal((b, t, 8)).astype(np.float32),
            "feat_lengths": np.full((b,), t, np.int32),
            "labels": rng.integers(1, 14, (b, u)).astype(np.int32),
            "label_lengths": np.full((b,), u, np.int32),
        })
    return out


@pytest.mark.slow  # ~2min CPU: trains, kills, resumes, retrains
def test_step_checkpoint_resume_reproduces_trajectory(tmp_path):
    cfg = _tiny()
    model = init_model(cfg)
    batches = _batches(4)
    args = (jnp.asarray(batches[0]["feats"]),
            jnp.asarray(batches[0]["feat_lengths"]),
            jnp.asarray(batches[0]["labels"]),
            jnp.asarray(batches[0]["label_lengths"]))
    variables_np = jax.device_get(model.init(jax.random.PRNGKey(0), *args))
    tx, schedule = T.make_optimizer(cfg)

    def fresh_state():
        # the fused train step donates its state buffers, so each run
        # needs its own device copies
        v = jax.tree_util.tree_map(jnp.asarray, variables_np)
        return T.create_train_state(model, v, tx)

    # --- uninterrupted run: 4 steps
    ex_a = Executor(model, tx, schedule, rng=jax.random.PRNGKey(5))
    state_a = ex_a.train_epoch(fresh_state(), iter(batches))
    assert int(state_a.step) == 4

    # --- interrupted run: checkpoint at step 2, new process resumes
    path = str(tmp_path / "step_2.state")

    def save(st, rng):
        if int(st.step) == 2:
            ckpt.save_train_state(st, path,
                                  {"step": 2,
                                   "rng": np.asarray(rng).tolist()},
                                  background=False)

    ex_b = Executor(model, tx, schedule, rng=jax.random.PRNGKey(5),
                    checkpoint_every=1, checkpoint_fn=save)
    ex_b.train_epoch(fresh_state(), iter(batches[:2]))
    assert os.path.exists(path)

    # "new process": fresh state template, restore everything
    state_c = ckpt.load_train_state(fresh_state(), path)
    infos = ckpt.load_checkpoint_infos(path)
    ex_c = Executor(model, tx, schedule,
                    rng=jnp.asarray(infos["rng"], jnp.uint32))
    ex_c.step = int(state_c.step)
    state_c = ex_c.train_epoch(state_c, iter(batches[2:]))
    assert int(state_c.step) == 4

    for a, c in zip(jax.tree_util.tree_leaves(state_a.params),
                    jax.tree_util.tree_leaves(state_c.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(c),
                                   rtol=1e-6, atol=1e-7)
    # optimizer moments restored too
    for a, c in zip(jax.tree_util.tree_leaves(state_a.opt_state),
                    jax.tree_util.tree_leaves(state_c.opt_state)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(c),
                                   rtol=1e-6, atol=1e-7)
