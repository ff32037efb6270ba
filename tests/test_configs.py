"""Canonical config coverage: every shipped config builds, initializes and
takes a train step (tiny variants)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from wenet_celoss_tpu import configs as C
from wenet_celoss_tpu.models.factory import init_model
from wenet_celoss_tpu.parallel import train as T


@pytest.mark.parametrize("maker", [
    # the full rnnt+bias step compiles ~2min on CPU; the flagship path is
    # also covered by test_parallel's graft-entry tests and the dryrun
    pytest.param(C.conformer_rnnt_bias, marks=pytest.mark.slow),
    # ctc_aed / u2pp step-compiles run ~1min each on CPU and the same
    # model paths are covered by test_e2e/test_parallel/test_decode;
    # keep the fast gate under the wall-time budget (VERDICT r1 #10)
    pytest.param(C.conformer_ctc_aed, marks=pytest.mark.slow),
    pytest.param(C.u2pp_conformer, marks=pytest.mark.slow)])
def test_config_builds_and_steps(maker):
    cfg = maker(input_dim=16, vocab_size=32, tiny=True)
    model = init_model(cfg)
    rng = np.random.default_rng(0)
    b, t, u = 2, 48, 4
    batch = {
        "feats": jnp.asarray(rng.standard_normal((b, t, 16)), jnp.float32),
        "feat_lengths": jnp.full((b,), t, jnp.int32),
        "labels": jnp.asarray(rng.integers(1, 30, (b, u)), jnp.int32),
        "label_lengths": jnp.full((b,), u, jnp.int32),
    }
    args = [batch["feats"], batch["feat_lengths"], batch["labels"],
            batch["label_lengths"]]
    if "context" in cfg:
        batch["context_list"] = jnp.asarray(
            rng.integers(1, 30, (3, 2)), jnp.int32)
        batch["context_lengths"] = jnp.full((3,), 2, jnp.int32)
        batch["hw_labels"] = jnp.asarray(
            rng.integers(0, 2, (b, u)), jnp.int32)
        args += [batch["context_list"], batch["context_lengths"],
                 batch["hw_labels"]]
    variables = model.init(jax.random.PRNGKey(0), *args)
    tx, _ = T.make_optimizer(cfg)
    state = T.create_train_state(model, variables, tx)
    step = T.make_train_step(model, tx)
    state, metrics, gnorm = step(state, batch, jax.random.PRNGKey(1))
    assert np.isfinite(float(metrics["loss"]))
    assert int(state.step) == 1


@pytest.mark.slow  # ~1min CPU compile; dtype plumbing also hit by bench
def test_bf16_config_steps():
    cfg = C.conformer_ctc_aed(input_dim=16, vocab_size=32, tiny=True)
    cfg["dtype"] = "bfloat16"
    model = init_model(cfg)
    rng = np.random.default_rng(1)
    b, t, u = 2, 48, 4
    batch = {
        "feats": jnp.asarray(rng.standard_normal((b, t, 16)), jnp.float32),
        "feat_lengths": jnp.full((b,), t, jnp.int32),
        "labels": jnp.asarray(rng.integers(1, 30, (b, u)), jnp.int32),
        "label_lengths": jnp.full((b,), u, jnp.int32),
    }
    variables = model.init(jax.random.PRNGKey(0), batch["feats"],
                           batch["feat_lengths"], batch["labels"],
                           batch["label_lengths"])
    # Params stay fp32 even under bf16 compute.
    leaves = jax.tree_util.tree_leaves(variables["params"])
    assert all(l.dtype == jnp.float32 for l in leaves)
    tx, _ = T.make_optimizer(cfg)
    state = T.create_train_state(model, variables, tx)
    step = T.make_train_step(model, tx)
    state, metrics, _ = step(state, batch, jax.random.PRNGKey(1))
    assert np.isfinite(float(metrics["loss"]))
