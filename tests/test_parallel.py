"""SPMD training tests on the virtual 8-device CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from wenet_celoss_tpu.parallel import train as T
from wenet_celoss_tpu.parallel.mesh import make_mesh, shard_batch


def test_mesh_shapes():
    mesh = make_mesh(model_parallel=1)
    assert mesh.shape["data"] == len(jax.devices())
    mesh2 = make_mesh(model_parallel=2)
    assert mesh2.shape["model"] == 2


def test_sharded_train_step_matches_single_device():
    """One SPMD step over the 8-device mesh must equal the single-device
    step (same loss, same updated params)."""
    from wenet_celoss_tpu.models.factory import init_model
    from wenet_celoss_tpu.configs import conformer_ctc_aed

    cfg = conformer_ctc_aed(input_dim=8, vocab_size=16, tiny=True)
    cfg["encoder_conf"].update(num_blocks=1, output_size=8,
                               linear_units=16, attention_heads=2,
                               cnn_module_kernel=7)
    cfg["decoder_conf"].update(num_blocks=1, linear_units=16,
                               attention_heads=2)
    model = init_model(cfg)

    rng = np.random.default_rng(0)
    b, t, u = 8, 32, 4
    batch = {
        "feats": jnp.asarray(rng.standard_normal((b, t, 8)), jnp.float32),
        "feat_lengths": jnp.full((b,), t, jnp.int32),
        "labels": jnp.asarray(rng.integers(1, 14, (b, u)), jnp.int32),
        "label_lengths": jnp.full((b,), u, jnp.int32),
    }
    args = (batch["feats"], batch["feat_lengths"], batch["labels"],
            batch["label_lengths"])
    variables = model.init(jax.random.PRNGKey(0), *args)
    tx, _ = T.make_optimizer(cfg)
    grad_fn = T.make_grad_fn(model)
    apply_fn = T.make_apply_fn(tx)

    # Single device
    state1 = T.create_train_state(model, variables, tx)
    g1, m1, _ = grad_fn(state1, batch, jax.random.PRNGKey(9))
    s1, _ = apply_fn(state1, g1)

    # Mesh
    mesh = make_mesh()
    state2 = jax.device_put(T.create_train_state(model, variables, tx),
                            NamedSharding(mesh, P()))
    placed = shard_batch(mesh, batch)
    g2, m2, _ = grad_fn(state2, placed, jax.random.PRNGKey(9))
    s2, _ = apply_fn(state2, g2)

    assert float(m1["loss"]) == pytest.approx(float(m2["loss"]), rel=1e-4)
    l1 = jax.tree_util.tree_leaves(s1.params)
    l2 = jax.tree_util.tree_leaves(s2.params)
    for a, b_ in zip(l1, l2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   rtol=2e-3, atol=2e-5)


def test_nonfinite_grad_skips_step():
    tx, _ = T.make_optimizer({"grad_clip": 1.0})
    apply_fn = T.make_apply_fn(tx)
    params = {"w": jnp.ones((4,))}
    state = T.TrainState(step=jnp.zeros((), jnp.int32), params=params,
                         opt_state=tx.init(params))
    bad = {"w": jnp.full((4,), jnp.nan)}
    new_state, gnorm = apply_fn(state, bad)
    np.testing.assert_allclose(np.asarray(new_state.params["w"]),
                               np.ones((4,)))

    good = {"w": jnp.ones((4,))}
    new_state2, _ = apply_fn(state, good)
    assert not np.array_equal(np.asarray(new_state2.params["w"]),
                              np.ones((4,)))
    assert int(new_state2.step) == 1


@pytest.mark.slow  # flagship step compiled twice (DP and DP×TP meshes)
def test_graft_entry_dryrun():
    import __graft_entry__ as ge
    ge.dryrun_multichip(min(8, len(jax.devices())))


def test_graft_entry_single():
    import __graft_entry__ as ge
    fn, args = ge.entry()
    loss = jax.jit(fn)(*args)
    assert np.isfinite(float(loss))


def test_model_parallel_step_matches_replicated():
    """(4 data, 2 model) mesh with tensor-parallel param placement must
    produce the same loss and updated params as the replicated DP-only
    step (GSPMD inserts the collectives; semantics are unchanged)."""
    from wenet_celoss_tpu.models.factory import init_model
    from wenet_celoss_tpu.configs import conformer_ctc_aed
    from wenet_celoss_tpu.parallel.mesh import shard_state, state_shardings

    cfg = conformer_ctc_aed(input_dim=8, vocab_size=16, tiny=True)
    cfg["encoder_conf"].update(num_blocks=1, output_size=8,
                               linear_units=16, attention_heads=2,
                               cnn_module_kernel=7)
    cfg["decoder_conf"].update(num_blocks=1, linear_units=16,
                               attention_heads=2)
    model = init_model(cfg)

    rng = np.random.default_rng(1)
    b, t, u = 8, 32, 4
    batch = {
        "feats": jnp.asarray(rng.standard_normal((b, t, 8)), jnp.float32),
        "feat_lengths": jnp.full((b,), t, jnp.int32),
        "labels": jnp.asarray(rng.integers(1, 14, (b, u)), jnp.int32),
        "label_lengths": jnp.full((b,), u, jnp.int32),
    }
    args = (batch["feats"], batch["feat_lengths"], batch["labels"],
            batch["label_lengths"])
    variables = model.init(jax.random.PRNGKey(0), *args)
    tx, _ = T.make_optimizer(cfg)
    grad_fn = T.make_grad_fn(model)
    apply_fn = T.make_apply_fn(tx)

    # DP-only replicated reference
    mesh_dp = make_mesh(model_parallel=1)
    state1 = jax.device_put(T.create_train_state(model, variables, tx),
                            NamedSharding(mesh_dp, P()))
    g1, m1, _ = grad_fn(state1, shard_batch(mesh_dp, batch),
                        jax.random.PRNGKey(9))
    s1, _ = apply_fn(state1, g1)

    # (4, 2) tensor-parallel placement
    mesh_tp = make_mesh(model_parallel=2)
    state2 = shard_state(mesh_tp, T.create_train_state(model, variables,
                                                       tx))
    # at least one weight matrix must actually be sharded over 'model'
    shardings = state_shardings(mesh_tp, state2)
    n_sharded = sum(
        1 for s in jax.tree_util.tree_leaves(
            shardings, is_leaf=lambda x: isinstance(x, NamedSharding))
        if "model" in str(s.spec))
    assert n_sharded > 0, "model-axis rules matched nothing"
    g2, m2, _ = grad_fn(state2, shard_batch(mesh_tp, batch),
                        jax.random.PRNGKey(9))
    s2, _ = apply_fn(state2, g2)

    assert float(m1["loss"]) == pytest.approx(float(m2["loss"]), rel=1e-4)
    for a, b_ in zip(jax.tree_util.tree_leaves(s1.params),
                     jax.tree_util.tree_leaves(s2.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   rtol=2e-3, atol=2e-5)


def test_sharded_batch_decode_matches_single_device():
    """recognize.py --sharded semantics: batch sharded over the 'data'
    axis (with mesh-evenness padding) decodes to the same hyps as the
    unsharded call — GSPMD partitions the encode + batched searches."""
    from wenet_celoss_tpu.configs import conformer_ctc_aed
    from wenet_celoss_tpu.decode.api import Decoder
    from wenet_celoss_tpu.models.factory import init_model

    cfg = conformer_ctc_aed(input_dim=8, vocab_size=16, tiny=True)
    cfg["encoder_conf"].update(num_blocks=1, output_size=8,
                               linear_units=16, attention_heads=2,
                               cnn_module_kernel=7)
    cfg["decoder_conf"].update(num_blocks=1, linear_units=16,
                               attention_heads=2)
    model = init_model(cfg)
    rng = np.random.default_rng(11)
    b, t = 6, 64
    feats = jnp.asarray(rng.standard_normal((b, t, 8)), jnp.float32)
    lens = jnp.asarray(rng.integers(t // 2, t + 1, (b,)), jnp.int32)
    variables = model.init(jax.random.PRNGKey(0), feats, lens,
                           jnp.ones((b, 4), jnp.int32),
                           jnp.full((b,), 4, jnp.int32))
    dec = Decoder(model, variables)

    ref_greedy = dec.ctc_greedy_search(feats, lens)
    ref_resc = dec.attention_rescoring(feats, lens, beam=4)

    mesh = make_mesh(model_parallel=1)
    pad = (-b) % mesh.size
    feats_p = jnp.concatenate(
        [feats, jnp.zeros((pad, t, 8), jnp.float32)])
    lens_p = jnp.concatenate([lens, jnp.full((pad,), t, jnp.int32)])
    sh = NamedSharding(mesh, P("data"))
    feats_s = jax.device_put(feats_p, sh)
    lens_s = jax.device_put(lens_p, sh)

    got_greedy = dec.ctc_greedy_search(feats_s, lens_s)[:b]
    got_resc = dec.attention_rescoring(feats_s, lens_s, beam=4)[:b]
    assert [list(h) for h in got_greedy] == [list(h) for h in ref_greedy]
    assert [list(h) for h in got_resc] == [list(h) for h in ref_resc]


def test_shard_batch_semantics():
    """Hotword-list entries replicate even when their row count equals
    the batch size (semantic replication, not shape inference), and the
    batch size comes from 'feats' regardless of dict order."""
    mesh = make_mesh(model_parallel=1)
    b = len(jax.devices())
    batch = {
        "context_list": np.ones((b, 3), np.int32),   # coincidental size b
        "context_lengths": np.full((b,), 3, np.int32),
        "feats": np.zeros((b, 16, 4), np.float32),
        "feat_lengths": np.full((b,), 16, np.int32),
        "hw_labels": np.zeros((b, 4), np.int32),
    }
    placed = shard_batch(mesh, batch)
    assert placed["context_list"].sharding.is_fully_replicated
    assert placed["context_lengths"].sharding.is_fully_replicated
    for k in ("feats", "feat_lengths", "hw_labels"):
        assert not placed[k].sharding.is_fully_replicated, k


def test_pad_batch_to_multiple_semantics():
    """Paddable entries derive from batch semantics (leading dim == batch
    size), so a NOVEL batch key pads correctly instead of silently
    keeping its old size; shared (step-global) entries and scalars are
    left alone; lengths pad to zero (feat_lengths to 1)."""
    from wenet_celoss_tpu.parallel.mesh import pad_batch_to_multiple
    b = 3
    batch = {
        "keys": ["a", "b", "c"],
        "feats": np.ones((b, 16, 4), np.float32),
        "feat_lengths": np.full((b,), 16, np.int32),
        "labels": np.ones((b, 5), np.int32),
        "label_lengths": np.full((b,), 5, np.int32),
        "novel_per_utt": np.ones((b, 7), np.float32),   # new batch entry
        "context_list": np.ones((b, 2), np.int32),       # shared: no pad
        "context_lengths": np.full((b,), 2, np.int32),
    }
    out = pad_batch_to_multiple(batch, 8)
    assert out["feats"].shape[0] == 8
    assert out["novel_per_utt"].shape[0] == 8
    np.testing.assert_array_equal(out["novel_per_utt"][b:], 0.0)
    np.testing.assert_array_equal(out["feat_lengths"][b:], 1)
    np.testing.assert_array_equal(out["label_lengths"][b:], 0)
    assert out["keys"] == ["a", "b", "c"] + ["<pad>"] * 5
    # Step-global hotword entries are untouched.
    assert out["context_list"].shape[0] == b
    assert out["context_lengths"].shape[0] == b
    # Already divisible: identity.
    assert pad_batch_to_multiple(out, 8) is out
