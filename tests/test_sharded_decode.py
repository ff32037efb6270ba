"""Mesh-sharded batch decode with collective hypothesis exchange.

The north-star scale-out design ("beam hypotheses and rescoring scores
exchanged via XLA collectives"): `ShardedDecoder` runs every batched
search SPMD over the mesh's 'data' axis and ends each mode with an
explicit `lax.all_gather` so every device (hence every host in a pod)
holds the full result. On the 8-device CPU mesh the sharded decode must
(a) produce byte-identical hypotheses to the plain single-device
`Decoder`, and (b) leave the exchanged arrays fully replicated.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from wenet_celoss_tpu.configs import conformer_ctc_aed
from wenet_celoss_tpu.decode.api import Decoder
from wenet_celoss_tpu.decode.sharded import ShardedDecoder, exchange
from wenet_celoss_tpu.models.factory import init_model
from wenet_celoss_tpu.parallel.mesh import make_mesh


def test_exchange_replicates_over_data_axis():
    mesh = make_mesh(model_parallel=1)
    x = jnp.arange(mesh.size * 6, dtype=jnp.float32).reshape(mesh.size, 6)
    xs = jax.device_put(x, NamedSharding(mesh, P("data")))
    (g,) = exchange(mesh, xs)
    assert g.sharding.is_fully_replicated
    np.testing.assert_array_equal(np.asarray(g), np.asarray(x))


@pytest.fixture(scope="module")
def ctc_aed():
    cfg = conformer_ctc_aed(input_dim=8, vocab_size=16, tiny=True)
    cfg["encoder_conf"].update(num_blocks=1, output_size=8,
                               linear_units=16, attention_heads=2,
                               cnn_module_kernel=7)
    cfg["decoder_conf"].update(num_blocks=1, linear_units=16,
                               attention_heads=2)
    model = init_model(cfg)
    rng = np.random.default_rng(3)
    b, t = 6, 64
    feats = jnp.asarray(rng.standard_normal((b, t, 8)), jnp.float32)
    lens = jnp.asarray(rng.integers(t // 2, t + 1, (b,)), jnp.int32)
    variables = model.init(jax.random.PRNGKey(0), feats, lens,
                           jnp.ones((b, 4), jnp.int32),
                           jnp.full((b,), 4, jnp.int32))
    return model, variables, feats, lens


def test_sharded_decoder_matches_plain_ctc_aed(ctc_aed):
    model, variables, feats, lens = ctc_aed
    plain = Decoder(model, variables)
    mesh = make_mesh(model_parallel=1)
    sharded = ShardedDecoder(model, variables, mesh)

    assert sharded.ctc_greedy_search(feats, lens) == \
        plain.ctc_greedy_search(feats, lens)

    hyps_s, res_s, _, _ = sharded.ctc_prefix_beam_search(feats, lens,
                                                         beam=4)
    hyps_p, res_p, _, _ = plain.ctc_prefix_beam_search(feats, lens, beam=4)
    assert hyps_s == hyps_p
    # The exchanged n-best is replicated — every host holds all of it.
    assert res_s["tokens"].sharding.is_fully_replicated
    np.testing.assert_array_equal(np.asarray(res_s["tokens"]),
                                  np.asarray(res_p["tokens"]))
    np.testing.assert_allclose(np.asarray(res_s["scores"]),
                               np.asarray(res_p["scores"]), rtol=1e-5)

    assert sharded.attention_rescoring(feats, lens, beam=4) == \
        plain.attention_rescoring(feats, lens, beam=4)

    assert sharded.attention(feats, lens, beam=4) == \
        plain.attention(feats, lens, beam=4)

    # The exchanged n-best dict is uniformly replicated — including the
    # viterbi scores + token times timestamp consumers read.
    for k in ("tokens", "lens", "scores", "viterbi", "times"):
        assert res_s[k].sharding.is_fully_replicated, k
        assert res_s[k].shape[0] == feats.shape[0], k

    # attention_rescoring_arrays on a ShardedDecoder must not mix
    # truncated n-best with mesh-padded enc (advisor r2 finding): with a
    # batch not divisible by the data axis it must still match plain.
    s_toks, s_lens = sharded.attention_rescoring_arrays(feats, lens,
                                                        beam=4)
    p_toks, p_lens = plain.attention_rescoring_arrays(feats, lens, beam=4)
    np.testing.assert_array_equal(np.asarray(s_toks), np.asarray(p_toks))
    np.testing.assert_array_equal(np.asarray(s_lens), np.asarray(p_lens))


@pytest.fixture(scope="module")
def transducer_bias():
    from tests.test_hotword_decode import _configs, _data
    cfg = _configs()
    batch = _data()
    model = init_model(cfg)
    args = (batch["feats"], batch["feat_lengths"], batch["labels"],
            batch["label_lengths"], batch["context_list"],
            batch["context_lengths"], batch["hw_labels"])
    variables = model.init(jax.random.PRNGKey(0), *args)
    return model, variables, batch


def test_sharded_decoder_matches_plain_transducer(transducer_bias):
    model, variables, batch = transducer_bias
    feats, lens = batch["feats"], batch["feat_lengths"]
    plain = Decoder(model, variables)
    mesh = make_mesh(model_parallel=1)
    sharded = ShardedDecoder(model, variables, mesh)

    assert sharded.rnnt_greedy_search(feats, lens) == \
        plain.rnnt_greedy_search(feats, lens)

    kw = dict(context_list=batch["context_list"],
              context_lengths=batch["context_lengths"],
              context_filter_state="on")
    got = sharded.rnnt_greedy_search(feats, lens, **kw)
    want = plain.rnnt_greedy_search(feats, lens, **kw)
    assert got == want
    g_s, gl_s = sharded.last_gates
    g_p, gl_p = plain.last_gates
    np.testing.assert_array_equal(np.asarray(gl_s), np.asarray(gl_p))

    res_s, _, _ = sharded.rnnt_beam_search(feats, lens, beam=3)
    res_p, _, _ = plain.rnnt_beam_search(feats, lens, beam=3)
    assert res_s["tokens"].sharding.is_fully_replicated
    assert sharded.rnnt_beam_to_lists(res_s) == \
        plain.rnnt_beam_to_lists(res_p)

    assert sharded.rnnt_beam_attn_rescoring(feats, lens, beam=3) == \
        plain.rnnt_beam_attn_rescoring(feats, lens, beam=3)


def test_sharded_decoder_with_model_parallel_smoke(ctc_aed):
    """(4,2) mesh: tensor-parallel params + data-parallel batch in one
    decode program; hypotheses come back replicated and well-formed.
    (No bitwise-equality claim: the 'model'-axis psum changes reduction
    order.)"""
    model, variables, feats, lens = ctc_aed
    mesh = make_mesh(model_parallel=2)
    sharded = ShardedDecoder(model, variables, mesh)
    hyps = sharded.ctc_greedy_search(feats, lens)
    assert len(hyps) == feats.shape[0]
    hyps2 = sharded.attention_rescoring(feats, lens, beam=4)
    assert len(hyps2) == feats.shape[0]
