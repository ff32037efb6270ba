"""Transducer predictors (label-history networks).

Parity with reference ``wenet/transducer/predictor.py``:
- RNNPredictor (`predictor.py:58-201`): embed → stacked LSTM → projection,
  with per-step state for decoding (ApplyPadding keeps finished beams'
  state frozen, `predictor.py:9-15`).
- EmbeddingPredictor (`predictor.py:203-367`, arXiv 2109.07513): stateless
  multi-head positional attention over an n-token history window.
- ConvPredictor (`predictor.py:369-481`): depthwise conv over the history.

TPU design: state is a plain pytree of fixed-shape arrays (beam search
gathers/scatters it with vmap-friendly indexing — no batch_to_cache /
cache_to_batch list shuffling as in `predictor.py:123-158`). The training
forward over [B, U] runs the recurrence with `nn.RNN`/conv, which XLA
unrolls into fused scans.
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import flax.linen as nn

from wenet_celoss_tpu.models.fast_dropout import FastDropout
import jax
import jax.numpy as jnp

from wenet_celoss_tpu.utils.common import get_activation


def _use_lstm_pallas() -> bool:
    import os
    return (jax.default_backend() == "tpu"
            and os.environ.get("LSTM_PALLAS", "1") == "1")


class RNNPredictor(nn.Module):
    voca_size: int
    embed_size: int
    output_size: int
    embed_dropout: float = 0.1
    hidden_size: int = 256
    num_layers: int = 2
    bias: bool = True
    rnn_type: str = "lstm"
    dropout: float = 0.1

    def setup(self):
        assert self.rnn_type in ("lstm", "gru")
        self.embed = nn.Embed(self.voca_size, self.embed_size)
        self.embed_drop = FastDropout(self.embed_dropout)
        cell_cls = nn.OptimizedLSTMCell if self.rnn_type == "lstm" \
            else nn.GRUCell
        self.cells = [cell_cls(features=self.hidden_size,
                               name=f"rnn_{i}")
                      for i in range(self.num_layers)]
        self.inter_drop = FastDropout(self.dropout)
        self.projection = nn.Dense(self.output_size, use_bias=self.bias)

    def init_state(self, batch_size: int) -> Dict[str, jnp.ndarray]:
        shape = (self.num_layers, batch_size, self.hidden_size)
        if self.rnn_type == "lstm":
            return {"h": jnp.zeros(shape), "c": jnp.zeros(shape)}
        return {"h": jnp.zeros(shape)}

    def _run_layers(self, x, state, deterministic):
        """x: [B, U, E]; state pytree → (out [B, U, H], new_state)."""
        new_h, new_c = [], []
        for i, cell in enumerate(self.cells):
            if self.rnn_type == "lstm":
                carry0 = (state["c"][i], state["h"][i])
            else:
                carry0 = state["h"][i]

            if self.rnn_type == "lstm" and not self.is_initializing():
                # Hoisted-input LSTM: the x-side gate projections for ALL
                # U steps run as ONE [B*U, E] x [E, 4H] MXU matmul; only
                # the h-recurrence stays sequential. Identical math and
                # params as OptimizedLSTMCell (gate order i,f,g,o; bias
                # on the hidden-side projections).
                cp = cell.variables["params"]
                wi = jnp.concatenate(
                    [cp[g]["kernel"] for g in ("ii", "if", "ig", "io")], 1)
                wh = jnp.concatenate(
                    [cp[g]["kernel"] for g in ("hi", "hf", "hg", "ho")], 1)
                bh = jnp.concatenate(
                    [cp[g]["bias"] for g in ("hi", "hf", "hg", "ho")])
                xw = x @ wi + bh                           # [B, U, 4H]

                def step(carry, xwt, wh=wh):
                    c, h = carry
                    z = xwt + h @ wh
                    i_, f_, g_, o_ = jnp.split(z, 4, axis=-1)
                    c2 = nn.sigmoid(f_) * c + nn.sigmoid(i_) * jnp.tanh(g_)
                    h2 = nn.sigmoid(o_) * jnp.tanh(c2)
                    return (c2, h2), h2

                carry, out = jax.lax.scan(step, carry0,
                                          jnp.swapaxes(xw, 0, 1), unroll=8)
                out = jnp.swapaxes(out, 0, 1)
            else:
                carry, out = nn.scan(
                    lambda cell, carry, xt: cell(carry, xt),
                    variable_broadcast="params", split_rngs={"params": False},
                    in_axes=1, out_axes=1, unroll=8)(cell, carry0, x)
            if self.rnn_type == "lstm":
                new_c.append(carry[0])
                new_h.append(carry[1])
            else:
                new_h.append(carry)
            x = out
            if i < self.num_layers - 1:
                x = self.inter_drop(x, deterministic=deterministic)
        new_state = {"h": jnp.stack(new_h)}
        if self.rnn_type == "lstm":
            new_state["c"] = jnp.stack(new_c)
        return x, new_state

    def _fused_seq(self, x, deterministic):
        """Whole-sequence fused Pallas path (zero initial state): both
        LSTM layers + the inter-layer dropout run as ONE kernel with the
        recurrent states resident in VMEM (ops/lstm_pallas.py). The
        hoisted layer-1 input projection stays outside as one MXU matmul
        (same hoisting as _run_layers)."""
        from wenet_celoss_tpu.ops.lstm_pallas import lstm2_seq
        from wenet_celoss_tpu.ops.lstm_pallas import fused_rows_for
        rows = fused_rows_for(x.shape[1], x.shape[0])
        cdt = jnp.bfloat16
        cp1 = self.cells[0].variables["params"]
        cp2 = self.cells[1].variables["params"]
        wi1 = jnp.concatenate(
            [cp1[g]["kernel"] for g in ("ii", "if", "ig", "io")], 1)
        bh1 = jnp.concatenate(
            [cp1[g]["bias"] for g in ("hi", "hf", "hg", "ho")])
        wh1 = jnp.concatenate(
            [cp1[g]["kernel"] for g in ("hi", "hf", "hg", "ho")], 1)
        wi2 = jnp.concatenate(
            [cp2[g]["kernel"] for g in ("ii", "if", "ig", "io")], 1)
        bh2 = jnp.concatenate(
            [cp2[g]["bias"] for g in ("hi", "hf", "hg", "ho")])
        wh2 = jnp.concatenate(
            [cp2[g]["kernel"] for g in ("hi", "hf", "hg", "ho")], 1)
        xw1 = (jax.lax.dot_general(
            x.astype(cdt), wi1.astype(cdt), (((2,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
            + bh1[None, None, :]).astype(cdt)
        rate = 0.0 if deterministic else self.dropout
        if rate > 0.0:
            seed = jax.random.randint(self.make_rng("dropout"), (), 0,
                                      2**31 - 1, dtype=jnp.int32)
        else:
            seed = jnp.zeros((), jnp.int32)
        return lstm2_seq(xw1, wh1.astype(cdt), wi2.astype(cdt), bh2,
                         wh2.astype(cdt), seed, rate, rows)

    def __call__(self, tokens: jnp.ndarray,
                 state: Optional[Dict] = None, *,
                 deterministic: bool = True) -> jnp.ndarray:
        """tokens [B, U] → [B, U, output_size]."""
        from wenet_celoss_tpu.ops.lstm_pallas import fused_rows_for
        if (state is None and not self.is_initializing()
                and self.rnn_type == "lstm" and self.num_layers == 2
                and self.hidden_size % 128 == 0 and _use_lstm_pallas()
                and fused_rows_for(tokens.shape[1], tokens.shape[0])
                is not None):
            # One-hot matmul embedding: identical values to the gather,
            # but the backward is an MXU matmul (onehot^T dx) instead of
            # a scatter-add (an order of magnitude slower on TPU — same
            # rationale as the V-axis gathers in ops/ctc_loss.py).
            emb = self.embed.variables["params"]["embedding"]
            oh = jax.nn.one_hot(tokens, self.voca_size, dtype=jnp.bfloat16)
            x = jax.lax.dot_general(
                oh, emb.astype(jnp.bfloat16), (((2,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            x = self.embed_drop(x, deterministic=deterministic)
            return self.projection(self._fused_seq(x, deterministic))
        x = self.embed_drop(self.embed(tokens), deterministic=deterministic)
        if state is None:
            state = self.init_state(tokens.shape[0])
        out, _ = self._run_layers(x, state, deterministic)
        return self.projection(out)

    def forward_step(self, token: jnp.ndarray, state: Dict,
                     padding: Optional[jnp.ndarray] = None):
        """One decode step.

        Args:
          token: [B] int32; padding: [B] 1=frozen (keep old state).
        Returns: (out [B, output_size], new_state)
        """
        x = self.embed(token[:, None])
        out, new_state = self._run_layers(x, state, True)
        out = self.projection(out)[:, 0]
        if padding is not None:
            freeze = padding[None, :, None].astype(jnp.float32)
            new_state = jax.tree_util.tree_map(
                lambda new, old: new * (1 - freeze) + old * freeze,
                new_state, state)
        return out, new_state


class EmbeddingPredictor(nn.Module):
    """Stateless multi-head positional predictor (arXiv 2109.07513)."""
    voca_size: int
    embed_size: int
    embed_dropout: float = 0.1
    n_head: int = 2
    history_size: int = 2
    activation: str = "swish"
    bias: bool = False

    @property
    def context_size(self) -> int:
        return self.history_size + 1

    def setup(self):
        self.embed = nn.Embed(self.voca_size, self.embed_size)
        self.embed_drop = FastDropout(self.embed_dropout)
        # pos_embed weight [n_head * context, embed] viewed as
        # [n_head, embed, context] in the reference; keep the natural shape.
        self.pos_embed = self.param(
            "pos_embed", nn.initializers.lecun_normal(),
            (self.n_head, self.context_size, self.embed_size))
        self.ffn = nn.Dense(self.embed_size)
        self.norm = nn.LayerNorm(epsilon=1e-5)

    def init_state(self, batch_size: int) -> Dict[str, jnp.ndarray]:
        return {"history": jnp.zeros(
            (batch_size, self.context_size - 1, self.embed_size))}

    def _attend(self, windows: jnp.ndarray) -> jnp.ndarray:
        """windows: [B, U, C, E] → [B, U, E] per-head weighted history sum."""
        act = get_activation(self.activation)
        # weight[b,u,h,c] = sum_e windows[b,u,c,e] * pos[h,c,e]
        weight = jnp.einsum("buce,hce->buhc", windows, self.pos_embed)
        out = jnp.einsum("buhc,buce->buhe", weight, windows)
        out = jnp.sum(out, axis=2) / (self.n_head * self.context_size)
        return act(self.norm(self.ffn(out)))

    def __call__(self, tokens: jnp.ndarray, state: Optional[Dict] = None, *,
                 deterministic: bool = True) -> jnp.ndarray:
        x = self.embed_drop(self.embed(tokens), deterministic=deterministic)
        b = tokens.shape[0]
        zeros = state["history"] if state is not None else \
            jnp.zeros((b, self.context_size - 1, self.embed_size), x.dtype)
        x = jnp.concatenate([zeros.astype(x.dtype), x], axis=1)
        u = tokens.shape[1]
        idx = jnp.arange(u)[:, None] + jnp.arange(self.context_size)[None, :]
        windows = x[:, idx]                                  # [B, U, C, E]
        return self._attend(windows)

    def forward_step(self, token: jnp.ndarray, state: Dict,
                     padding: Optional[jnp.ndarray] = None):
        x = self.embed(token[:, None])
        ctx = jnp.concatenate([state["history"].astype(x.dtype), x], axis=1)
        out = self._attend(ctx[:, None, :, :])[:, 0]
        new_hist = ctx[:, 1:, :]
        if padding is not None:
            freeze = padding[:, None, None].astype(jnp.float32)
            new_hist = new_hist * (1 - freeze) + state["history"] * freeze
        return out, {"history": new_hist}


class ConvPredictor(nn.Module):
    """Depthwise-conv-over-history predictor (`predictor.py:369-481`)."""
    voca_size: int
    embed_size: int
    embed_dropout: float = 0.1
    history_size: int = 2
    activation: str = "relu"
    bias: bool = False

    @property
    def context_size(self) -> int:
        return self.history_size + 1

    def setup(self):
        self.embed = nn.Embed(self.voca_size, self.embed_size)
        self.embed_drop = FastDropout(self.embed_dropout)
        self.conv = nn.Conv(self.embed_size, (self.context_size,),
                            padding="VALID", feature_group_count=self.embed_size,
                            use_bias=self.bias)
        self.norm = nn.LayerNorm(epsilon=1e-5)

    def init_state(self, batch_size: int) -> Dict[str, jnp.ndarray]:
        return {"history": jnp.zeros(
            (batch_size, self.context_size - 1, self.embed_size))}

    def __call__(self, tokens: jnp.ndarray, state: Optional[Dict] = None, *,
                 deterministic: bool = True) -> jnp.ndarray:
        act = get_activation(self.activation)
        x = self.embed_drop(self.embed(tokens), deterministic=deterministic)
        b = tokens.shape[0]
        zeros = state["history"] if state is not None else \
            jnp.zeros((b, self.context_size - 1, self.embed_size), x.dtype)
        x = jnp.concatenate([zeros.astype(x.dtype), x], axis=1)
        out = self.conv(x)
        return act(self.norm(out))

    def forward_step(self, token: jnp.ndarray, state: Dict,
                     padding: Optional[jnp.ndarray] = None):
        act = get_activation(self.activation)
        x = self.embed(token[:, None])
        ctx = jnp.concatenate([state["history"].astype(x.dtype), x], axis=1)
        out = act(self.norm(self.conv(ctx)))[:, 0]
        new_hist = ctx[:, 1:, :]
        if padding is not None:
            freeze = padding[:, None, None].astype(jnp.float32)
            new_hist = new_hist * (1 - freeze) + state["history"] * freeze
        return out, {"history": new_hist}


PREDICTOR_CLASSES = {
    "rnn": RNNPredictor,
    "embedding": EmbeddingPredictor,
    "conv": ConvPredictor,
}
