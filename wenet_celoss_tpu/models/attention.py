"""Multi-head attention with streaming KV cache.

Parity with reference ``wenet/transformer/attention.py:26-312``
(MultiHeadedAttention with cache-concat streaming, and the rel-pos variant
with the Transformer-XL u/v biases but — deliberately, matching the
reference — *no* rel_shift (`attention.py:305-307`)).

TPU-first design notes:
- everything is batched einsum → MXU; masks are boolean adds of -inf, fused
  by XLA into the softmax;
- the streaming cache is a fixed-size [B, H, C, 2*dk] buffer + valid-length
  scalar instead of a growing concat, so one compiled program serves the
  whole stream (the reference re-concats and re-slices every chunk,
  `attention.py:122-186`).
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn

from wenet_celoss_tpu.models.fast_dropout import FastDropout
import jax.numpy as jnp

# Additive mask value. Kept within XLA exp's safe range-reduction domain
# (see utils/common.py LOG_ZERO note); softmax outputs are re-zeroed under
# the mask anyway.
NEG_INF = -1.0e9


class MultiHeadedAttention(nn.Module):
    n_head: int
    n_feat: int
    dropout_rate: float = 0.0
    dtype: object = None  # compute dtype (e.g. bf16); params stay fp32

    def setup(self):
        assert self.n_feat % self.n_head == 0
        self.d_k = self.n_feat // self.n_head
        self.linear_q = nn.Dense(self.n_feat, dtype=self.dtype)
        self.linear_k = nn.Dense(self.n_feat, dtype=self.dtype)
        self.linear_v = nn.Dense(self.n_feat, dtype=self.dtype)
        self.linear_out = nn.Dense(self.n_feat, dtype=self.dtype)
        self.dropout = FastDropout(self.dropout_rate)

    def _split(self, x: jnp.ndarray) -> jnp.ndarray:
        b, t, _ = x.shape
        return x.reshape(b, t, self.n_head, self.d_k).transpose(0, 2, 1, 3)

    def _use_ln_mm(self):
        # Default OFF: measured SLOWER than letting XLA compose LN with
        # the merged projection at the flagship point (train bench:
        # off 8344, attn-only 7972, conv-only 8093, both 7812 audio-s/s)
        # — the pallas_call boundary costs more than the LN round trip
        # it saves. Kernel + plumbing kept (ops/ffn_pallas.ln_matmul,
        # parity-tested) for configs where LN bandwidth dominates.
        import os

        import jax
        return (jax.default_backend() == "tpu"
                and os.environ.get("LNMM_PALLAS", "0") in ("1", "attn"))

    def qkv(self, query, key, value, ln=None):
        # Merge aliased projections into one MXU matmul (weights
        # concatenated at apply time — 0.2 MB, grads flow through the
        # concat): q=k=v for self-attention, k=v for cross-attention.
        # Halves-to-thirds the small-matmul dispatch count that dominates
        # the AED decoder at U≈33. With a pre-norm module passed as
        # ``ln``, the LayerNorm fuses INTO the merged projection (one
        # Pallas kernel, ops/ffn_pallas.ln_matmul) — removing the
        # standalone LN read/write pair per direction.
        import os as _os
        if (not self.is_initializing() and query is key and key is value
                and _os.environ.get("QKV_MERGE", "1") == "1"):
            ps = [self.linear_q.variables["params"],
                  self.linear_k.variables["params"],
                  self.linear_v.variables["params"]]
            cdt = jnp.dtype(self.dtype) if self.dtype is not None \
                else query.dtype
            w = jnp.concatenate([p["kernel"] for p in ps],
                                axis=1).astype(cdt)
            b = jnp.concatenate([p["bias"] for p in ps]).astype(cdt)
            bb, t, d = query.shape
            if ln is not None and self._use_ln_mm():
                from wenet_celoss_tpu.ops.ffn_pallas import ln_matmul
                pn = ln.variables["params"]
                y = ln_matmul(query.reshape(bb * t, d).astype(cdt),
                              pn["scale"], pn["bias"], w, b,
                              None).reshape(bb, t, 3 * d)
            else:
                xn = ln(query) if ln is not None else query
                y = xn.astype(cdt) @ w + b
            q, k, v = jnp.split(y, 3, axis=-1)
            return self._split(q), self._split(k), self._split(v)
        if ln is not None:
            # Rebind every alias of the pre-norm input, not just query:
            # with QKV_MERGE=0 (the documented bisect lever) the merged
            # self-attention branch above is skipped and K/V must still
            # see the NORMALIZED activations.
            qn = ln(query)
            if key is query:
                key = qn
            if value is query:
                value = qn
            query = qn
        if not self.is_initializing() and key is value:
            ps = [self.linear_k.variables["params"],
                  self.linear_v.variables["params"]]
            cdt = jnp.dtype(self.dtype) if self.dtype is not None \
                else key.dtype
            w = jnp.concatenate([p["kernel"] for p in ps],
                                axis=1).astype(cdt)
            b = jnp.concatenate([p["bias"] for p in ps]).astype(cdt)
            y = key.astype(cdt) @ w + b
            k2, v2 = jnp.split(y, 2, axis=-1)
            return (self._split(self.linear_q(query)), self._split(k2),
                    self._split(v2))
        return (self._split(self.linear_q(query)),
                self._split(self.linear_k(key)),
                self._split(self.linear_v(value)))

    def _attend(self, q, k, v, mask, deterministic):
        """q,k,v: [B,H,T,dk]; mask: [B, 1|Tq, Tk] bool, float additive
        bias (0 = keep, NEG_INF = drop; precomputed once by the encoder
        and shared across layers so each layer skips the two boolean
        select passes over [B,H,T,T]), or None."""
        scores = jnp.einsum("bhqd,bhkd->bhqk", q, k) / jnp.sqrt(
            jnp.asarray(self.d_k, q.dtype))
        additive = mask is not None and mask.dtype != jnp.bool_
        if additive:
            # exp(NEG_INF - max) underflows to exactly 0 in the fp32
            # softmax, so no post-softmax re-zero is needed for masked
            # keys. (Fully-masked pad query rows get uniform attention;
            # every consumer masks pad frames by length.)
            scores = scores + mask[:, None, :, :].astype(scores.dtype)
        elif mask is not None:
            scores = jnp.where(mask[:, None, :, :], scores, NEG_INF)
        attn = nn.softmax(scores.astype(jnp.float32), axis=-1).astype(q.dtype)
        if mask is not None and not additive:
            attn = jnp.where(mask[:, None, :, :], attn, 0.0)
        attn = self.dropout(attn, deterministic=deterministic)
        x = jnp.einsum("bhqk,bhkd->bhqd", attn, v)
        b = x.shape[0]
        return self.linear_out(
            x.transpose(0, 2, 1, 3).reshape(b, -1, self.n_feat))

    def __call__(self, query, key, value, mask=None, pos_emb=None, *,
                 deterministic: bool = True, ln=None):
        q, k, v = self.qkv(query, key, value, ln=ln)
        return self._attend(q, k, v, mask, deterministic)

    def forward_with_cache(self, query, key, value, cache_kv, cache_len,
                           mask=None, pos_emb=None, *,
                           deterministic: bool = True):
        """Streaming step with a fixed-size left-context cache.

        Args:
          cache_kv: [B, H, C, 2*dk] ring of past (k|v), oldest first.
          cache_len: [] or [B] number of valid cached frames (≤ C).
          mask: [B, Tq, C+Tnew] over (cache ++ new) keys, or None.
        Returns: (out [B, Tq, n_feat], new_cache_kv, new_cache_len)
        """
        q, k, v = self.qkv(query, key, value)
        c = cache_kv.shape[2]
        k_cache, v_cache = jnp.split(cache_kv, 2, axis=-1)
        k_all = jnp.concatenate([k_cache, k], axis=2)
        v_all = jnp.concatenate([v_cache, v], axis=2)
        # Valid-key mask: cache slot i valid iff i >= C - cache_len.
        idx = jnp.arange(c + k.shape[2])
        key_valid = (idx >= (c - cache_len)) | (idx >= c)
        full_mask = key_valid[None, None, :]
        if mask is not None:
            full_mask = full_mask & mask
        out = self._attend(q, k_all, v_all, full_mask, deterministic)
        # Slide: keep last C entries of (cache ++ new).
        new_cache = jnp.concatenate([k_all, v_all], axis=-1)[:, :, -c:, :]
        new_len = jnp.minimum(cache_len + k.shape[2], c)
        return out, new_cache, new_len


class RelPositionMultiHeadedAttention(MultiHeadedAttention):
    """Rel-pos MHA following the reference's simplification: matrix_bd is
    computed from the (offset-continued) sinusoid pos_emb without rel_shift
    (reference `attention.py:189-312`)."""

    def setup(self):
        super().setup()
        self.linear_pos = nn.Dense(self.n_feat, use_bias=False,
                                   dtype=self.dtype)
        self.pos_bias_u = self.param(
            "pos_bias_u", nn.initializers.xavier_uniform(),
            (self.n_head, self.d_k))
        self.pos_bias_v = self.param(
            "pos_bias_v", nn.initializers.xavier_uniform(),
            (self.n_head, self.d_k))

    def _rel_attend(self, q, k, v, pos_emb, mask, deterministic):
        """q: [B,H,Tq,dk]; k,v: [B,H,Tk,dk]; pos_emb: [1|B, Tk, n_feat];
        mask: bool or float additive bias (see _attend)."""
        p = self.linear_pos(pos_emb)
        pb, pt = p.shape[0], p.shape[1]
        p = p.reshape(pb, pt, self.n_head, self.d_k).transpose(0, 2, 1, 3)
        q_u = q + self.pos_bias_u[None, :, None, :].astype(q.dtype)
        q_v = q + self.pos_bias_v[None, :, None, :].astype(q.dtype)
        matrix_ac = jnp.einsum("bhqd,bhkd->bhqk", q_u, k)
        matrix_bd = jnp.einsum("bhqd,phkd->bhqk", q_v, p)
        scores = (matrix_ac + matrix_bd) / jnp.sqrt(
            jnp.asarray(self.d_k, q.dtype))
        additive = mask is not None and mask.dtype != jnp.bool_
        if additive:
            scores = scores + mask[:, None, :, :].astype(scores.dtype)
        elif mask is not None:
            scores = jnp.where(mask[:, None, :, :], scores, NEG_INF)
        attn = nn.softmax(scores.astype(jnp.float32), axis=-1).astype(q.dtype)
        if mask is not None and not additive:
            attn = jnp.where(mask[:, None, :, :], attn, 0.0)
        attn = self.dropout(attn, deterministic=deterministic)
        x = jnp.einsum("bhqk,bhkd->bhqd", attn, v)
        b = x.shape[0]
        return self.linear_out(
            x.transpose(0, 2, 1, 3).reshape(b, -1, self.n_feat))

    def __call__(self, query, key, value, mask=None, pos_emb=None, *,
                 deterministic: bool = True, ln=None):
        # NOTE: a fused flash-style rel-pos Pallas kernel was built and
        # measured here; at the flagship operating point (T'=127, dk=64)
        # there is nothing to tile along T and XLA's batched einsums win
        # (7496 vs 6941 audio-s/s), so the kernel was removed (r3; see
        # ROADMAP "attention kernel decision"). Long-context flash would
        # be a different, T-tiled kernel.
        q, k, v = self.qkv(query, key, value, ln=ln)
        return self._rel_attend(q, k, v, pos_emb, mask, deterministic)

    def forward_with_cache(self, query, key, value, cache_kv, cache_len,
                           mask=None, pos_emb=None, *,
                           deterministic: bool = True):
        q, k, v = self.qkv(query, key, value)
        c = cache_kv.shape[2]
        k_cache, v_cache = jnp.split(cache_kv, 2, axis=-1)
        k_all = jnp.concatenate([k_cache, k], axis=2)
        v_all = jnp.concatenate([v_cache, v], axis=2)
        idx = jnp.arange(c + k.shape[2])
        key_valid = (idx >= (c - cache_len)) | (idx >= c)
        full_mask = key_valid[None, None, :]
        if mask is not None:
            full_mask = full_mask & mask
        out = self._rel_attend(q, k_all, v_all, pos_emb, full_mask,
                               deterministic)
        new_cache = jnp.concatenate([k_all, v_all], axis=-1)[:, :, -c:, :]
        new_len = jnp.minimum(cache_len + k.shape[2], c)
        return out, new_cache, new_len
