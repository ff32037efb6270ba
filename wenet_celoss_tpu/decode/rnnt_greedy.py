"""Batched, jit-able RNN-T greedy search (+ hotword-gate variant).

Parity with reference ``wenet/transducer/search/greedy_search.py:34-430``
(basic_greedy_search / _both): frame loop with up to ``n_steps`` emissions
per frame via predictor step + joint argmax. Re-designed for XLA as a
`lax.scan` over frames with a static inner emission budget and a fixed-size
output buffer — the whole batch decodes in one compiled program (the
reference loops per frame per utterance in python).

The gate variant mirrors the fork's context-gated decode: it maintains
BOTH biased and unbiased encoder/predictor streams, classifies each
candidate emission with the hotword gate, and selects the stream per step
(`greedy_search.py:94-176`). The reference's mutable backtracking repair
(pop caches, rewind t — `greedy_search.py:117-137`) is re-thought for jit
as gate-consistent stream selection at emission time; a two-pass constrained
re-decode can be layered on top for exact parity.
"""

from __future__ import annotations

from functools import partial
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np


def rnnt_greedy_search(predictor_step: Callable, joint_step: Callable,
                       init_state, encoder_out, encoder_lens,
                       blank: int = 0, n_steps: int = 4,
                       u_max: int = 0):
    """Greedy decode.

    Args:
      predictor_step: (token [B], state, padding [B]) ->
        (pred_out [B, P], state); padding 1 freezes that row's state.
      joint_step: (enc_t [B, E], pred_out [B, P]) -> logits [B, V].
      init_state: predictor state pytree for batch size B.
      encoder_out: [B, T, E]; encoder_lens: [B].
    Returns: (tokens [B, U_cap], lens [B])
    """
    b, t_max, _ = encoder_out.shape
    if u_max <= 0:
        # True emission bound (the reference emits up to n_steps tokens per
        # frame, greedy_search.py:421-430); a smaller cap silently truncates
        # degenerate hyps and breaks reference parity.
        u_max = n_steps * t_max
    pred0, state0 = predictor_step(jnp.full((b,), blank, jnp.int32),
                                   init_state, jnp.zeros((b,), jnp.int32))
    buf0 = jnp.zeros((b, u_max), jnp.int32)
    cnt0 = jnp.zeros((b,), jnp.int32)

    def frame(carry, inputs):
        pred_out, state, buf, cnt = carry
        enc_t, t = inputs                                  # [B, E], scalar
        frame_ok0 = t < encoder_lens                       # [B]

        def emit(sub_carry, _):
            pred_out, state, buf, cnt, alive = sub_carry
            logits = joint_step(enc_t, pred_out)           # [B, V]
            tok = jnp.argmax(logits, axis=-1).astype(jnp.int32)
            do = alive & (tok != blank) & (cnt < u_max)
            buf = jnp.where(
                jax.nn.one_hot(jnp.minimum(cnt, u_max - 1), u_max,
                               dtype=bool) & do[:, None],
                tok[:, None], buf)
            cnt = cnt + do.astype(jnp.int32)
            # The predictor's own padding mechanism freezes state for
            # non-emitting rows (reference ApplyPadding, predictor.py:9-15).
            new_pred, new_state = predictor_step(
                tok, state, (~do).astype(jnp.int32))
            keep = do[:, None].astype(pred_out.dtype)
            pred_out = new_pred * keep + pred_out * (1 - keep)
            state = new_state
            alive = do
            return (pred_out, state, buf, cnt, alive), None

        (pred_out, state, buf, cnt, _), _ = jax.lax.scan(
            emit, (pred_out, state, buf, cnt, frame_ok0), None,
            length=n_steps)
        return (pred_out, state, buf, cnt), None

    ts = jnp.arange(t_max)
    enc_seq = jnp.moveaxis(encoder_out, 1, 0)              # [T, B, E]
    (pred_out, state, buf, cnt), _ = jax.lax.scan(
        frame, (pred0, state0, buf0, cnt0), (enc_seq, ts))
    return buf, cnt


def rnnt_greedy_search_labelsync(predictor_step: Callable,
                                 joint_frames: Callable, init_state,
                                 t_max: int, encoder_lens,
                                 blank: int = 0, n_steps: int = 4,
                                 u_max: int = 0):
    """Label-synchronous greedy decode — semantically IDENTICAL to
    :func:`rnnt_greedy_search`, restructured for the TPU.

    The frame-synchronous scan runs T·n_steps sequential iterations of
    tiny per-frame matmuls (the device sits idle between them). But the
    predictor state only changes on EMISSION: between emissions the joint
    argmax of every remaining frame is computable in parallel. So iterate
    per LABEL: one `joint_frames` evaluation scores ALL frames against
    the current predictor state in a single large MXU matmul, each row
    jumps straight to its first non-blank frame, emits, and steps its
    predictor. Sequential iterations collapse from T·n_steps (508 at the
    flagship point) to max-emissions+1 (≈ label count, ~35) — ~24× fewer
    dispatches, each MXU-shaped.

    Args:
      joint_frames: (pred_out [B, P]) -> argmax token ids [B, T] of the
        joint of EVERY encoder frame against this predictor state (built
        from a pre-projected enc_j so only the pred half recomputes).
      t_max: number of encoder frames (static).
    Returns: (tokens [B, U_cap], lens [B]) — same contract as
      rnnt_greedy_search.
    """
    b = encoder_lens.shape[0]
    if u_max <= 0:
        u_max = n_steps * t_max
    pred0, state0 = predictor_step(jnp.full((b,), blank, jnp.int32),
                                   init_state, jnp.zeros((b,), jnp.int32))
    buf0 = jnp.zeros((b, u_max), jnp.int32)
    cnt0 = jnp.zeros((b,), jnp.int32)
    t_ptr0 = jnp.zeros((b,), jnp.int32)    # next frame to (re)consider
    k0 = jnp.zeros((b,), jnp.int32)        # emissions already at t_ptr
    done0 = encoder_lens <= 0
    fidx = jnp.arange(t_max)[None, :]

    def cond(c):
        it, done = c[0], c[-1]
        return jnp.any(~done) & (it <= u_max)

    def body(c):
        it, t_ptr, k, pred_out, state, buf, cnt, done = c
        toks_all = joint_frames(pred_out)                    # [B, T]
        elig = (fidx >= t_ptr[:, None]) & \
            (fidx < encoder_lens[:, None]) & (toks_all != blank)
        has = jnp.any(elig, axis=1)
        do = has & ~done & (cnt < u_max)
        f = jnp.argmax(elig, axis=1)                         # first hit
        tok = jnp.take_along_axis(toks_all, f[:, None], axis=1)[:, 0]
        tok = jnp.where(do, tok, blank)

        buf = jnp.where(
            jax.nn.one_hot(jnp.minimum(cnt, u_max - 1), u_max,
                           dtype=bool) & do[:, None],
            tok[:, None], buf)
        cnt = cnt + do.astype(jnp.int32)

        # Per-frame emission budget (reference: at most n_steps tokens
        # per frame, then advance): landing on the same frame increments
        # k; a fresh frame restarts it at 1; hitting n_steps moves past.
        k_new = jnp.where(f == t_ptr, k + 1, 1)
        exhaust = k_new >= n_steps
        t_ptr = jnp.where(do, jnp.where(exhaust, f + 1, f), t_ptr)
        k = jnp.where(do, jnp.where(exhaust, 0, k_new), k)
        done = done | ~do

        new_pred, new_state = predictor_step(tok, state,
                                             (~do).astype(jnp.int32))
        keep = do[:, None].astype(pred_out.dtype)
        pred_out = new_pred * keep + pred_out * (1 - keep)
        return it + 1, t_ptr, k, pred_out, new_state, buf, cnt, done

    _, _, _, _, _, buf, cnt, _ = jax.lax.while_loop(
        cond, body, (jnp.zeros((), jnp.int32), t_ptr0, k0, pred0, state0,
                     buf0, cnt0, done0))
    return buf, cnt


def rnnt_greedy_chunk(predictor_step: Callable, joint_step: Callable,
                      carry, encoder_chunk, blank: int = 0,
                      n_steps: int = 4):
    """Greedy-decode one encoder chunk, resuming from ``carry`` =
    (pred_out [B, P], predictor state). Returns (tokens [B, Tc*n_steps],
    lens [B], new_carry) — the streaming building block for serving."""
    pred_out, state = carry
    b, t_c, _ = encoder_chunk.shape
    u_cap = t_c * n_steps
    buf0 = jnp.zeros((b, u_cap), jnp.int32)
    cnt0 = jnp.zeros((b,), jnp.int32)

    def frame(fc, enc_t):
        pred_out, state, buf, cnt = fc

        def emit(sub_carry, _):
            pred_out, state, buf, cnt, alive = sub_carry
            logits = joint_step(enc_t, pred_out)
            tok = jnp.argmax(logits, axis=-1).astype(jnp.int32)
            do = alive & (tok != blank) & (cnt < u_cap)
            buf = jnp.where(
                jax.nn.one_hot(jnp.minimum(cnt, u_cap - 1), u_cap,
                               dtype=bool) & do[:, None],
                tok[:, None], buf)
            cnt = cnt + do.astype(jnp.int32)
            new_pred, new_state = predictor_step(
                tok, state, (~do).astype(jnp.int32))
            keep = do[:, None].astype(pred_out.dtype)
            pred_out = new_pred * keep + pred_out * (1 - keep)
            return (pred_out, new_state, buf, cnt, do), None

        (pred_out, state, buf, cnt, _), _ = jax.lax.scan(
            emit, (pred_out, state, buf, cnt, jnp.ones((b,), bool)), None,
            length=n_steps)
        return (pred_out, state, buf, cnt), None

    (pred_out, state, buf, cnt), _ = jax.lax.scan(
        frame, (pred_out, state, buf0, cnt0),
        jnp.moveaxis(encoder_chunk, 1, 0))
    return buf, cnt, (pred_out, state)


def rnnt_gated_greedy_search(predictor_step: Callable,
                             predictor_bias_step: Callable,
                             joint_step: Callable,
                             gate_step: Callable,
                             init_state,
                             encoder_out, encoder_out_biased, enc_bias,
                             encoder_lens, blank: int = 0, n_steps: int = 4,
                             u_max: int = 0, gate_on: bool = True,
                             predictor_bias_step_empty: Callable = None):
    """Hotword-gate-aware greedy decode over dual streams.

    Args (beyond rnnt_greedy_search):
      predictor_bias_step: (pred_out [B, P]) -> (biased_pred [B, P],
        pred_bias_branch [B, E]).
      gate_step: (enc_bias_t [B, E], pred_bias_u [B, E]) -> gate logits
        [B, num_labels]; argmax 1 = hotword.
      encoder_out / encoder_out_biased / enc_bias: [B, T, E]. Per the
        reference (`greedy_search.py:64-73`), "encoder_out" should be the
        EMPTY-LIST-biased stream, not the raw encoder output — the model
        never sees unbiased activations in training.
      gate_on: False decodes purely on the biased streams (reference
        context_filter_state == 'off').
      predictor_bias_step_empty: like predictor_bias_step but attending
        over the empty (sentinel-only) hotword list; identity fallback.
    Returns: (tokens [B, U_cap], lens [B], gates [B, U_cap])
    """
    if predictor_bias_step_empty is None:
        predictor_bias_step_empty = lambda p: (p, p)
    b, t_max, _ = encoder_out.shape
    if u_max <= 0:
        # True emission bound (the reference emits up to n_steps tokens per
        # frame, greedy_search.py:421-430); a smaller cap silently truncates
        # degenerate hyps and breaks reference parity.
        u_max = n_steps * t_max
    pred0, state0 = predictor_step(jnp.full((b,), blank, jnp.int32),
                                   init_state, jnp.zeros((b,), jnp.int32))
    buf0 = jnp.zeros((b, u_max), jnp.int32)
    gate_buf0 = jnp.zeros((b, u_max), jnp.int32)
    cnt0 = jnp.zeros((b,), jnp.int32)

    def frame(carry, inputs):
        pred_out, state, buf, gate_buf, cnt = carry
        enc_t, enc_b_t, bias_t, t = inputs
        frame_ok0 = t < encoder_lens

        def emit(sub_carry, _):
            pred_out, state, buf, gate_buf, cnt, alive = sub_carry
            pred_biased, pred_bias_branch = predictor_bias_step(pred_out)
            pred_empty, _ = predictor_bias_step_empty(pred_out)
            gate_logits = gate_step(bias_t, pred_bias_branch)
            gate = jnp.argmax(gate_logits, axis=-1).astype(jnp.int32)
            use_bias = (gate > 0) if gate_on else jnp.ones((b,), bool)
            enc_sel = jnp.where(use_bias[:, None], enc_b_t, enc_t)
            pred_sel = jnp.where(use_bias[:, None], pred_biased, pred_empty)
            logits = joint_step(enc_sel, pred_sel)
            tok = jnp.argmax(logits, axis=-1).astype(jnp.int32)
            do = alive & (tok != blank) & (cnt < u_max)
            onehot = jax.nn.one_hot(jnp.minimum(cnt, u_max - 1), u_max,
                                    dtype=bool) & do[:, None]
            buf = jnp.where(onehot, tok[:, None], buf)
            gate_buf = jnp.where(onehot, gate[:, None], gate_buf)
            cnt = cnt + do.astype(jnp.int32)
            new_pred, new_state = predictor_step(
                tok, state, (~do).astype(jnp.int32))
            keep = do[:, None].astype(pred_out.dtype)
            pred_out = new_pred * keep + pred_out * (1 - keep)
            state = new_state
            return (pred_out, state, buf, gate_buf, cnt, do), None

        (pred_out, state, buf, gate_buf, cnt, _), _ = jax.lax.scan(
            emit, (pred_out, state, buf, gate_buf, cnt, frame_ok0), None,
            length=n_steps)
        return (pred_out, state, buf, gate_buf, cnt), None

    ts = jnp.arange(t_max)
    (pred_out, state, buf, gate_buf, cnt), _ = jax.lax.scan(
        frame, (pred0, state0, buf0, gate_buf0, cnt0),
        (jnp.moveaxis(encoder_out, 1, 0),
         jnp.moveaxis(encoder_out_biased, 1, 0),
         jnp.moveaxis(enc_bias, 1, 0), ts))
    return buf, cnt, gate_buf


def greedy_to_lists(tokens, lens):
    tokens, lens = np.asarray(tokens), np.asarray(lens)
    return [[int(x) for x in tokens[i, : lens[i]]]
            for i in range(tokens.shape[0])]


def rnnt_gated_greedy_search_exact(predictor_step: Callable,
                                   predictor_bias_step: Callable,
                                   predictor_bias_step_empty: Callable,
                                   joint_step: Callable,
                                   gate_step: Callable,
                                   init_state,
                                   encoder_out_empty, encoder_out_biased,
                                   enc_bias, encoder_len: int,
                                   blank: int = 0, n_steps: int = 4,
                                   gate_on: bool = True,
                                   loss_mode: str = "pred"):
    """EXACT-parity re-implementation of the fork's backtracking gated
    greedy decode (reference `wenet/transducer/search/greedy_search.py:
    34-176`), one utterance per call (batch dim 1 throughout).

    Mirrored faithfully, including details that differ from the batched
    `rnnt_gated_greedy_search` fast path:

    - Stream CROSSING (`greedy_search.py:139-151`): gate==1 pairs the
      real-list-biased ENCODER with the EMPTY-list-biased PREDICTOR;
      gate==0 pairs the empty-list-biased encoder with the real-biased
      predictor.
    - Backtracking repair (`greedy_search.py:110-137`): when a gate-1
      step immediately follows a gate-0 step, pop the gate-0 token and
      its caches, rewind to the frame of that step (`last_t`), and replay
      with gate forced to 1 until passing the frame where the 1 appeared
      (`go_back_end`).
    - Per-step gate record `result` aligns with predictor steps, not
      emissions, and `per_frame_noblk` is decremented on backtrack
      (`greedy_search.py:125`).

    This is a host loop (so is the reference); every step callable runs
    jitted on device. Returns (hyps, gates) as python lists.
    """
    t = 0
    hyps: list = []
    result: list = []
    prev_out_nblk = True
    per_frame_noblk = 0
    go_back_flag = 0
    go_back_end = -1
    last_t = 0
    cache = init_state
    pred_input = jnp.full((1,), blank, jnp.int32)
    no_pad = jnp.zeros((1,), jnp.int32)
    step_list: list = []
    cache_list: list = []
    input_list: list = []
    pred_sel = None

    while t < encoder_len:
        enc_t_empty = encoder_out_empty[:, t]
        enc_t_biased = encoder_out_biased[:, t]
        bias_t = enc_bias[:, t]
        if prev_out_nblk:
            pred_out_step, new_cache = predictor_step(pred_input, cache,
                                                      no_pad)
            step_list.append(pred_out_step)
            cache_list.append(cache)
            input_list.append(pred_input)
            _, pred_bias_branch = predictor_bias_step(pred_out_step)
            if gate_on:
                gate = int(jnp.argmax(gate_step(bias_t, pred_bias_branch),
                                      axis=-1)[0])
                if go_back_flag == 0:
                    if gate == 0:
                        result.append(0)
                        last_t = t
                    else:
                        if result and result[-1] == 0:
                            go_back_end = t
                            t = last_t
                            go_back_flag = 1
                            result.pop()
                            if hyps:  # reference assumes non-empty
                                hyps.pop()
                            input_list.pop()
                            per_frame_noblk -= 1
                            step_list.pop()
                            cache_list.pop()
                            cache = cache_list[-1]
                            pred_input = input_list[-1]
                            continue
                        result.append(1)
                else:
                    result.append(1)
                    if t >= go_back_end:
                        go_back_flag = 0
            else:
                result.append(1)
            if loss_mode == "pred":
                # 'pred'-mode CROSSES streams (greedy_search.py:141-144):
                # gate 1 pairs the real-biased encoder with the EMPTY-
                # biased predictor and vice versa.
                if result[-1] == 1:
                    pred_sel, _ = predictor_bias_step_empty(pred_out_step)
                else:
                    pred_sel, _ = predictor_bias_step(pred_out_step)
            else:
                # 'both'-mode keeps streams aligned
                # (greedy_search.py:396-408): gate 1 → real-biased
                # encoder+predictor, gate 0 → empty-biased pair.
                if result[-1] == 1:
                    pred_sel, _ = predictor_bias_step(pred_out_step)
                else:
                    pred_sel, _ = predictor_bias_step_empty(pred_out_step)

        enc_sel = enc_t_biased if result[-1] == 1 else enc_t_empty
        logits = joint_step(enc_sel, pred_sel)
        tok = int(jnp.argmax(logits, axis=-1)[0])
        if tok != blank:
            hyps.append(tok)
            prev_out_nblk = True
            per_frame_noblk += 1
            pred_input = jnp.full((1,), tok, jnp.int32)
            cache = new_cache
        if tok == blank or per_frame_noblk >= n_steps:
            if tok == blank:
                prev_out_nblk = False
            t += 1
            per_frame_noblk = 0
    return hyps, result


def rnnt_gated_greedy_search_labelsync(
        predictor_step: Callable, predictor_bias_step: Callable,
        joint_frames_sel: Callable, gate_frames: Callable, init_state,
        t_max: int, encoder_lens, blank: int = 0, n_steps: int = 4,
        u_max: int = 0, gate_on: bool = True,
        predictor_bias_step_empty: Callable = None):
    """Label-synchronous variant of :func:`rnnt_gated_greedy_search` —
    same emissions, ~emission-count sequential iterations.

    Decode-time hotword gating is PREDICTOR-INDEPENDENT: the per-step
    gate attends a singleton key (the current frame's enc-bias branch,
    `hw_gate_step`), and softmax over one key weights it 1.0 regardless
    of the query — so the whole [B, T] gate map is computable up front
    (``gate_frames()``), the encoder stream can be pre-selected per
    frame, and only the per-frame PREDICTOR stream choice remains inside
    the loop (two ``joint_frames_sel`` evaluations, biased + empty,
    selected by the gate map). Equivalence to the frame-synchronous scan
    is tested in tests/test_decode.py.

    Args:
      joint_frames_sel: (pred_biased [B, P], pred_empty [B, P],
        use_bias [B, T] bool) -> argmax token ids [B, T] of the joint of
        every (gate-selected) encoder frame against the gate-selected
        predictor stream.
      gate_frames: () -> gate ids [B, T] (argmax of the hw gate per
        frame).
    Returns: (tokens [B, U_cap], lens [B], gates [B, U_cap]).
    """
    if predictor_bias_step_empty is None:
        predictor_bias_step_empty = lambda p: (p, p)
    b = encoder_lens.shape[0]
    if u_max <= 0:
        u_max = n_steps * t_max
    gate_all = gate_frames()                                  # [B, T]
    use_bias_all = (gate_all > 0) if gate_on else \
        jnp.ones_like(gate_all, dtype=bool)
    pred0, state0 = predictor_step(jnp.full((b,), blank, jnp.int32),
                                   init_state, jnp.zeros((b,), jnp.int32))
    buf0 = jnp.zeros((b, u_max), jnp.int32)
    gate_buf0 = jnp.zeros((b, u_max), jnp.int32)
    cnt0 = jnp.zeros((b,), jnp.int32)
    t_ptr0 = jnp.zeros((b,), jnp.int32)
    k0 = jnp.zeros((b,), jnp.int32)
    done0 = encoder_lens <= 0
    fidx = jnp.arange(t_max)[None, :]

    def cond(c):
        it, done = c[0], c[-1]
        return jnp.any(~done) & (it <= u_max)

    def body(c):
        it, t_ptr, k, pred_out, state, buf, gate_buf, cnt, done = c
        pred_biased, _ = predictor_bias_step(pred_out)
        pred_empty, _ = predictor_bias_step_empty(pred_out)
        toks_all = joint_frames_sel(pred_biased, pred_empty,
                                    use_bias_all)             # [B, T]
        elig = (fidx >= t_ptr[:, None]) & \
            (fidx < encoder_lens[:, None]) & (toks_all != blank)
        has = jnp.any(elig, axis=1)
        do = has & ~done & (cnt < u_max)
        f = jnp.argmax(elig, axis=1)
        tok = jnp.take_along_axis(toks_all, f[:, None], axis=1)[:, 0]
        tok = jnp.where(do, tok, blank)
        gate = jnp.take_along_axis(gate_all, f[:, None], axis=1)[:, 0]

        onehot = jax.nn.one_hot(jnp.minimum(cnt, u_max - 1), u_max,
                                dtype=bool) & do[:, None]
        buf = jnp.where(onehot, tok[:, None], buf)
        gate_buf = jnp.where(onehot, gate[:, None], gate_buf)
        cnt = cnt + do.astype(jnp.int32)

        k_new = jnp.where(f == t_ptr, k + 1, 1)
        exhaust = k_new >= n_steps
        t_ptr = jnp.where(do, jnp.where(exhaust, f + 1, f), t_ptr)
        k = jnp.where(do, jnp.where(exhaust, 0, k_new), k)
        done = done | ~do

        new_pred, new_state = predictor_step(tok, state,
                                             (~do).astype(jnp.int32))
        keep = do[:, None].astype(pred_out.dtype)
        pred_out = new_pred * keep + pred_out * (1 - keep)
        return (it + 1, t_ptr, k, pred_out, new_state, buf, gate_buf,
                cnt, done)

    out = jax.lax.while_loop(
        cond, body, (jnp.zeros((), jnp.int32), t_ptr0, k0, pred0, state0,
                     buf0, gate_buf0, cnt0, done0))
    _, _, _, _, _, buf, gate_buf, cnt, _ = out
    return buf, cnt, gate_buf
