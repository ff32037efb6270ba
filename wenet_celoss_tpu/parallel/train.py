"""SPMD training step: optimizer, gradient accumulation, AMP-equivalent.

Replaces the reference's training engine
(`wenet/utils/executor.py:24-138` + DDP/AMP in `wenet/bin/train.py:227-262`):

- torch DDP all-reduce        → XLA-inserted reductions under jit over the
                                mesh-sharded batch (parallel/mesh.py).
- torch.cuda.amp + GradScaler → bf16 compute dtype (TPU-native; no loss
                                scaling needed, params/optimizer in fp32).
- grad accumulation w/ no_sync→ jitted grad fn + tree accumulation, one
                                apply per accum_grad microbatches.
- grad-clip with NaN skip     → optax clip_by_global_norm + nonfinite guard
                                (reference `executor.py:121-126`).
"""

from __future__ import annotations

from functools import partial
from typing import Any, Callable, Dict, Optional, Tuple

import flax
import jax
import jax.numpy as jnp
import optax

from wenet_celoss_tpu.utils.scheduler import warmup_lr


@flax.struct.dataclass
class TrainState:
    step: jnp.ndarray
    params: Any
    opt_state: Any
    batch_stats: Any = None


def make_optimizer(configs: Dict) -> Tuple[optax.GradientTransformation,
                                           Callable]:
    optim_conf = configs.get("optim_conf", {})
    lr = optim_conf.get("lr", 0.002)
    sched_conf = configs.get("scheduler_conf", {})
    schedule = warmup_lr(lr, sched_conf.get("warmup_steps", 25000))
    grad_clip = configs.get("grad_clip", 5.0)
    tx = optax.chain(
        optax.clip_by_global_norm(grad_clip),
        optax.scale_by_adam(),
        optax.scale_by_learning_rate(schedule),
    )
    return tx, schedule


def create_train_state(model, params_variables, tx) -> TrainState:
    params = params_variables["params"]
    batch_stats = params_variables.get("batch_stats")
    return TrainState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        opt_state=tx.init(params),
        batch_stats=batch_stats,
    )


def make_grad_fn(model, accum_grad: int = 1):
    """Returns jitted (state, batch, rng) -> (grads, metrics, new_batch_stats).

    The batch dict must contain feats/feat_lengths/labels/label_lengths and
    optionally context_list/context_lengths/hw_labels.
    """

    def loss_fn(params, batch_stats, batch, rng):
        variables = {"params": params}
        mutable = False
        if batch_stats is not None:
            variables["batch_stats"] = batch_stats
            mutable = ["batch_stats"]
        drng, crng = jax.random.split(rng)
        kwargs = dict(deterministic=False, train=True, chunk_rng=crng)
        args = (batch["feats"], batch["feat_lengths"], batch["labels"],
                batch["label_lengths"])
        if "context_list" in batch:
            args = args + (batch["context_list"], batch["context_lengths"],
                           batch.get("hw_labels"),
                           batch.get("context_n_valid"))
        out = model.apply(variables, *args, rngs={"dropout": drng},
                          mutable=mutable, **kwargs)
        if mutable:
            metrics, updates = out
            new_bs = updates.get("batch_stats")
        else:
            metrics, new_bs = out, None
        return metrics["loss"] / accum_grad, (metrics, new_bs)

    @jax.jit
    def grad_fn(state: TrainState, batch, rng):
        (_, (metrics, new_bs)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params, state.batch_stats, batch,
                                   rng)
        return grads, metrics, new_bs

    return grad_fn


def make_apply_fn(tx):
    @jax.jit
    def apply_fn(state: TrainState, grads):
        gnorm = optax.global_norm(grads)
        finite = jnp.isfinite(gnorm)
        safe_grads = jax.tree_util.tree_map(
            lambda g: jnp.where(finite, g, jnp.zeros_like(g)), grads)
        updates, new_opt = tx.update(safe_grads, state.opt_state,
                                     state.params)
        new_params = optax.apply_updates(state.params, updates)
        # NaN/inf grad → skip the step entirely (reference
        # `executor.py:121-126`).
        new_params = jax.tree_util.tree_map(
            lambda n, o: jnp.where(finite, n, o), new_params, state.params)
        new_opt = jax.tree_util.tree_map(
            lambda n, o: jnp.where(finite, n, o), new_opt, state.opt_state)
        return TrainState(step=state.step + 1, params=new_params,
                          opt_state=new_opt,
                          batch_stats=state.batch_stats), gnorm

    return apply_fn


def make_train_step(model, tx, accum_grad: int = 1):
    """Fused (grad + clip + apply) step in ONE jitted program with donated
    state buffers — one device dispatch per step (the split grad/apply pair
    is for gradient accumulation)."""
    grad_core = make_grad_fn(model, accum_grad)

    @partial(jax.jit, donate_argnums=(0,))
    def train_step(state: TrainState, batch, rng):
        grads, metrics, new_bs = grad_core(state, batch, rng)
        gnorm = optax.global_norm(grads)
        finite = jnp.isfinite(gnorm)
        safe = jax.tree_util.tree_map(
            lambda g: jnp.where(finite, g, jnp.zeros_like(g)), grads)
        updates, new_opt = tx.update(safe, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        new_params = jax.tree_util.tree_map(
            lambda n, o: jnp.where(finite, n, o), new_params, state.params)
        new_opt = jax.tree_util.tree_map(
            lambda n, o: jnp.where(finite, n, o), new_opt, state.opt_state)
        return TrainState(step=state.step + 1, params=new_params,
                          opt_state=new_opt,
                          batch_stats=new_bs if new_bs is not None
                          else state.batch_stats), metrics, gnorm

    return train_step


def make_eval_fn(model):
    @jax.jit
    def eval_fn(state: TrainState, batch):
        variables = {"params": state.params}
        if state.batch_stats is not None:
            variables["batch_stats"] = state.batch_stats
        args = (batch["feats"], batch["feat_lengths"], batch["labels"],
                batch["label_lengths"])
        if "context_list" in batch:
            args = args + (batch["context_list"], batch["context_lengths"],
                           batch.get("hw_labels"),
                           batch.get("context_n_valid"))
        return model.apply(variables, *args, deterministic=True)

    return eval_fn


def accumulate(acc, grads):
    if acc is None:
        return grads
    return jax.tree_util.tree_map(jnp.add, acc, grads)
