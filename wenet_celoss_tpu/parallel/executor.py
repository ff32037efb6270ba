"""Epoch train/cv loops.

Parity with reference ``wenet/utils/executor.py:24-184`` (per-batch grad
accumulation, clip + NaN skip, interval logging, cv loss aggregation) on
top of the SPMD step functions in parallel/train.py.
"""

from __future__ import annotations

import logging
import time
from typing import Dict, Iterable, Optional

import jax
import numpy as np

from wenet_celoss_tpu.parallel import train as T
from wenet_celoss_tpu.parallel.mesh import shard_batch


class Executor:
    def __init__(self, model, tx, schedule, mesh=None, accum_grad: int = 1,
                 log_interval: int = 100, rng=None,
                 checkpoint_every: int = 0, checkpoint_fn=None,
                 metrics_writer=None):
        self.model = model
        self.mesh = mesh
        self.accum_grad = accum_grad
        self.log_interval = log_interval
        # Step-level checkpointing: every `checkpoint_every` optimizer
        # steps call checkpoint_fn(state, rng) (mid-epoch kill/resume).
        self.checkpoint_every = checkpoint_every
        self.checkpoint_fn = checkpoint_fn
        # Machine-readable per-logged-step metrics (tensorboard-role
        # analog of reference train.py:225); called with a flat dict.
        self.metrics_writer = metrics_writer
        self.grad_fn = T.make_grad_fn(model, accum_grad)
        self.apply_fn = T.make_apply_fn(tx)
        # One fused dispatch per step when not accumulating.
        self.train_step = (T.make_train_step(model, tx)
                           if accum_grad == 1 else None)
        self.eval_fn = T.make_eval_fn(model)
        self.schedule = schedule
        self.rng = rng if rng is not None else jax.random.PRNGKey(0)
        self.step = 0

    def _place(self, batch: Dict) -> Dict:
        if self.mesh is not None:
            return shard_batch(self.mesh, batch)
        return {k: v for k, v in batch.items() if k != "keys"}

    def _joined(self, data: Iterable[Dict]):
        """Multi-host even-stepping: stop EVERY process at the shortest
        host's batch count. Rank-sharded lists (`dataset.py:53-54`) leave
        hosts with unequal batch counts; an SPMD program would deadlock at
        epoch end when one host keeps dispatching collectives the others
        never join. The reference solves this with torch's `model.join`
        (`wenet/utils/executor.py:47-52`); here every host agrees on
        "do we all have a next batch" with one tiny allgather per step."""
        if jax.process_count() == 1:
            yield from data
            return
        from jax.experimental import multihost_utils
        it = iter(data)
        while True:
            try:
                nxt = next(it)
                have = 1
            except StopIteration:
                nxt, have = None, 0
            counts = multihost_utils.process_allgather(
                np.asarray(have, np.int32))
            if int(np.min(counts)) == 0:
                return
            yield nxt

    def train_epoch(self, state, data: Iterable[Dict], epoch: int = 0):
        acc = None
        n_acc = 0
        t0 = time.time()
        frames = 0
        for batch_idx, batch in enumerate(self._joined(data)):
            placed = self._place(batch)
            self.rng, rng = jax.random.split(self.rng)
            frames += int(np.sum(batch["feat_lengths"]))
            stepped = False
            if self.train_step is not None:
                state, metrics, gnorm = self.train_step(state, placed, rng)
                self.step = int(state.step)
                stepped = True
            else:
                grads, metrics, new_bs = self.grad_fn(state, placed, rng)
                if new_bs is not None:
                    state = state.replace(batch_stats=new_bs)
                acc = T.accumulate(acc, grads)
                n_acc += 1
                if n_acc >= self.accum_grad:
                    state, gnorm = self.apply_fn(state, acc)
                    acc, n_acc = None, 0
                    self.step = int(state.step)
                    stepped = True
            if (stepped and self.checkpoint_every > 0
                    and self.checkpoint_fn is not None
                    and self.step % self.checkpoint_every == 0):
                self.checkpoint_fn(state, self.rng)
            if batch_idx % self.log_interval == 0:
                lr = float(self.schedule(max(self.step, 1)))
                elapsed = time.time() - t0
                audio_sps = frames / 100.0 / max(elapsed, 1e-6)
                logging.info(
                    "epoch %d batch %d loss %.4f lr %.6g "
                    "audio-s/s %.1f",
                    epoch, batch_idx, float(metrics["loss"]), lr,
                    audio_sps)
                if self.metrics_writer is not None:
                    rec = {"epoch": epoch, "batch": batch_idx,
                           "step": self.step, "lr": lr,
                           "audio_s_per_s": round(audio_sps, 2)}
                    for k, v in metrics.items():
                        try:
                            rec[k] = float(v)
                        except (TypeError, ValueError):
                            pass
                    if stepped:
                        rec["grad_norm"] = float(gnorm)
                    self.metrics_writer(rec)
        return state

    def cv(self, state, data: Iterable[Dict]) -> float:
        total, count = 0.0, 0
        for batch in self._joined(data):
            placed = self._place(batch)
            metrics = self.eval_fn(state, placed)
            loss = float(metrics["loss"])
            if np.isfinite(loss):
                b = len(batch["keys"])
                total += loss * b
                count += b
        return total / max(count, 1)
