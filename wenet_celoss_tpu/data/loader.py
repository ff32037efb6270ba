"""Sharded multi-process batch loader.

The reference parallelizes its input pipeline with torch DataLoader worker
subprocesses: each worker runs the WHOLE processor chain over a slice of
the data list and the parent interleaves finished batches
(`wenet/dataset/dataset.py:49-98` worker sharding + `wenet/bin/train.py`
DataLoader num_workers/prefetch_factor). The in-process thread pool in
``Dataset`` only parallelizes the featurize stage (numpy releases the GIL
there), so the GIL-held stages — wav/tar read, tokenize, spec_aug,
batching, padding, hotword synthesis — serialize and cap aggregate
throughput no matter how many cores the host has.

``MultiProcessLoader`` is the TPU-host equivalent of DataLoader workers:
``num_workers`` spawned processes each build a full ``Dataset`` over
``lists[worker::num_workers]`` (composed with the caller's rank/world
sharding exactly like the reference's DistributedSampler×worker split) and
stream finished padded batches back over bounded queues; the parent pops
round-robin, which makes batch order deterministic under any worker
scheduling. Numpy arrays cross the process boundary via pickle-5
out-of-band buffers (memcpy speed).

Processes are started with the ``spawn`` context: the training parent owns
a live TPU client, and forking a process holding an initialized PJRT
backend is undefined behavior.
"""

from __future__ import annotations

import multiprocessing as mp
from typing import Dict, Iterator, List, Optional

_SENTINEL = ("__end__", None)


def _worker_main(queue, data_type, list_file, symbol_table, conf,
                 bpe_model, non_lang_syms, partition, rank, world_size,
                 epoch):
    try:
        from wenet_celoss_tpu.data.dataset import Dataset
        # Handshake: imports are done (spawned interpreters pay several
        # seconds of module import); lets the parent separate one-time
        # startup from pipeline work (tools/bench_pipeline.py).
        queue.put(("ready", None))
        ds = Dataset(data_type, list_file, symbol_table, conf,
                     bpe_model=bpe_model, non_lang_syms=non_lang_syms,
                     partition=partition, rank=rank,
                     world_size=world_size)
        ds.set_epoch(epoch)
        for batch in ds:
            queue.put(("batch", batch))
    except Exception as e:  # surface worker crashes in the parent
        queue.put(("error", f"{type(e).__name__}: {e}"))
    finally:
        queue.put(_SENTINEL)


class MultiProcessLoader:
    """Iterable over padded batches produced by ``num_workers`` full
    pipeline processes, each on a disjoint shard of the data list.

    Sharding composes with distributed training: worker ``w`` of rank
    ``r`` sees ``lists[r * num_workers + w :: world_size * num_workers]``
    — the same epoch-seeded shuffle runs in every process, so shards are
    disjoint and exhaustive (reference `dataset.py:49-98`).
    """

    def __init__(self, data_type: str, list_file: str,
                 symbol_table: Dict[str, int], conf: Dict,
                 bpe_model: Optional[str] = None,
                 non_lang_syms: Optional[List[str]] = None,
                 partition: bool = True, rank: int = 0,
                 world_size: int = 1, num_workers: int = 2,
                 queue_depth: int = 2):
        assert num_workers >= 1
        self.args = (data_type, list_file, symbol_table, conf, bpe_model,
                     non_lang_syms, partition)
        self.rank = rank
        self.world_size = world_size
        self.num_workers = num_workers
        self.queue_depth = queue_depth
        self.epoch = 0
        # Worker processes must not inherit the parent's in-process
        # thread pool setting AND spawn their own: the chain inside each
        # worker runs serially (one core per worker is the design).
        conf = dict(conf)
        conf["num_workers"] = 0
        conf["prefetch"] = 0
        self.args = (data_type, list_file, symbol_table, conf, bpe_model,
                     non_lang_syms, partition)

    def set_epoch(self, epoch: int):
        self.epoch = epoch

    def __iter__(self) -> Iterator[Dict]:
        import os
        import time as _time
        ctx = mp.get_context("spawn")
        queues = []
        procs = []
        t0 = _time.perf_counter()
        # Loader workers are pure-host processes: hide the axon TPU
        # plugin from their sitecustomize (registering a PJRT client
        # per worker costs seconds and can contend for the tunnel) and
        # pin any accidental jax import in a worker to CPU.
        # ... and pin BLAS/OpenMP to ONE thread per worker: each worker
        # owns one core by design, and OpenBLAS' default ncpu threads
        # spin-wait — two 2-thread workers on two cores measured 4× the
        # user CPU of the same work single-threaded.
        saved_env = {}
        for k, v in (("PALLAS_AXON_POOL_IPS", None),
                     ("JAX_PLATFORMS", "cpu"),
                     ("OMP_NUM_THREADS", "1"),
                     ("OPENBLAS_NUM_THREADS", "1"),
                     ("MKL_NUM_THREADS", "1")):
            saved_env[k] = os.environ.pop(k, None)
            if v is not None:
                os.environ[k] = v
        try:
            for w in range(self.num_workers):
                q = ctx.Queue(maxsize=self.queue_depth)
                # Workers ALWAYS shard among themselves (partition=True
                # in the child); the caller's partition flag only
                # decides whether the DDP rank split composes in
                # (partition=False is the CV "every rank sees
                # everything" case — but each of this loader's workers
                # must still take a disjoint slice).
                if self.args[-1]:  # caller partition
                    rank = self.rank * self.num_workers + w
                    world = self.world_size * self.num_workers
                else:
                    rank, world = w, self.num_workers
                p = ctx.Process(
                    target=_worker_main,
                    args=(q,) + self.args[:-1] + (True, rank, world,
                                                  self.epoch),
                    daemon=True)
                p.start()
                queues.append(q)
                procs.append(p)
        finally:
            for k, old in saved_env.items():
                if old is None:
                    os.environ.pop(k, None)
                else:
                    os.environ[k] = old
        self.startup_s = 0.0
        live = list(range(self.num_workers))
        pending = [None] * self.num_workers
        try:
            # Wait for every worker's import handshake first (they
            # import concurrently); records pure interpreter-startup
            # cost — from BEFORE the spawns — so benches can separate
            # it from pipeline work. A worker that dies during import
            # sends error/sentinel instead — defer that message to the
            # rotation below.
            for w in range(self.num_workers):
                kind, payload = queues[w].get()
                if kind != "ready":
                    pending[w] = (kind, payload)
            self.startup_s = _time.perf_counter() - t0
            while live:
                next_live = []
                for w in live:
                    if pending[w] is not None:
                        kind, payload = pending[w]
                        pending[w] = None
                    else:
                        kind, payload = queues[w].get()
                    if kind == "batch":
                        next_live.append(w)
                        yield payload
                    elif kind == "error":
                        raise RuntimeError(
                            f"loader worker {w} failed: {payload}")
                    # sentinel: drop worker from rotation
                live = next_live
        finally:
            for p in procs:
                if p.is_alive():
                    p.terminate()
            for p in procs:
                p.join(timeout=5)


def make_loader(data_type, list_file, symbol_table, conf, **kw):
    """Factory: ``conf['loader_processes'] > 0`` selects the
    multi-process loader, else the in-process ``Dataset`` chain."""
    from wenet_celoss_tpu.data.dataset import Dataset
    n = int(conf.get("loader_processes", 0) or 0)
    if n > 0:
        return MultiProcessLoader(data_type, list_file, symbol_table,
                                  conf, num_workers=n, **kw)
    return Dataset(data_type, list_file, symbol_table, conf, **kw)
