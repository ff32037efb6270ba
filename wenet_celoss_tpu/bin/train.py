"""Training CLI.

Parity with reference ``wenet/bin/train.py:38-293``: YAML config +
overrides, dataset construction, model build, resume, epoch loop with CV,
checkpoint-per-epoch with metadata, final symlink. DDP process choreography
is replaced by SPMD over the jax device mesh (multi-host via
``jax.distributed.initialize`` when --distributed is set).
"""

from __future__ import annotations

import argparse
import copy
import logging
import os

import jax
import numpy as np
import yaml


def get_args():
    parser = argparse.ArgumentParser(description="training your network")
    parser.add_argument("--config", required=True, help="config file")
    parser.add_argument("--data_type", default="raw",
                        choices=["raw", "shard"])
    parser.add_argument("--train_data", required=True)
    parser.add_argument("--cv_data", required=True)
    parser.add_argument("--model_dir", required=True)
    parser.add_argument("--checkpoint", default=None)
    parser.add_argument("--symbol_table", required=True)
    parser.add_argument("--bpe_model", default=None)
    parser.add_argument("--non_lang_syms", default=None)
    parser.add_argument("--override_config", action="append", default=[])
    parser.add_argument("--cmvn", default=None)
    parser.add_argument("--num_epochs", type=int, default=None)
    parser.add_argument("--step_checkpoint_interval", type=int, default=0,
                        help="save a full-state step_<n>.state every N "
                             "optimizer steps (mid-epoch kill/resume)")
    parser.add_argument("--model_parallel", type=int, default=1)
    parser.add_argument("--metrics_file", default=None,
                        help="per-logged-step metrics JSONL (default "
                             "<model_dir>/metrics.jsonl)")
    parser.add_argument("--profile_dir", default=None,
                        help="write a jax.profiler trace of the first "
                             "train epoch to this dir")
    parser.add_argument("--distributed", action="store_true",
                        help="multi-host: jax.distributed.initialize()")
    parser.add_argument("--enc_init", default=None,
                        help="pretrained model for partial warm start")
    parser.add_argument("--enc_init_mods", default="encoder.",
                        help="comma list of module prefixes to warm start")
    return parser.parse_args()


def main():
    args = get_args()
    logging.basicConfig(
        level=logging.INFO,
        format="%(asctime)s %(levelname)s %(message)s")
    from wenet_celoss_tpu.utils.platform import (
        configure_tpu_runtime, enable_compilation_cache)
    configure_tpu_runtime()
    enable_compilation_cache()
    if args.distributed:
        jax.distributed.initialize()
    rank = jax.process_index()
    world_size = jax.process_count()

    from wenet_celoss_tpu.data.dataset import Dataset
    from wenet_celoss_tpu.models.factory import init_model
    from wenet_celoss_tpu.parallel import train as T
    from wenet_celoss_tpu.parallel.executor import Executor
    from wenet_celoss_tpu.parallel.mesh import make_mesh
    from wenet_celoss_tpu.utils import checkpoint as ckpt
    from wenet_celoss_tpu.utils.config import load_config, override_config
    from wenet_celoss_tpu.utils.file_utils import (
        read_non_lang_symbols, read_symbol_table)

    configs = load_config(args.config)
    if args.override_config:
        configs = override_config(configs, args.override_config)

    symbol_table = read_symbol_table(args.symbol_table)
    non_lang_syms = read_non_lang_symbols(args.non_lang_syms)

    train_conf = configs["dataset_conf"]
    cv_conf = copy.deepcopy(train_conf)
    cv_conf.update(speed_perturb=False, spec_aug=False, spec_sub=False,
                   shuffle=False)

    mesh = make_mesh(args.model_parallel)
    data_parallel = mesh.shape["data"]
    bc = train_conf.setdefault("batch_conf", {})
    if bc.get("batch_type", "static") == "dynamic":
        bc["round_to"] = data_parallel

    # dataset_conf.loader_processes > 0 runs the full chain in that many
    # spawned processes, each over a disjoint list shard (the reference's
    # DataLoader-worker parallelism; data/loader.py).
    from wenet_celoss_tpu.data.loader import make_loader
    train_dataset = make_loader(args.data_type, args.train_data,
                                symbol_table, train_conf,
                                bpe_model=args.bpe_model,
                                non_lang_syms=non_lang_syms,
                                partition=True, rank=rank,
                                world_size=world_size)
    cv_dataset = Dataset(args.data_type, args.cv_data, symbol_table,
                         cv_conf, args.bpe_model, non_lang_syms,
                         partition=False)

    vocab_size = len(symbol_table)
    configs["input_dim"] = train_conf.get("fbank_conf",
                                          {}).get("num_mel_bins", 80)
    configs["output_dim"] = vocab_size
    configs["cmvn_file"] = args.cmvn
    configs["is_json_cmvn"] = True
    if rank == 0:
        os.makedirs(args.model_dir, exist_ok=True)
        with open(os.path.join(args.model_dir, "train.yaml"), "w") as f:
            yaml.dump(configs, f)

    model = init_model(configs)
    # Init params from one synthetic batch shape (incl. the context tower
    # when the config enables biasing — params must exist before the first
    # real batch arrives with hotword tensors).
    rng = np.random.default_rng(0)
    ex = (np.zeros((2, 64, configs["input_dim"]), np.float32),
          np.array([64, 64], np.int32),
          rng.integers(1, vocab_size - 1, (2, 8)).astype(np.int32),
          np.array([8, 8], np.int32))
    if configs.get("context", "nobias") != "nobias":
        ex = ex + (rng.integers(1, vocab_size - 1, (3, 2)).astype(np.int32),
                   np.array([2, 2, 2], np.int32),
                   rng.integers(0, 2, (2, 8)).astype(np.int32))
    variables = model.init(jax.random.PRNGKey(777), *[np.asarray(a)
                                                      for a in ex])

    tx, schedule = T.make_optimizer(configs)
    state = T.create_train_state(model, variables, tx)

    start_epoch, start_step = 0, 0
    resume_rng = None
    if args.checkpoint and args.checkpoint.endswith(".state"):
        # Full-state mid-epoch resume: params + optimizer + step + rng.
        state = ckpt.load_train_state(state, args.checkpoint)
        infos = ckpt.load_checkpoint_infos(args.checkpoint)
        start_epoch = infos.get("epoch", 0)
        start_step = int(state.step)
        if "rng" in infos:
            resume_rng = np.asarray(infos["rng"], np.uint32)
    elif args.checkpoint:
        params = ckpt.load_checkpoint(state.params, args.checkpoint)
        infos = ckpt.load_checkpoint_infos(args.checkpoint)
        start_epoch = infos.get("epoch", -1) + 1
        start_step = infos.get("step", 0)
        state = state.replace(params=params,
                              step=np.int32(start_step))
    elif args.enc_init:
        mods = args.enc_init_mods.split(",")
        params = ckpt.load_trained_modules(state.params, args.enc_init,
                                           [m.rstrip(".") for m in mods])
        state = state.replace(params=params)

    # Place the whole train state on the mesh: weights matched by the
    # model-axis rules shard over 'model' (tensor parallel), the rest
    # replicate — the DDP-broadcast analog (ref train.py:138-144).
    from wenet_celoss_tpu.parallel.mesh import shard_state
    state = shard_state(mesh, state)

    def step_checkpoint(st, rng, _dir=args.model_dir):
        if rank != 0:
            return
        n = int(st.step)
        ckpt.save_train_state(
            st, os.path.join(_dir, f"step_{n}.state"),
            {"step": n, "epoch": epoch_holder[0],
             "rng": np.asarray(rng).tolist()})

    epoch_holder = [start_epoch]
    metrics_writer = None
    if rank == 0:
        import json
        metrics_path = args.metrics_file or os.path.join(
            args.model_dir, "metrics.jsonl")
        os.makedirs(os.path.dirname(metrics_path) or ".", exist_ok=True)
        metrics_f = open(metrics_path, "a", buffering=1)

        def metrics_writer(rec):
            metrics_f.write(json.dumps(rec) + "\n")

    executor = Executor(model, tx, schedule, mesh,
                        accum_grad=configs.get("accum_grad", 1),
                        log_interval=configs.get("log_interval", 100),
                        checkpoint_every=args.step_checkpoint_interval,
                        checkpoint_fn=step_checkpoint,
                        metrics_writer=metrics_writer)
    executor.step = start_step
    if resume_rng is not None:
        import jax.numpy as jnp
        executor.rng = jnp.asarray(resume_rng, jnp.uint32)

    num_epochs = args.num_epochs or configs.get("max_epoch", 100)
    final_epoch = None
    if args.profile_dir:
        jax.profiler.start_trace(args.profile_dir)
    for epoch in range(start_epoch, num_epochs):
        epoch_holder[0] = epoch
        train_dataset.set_epoch(epoch)
        logging.info("Epoch %d TRAIN", epoch)
        state = executor.train_epoch(state, iter(train_dataset), epoch)
        if args.profile_dir and epoch == start_epoch:
            jax.profiler.stop_trace()
        logging.info("Epoch %d CV", epoch)
        cv_loss = executor.cv(state, iter(cv_dataset))
        logging.info("Epoch %d CV loss %.4f", epoch, cv_loss)
        if rank == 0:
            path = os.path.join(args.model_dir, f"{epoch}.ckpt")
            ckpt.save_checkpoint(
                state.params, path,
                {"epoch": epoch, "cv_loss": float(cv_loss),
                 "step": int(state.step),
                 "lr": float(schedule(max(int(state.step), 1)))})
        final_epoch = epoch
    ckpt.wait_pending()
    if final_epoch is not None and rank == 0:
        final = os.path.join(args.model_dir, "final.ckpt")
        if os.path.islink(final) or os.path.exists(final):
            os.remove(final)
        os.symlink(f"{final_epoch}.ckpt", final)


if __name__ == "__main__":
    main()
