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
    parser.add_argument("--model_parallel", type=int, default=1)
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
    from wenet_celoss_tpu.utils.platform import configure_tpu_runtime
    configure_tpu_runtime()
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

    train_dataset = Dataset(args.data_type, args.train_data, symbol_table,
                            train_conf, args.bpe_model, non_lang_syms,
                            True, rank, world_size)
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
    # Init params from one synthetic batch shape.
    rng = np.random.default_rng(0)
    ex = (np.zeros((2, 64, configs["input_dim"]), np.float32),
          np.array([64, 64], np.int32),
          rng.integers(1, vocab_size - 1, (2, 8)).astype(np.int32),
          np.array([8, 8], np.int32))
    variables = model.init(jax.random.PRNGKey(777), *[np.asarray(a)
                                                      for a in ex])

    tx, schedule = T.make_optimizer(configs)
    state = T.create_train_state(model, variables, tx)

    start_epoch, start_step = 0, 0
    if args.checkpoint:
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

    executor = Executor(model, tx, schedule, mesh,
                        accum_grad=configs.get("accum_grad", 1),
                        log_interval=configs.get("log_interval", 100))
    executor.step = start_step

    num_epochs = args.num_epochs or configs.get("max_epoch", 100)
    final_epoch = None
    for epoch in range(start_epoch, num_epochs):
        train_dataset.set_epoch(epoch)
        logging.info("Epoch %d TRAIN", epoch)
        state = executor.train_epoch(state, iter(train_dataset), epoch)
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
    if final_epoch is not None and rank == 0:
        final = os.path.join(args.model_dir, "final.ckpt")
        if os.path.islink(final) or os.path.exists(final):
            os.remove(final)
        os.symlink(f"{final_epoch}.ckpt", final)


if __name__ == "__main__":
    main()
