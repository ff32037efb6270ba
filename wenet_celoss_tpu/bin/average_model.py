"""Checkpoint averaging CLI (reference ``wenet/bin/average_model.py:25-101``)."""

from __future__ import annotations

import argparse

import flax


def main():
    parser = argparse.ArgumentParser(description="average model")
    parser.add_argument("--dst_model", required=True)
    parser.add_argument("--src_path", required=True,
                        help="model dir with N.ckpt + N.yaml files")
    parser.add_argument("--val_best", action="store_true")
    parser.add_argument("--num", type=int, default=5)
    parser.add_argument("--min_epoch", type=int, default=0)
    parser.add_argument("--max_epoch", type=int, default=65536)
    args = parser.parse_args()

    from wenet_celoss_tpu.utils import checkpoint as ckpt

    paths = ckpt.select_checkpoints(args.src_path, args.num, args.val_best,
                                    args.min_epoch, args.max_epoch)
    print(f"averaging {len(paths)} checkpoints: {paths}")
    assert paths, "no checkpoints matched"
    with open(paths[0], "rb") as f:
        template = flax.serialization.msgpack_restore(f.read())
    avg = ckpt.average_checkpoints(template, paths)
    with open(args.dst_model, "wb") as f:
        f.write(flax.serialization.to_bytes(avg))
    ckpt.save_checkpoint(avg, args.dst_model,
                         {"averaged_from": [str(p) for p in paths]})


if __name__ == "__main__":
    main()
