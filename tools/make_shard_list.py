#!/usr/bin/env python3
"""wav.scp + text → tar shards + shard list (reference
``tools/make_shard_list.py``): each shard is a tar of (key.wav, key.txt)
pairs for sequential UIO reads."""

import argparse
import io
import os
import tarfile
import time


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("wav_file")
    parser.add_argument("text_file")
    parser.add_argument("shards_dir")
    parser.add_argument("shards_list")
    parser.add_argument("--num_utts_per_shard", type=int, default=1000)
    parser.add_argument("--prefix", default="shards")
    args = parser.parse_args()

    wavs = {}
    with open(args.wav_file, encoding="utf8") as f:
        for line in f:
            parts = line.strip().split(maxsplit=1)
            if len(parts) == 2:
                wavs[parts[0]] = parts[1]
    items = []
    with open(args.text_file, encoding="utf8") as f:
        for line in f:
            parts = line.strip().split(maxsplit=1)
            key = parts[0]
            if key in wavs:
                items.append((key, wavs[key],
                              parts[1] if len(parts) > 1 else ""))

    os.makedirs(args.shards_dir, exist_ok=True)
    shard_paths = []
    for si in range(0, len(items), args.num_utts_per_shard):
        chunk = items[si:si + args.num_utts_per_shard]
        name = f"{args.prefix}_{si // args.num_utts_per_shard:09d}.tar"
        path = os.path.join(args.shards_dir, name)
        with tarfile.open(path, "w") as tar:
            for key, wav_path, text in chunk:
                with open(wav_path, "rb") as wf:
                    wav_bytes = wf.read()
                txt_bytes = text.encode("utf8")
                for suffix, data in ((".wav", wav_bytes),
                                     (".txt", txt_bytes)):
                    info = tarfile.TarInfo(key + suffix)
                    info.size = len(data)
                    info.mtime = int(time.time())
                    tar.addfile(info, io.BytesIO(data))
        shard_paths.append(os.path.abspath(path))
    with open(args.shards_list, "w") as f:
        for p in shard_paths:
            f.write(p + "\n")


if __name__ == "__main__":
    main()
