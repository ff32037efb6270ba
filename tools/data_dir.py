#!/usr/bin/env python3
"""Kaldi-style data-dir utilities, consolidated into one CLI.

Capability parity with the reference's shell/perl helpers
(`tools/fix_data_dir.sh`, `tools/subset_data_dir.sh`,
`tools/combine_data.sh`, `tools/perturb_data_dir_speed.sh`,
`tools/validate_data_dir.sh`, `tools/filter_scp.pl`,
`tools/utt2spk_to_spk2utt.pl`, `tools/spk2utt_to_utt2spk.pl`,
`tools/data/remove_dup_utts.sh`) — reimplemented as python subcommands
operating on a data dir of line-keyed files:

  wav.scp   <utt-or-rec-id> <wav path>
  text      <utt-id> <transcript>
  utt2spk   <utt-id> <spk-id>            (optional)
  spk2utt   <spk-id> <utt-id ...>        (optional, derivable)
  segments  <utt-id> <rec-id> <start> <end>   (optional)

Usage:
  python tools/data_dir.py validate DIR
  python tools/data_dir.py fix DIR
  python tools/data_dir.py subset SRC DST --num N [--first|--last|--shortest]
  python tools/data_dir.py subset SRC DST --utt-list FILE | --spk-list FILE
  python tools/data_dir.py combine DST SRC1 SRC2 [...]
  python tools/data_dir.py perturb-speed SRC DST --speed 0.9
  python tools/data_dir.py utt2spk-to-spk2utt DIR   (and the reverse)
  python tools/data_dir.py filter-scp ID_FILE SCP   (stdout, kaldi filter_scp.pl)
  python tools/data_dir.py remove-dup-utts DIR --max-count N
"""

import argparse
import os
import sys

DATA_FILES = ("wav.scp", "text", "utt2spk", "feats.scp", "utt2dur",
              "segments")


def read_kv(path):
    """Keyed file → ordered dict of key → rest-of-line."""
    out = {}
    with open(path, encoding="utf8") as f:
        for line in f:
            parts = line.rstrip("\n").split(maxsplit=1)
            if not parts:
                continue
            out[parts[0]] = parts[1] if len(parts) > 1 else ""
    return out


def write_kv(path, kv):
    with open(path, "w", encoding="utf8") as f:
        for k in sorted(kv):
            f.write(f"{k} {kv[k]}".rstrip() + "\n")


def _present(dirname):
    return [f for f in DATA_FILES if os.path.exists(os.path.join(dirname, f))]


def _utt_files(dirname):
    """Files keyed by utt-id (wav.scp is rec-id-keyed when segments exist)."""
    files = _present(dirname)
    if "segments" in files:
        return [f for f in files if f != "wav.scp"]
    return files


def validate(dirname, verbose=True):
    """Check keys are sorted-compatible, nonempty, and consistent across
    files. Returns list of problem strings (empty = valid)."""
    problems = []
    files = _present(dirname)
    if "wav.scp" not in files:
        problems.append("missing wav.scp")
    if "text" not in files:
        problems.append("missing text")
    tables = {f: read_kv(os.path.join(dirname, f)) for f in files}
    utt_sets = {f: set(tables[f]) for f in _utt_files(dirname)}
    if utt_sets:
        base_name = "text" if "text" in utt_sets else next(iter(utt_sets))
        base = utt_sets[base_name]
        for f, s in utt_sets.items():
            only_f = s - base
            only_base = base - s
            if only_f:
                problems.append(
                    f"{f} has {len(only_f)} utts not in {base_name} "
                    f"(e.g. {sorted(only_f)[:3]})")
            if only_base:
                problems.append(
                    f"{base_name} has {len(only_base)} utts not in {f} "
                    f"(e.g. {sorted(only_base)[:3]})")
    if "segments" in files:
        recs = set(tables["wav.scp"])
        for utt, rest in tables["segments"].items():
            parts = rest.split()
            if len(parts) != 3:
                problems.append(f"segments: bad line for {utt}")
                continue
            rec, start, end = parts[0], float(parts[1]), float(parts[2])
            if rec not in recs:
                problems.append(f"segments: recording {rec} not in wav.scp")
            if not 0 <= start < end:
                problems.append(f"segments: bad times for {utt}")
    for f, t in tables.items():
        empties = [k for k, v in t.items() if not v]
        if empties and f != "text":  # empty transcript is legal
            problems.append(f"{f}: empty values for {empties[:3]}")
    if verbose:
        for p in problems:
            print(f"PROBLEM: {p}")
        if not problems:
            print(f"{dirname}: ok "
                  f"({len(tables.get('text', tables.get('wav.scp', {})))} "
                  f"utts)")
    return problems


def fix(dirname):
    """Keep only utts present in ALL utt-keyed files; drop orphan
    recordings (kaldi fix_data_dir.sh)."""
    files = _present(dirname)
    tables = {f: read_kv(os.path.join(dirname, f)) for f in files}
    utt_files = _utt_files(dirname)
    common = None
    for f in utt_files:
        keys = set(tables[f])
        common = keys if common is None else common & keys
    common = common or set()
    for f in utt_files:
        before = len(tables[f])
        tables[f] = {k: v for k, v in tables[f].items() if k in common}
        if len(tables[f]) != before:
            print(f"fix: {f}: kept {len(tables[f])}/{before}")
    if "segments" in files:
        used_recs = {tables["segments"][u].split()[0]
                     for u in tables["segments"]}
        before = len(tables["wav.scp"])
        tables["wav.scp"] = {k: v for k, v in tables["wav.scp"].items()
                             if k in used_recs}
        if len(tables["wav.scp"]) != before:
            print(f"fix: wav.scp: kept {len(tables['wav.scp'])}/{before}")
    for f in files:
        write_kv(os.path.join(dirname, f), tables[f])
    if "utt2spk" in files:
        utt2spk_to_spk2utt(dirname)


def subset(src, dst, num=None, mode="first", utt_list=None, spk_list=None):
    files = _present(src)
    tables = {f: read_kv(os.path.join(src, f)) for f in files}
    utts = list(tables["text"] if "text" in tables else tables["wav.scp"])
    if utt_list:
        keep = set(read_kv(utt_list))
    elif spk_list:
        spks = set(read_kv(spk_list))
        if "utt2spk" not in tables:
            sys.exit("subset --spk-list needs utt2spk")
        keep = {u for u, s in tables["utt2spk"].items() if s in spks}
    else:
        assert num is not None, "need --num or --utt-list/--spk-list"
        if mode == "first":
            keep = set(utts[:num])
        elif mode == "last":
            keep = set(utts[-num:])
        elif mode == "shortest":
            if "utt2dur" in tables:
                order = sorted(utts,
                               key=lambda u: float(tables["utt2dur"][u]))
            else:  # fall back to transcript length as a duration proxy
                order = sorted(utts, key=lambda u: len(
                    tables.get("text", {}).get(u, "")))
            keep = set(order[:num])
        else:
            sys.exit(f"unknown subset mode {mode}")
    os.makedirs(dst, exist_ok=True)
    for f in _utt_files(src):
        write_kv(os.path.join(dst, f),
                 {k: v for k, v in tables[f].items() if k in keep})
    if "segments" in files:
        segs = {k: v for k, v in tables["segments"].items() if k in keep}
        used_recs = {v.split()[0] for v in segs.values()}
        write_kv(os.path.join(dst, "wav.scp"),
                 {k: v for k, v in tables["wav.scp"].items()
                  if k in used_recs})
    if "utt2spk" in files:
        utt2spk_to_spk2utt(dst)
    print(f"subset: {len(keep)} utts → {dst}")


def combine(dst, srcs):
    os.makedirs(dst, exist_ok=True)
    all_files = set()
    for s in srcs:
        all_files.update(_present(s))
    for f in sorted(all_files):
        merged = {}
        for s in srcs:
            path = os.path.join(s, f)
            if not os.path.exists(path):
                continue
            for k, v in read_kv(path).items():
                if k in merged and merged[k] != v:
                    sys.exit(f"combine: duplicate key {k} in {f} "
                             f"with different values")
                merged[k] = v
        write_kv(os.path.join(dst, f), merged)
    if os.path.exists(os.path.join(dst, "utt2spk")):
        utt2spk_to_spk2utt(dst)
    print(f"combine: {len(srcs)} dirs → {dst}")


def perturb_speed(src, dst, speed):
    """Speed-perturbed copy: utt ids prefixed sp{speed}-, durations scaled,
    a `speed` field consumed by parse_raw / make_raw_list downstream
    (reference perturb_data_dir_speed.sh uses sox pipes; our pipeline
    resamples in-process)."""
    files = _present(src)
    tables = {f: read_kv(os.path.join(src, f)) for f in files}
    os.makedirs(dst, exist_ok=True)
    pre = f"sp{speed:g}-"
    for f in files:
        out = {}
        for k, v in tables[f].items():
            if f == "wav.scp":
                out[pre + k] = f"{v} #speed={speed:g}"
            elif f == "segments":
                # times stay in the ORIGINAL recording timeline: our
                # pipeline slices the unmodified wav first, then
                # resamples by `speed` in-process (processor.parse_raw).
                rec, start, end = v.split()
                out[pre + k] = f"{pre}{rec} {start} {end}"
            elif f == "utt2dur":
                out[pre + k] = f"{float(v) / speed:.3f}"
            elif f == "utt2spk":
                out[pre + k] = pre + v
            else:
                out[pre + k] = v
        write_kv(os.path.join(dst, f), out)
    if "utt2spk" in files:
        utt2spk_to_spk2utt(dst)
    print(f"perturb-speed {speed}: → {dst}")


def utt2spk_to_spk2utt(dirname):
    utt2spk = read_kv(os.path.join(dirname, "utt2spk"))
    spk2utt = {}
    for u, s in utt2spk.items():
        spk2utt.setdefault(s, []).append(u)
    write_kv(os.path.join(dirname, "spk2utt"),
             {s: " ".join(sorted(us)) for s, us in spk2utt.items()})


def spk2utt_to_utt2spk(dirname):
    spk2utt = read_kv(os.path.join(dirname, "spk2utt"))
    utt2spk = {}
    for s, us in spk2utt.items():
        for u in us.split():
            utt2spk[u] = s
    write_kv(os.path.join(dirname, "utt2spk"), utt2spk)


def filter_scp(id_file, scp, exclude=False):
    ids = set(read_kv(id_file))
    with open(scp, encoding="utf8") as f:
        for line in f:
            parts = line.split(maxsplit=1)
            if parts and (parts[0] in ids) != exclude:
                sys.stdout.write(line)


def remove_dup_utts(dirname, max_count):
    """Cap identical transcripts at max_count occurrences
    (kaldi remove_dup_utts.sh — guards against e.g. thousands of 'uh-huh')."""
    text = read_kv(os.path.join(dirname, "text"))
    seen, drop = {}, set()
    for u, t in text.items():
        seen[t] = seen.get(t, 0) + 1
        if seen[t] > max_count:
            drop.add(u)
    if drop:
        write_kv(os.path.join(dirname, "text"),
                 {u: t for u, t in text.items() if u not in drop})
        fix(dirname)
    print(f"remove-dup-utts: dropped {len(drop)}")


def main():
    p = argparse.ArgumentParser(
        description=__doc__,
        formatter_class=argparse.RawDescriptionHelpFormatter)
    sub = p.add_subparsers(dest="cmd", required=True)
    sub.add_parser("validate").add_argument("dir")
    sub.add_parser("fix").add_argument("dir")
    sp = sub.add_parser("subset")
    sp.add_argument("src")
    sp.add_argument("dst")
    sp.add_argument("--num", type=int)
    sp.add_argument("--first", action="store_const", dest="mode",
                    const="first", default="first")
    sp.add_argument("--last", action="store_const", dest="mode",
                    const="last")
    sp.add_argument("--shortest", action="store_const", dest="mode",
                    const="shortest")
    sp.add_argument("--utt-list")
    sp.add_argument("--spk-list")
    cp = sub.add_parser("combine")
    cp.add_argument("dst")
    cp.add_argument("srcs", nargs="+")
    pp = sub.add_parser("perturb-speed")
    pp.add_argument("src")
    pp.add_argument("dst")
    pp.add_argument("--speed", type=float, required=True)
    sub.add_parser("utt2spk-to-spk2utt").add_argument("dir")
    sub.add_parser("spk2utt-to-utt2spk").add_argument("dir")
    fp = sub.add_parser("filter-scp")
    fp.add_argument("id_file")
    fp.add_argument("scp")
    fp.add_argument("--exclude", action="store_true")
    rp = sub.add_parser("remove-dup-utts")
    rp.add_argument("dir")
    rp.add_argument("--max-count", type=int, default=10)
    args = p.parse_args()

    if args.cmd == "validate":
        sys.exit(1 if validate(args.dir) else 0)
    elif args.cmd == "fix":
        fix(args.dir)
    elif args.cmd == "subset":
        subset(args.src, args.dst, args.num, args.mode,
               args.utt_list, args.spk_list)
    elif args.cmd == "combine":
        combine(args.dst, args.srcs)
    elif args.cmd == "perturb-speed":
        perturb_speed(args.src, args.dst, args.speed)
    elif args.cmd == "utt2spk-to-spk2utt":
        utt2spk_to_spk2utt(args.dir)
    elif args.cmd == "spk2utt-to-utt2spk":
        spk2utt_to_utt2spk(args.dir)
    elif args.cmd == "filter-scp":
        filter_scp(args.id_file, args.scp, args.exclude)
    elif args.cmd == "remove-dup-utts":
        remove_dup_utts(args.dir, args.max_count)


if __name__ == "__main__":
    main()
