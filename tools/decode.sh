#!/usr/bin/env bash
# Drive the C++ runtime decoder over a wav scp and score WER
# (reference tools/decode.sh equivalent).
#
# Usage:
#   tools/decode.sh --scp wav.scp --ref ref.text --units units.txt \
#     --worker_cmd "python -m wenet_celoss_tpu.bin.runtime_worker \
#       --config exp/train.yaml --checkpoint exp/final.ckpt --chunk_size 16" \
#     [--fst lang/lg.bin --words lang/words.txt] [--mode MODE] [--out DIR]
set -euo pipefail

scp="" ref="" units="" worker_cmd="" fst="" words="" mode="" out="decode_out"
chunk_size=16 num_bins=80
while [ $# -gt 0 ]; do
  case "$1" in
    --scp) scp="$2"; shift 2 ;;
    --ref) ref="$2"; shift 2 ;;
    --units) units="$2"; shift 2 ;;
    --worker_cmd) worker_cmd="$2"; shift 2 ;;
    --fst) fst="$2"; shift 2 ;;
    --words) words="$2"; shift 2 ;;
    --mode) mode="$2"; shift 2 ;;
    --out) out="$2"; shift 2 ;;
    --chunk_size) chunk_size="$2"; shift 2 ;;
    --num_bins) num_bins="$2"; shift 2 ;;
    *) echo "unknown flag $1" >&2; exit 1 ;;
  esac
done
[ -n "$scp" ] && [ -n "$units" ] && [ -n "$worker_cmd" ] || {
  echo "required: --scp --units --worker_cmd" >&2; exit 1; }

repo="$(cd "$(dirname "$0")/.." && pwd)"
decoder="$repo/runtime/build/decoder_main"
[ -x "$decoder" ] || {
  echo "build the runtime first: cmake+ninja in runtime/build" >&2; exit 1; }

mkdir -p "$out"
args=(--wav_scp "$scp" --worker_cmd "$worker_cmd" \
      --chunk_size "$chunk_size" --num_bins "$num_bins" \
      --result "$out/text")
if [ -n "$fst" ]; then
  args+=(--fst_path "$fst" --symbol_table "${words:?--words required with --fst}")
else
  args+=(--symbol_table "$units")
fi
[ -n "$mode" ] && args+=(--mode "$mode")

"$decoder" "${args[@]}"

if [ -n "$ref" ]; then
  python "$repo/tools/compute_wer.py" --char "$ref" "$out/text" \
    > "$out/wer" || true
  tail -n 3 "$out/wer"
fi
