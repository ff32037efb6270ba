#!/usr/bin/env bash
# LibriSpeech recipe (reference examples/librispeech/s0/run.sh parity):
# stages 0..6 — data prep → cmvn → dict → data.list → train → average +
# decode → export. Single SPMD process (the mesh spans all local devices;
# multi-host adds --distributed), replacing the reference's
# one-process-per-GPU loop (run.sh:122-160).
set -eo pipefail

SCRIPT_DIR=$(cd "$(dirname "$0")" && pwd)
REPO=${WENET_TPU_REPO:-$(cd "${SCRIPT_DIR}/../.." && pwd)}
cd "${SCRIPT_DIR}"
export PYTHONPATH=${REPO}${PYTHONPATH:+:${PYTHONPATH}}
tools=${REPO}/tools
runtime=${REPO}/runtime

stage=0
stop_stage=6
smoke=false            # --smoke: synthetic mini data, tiny model, all stages
dryrun=false           # --dryrun: REAL-data code path on a fake flac tree

for arg in "$@"; do
  case $arg in
    --smoke) smoke=true ;;
    --dryrun) dryrun=true ;;
    --stage=*) stage=${arg#*=} ;;
    --stop_stage=*) stop_stage=${arg#*=} ;;
  esac
done

data=${LIBRISPEECH_DATA:-/data/librispeech}   # extracted LibriSpeech tree
dir=exp/conformer_rnnt_bias
config=conf/conformer_rnnt_bias.yaml
train_sets="train-clean-100 train-clean-360 train-other-500"
dev_set=dev-clean
test_sets="test-clean test-other"
bpe_model=data/lang_char/train_960_unigram5000.model
dict=data/lang_char/train_960_unigram5000_units.txt
decode_modes="ctc_greedy_search ctc_prefix_beam_search attention_rescoring rnnt_greedy_search"
average_num=30
spm_vocab=5000
num_epochs=""
train_extra=()

if [ "${dryrun}" = true ]; then
  # Readiness rehearsal for the day the real dataset appears: every stage
  # runs its NON-smoke branch — find-over-.flac wav.scp prep, trans.txt
  # collection, FLAC decode through cmvn/train/decode, C++ runtime FLAC
  # read — against a fabricated LibriSpeech-shaped tree
  # (tools/make_fake_librispeech.py). Tiny model + 2 epochs; no WER gate
  # (plumbing, not accuracy — the smoke covers accuracy).
  dir=exp/dryrun
  data=data/fake_librispeech
  train_sets="train-clean-100 train-clean-360 train-other-500"
  test_sets="test-clean"
  average_num=1
  spm_vocab=60
  num_epochs=2
  export JAX_PLATFORMS=${WENET_SMOKE_PLATFORM:-cpu}
  rm -rf ${data}
  python ${tools}/make_fake_librispeech.py --out_dir ${data} \
    --parts ${train_sets} ${dev_set} ${test_sets} --n_utts 12
  for ov in "encoder_conf.num_blocks 2" "encoder_conf.output_size 64" \
      "encoder_conf.attention_heads 2" "encoder_conf.linear_units 64" \
      "encoder_conf.cnn_module_kernel 7" "decoder_conf.num_blocks 1" \
      "decoder_conf.r_num_blocks 1" "decoder_conf.attention_heads 2" \
      "decoder_conf.linear_units 64" "predictor_conf.embed_size 64" \
      "predictor_conf.output_size 64" "predictor_conf.hidden_size 64" \
      "predictor_conf.num_layers 1" "joint_conf.join_dim 64" \
      "context_conf.embedding_size 64" "context_conf.attention_heads 2" \
      "context_conf.linear_units 64" "context_conf.num_block 1" \
      "context_conf.unified_hw_odim 16" \
      "dataset_conf.batch_conf.batch_type static" \
      "dataset_conf.batch_conf.batch_size 8" \
      "dataset_conf.filter_conf.min_length 0" \
      "dataset_conf.fbank_conf.dither 0.0" "dtype float32" \
      "scheduler_conf.warmup_steps 40" "optim_conf.lr 0.005" \
      "dataset_conf.speed_perturb false" \
      "dataset_conf.spec_aug false" \
      "context nobias" "model_conf.hw_weight 0.0" \
      "accum_grad 1"; do
    train_extra+=(--override_config "${ov}")
  done
fi

if [ "${smoke}" = true ]; then
  dir=exp/smoke
  train_sets="train-clean-100"
  test_sets="test-clean"
  average_num=1
  spm_vocab=60
  # Shape-bucketed epochs run in ~2 s once the few bucket programs are
  # compiled (first epoch pays them; the persistent cache keeps them
  # across runs), so a real overfit budget is cheap.
  num_epochs=28
  # Tiny models decode faster on the host CPU than they can pay the
  # TPU-tunnel's cold-compile latency; the persistent compilation cache
  # (utils/platform.enable_compilation_cache) makes repeat smokes cheap.
  # Forced (not ${JAX_PLATFORMS:-cpu}): driver environments export
  # JAX_PLATFORMS=axon globally, which silently put the whole smoke on
  # the TPU tunnel; WENET_SMOKE_PLATFORM opts into another platform.
  export JAX_PLATFORMS=${WENET_SMOKE_PLATFORM:-cpu}
  # The smoke is an ACCURACY gate: the synthetic corpus is learnable
  # (word↔tone, tools/make_smoke_data.py) and stage 4 asserts WER below
  # this ceiling for every decode mode, failing the script otherwise.
  # Trained WITHOUT the context-bias tower: a bias-trained model's CTC/
  # attention heads only ever see BIASED encoder outputs (same property
  # as the reference fork), so plain decode modes are meaningless on it;
  # hotword decode correctness is covered by the parity/hotword tests.
  wer_ceiling=10.0
  # shrink every tower; static batching keeps the smoke deterministic
  smoke_ovs=("encoder_conf.num_blocks 2" "encoder_conf.output_size 64"
      "encoder_conf.attention_heads 2" "encoder_conf.linear_units 64"
      "encoder_conf.cnn_module_kernel 7" "decoder_conf.num_blocks 1"
      "decoder_conf.r_num_blocks 1" "decoder_conf.attention_heads 2"
      "decoder_conf.linear_units 64" "predictor_conf.embed_size 64"
      "predictor_conf.output_size 64" "predictor_conf.hidden_size 64"
      "predictor_conf.num_layers 1" "joint_conf.join_dim 64"
      "context_conf.embedding_size 64" "context_conf.attention_heads 2"
      "context_conf.linear_units 64" "context_conf.num_block 1"
      "context_conf.unified_hw_odim 16"
      "dataset_conf.batch_conf.batch_type static"
      "dataset_conf.batch_conf.batch_size 8"
      "dataset_conf.filter_conf.min_length 0"
      "dataset_conf.fbank_conf.dither 0.0" "dtype float32"
      "scheduler_conf.warmup_steps 40" "optim_conf.lr 0.005"
      "dataset_conf.speed_perturb false"
      "dataset_conf.spec_aug false"
      "accum_grad 1")
  for ov in "${smoke_ovs[@]}" "context nobias" "model_conf.hw_weight 0.0"
  do
    train_extra+=(--override_config "${ov}")
  done
fi


# Bounded retry with epoch-checkpoint resume around the trainer: a host
# crash (observed: XLA:CPU's LLVM JIT intermittently dying in libgcc's
# unwinder on small sandboxes) costs at most the current epoch, not the
# run — the recipe-level analog of the step-checkpoint kill/resume
# guarantee (utils/checkpoint.py, tests/test_checkpoint_resume.py).
run_train() {  # run_train <model_dir> <train args...>
  local mdir=$1; shift
  local attempt last rc
  for attempt in 1 2 3; do
    local resume=()
    # `|| true`: an unmatched glob fails ls, and under set -e a failing
    # command substitution in a plain assignment aborts the script.
    last=$(ls "${mdir}"/[0-9]*.ckpt 2>/dev/null | \
           sed 's/.*\///; s/\.ckpt//' | sort -n | tail -1 || true)
    [ -n "${last}" ] && resume=(--checkpoint "${mdir}/${last}.ckpt")
    if python -m wenet_celoss_tpu.bin.train "$@" "${resume[@]}" \
         --model_dir "${mdir}"; then
      return 0
    fi
    rc=$?
    echo "train attempt ${attempt} exited rc=${rc};" \
         "retrying from epoch checkpoint ${last:-none}" >&2
  done
  echo "train failed after 3 attempts" >&2
  return 1
}

if [ ${stage} -le 0 ] && [ ${stop_stage} -ge 0 ]; then
  if [ "${smoke}" = true ]; then
    echo "stage 0: generate synthetic smoke data"
    python ${tools}/make_smoke_data.py --out_dir data --n_utts 200 \
      --parts ${train_sets} ${dev_set} ${test_sets}
  else
    echo "stage 0: prepare wav.scp/text from the LibriSpeech tree"
    for part in ${train_sets} ${dev_set} ${test_sets}; do
      pdir=data/${part}
      mkdir -p ${pdir}
      find ${data}/${part} -name '*.flac' -o -name '*.wav' | sort | \
        awk -F/ '{key=$NF; sub(/\.(flac|wav)$/, "", key); print key, $0}' \
        > ${pdir}/wav.scp
      find ${data}/${part} -name '*.trans.txt' | sort | xargs cat | \
        sort > ${pdir}/text
    done
  fi
fi

if [ ${stage} -le 1 ] && [ ${stop_stage} -ge 1 ]; then
  echo "stage 1: global CMVN stats"
  mkdir -p data/train_960
  cat data/train-*/wav.scp > data/train_960/wav.scp
  cat data/train-*/text > data/train_960/text
  python -m wenet_celoss_tpu.bin.compute_cmvn_stats \
    --train_config ${config} --in_scp data/train_960/wav.scp \
    --out_cmvn data/train_960/global_cmvn
fi

if [ ${stage} -le 2 ] && [ ${stop_stage} -ge 2 ]; then
  echo "stage 2: BPE model + dict (from-scratch unigram trainer,"
  echo "         reference recipe stage 2 / tools/spm_train)"
  mkdir -p data/lang_char
  if [ ! -f ${bpe_model} ]; then
    # Transcripts (strip utt keys) → unigram subword model. Case is kept
    # as-is, matching the reference recipe (LibriSpeech text is
    # uppercase; ref run.sh:103-105).
    cut -d' ' -f2- data/train_960/text > data/lang_char/input.txt
    python ${tools}/spm_train.py --input data/lang_char/input.txt \
      --vocab_size ${spm_vocab} --model_prefix ${bpe_model%.model}
  fi
  if [ ! -f ${dict} ]; then
    {
      echo "<blank> 0"
      echo "<unk> 1"
      # vocab is "piece<TAB>score"; skip the 3 control rows.
      tail -n +4 ${bpe_model%.model}.vocab | cut -f1 | \
        awk '{print $1, NR+1}'
      echo "<sos/eos> $(($(tail -n +4 ${bpe_model%.model}.vocab | wc -l) + 2))"
    } > ${dict}
  fi
  echo "stage 2b: data.list (raw jsonl; use tools/make_shard_list.py for UIO shards)"
  for part in train_960 ${dev_set} ${test_sets}; do
    python ${tools}/make_raw_list.py data/${part}/wav.scp data/${part}/text \
      data/${part}/data.list
  done
fi

if [ ${stage} -le 3 ] && [ ${stop_stage} -ge 3 ]; then
  echo "stage 3: train"
  mkdir -p ${dir}
  run_train ${dir} \
    --config ${config} \
    --data_type raw \
    --train_data data/train_960/data.list \
    --cv_data data/${dev_set}/data.list \
    --symbol_table ${dict} \
    --bpe_model ${bpe_model} \
    --cmvn data/train_960/global_cmvn \
    ${num_epochs:+--num_epochs ${num_epochs}} \
    "${train_extra[@]}"
fi

if [ ${stage} -le 4 ] && [ ${stop_stage} -ge 4 ]; then
  echo "stage 4: average + decode"
  python -m wenet_celoss_tpu.bin.average_model \
    --dst_model ${dir}/avg_${average_num}.ckpt \
    --src_path ${dir} --num ${average_num} --val_best
  for test_set in ${test_sets}; do
    # ONE recognize process decodes every mode (comma list): the dataset
    # pass and the encoder compiles are shared instead of paid per mode.
    multi=$(echo ${decode_modes} | tr ' ' ',')
    python -m wenet_celoss_tpu.bin.recognize \
      --config ${dir}/train.yaml \
      --data_type raw \
      --test_data data/${test_set}/data.list \
      --checkpoint ${dir}/avg_${average_num}.ckpt \
      --symbol_table ${dict} \
      --bpe_model ${bpe_model} \
      --mode "${multi}" \
      --result_file ${dir}/decode_${test_set}
    for mode in ${decode_modes}; do
      out=${dir}/${mode}_${test_set}
      mkdir -p ${out}
      # recognize.py writes the unsuffixed result_file when --mode has a
      # single entry; handle both layouts (advisor r3).
      src=${dir}/decode_${test_set}.${mode}
      [ -f "${src}" ] || src=${dir}/decode_${test_set}
      mv ${src} ${out}/text
      python ${tools}/compute_wer.py data/${test_set}/text ${out}/text \
        > ${out}/wer
      tail -1 ${out}/wer
      if [ "${smoke}" = true ]; then
        # Accuracy gate: the smoke corpus is learnable by construction;
        # a WER above the ceiling is a training/decode regression.
        wer=$(grep -o 'WER [0-9.]*' ${out}/wer | awk '{print $2}')
        ok=$(awk -v w="${wer}" -v c="${wer_ceiling}" \
             'BEGIN{print (w <= c) ? 1 : 0}')
        if [ "${ok}" != "1" ]; then
          echo "SMOKE FAIL: ${mode} ${test_set} WER ${wer}% >" \
               "ceiling ${wer_ceiling}%"
          exit 1
        fi
      fi
    done
  done
fi

if [ ${stage} -le 4 ] && [ ${stop_stage} -ge 4 ] && [ "${smoke}" = true ]; then
  echo "stage 4b: hotword-biasing accuracy gate (fork flagship capability)"
  # A confusable corpus (SPEECH and MODEL share one tone; MODEL 3x as
  # frequent in training) trained WITH the bias tower. The unbiased
  # decode of the hotword-rich test set must transcribe SPEECH's tone as
  # MODEL (the learned prior); supplying a context list containing
  # SPEECH must recover it. Gate: biased WER strictly below unbiased
  # WER, biased WER under the smoke ceiling, and the per-token hotword
  # gate's total edit distance under a ceiling — the fork's own eval
  # criterion (reference `wenet/bin/recognize.py:374-375`), asserted at
  # recipe level instead of only in tests/test_hotword_decode.py.
  hwdir=exp/smoke_hw
  mkdir -p ${hwdir}
  python ${tools}/make_smoke_data.py --out_dir data_hw --n_utts 200 \
    --n_test_utts 16 --parts train-clean-100 ${dev_set} test-clean \
    --confuse speech:model
  for part in train-clean-100 ${dev_set} test-clean; do
    python ${tools}/make_raw_list.py data_hw/${part}/wav.scp \
      data_hw/${part}/text data_hw/${part}/data.list
  done
  hw_extra=()
  for ov in "${smoke_ovs[@]}" "model_conf.hw_weight 0.5"; do
    hw_extra+=(--override_config "${ov}")
  done
  run_train ${hwdir} \
    --config ${config} \
    --data_type raw \
    --train_data data_hw/train-clean-100/data.list \
    --cv_data data_hw/${dev_set}/data.list \
    --symbol_table ${dict} \
    --bpe_model ${bpe_model} \
    --cmvn data/train_960/global_cmvn \
    --num_epochs ${num_epochs} \
    "${hw_extra[@]}"
  python -m wenet_celoss_tpu.bin.average_model \
    --dst_model ${hwdir}/avg_1.ckpt --src_path ${hwdir} --num 1 --val_best
  echo "SPEECH" > ${hwdir}/hotwords.txt
  python ${tools}/make_context_list.py --context_file ${hwdir}/hotwords.txt \
    --symbol_table ${dict} --bpe_model ${bpe_model} \
    --output ${hwdir}/ctx_ids.txt
  : > ${hwdir}/ctx_empty.txt
  for variant in biased unbiased; do
    [ ${variant} = biased ] && ctx=${hwdir}/ctx_ids.txt \
      || ctx=${hwdir}/ctx_empty.txt
    python -m wenet_celoss_tpu.bin.recognize \
      --config ${hwdir}/train.yaml \
      --data_type raw \
      --test_data data_hw/test-clean/data.list \
      --checkpoint ${hwdir}/avg_1.ckpt \
      --symbol_table ${dict} \
      --bpe_model ${bpe_model} \
      --mode rnnt_greedy_search \
      --context_mode 3 --context_list_file ${ctx} \
      --context_filter_state on \
      --result_file ${hwdir}/decode_${variant}
    python ${tools}/compute_wer.py data_hw/test-clean/text \
      ${hwdir}/decode_${variant} > ${hwdir}/wer_${variant}
    tail -1 ${hwdir}/wer_${variant}
  done
  wb=$(grep -o 'WER [0-9.]*' ${hwdir}/wer_biased | awk '{print $2}')
  wu=$(grep -o 'WER [0-9.]*' ${hwdir}/wer_unbiased | awk '{print $2}')
  gate=$(grep -o '[0-9]*' ${hwdir}/decode_biased.gate_dist | head -1)
  echo "hotword gate: biased WER ${wb}% vs unbiased ${wu}%," \
       "gate edit distance ${gate}"
  ok=$(awk -v b="${wb}" -v u="${wu}" -v c="${wer_ceiling}" -v g="${gate:-999}" \
       'BEGIN{print (b < u && b <= c && g <= 8) ? 1 : 0}')
  if [ "${ok}" != "1" ]; then
    echo "SMOKE FAIL: hotword biasing gate (biased ${wb}% must be <" \
         "unbiased ${wu}%, <= ${wer_ceiling}%, gate dist ${gate} <= 8)"
    exit 1
  fi
fi

if [ ${stage} -le 5 ] && [ ${stop_stage} -ge 5 ]; then
  echo "stage 5: export serving artifacts (StableHLO + worker bundle)"
  python -m wenet_celoss_tpu.bin.export \
    --config ${dir}/train.yaml \
    --checkpoint ${dir}/avg_${average_num}.ckpt \
    --output_dir ${dir}/export
  cp ${dict} ${dir}/export/units.txt
  echo "python -m wenet_celoss_tpu.bin.runtime_worker --config ${dir}/train.yaml --checkpoint ${dir}/avg_${average_num}.ckpt" \
    > ${dir}/export/worker_cmd.txt
fi

if [ ${stage} -le 6 ] && [ ${stop_stage} -ge 6 ]; then
  echo "stage 6: C++ runtime decode (RTF)"
  cmake -S ${runtime}/core -B ${runtime}/build -G Ninja >/dev/null
  ninja -C ${runtime}/build >/dev/null
  ${runtime}/build/decoder_main \
    --wav_scp data/$(echo ${test_sets} | awk '{print $1}')/wav.scp \
    --symbol_table ${dir}/export/units.txt \
    --num_bins $(grep -A5 'fbank_conf' ${dir}/train.yaml | grep num_mel_bins | awk '{print $2}') \
    --worker_cmd "$(cat ${dir}/export/worker_cmd.txt)" \
    --result ${dir}/runtime_decode.text
  echo "runtime decode results:"; cat ${dir}/runtime_decode.text
fi
