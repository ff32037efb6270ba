// Offline decoding CLI over a wav scp, with RTF report.
// Capability parity with reference runtime/core/bin/decoder_main.cc
// (threadpool decode, simulate_streaming, RTF at :182). Model inference
// runs in the JAX worker subprocess (TPU); this binary owns IO, features,
// search and scoring.
#include <cstdio>
#include <cstring>
#include <fstream>
#include <memory>
#include <mutex>
#include <sstream>
#include <string>
#include <unordered_map>
#include <vector>

#include "decoder/asr_decoder.h"
#include "decoder/subprocess_asr_model.h"
#include "frontend/wav.h"
#include "utils/thread_pool.h"
#include "utils/utils.h"

using namespace wenet_tpu;

struct Flags {
  std::string wav_path;
  std::string wav_scp;
  std::string symbol_table;
  std::string worker_cmd;  // e.g. "python -m wenet_celoss_tpu.bin.runtime_worker --config c.yaml --checkpoint m.ckpt"
  std::string result;
  int chunk_size = 16;
  int sample_rate = 16000;
  int num_bins = 80;
  double rescoring_weight = 1.0;
  bool continuous = false;
  std::string mode = "ctc_prefix_beam_search";
  // WFST (LG) decoding (reference --fst_path TLG.fst).
  std::string fst_path;
  double beam = 16.0;
  double lm_scale = 1.0;
  double acoustic_scale = 1.0;
  double blank_skip_thresh = 0.98;
  int max_active = 7000;
};

static Flags ParseFlags(int argc, char** argv) {
  Flags f;
  for (int i = 1; i < argc; ++i) {
    std::string a = argv[i];
    auto next = [&]() { return std::string(argv[++i]); };
    if (a == "--wav_path") f.wav_path = next();
    else if (a == "--wav_scp") f.wav_scp = next();
    else if (a == "--symbol_table") f.symbol_table = next();
    else if (a == "--worker_cmd") f.worker_cmd = next();
    else if (a == "--result") f.result = next();
    else if (a == "--chunk_size") f.chunk_size = std::atoi(next().c_str());
    else if (a == "--num_bins") f.num_bins = std::atoi(next().c_str());
    else if (a == "--mode") f.mode = next();
    else if (a == "--fst_path") f.fst_path = next();
    else if (a == "--beam") f.beam = std::atof(next().c_str());
    else if (a == "--lm_scale") f.lm_scale = std::atof(next().c_str());
    else if (a == "--acoustic_scale")
      f.acoustic_scale = std::atof(next().c_str());
    else if (a == "--blank_skip_thresh")
      f.blank_skip_thresh = std::atof(next().c_str());
    else if (a == "--max_active")
      f.max_active = std::atoi(next().c_str());
    else {
      std::fprintf(stderr, "unknown flag %s\n", a.c_str());
      std::exit(1);
    }
  }
  return f;
}

int main(int argc, char** argv) {
  Flags flags = ParseFlags(argc, argv);

  // Symbol table: "symbol id" per line.
  auto symbol_table =
      std::make_shared<std::unordered_map<int, std::string>>();
  {
    std::ifstream in(flags.symbol_table);
    std::string sym;
    int id;
    while (in >> sym >> id) (*symbol_table)[id] = sym;
  }

  std::vector<std::string> worker_argv;
  {
    std::stringstream ss(flags.worker_cmd);
    std::string tok;
    while (ss >> tok) worker_argv.push_back(tok);
  }
  auto model = std::make_shared<SubprocessAsrModel>(worker_argv);

  auto resource = std::make_shared<DecodeResource>();
  resource->model = model;
  resource->symbol_table = symbol_table;
  resource->post_processor = std::make_shared<PostProcessor>();

  DecodeOptions opts;
  opts.chunk_size = flags.chunk_size;
  if (flags.mode == "rnnt_greedy_search")
    opts.search_type = SearchType::kRnntGreedySearch;
  if (flags.mode == "rnnt_beam_search") {
    opts.search_type = SearchType::kRnntPrefixBeamSearch;
    if (flags.beam > 1.0) opts.rnnt_beam = static_cast<int>(flags.beam);
  }
  if (!flags.fst_path.empty()) {
    auto fst = std::make_shared<LgFst>();
    if (!fst->Read(flags.fst_path)) {
      std::fprintf(stderr, "failed to read fst %s\n",
                   flags.fst_path.c_str());
      return 1;
    }
    resource->fst = fst;
    opts.search_type = SearchType::kWfstBeamSearch;
    opts.wfst_search_opts.beam = static_cast<float>(flags.beam);
    opts.wfst_search_opts.lm_scale = static_cast<float>(flags.lm_scale);
    opts.wfst_search_opts.acoustic_scale =
        static_cast<float>(flags.acoustic_scale);
    opts.wfst_search_opts.blank_skip_thresh =
        static_cast<float>(flags.blank_skip_thresh);
    opts.wfst_search_opts.max_active = flags.max_active;
  }

  std::vector<std::pair<std::string, std::string>> waves;
  if (!flags.wav_path.empty()) waves.emplace_back("utt", flags.wav_path);
  if (!flags.wav_scp.empty()) {
    std::ifstream in(flags.wav_scp);
    std::string key, path;
    while (in >> key >> path) waves.emplace_back(key, path);
  }

  std::ofstream result;
  if (!flags.result.empty()) result.open(flags.result);
  double total_audio_ms = 0, total_decode_ms = 0;

  for (const auto& kv : waves) {
    WavReader reader(kv.second);
    FeaturePipelineConfig fp_cfg(flags.num_bins, reader.sample_rate());
    auto feature_pipeline = std::make_shared<FeaturePipeline>(fp_cfg);
    std::vector<float> wave(reader.data(),
                            reader.data() + reader.num_samples());
    Timer timer;
    feature_pipeline->AcceptWaveform(wave);
    feature_pipeline->set_input_finished();
    AsrDecoder decoder(feature_pipeline, resource, opts);
    while (true) {
      DecodeState state = decoder.Decode();
      if (state == DecodeState::kEndFeats) {
        decoder.Rescoring();
        break;
      }
    }
    int decode_ms = timer.Elapsed();
    double audio_ms = 1000.0 * reader.num_samples() / reader.sample_rate();
    total_audio_ms += audio_ms;
    total_decode_ms += decode_ms;
    // Per-utterance timing (stderr, machine-parsable) so harnesses can
    // separate first-utterance compile cost from steady-state RTF.
    std::fprintf(stderr, "UTTMS %s %d %.0f\n", kv.first.c_str(), decode_ms,
                 audio_ms);
    // Per-stage attribution: feature-read wait, worker encoder forward,
    // host search, finalize/rescoring (see AsrDecoder::StageTimes).
    const auto& st = decoder.stage_times();
    std::fprintf(stderr,
                 "UTTSTAGE %s feat %.1f enc %.1f search %.1f resc %.1f\n",
                 kv.first.c_str(), st.feat_ms, st.encoder_ms,
                 st.search_ms, st.rescore_ms);
    std::string text = decoder.DecodedSomething()
                           ? decoder.result()[0].sentence
                           : "";
    std::printf("%s %s\n", kv.first.c_str(), text.c_str());
    if (result.is_open()) result << kv.first << " " << text << "\n";
  }
  if (total_audio_ms > 0) {
    std::fprintf(stderr, "RTF: %.4f (decode %.0fms / audio %.0fms)\n",
                 total_decode_ms / total_audio_ms, total_decode_ms,
                 total_audio_ms);
  }
  return 0;
}
