// Decode orchestrator: feature pipeline → model chunks → search →
// endpoint → results with word timestamps.
// Capability parity with reference runtime/core/decoder/asr_decoder.{h,cc}
// (AdvanceDecoding :94-145, UpdateResult :147-215, Rescoring :217-242,
// DecodeResource sharing :95-104).
#ifndef WENET_TPU_DECODER_ASR_DECODER_H_
#define WENET_TPU_DECODER_ASR_DECODER_H_

#include <memory>
#include <string>
#include <unordered_map>
#include <vector>

#include "decoder/asr_model.h"
#include "decoder/ctc_endpoint.h"
#include "decoder/ctc_prefix_beam_search.h"
#include "decoder/rnnt_greedy_search.h"
#include "decoder/wfst_beam_search.h"
#include "decoder/context_graph.h"
#include "frontend/feature_pipeline.h"
#include "post_processor/post_processor.h"
#include "utils/utils.h"

namespace wenet_tpu {

struct DecodeOptions {
  int chunk_size = 16;
  int num_left_chunks = -1;
  float ctc_weight = 0.5f;
  float rescoring_weight = 1.0f;
  float reverse_weight = 0.0f;
  // "ctc_prefix_beam_search" | "rnnt_greedy_search" |
  // "rnnt_beam_search" | "ctc_wfst_beam_search"
  SearchType search_type = SearchType::kPrefixBeamSearch;
  // n-best width for the utterance-final transducer beam
  // (search_type == kRnntPrefixBeamSearch).
  int rnnt_beam = 5;
  CtcEndpointConfig ctc_endpoint_config;
  CtcPrefixBeamSearchOptions ctc_search_opts;
  WfstBeamSearchOptions wfst_search_opts;
};

struct WordPiece {
  std::string word;
  int start;  // ms
  int end;    // ms
  WordPiece(std::string w, int s, int e)
      : word(std::move(w)), start(s), end(e) {}
};

struct DecodeResult {
  float score = -kLogZero;
  std::string sentence;
  std::vector<WordPiece> word_pieces;

  static bool CompareFunc(const DecodeResult& a, const DecodeResult& b) {
    return a.score > b.score;
  }
};

enum class DecodeState {
  kEndBatch = 0,
  kEndpoint = 1,
  kEndFeats = 2,
};

// Shared, thread-safe resources (one per server; decoders share it).
struct DecodeResource {
  std::shared_ptr<AsrModel> model;
  std::shared_ptr<std::unordered_map<int, std::string>> symbol_table;
  std::shared_ptr<ContextGraph> context_graph;
  std::shared_ptr<PostProcessor> post_processor;
  // LG decoding graph; when set, search_type kWfstBeamSearch applies and
  // symbol_table is the word table (words.txt).
  std::shared_ptr<LgFst> fst;
};

class AsrDecoder {
 public:
  AsrDecoder(std::shared_ptr<FeaturePipeline> feature_pipeline,
             std::shared_ptr<DecodeResource> resource,
             const DecodeOptions& opts);

  DecodeState Decode();
  void Rescoring();
  void Reset();
  void ResetContinuousDecoding();

  bool DecodedSomething() const {
    return !result_.empty() && !result_[0].sentence.empty();
  }
  const std::vector<DecodeResult>& result() const { return result_; }

  // Cumulative per-stage wall time, for RTF attribution (the reference
  // logs a forward/search split per chunk, asr_decoder.cc:113-133; this
  // accumulates the whole utterance so decoder_main can emit one
  // machine-parsable UTTSTAGE line).
  struct StageTimes {
    double feat_ms = 0;      // FeaturePipeline::Read wait
    double encoder_ms = 0;   // model ForwardEncoderChunk (+tail flush)
    double search_ms = 0;    // host search update (incl. greedy chunk)
    double rescore_ms = 0;   // finalize: beam finalize + rescoring fwd
  };
  const StageTimes& stage_times() const { return stage_times_; }
  int frame_shift_in_ms() const {
    return model_->subsampling_rate() *
           feature_pipeline_->config().frame_shift * 1000 /
           feature_pipeline_->config().sample_rate;
  }

 private:
  DecodeState AdvanceDecoding();
  void UpdateResult(bool finish = false);

  std::shared_ptr<FeaturePipeline> feature_pipeline_;
  std::shared_ptr<DecodeResource> resource_;
  std::shared_ptr<AsrModel> model_;
  std::shared_ptr<PostProcessor> post_processor_;
  DecodeOptions opts_;
  CtcEndpoint ctc_endpointer_;
  std::unique_ptr<SearchInterface> searcher_;
  std::vector<DecodeResult> result_;
  StageTimes stage_times_;
  int num_frames_ = 0;
  int global_frame_offset_ = 0;
  bool start_ = false;
};

}  // namespace wenet_tpu

#endif  // WENET_TPU_DECODER_ASR_DECODER_H_
