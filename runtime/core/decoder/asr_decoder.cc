#include "decoder/asr_decoder.h"

#include <algorithm>
#include <chrono>
#include <utility>

namespace wenet_tpu {

AsrDecoder::AsrDecoder(std::shared_ptr<FeaturePipeline> feature_pipeline,
                       std::shared_ptr<DecodeResource> resource,
                       const DecodeOptions& opts)
    : feature_pipeline_(std::move(feature_pipeline)),
      resource_(std::move(resource)), model_(resource_->model),
      post_processor_(resource_->post_processor), opts_(opts),
      ctc_endpointer_(opts.ctc_endpoint_config) {
  model_->set_chunk_size(opts_.chunk_size);
  model_->set_num_left_chunks(opts_.num_left_chunks);
  // A new decoder must start from fresh model state. The reference
  // guarantees this with a model COPY per decoder
  // (torch_asr_model.cc:79-104); the subprocess engine is shared, so
  // reset its stream here — without this, consecutive utterances in
  // decoder_main leaked encoder state across utterances (and the
  // growing rescoring memory forced a fresh XLA compile per utterance:
  // the 0.59-RTF mystery in the r5 stage attribution).
  model_->Reset();
  if (opts_.search_type == SearchType::kRnntGreedySearch) {
    searcher_.reset(new RnntGreedySearch());
  } else if (opts_.search_type == SearchType::kRnntPrefixBeamSearch) {
    searcher_.reset(new RnntBeamSearch());
  } else if (opts_.search_type == SearchType::kWfstBeamSearch &&
             resource_->fst != nullptr) {
    searcher_.reset(
        new WfstBeamSearch(resource_->fst, opts_.wfst_search_opts));
  } else {
    searcher_.reset(new CtcPrefixBeamSearch(opts_.ctc_search_opts,
                                            resource_->context_graph));
  }
  ctc_endpointer_.frame_shift_in_ms(frame_shift_in_ms());
}

void AsrDecoder::Reset() {
  start_ = false;
  result_.clear();
  num_frames_ = 0;
  global_frame_offset_ = 0;
  model_->Reset();
  searcher_->Reset();
  feature_pipeline_->Reset();
  ctc_endpointer_.Reset();
}

void AsrDecoder::ResetContinuousDecoding() {
  global_frame_offset_ = num_frames_;
  start_ = false;
  result_.clear();
  model_->Reset();
  searcher_->Reset();
  ctc_endpointer_.Reset();
}

DecodeState AsrDecoder::Decode() { return AdvanceDecoding(); }

DecodeState AsrDecoder::AdvanceDecoding() {
  using clock = std::chrono::steady_clock;
  auto ms_since = [](clock::time_point t0) {
    return std::chrono::duration<double, std::milli>(clock::now() - t0)
        .count();
  };
  DecodeState state = DecodeState::kEndBatch;
  const int num_required_frames = model_->num_frames_for_chunk(!start_);
  std::vector<std::vector<float>> chunk_feats;
  auto t0 = clock::now();
  bool has_more =
      feature_pipeline_->Read(num_required_frames, &chunk_feats);
  stage_times_.feat_ms += ms_since(t0);
  if (!has_more) state = DecodeState::kEndFeats;
  num_frames_ += static_cast<int>(chunk_feats.size());

  if (!chunk_feats.empty() || state == DecodeState::kEndFeats) {
    std::vector<std::vector<float>> ctc_log_probs;
    t0 = clock::now();
    model_->ForwardEncoderChunk(chunk_feats, &ctc_log_probs);
    if (state == DecodeState::kEndFeats) {
      // Flush the model's internal window buffer (tail frames).
      std::vector<std::vector<float>> tail_probs;
      model_->ForwardEncoderChunk({}, &tail_probs);
      ctc_log_probs.insert(ctc_log_probs.end(), tail_probs.begin(),
                           tail_probs.end());
    }
    stage_times_.encoder_ms += ms_since(t0);
    t0 = clock::now();
    if (opts_.search_type == SearchType::kRnntGreedySearch ||
        opts_.search_type == SearchType::kRnntPrefixBeamSearch) {
      // Streaming partials come from the incremental greedy decode; the
      // beam mode replaces them with the utterance-final n-best in
      // Rescoring().
      std::vector<int> new_tokens;
      model_->RnntGreedyChunk(&new_tokens);
      searcher_->Search(new_tokens);
    } else {
      searcher_->Search(ctc_log_probs);
    }
    stage_times_.search_ms += ms_since(t0);
    UpdateResult(false);
    if (state != DecodeState::kEndFeats && !ctc_log_probs.empty() &&
        ctc_endpointer_.IsEndpoint(ctc_log_probs, DecodedSomething())) {
      state = DecodeState::kEndpoint;
    }
    start_ = true;
  }
  return state;
}

void AsrDecoder::UpdateResult(bool finish) {
  const auto& hypotheses = searcher_->Outputs();
  const auto& likelihood = searcher_->Likelihood();
  const auto& times = searcher_->Times();
  result_.clear();
  for (size_t i = 0; i < hypotheses.size(); ++i) {
    const auto& hypothesis = hypotheses[i];
    DecodeResult path;
    path.score = likelihood[i];
    for (size_t j = 0; j < hypothesis.size(); ++j) {
      int w = hypothesis[j];
      auto it = resource_->symbol_table->find(w);
      std::string word =
          it != resource_->symbol_table->end() ? it->second : "<unk>";
      // WFST outputs are whole words: join with spaces (reference
      // asr_decoder.cc:163-168).
      if (searcher_->Type() == SearchType::kWfstBeamSearch && j > 0) {
        path.sentence += ' ';
      }
      path.sentence += word;
      if (j < times[i].size()) {
        int frame = times[i][j] + global_frame_offset_;
        int start_ms = frame * frame_shift_in_ms();
        int end_ms = start_ms + frame_shift_in_ms();
        path.word_pieces.emplace_back(word, start_ms, end_ms);
      }
    }
    if (post_processor_) {
      path.sentence = post_processor_->Process(path.sentence, finish);
    }
    result_.push_back(std::move(path));
  }
}

void AsrDecoder::Rescoring() {
  auto t0 = std::chrono::steady_clock::now();
  struct Acc {  // accumulate on every exit path
    std::chrono::steady_clock::time_point t0;
    double* dst;
    ~Acc() {
      *dst += std::chrono::duration<double, std::milli>(
                  std::chrono::steady_clock::now() - t0)
                  .count();
    }
  } acc{t0, &stage_times_.rescore_ms};
  searcher_->FinalizeSearch();
  if (opts_.search_type == SearchType::kRnntPrefixBeamSearch) {
    // Utterance-final transducer beam (JAX batched search in the worker)
    // replaces the streaming greedy partial.
    std::vector<std::vector<int>> hyps;
    std::vector<float> scores;
    model_->RnntBeamSearch(opts_.rnnt_beam, &hyps, &scores);
    static_cast<RnntBeamSearch*>(searcher_.get())->SetNbest(hyps, scores);
  }
  UpdateResult(true);
  if (opts_.rescoring_weight <= 0.0f ||
      opts_.search_type == SearchType::kRnntGreedySearch)
    return;
  const auto& hypotheses = searcher_->Inputs();
  if (hypotheses.empty()) return;
  std::vector<float> rescoring_score;
  model_->AttentionRescoring(hypotheses, opts_.reverse_weight,
                             &rescoring_score);
  const auto& ctc_scores = searcher_->Likelihood();
  for (size_t i = 0;
       i < result_.size() && i < rescoring_score.size(); ++i) {
    result_[i].score = opts_.rescoring_weight * rescoring_score[i] +
                       opts_.ctc_weight * ctc_scores[i];
  }
  std::sort(result_.begin(), result_.end(), DecodeResult::CompareFunc);
}

}  // namespace wenet_tpu
