// CTC prefix beam search with viterbi timestamps and context boosting.
// Capability parity with reference
// runtime/core/decoder/ctc_prefix_beam_search.{h,cc}:97-234 (PrefixScore
// with split blank/non-blank probability and viterbi channels, first/second
// beam pruning, context-graph scoring, final-context backoff).
#ifndef WENET_TPU_DECODER_CTC_PREFIX_BEAM_SEARCH_H_
#define WENET_TPU_DECODER_CTC_PREFIX_BEAM_SEARCH_H_

#include <memory>
#include <unordered_map>
#include <vector>

#include "decoder/context_graph.h"
#include "decoder/search_interface.h"
#include "utils/utils.h"

namespace wenet_tpu {

struct CtcPrefixBeamSearchOptions {
  int blank = 0;
  int first_beam_size = 10;
  int second_beam_size = 10;
};

struct PrefixScore {
  float s = kLogZero;               // log p(prefix, ends blank)
  float ns = kLogZero;              // log p(prefix, ends non-blank)
  float v_s = kLogZero;             // viterbi score, path ends blank
  float v_ns = kLogZero;            // viterbi score, path ends non-blank
  float cur_token_prob = kLogZero;  // emission prob of last token (nb path)
  std::vector<int> times_s;
  std::vector<int> times_ns;

  // Context boosting state.
  bool has_context = false;
  int context_state = 0;
  float context_score = 0.0f;

  float score() const { return LogAdd(s, ns); }
  float viterbi_score() const { return v_s > v_ns ? v_s : v_ns; }
  const std::vector<int>& times() const {
    return v_s > v_ns ? times_s : times_ns;
  }
  float total_score() const { return score() + context_score; }

  void CopyContext(const PrefixScore& prefix_score) {
    context_state = prefix_score.context_state;
    context_score = prefix_score.context_score;
  }

  void UpdateContext(const std::shared_ptr<ContextGraph>& graph,
                     const PrefixScore& prefix_score, int word_id) {
    CopyContext(prefix_score);
    float score = 0.0f;
    bool sb = false, eb = false;
    context_state =
        graph->GetNextState(prefix_score.context_state, word_id, &score,
                            &sb, &eb);
    context_score += score;
  }
};

struct PrefixHash {
  size_t operator()(const std::vector<int>& prefix) const {
    size_t h = 17;
    for (int t : prefix) h = h * 1000003u + static_cast<size_t>(t + 1);
    return h;
  }
};

class CtcPrefixBeamSearch : public SearchInterface {
 public:
  explicit CtcPrefixBeamSearch(
      const CtcPrefixBeamSearchOptions& opts,
      const std::shared_ptr<ContextGraph>& context_graph = nullptr);

  void Search(const std::vector<std::vector<float>>& logp) override;
  void Reset() override;
  void FinalizeSearch() override;
  SearchType Type() const override {
    return SearchType::kPrefixBeamSearch;
  }

  const std::vector<std::vector<int>>& Inputs() const override {
    return hypotheses_;
  }
  const std::vector<std::vector<int>>& Outputs() const override {
    return outputs_;
  }
  const std::vector<float>& Likelihood() const override {
    return likelihood_;
  }
  const std::vector<float>& viterbi_likelihood() const {
    return viterbi_likelihood_;
  }
  const std::vector<std::vector<int>>& Times() const override {
    return times_;
  }
  int abs_time_step() const { return abs_time_step_; }

 private:
  void UpdateOutputs();
  void UpdateHypotheses(
      const std::vector<std::pair<std::vector<int>, PrefixScore>>& hyps);
  void UpdateFinalContext();

  CtcPrefixBeamSearchOptions opts_;
  std::shared_ptr<ContextGraph> context_graph_;
  int abs_time_step_ = 0;

  std::unordered_map<std::vector<int>, PrefixScore, PrefixHash> cur_hyps_;
  // Result caches.
  std::vector<std::vector<int>> hypotheses_;
  std::vector<std::vector<int>> outputs_;
  std::vector<float> likelihood_;
  std::vector<float> viterbi_likelihood_;
  std::vector<std::vector<int>> times_;
};

}  // namespace wenet_tpu

#endif  // WENET_TPU_DECODER_CTC_PREFIX_BEAM_SEARCH_H_
