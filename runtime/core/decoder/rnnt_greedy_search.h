// Streaming RNN-T greedy search accumulator.
// Capability parity with the fork's runtime
// runtime/core/decoder/rnnt_greedy_search.{h,cc}:50-69 — a thin
// SearchInterface that appends model-produced hypothesis tokens (the
// transducer decode itself runs next to the model, in the JAX worker).
#ifndef WENET_TPU_DECODER_RNNT_GREEDY_SEARCH_H_
#define WENET_TPU_DECODER_RNNT_GREEDY_SEARCH_H_

#include <vector>

#include "decoder/search_interface.h"

namespace wenet_tpu {

class RnntGreedySearch : public SearchInterface {
 public:
  RnntGreedySearch() { Reset(); }

  void Search(const std::vector<std::vector<float>>& logp) override {}

  void Search(const std::vector<int>& hyp) override {
    hyp_.insert(hyp_.end(), hyp.begin(), hyp.end());
    UpdateOutputs();
  }

  void Reset() override {
    hyp_.clear();
    hypotheses_.assign(1, {});
    outputs_.assign(1, {});
    likelihood_.assign(1, 0.0f);
    times_.assign(1, {});
  }

  void FinalizeSearch() override {}
  SearchType Type() const override {
    return SearchType::kRnntGreedySearch;
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
  const std::vector<std::vector<int>>& Times() const override {
    return times_;
  }

 protected:
  void UpdateOutputs() {
    hypotheses_[0] = hyp_;
    outputs_[0] = hyp_;
  }

  std::vector<int> hyp_;
  std::vector<std::vector<int>> hypotheses_;
  std::vector<std::vector<int>> outputs_;
  std::vector<float> likelihood_;
  std::vector<std::vector<int>> times_;
};

// Transducer prefix beam: greedy-accumulator partials during streaming;
// at FinalizeSearch the decoder queries the model's utterance-final beam
// (AsrModel::RnntBeamSearch → JAX batched rnnt_prefix_beam_search) and
// installs the n-best here. Completes the reference's unfinished
// runtime/core/decoder/rnnt_prefix_beam_search.{h,cc}.
class RnntBeamSearch : public RnntGreedySearch {
 public:
  SearchType Type() const override {
    return SearchType::kRnntPrefixBeamSearch;
  }

  void SetNbest(const std::vector<std::vector<int>>& hyps,
                const std::vector<float>& scores) {
    if (hyps.empty()) return;
    hypotheses_ = hyps;
    outputs_ = hyps;
    likelihood_ = scores;
    times_.assign(hyps.size(), {});
  }
};

}  // namespace wenet_tpu

#endif  // WENET_TPU_DECODER_RNNT_GREEDY_SEARCH_H_
