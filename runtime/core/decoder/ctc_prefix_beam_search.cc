// See header. Algorithm: per frame expand each prefix by (blank, repeat,
// new token) cases over the first-beam top-k, merge into a hash map keyed
// by prefix, prune to second beam by total (context-boosted) score.
#include "decoder/ctc_prefix_beam_search.h"

#include <algorithm>
#include <utility>

namespace wenet_tpu {

CtcPrefixBeamSearch::CtcPrefixBeamSearch(
    const CtcPrefixBeamSearchOptions& opts,
    const std::shared_ptr<ContextGraph>& context_graph)
    : opts_(opts), context_graph_(context_graph) {
  Reset();
}

void CtcPrefixBeamSearch::Reset() {
  abs_time_step_ = 0;
  cur_hyps_.clear();
  hypotheses_.clear();
  outputs_.clear();
  likelihood_.clear();
  viterbi_likelihood_.clear();
  times_.clear();
  PrefixScore empty;
  empty.s = 0.0f;
  empty.v_s = 0.0f;
  empty.has_context = context_graph_ != nullptr;
  cur_hyps_[std::vector<int>()] = empty;
  UpdateHypotheses({{std::vector<int>(), empty}});
}

static bool PrefixScoreCompare(
    const std::pair<std::vector<int>, PrefixScore>& a,
    const std::pair<std::vector<int>, PrefixScore>& b) {
  return a.second.total_score() > b.second.total_score();
}

void CtcPrefixBeamSearch::Search(
    const std::vector<std::vector<float>>& logp) {
  if (logp.empty()) return;
  for (const auto& logp_t : logp) {
    std::unordered_map<std::vector<int>, PrefixScore, PrefixHash> next_hyps;
    // First beam: prune vocabulary.
    std::vector<float> top_values;
    std::vector<int> top_indices;
    TopK(logp_t, opts_.first_beam_size, &top_values, &top_indices);

    for (const auto& it : cur_hyps_) {
      const std::vector<int>& prefix = it.first;
      const PrefixScore& prefix_score = it.second;
      for (size_t k = 0; k < top_indices.size(); ++k) {
        int id = top_indices[k];
        float prob = top_values[k];
        if (id == opts_.blank) {
          // Case 0: *a + ε => *a  (ends blank)
          PrefixScore& next = next_hyps[prefix];
          next.s = LogAdd(next.s, prefix_score.score() + prob);
          float v = prefix_score.viterbi_score() + prob;
          if (v > next.v_s) {
            next.v_s = v;
            next.times_s = prefix_score.times();
          }
          if (!next.has_context) {
            next.CopyContext(prefix_score);
            next.has_context = true;
          }
        } else if (!prefix.empty() && id == prefix.back()) {
          // Case 1: *a + a => *a  (repeat, from non-blank channel)
          PrefixScore& next = next_hyps[prefix];
          next.ns = LogAdd(next.ns, prefix_score.ns + prob);
          if (prefix_score.v_ns + prob > next.v_ns) {
            next.v_ns = prefix_score.v_ns + prob;
            if (prob > prefix_score.cur_token_prob) {
              next.cur_token_prob = prob;
              next.times_ns = prefix_score.times_ns;
              if (!next.times_ns.empty())
                next.times_ns.back() = abs_time_step_;
            } else {
              next.cur_token_prob = prefix_score.cur_token_prob;
              next.times_ns = prefix_score.times_ns;
            }
          }
          if (!next.has_context) {
            next.CopyContext(prefix_score);
            next.has_context = true;
          }
          // Case 2: *a + a => *aa (via blank channel)
          std::vector<int> new_prefix(prefix);
          new_prefix.push_back(id);
          PrefixScore& next2 = next_hyps[new_prefix];
          next2.ns = LogAdd(next2.ns, prefix_score.s + prob);
          if (prefix_score.s + prob > next2.v_ns) {
            next2.v_ns = prefix_score.v_s + prob;
            next2.cur_token_prob = prob;
            next2.times_ns = prefix_score.times_s;
            next2.times_ns.push_back(abs_time_step_);
          }
          if (context_graph_ && !next2.has_context) {
            next2.UpdateContext(context_graph_, prefix_score, id);
            next2.has_context = true;
          }
        } else {
          // Case 3: *a + b => *ab
          std::vector<int> new_prefix(prefix);
          new_prefix.push_back(id);
          PrefixScore& next = next_hyps[new_prefix];
          next.ns = LogAdd(next.ns, prefix_score.score() + prob);
          float v = prefix_score.viterbi_score() + prob;
          if (v > next.v_ns) {
            next.v_ns = v;
            next.cur_token_prob = prob;
            next.times_ns = prefix_score.times();
            next.times_ns.push_back(abs_time_step_);
          }
          if (context_graph_ && !next.has_context) {
            next.UpdateContext(context_graph_, prefix_score, id);
            next.has_context = true;
          }
        }
      }
    }

    // Second beam prune.
    std::vector<std::pair<std::vector<int>, PrefixScore>> arr(
        next_hyps.begin(), next_hyps.end());
    int beam = std::min<int>(opts_.second_beam_size,
                             static_cast<int>(arr.size()));
    std::nth_element(arr.begin(), arr.begin() + beam - 1, arr.end(),
                     PrefixScoreCompare);
    arr.resize(beam);
    std::sort(arr.begin(), arr.end(), PrefixScoreCompare);

    cur_hyps_.clear();
    for (auto& p : arr) cur_hyps_[p.first] = p.second;
    UpdateHypotheses(arr);
    ++abs_time_step_;
  }
}

void CtcPrefixBeamSearch::UpdateHypotheses(
    const std::vector<std::pair<std::vector<int>, PrefixScore>>& hyps) {
  hypotheses_.clear();
  likelihood_.clear();
  viterbi_likelihood_.clear();
  times_.clear();
  for (const auto& p : hyps) {
    hypotheses_.push_back(p.first);
    likelihood_.push_back(p.second.total_score());
    viterbi_likelihood_.push_back(p.second.viterbi_score());
    times_.push_back(p.second.times());
  }
  UpdateOutputs();
}

void CtcPrefixBeamSearch::UpdateOutputs() {
  // CTC tokens == output tokens here (no WFST ilabel shift).
  outputs_ = hypotheses_;
}

void CtcPrefixBeamSearch::UpdateFinalContext() {
  if (!context_graph_) return;
  // Refund dangling partial-match boosts (reference :215-234).
  for (auto& it : cur_hyps_) {
    it.second.context_score +=
        context_graph_->FinalScore(it.second.context_state);
    it.second.context_state = 0;
  }
  std::vector<std::pair<std::vector<int>, PrefixScore>> arr(
      cur_hyps_.begin(), cur_hyps_.end());
  std::sort(arr.begin(), arr.end(), PrefixScoreCompare);
  UpdateHypotheses(arr);
}

void CtcPrefixBeamSearch::FinalizeSearch() { UpdateFinalContext(); }

}  // namespace wenet_tpu
