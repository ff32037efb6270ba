// See header. One frame = expand every beam slot against the pruned
// vocabulary into stay/extend candidates keyed by trie node, merging
// probability channels with log-add and viterbi channels with max, then
// keep the best `second_beam_size` candidates by context-boosted score.
#include "decoder/ctc_prefix_beam_search.h"

#include <algorithm>
#include <cmath>

namespace wenet_tpu {

void CtcPrefixBeamSearch::Beam::clear() {
  node.clear();
  lp_b.clear();
  lp_t.clear();
  vit_b.clear();
  vit_t.clear();
  tl_b.clear();
  tl_t.clear();
  last_lp.clear();
  ctx_state.clear();
  ctx_bonus.clear();
}

int CtcPrefixBeamSearch::Beam::emplace(int32_t node_id, int32_t ctx_state_id,
                                       float ctx_bonus_v) {
  node.push_back(node_id);
  lp_b.push_back(kLogZero);
  lp_t.push_back(kLogZero);
  vit_b.push_back(kLogZero);
  vit_t.push_back(kLogZero);
  tl_b.push_back(-1);
  tl_t.push_back(-1);
  last_lp.push_back(kLogZero);
  ctx_state.push_back(ctx_state_id);
  ctx_bonus.push_back(ctx_bonus_v);
  return static_cast<int>(node.size()) - 1;
}

CtcPrefixBeamSearch::CtcPrefixBeamSearch(
    const CtcPrefixBeamSearchOptions& opts,
    const std::shared_ptr<ContextGraph>& context_graph)
    : opts_(opts), context_graph_(context_graph) {
  Reset();
}

void CtcPrefixBeamSearch::Reset() {
  frame_ = 0;
  trie_.assign(1, {-1, -1});  // node 0: empty prefix
  children_.clear();
  tstamps_.clear();
  beam_.clear();
  next_.clear();
  slot_of_.clear();
  int root = beam_.emplace(0, 0, 0.0f);
  beam_.lp_b[root] = 0.0f;   // P(empty prefix) = 1, "ends blank"
  beam_.vit_b[root] = 0.0f;
  PruneAndPublish();  // publishes the empty hypothesis
}

int32_t CtcPrefixBeamSearch::Child(int32_t parent, int32_t token) {
  uint64_t key = (static_cast<uint64_t>(parent) << 32) |
                 static_cast<uint32_t>(token);
  auto it = children_.find(key);
  if (it != children_.end()) return it->second;
  int32_t id = static_cast<int32_t>(trie_.size());
  trie_.push_back({token, parent});
  children_.emplace(key, id);
  return id;
}

int32_t CtcPrefixBeamSearch::PushTime(int32_t prev_head, int32_t t) {
  tstamps_.push_back({t, prev_head});
  return static_cast<int32_t>(tstamps_.size()) - 1;
}

int32_t CtcPrefixBeamSearch::RetimeLast(int32_t head, int32_t t) {
  if (head < 0) return head;
  tstamps_.push_back({t, tstamps_[head].prev});
  return static_cast<int32_t>(tstamps_.size()) - 1;
}

int CtcPrefixBeamSearch::StaySlot(int src) {
  int32_t n = beam_.node[src];
  auto it = slot_of_.find(n);
  if (it != slot_of_.end()) return it->second;
  // A stay candidate inherits the source prefix's context as-is.
  int s = next_.emplace(n, beam_.ctx_state[src], beam_.ctx_bonus[src]);
  slot_of_.emplace(n, s);
  return s;
}

int CtcPrefixBeamSearch::ExtendSlot(int src, int32_t token) {
  int32_t child = Child(beam_.node[src], token);
  auto it = slot_of_.find(child);
  if (it != slot_of_.end()) return it->second;
  int32_t st = beam_.ctx_state[src];
  float bonus = beam_.ctx_bonus[src];
  if (context_graph_) {
    float delta = 0.0f;
    bool sb = false, eb = false;
    st = context_graph_->GetNextState(st, token, &delta, &sb, &eb);
    bonus += delta;
  }
  int s = next_.emplace(child, st, bonus);
  slot_of_.emplace(child, s);
  return s;
}

void CtcPrefixBeamSearch::ExpandFrame(const std::vector<float>& logp_t) {
  std::vector<float> top_lp;
  std::vector<int> top_tok;
  TopK(logp_t, opts_.first_beam_size, &top_lp, &top_tok);

  next_.clear();
  slot_of_.clear();
  for (int i = 0; i < static_cast<int>(beam_.size()); ++i) {
    int32_t last = trie_[beam_.node[i]].token;  // -1 at the root
    float total = beam_.total(i);
    for (size_t k = 0; k < top_tok.size(); ++k) {
      int32_t tok = top_tok[k];
      float lp = top_lp[k];
      if (tok == opts_.blank) {
        // Prefix absorbs a blank frame: both channels fold into lp_b.
        int s = StaySlot(i);
        next_.lp_b[s] = LogAdd(next_.lp_b[s], total + lp);
        float v = beam_.viterbi(i) + lp;
        if (v > next_.vit_b[s]) {
          next_.vit_b[s] = v;
          next_.tl_b[s] = beam_.viterbi_times(i);
        }
      } else if (tok == last) {
        // Same token again. Token-channel mass stays on this prefix...
        int s = StaySlot(i);
        float v = beam_.vit_t[i] + lp;
        next_.lp_t[s] = LogAdd(next_.lp_t[s], beam_.lp_t[i] + lp);
        if (v > next_.vit_t[s]) {
          next_.vit_t[s] = v;
          // The viterbi path may re-stamp its final emission if this
          // frame's evidence is stronger.
          if (lp > beam_.last_lp[i]) {
            next_.last_lp[s] = lp;
            next_.tl_t[s] = RetimeLast(beam_.tl_t[i], frame_);
          } else {
            next_.last_lp[s] = beam_.last_lp[i];
            next_.tl_t[s] = beam_.tl_t[i];
          }
        }
        // ...while blank-channel mass starts a doubled token.
        int e = ExtendSlot(i, tok);
        next_.lp_t[e] = LogAdd(next_.lp_t[e], beam_.lp_b[i] + lp);
        float ve = beam_.vit_b[i] + lp;
        if (ve > next_.vit_t[e]) {
          next_.vit_t[e] = ve;
          next_.last_lp[e] = lp;
          next_.tl_t[e] = PushTime(beam_.tl_b[i], frame_);
        }
      } else {
        // New token extends the prefix from either channel.
        int e = ExtendSlot(i, tok);
        next_.lp_t[e] = LogAdd(next_.lp_t[e], total + lp);
        float ve = beam_.viterbi(i) + lp;
        if (ve > next_.vit_t[e]) {
          next_.vit_t[e] = ve;
          next_.last_lp[e] = lp;
          next_.tl_t[e] = PushTime(beam_.viterbi_times(i), frame_);
        }
      }
    }
  }
}

void CtcPrefixBeamSearch::PruneAndPublish() {
  int n = static_cast<int>(beam_.size());
  std::vector<int> order(n);
  for (int i = 0; i < n; ++i) order[i] = i;
  int keep = std::min(opts_.second_beam_size, n);
  std::partial_sort(order.begin(), order.begin() + keep, order.end(),
                    [this](int a, int b) {
                      return beam_.ranked(a) > beam_.ranked(b);
                    });
  order.resize(keep);

  Beam pruned;
  for (int i : order) {
    int s = pruned.emplace(beam_.node[i], beam_.ctx_state[i],
                           beam_.ctx_bonus[i]);
    pruned.lp_b[s] = beam_.lp_b[i];
    pruned.lp_t[s] = beam_.lp_t[i];
    pruned.vit_b[s] = beam_.vit_b[i];
    pruned.vit_t[s] = beam_.vit_t[i];
    pruned.tl_b[s] = beam_.tl_b[i];
    pruned.tl_t[s] = beam_.tl_t[i];
    pruned.last_lp[s] = beam_.last_lp[i];
  }
  beam_ = std::move(pruned);

  hypotheses_.clear();
  likelihood_.clear();
  viterbi_likelihood_.clear();
  times_.clear();
  for (int i = 0; i < static_cast<int>(beam_.size()); ++i) {
    hypotheses_.push_back(MaterializePrefix(beam_.node[i]));
    likelihood_.push_back(beam_.ranked(i));
    viterbi_likelihood_.push_back(beam_.viterbi(i));
    times_.push_back(MaterializeTimes(beam_.viterbi_times(i)));
  }
  outputs_ = hypotheses_;  // CTC ids == output ids (no WFST relabeling)
}

void CtcPrefixBeamSearch::Search(
    const std::vector<std::vector<float>>& logp) {
  for (const auto& logp_t : logp) {
    ExpandFrame(logp_t);
    std::swap(beam_, next_);
    PruneAndPublish();
    ++frame_;
  }
}

void CtcPrefixBeamSearch::FinalizeSearch() {
  if (!context_graph_) return;
  // Return dangling partial-match boosts to the root (backoff refund).
  for (size_t i = 0; i < beam_.size(); ++i) {
    beam_.ctx_bonus[i] += context_graph_->FinalScore(beam_.ctx_state[i]);
    beam_.ctx_state[i] = 0;
  }
  PruneAndPublish();
}

std::vector<int> CtcPrefixBeamSearch::MaterializePrefix(
    int32_t node_id) const {
  std::vector<int> out;
  for (int32_t n = node_id; n > 0; n = trie_[n].parent)
    out.push_back(trie_[n].token);
  std::reverse(out.begin(), out.end());
  return out;
}

std::vector<int> CtcPrefixBeamSearch::MaterializeTimes(int32_t head) const {
  std::vector<int> out;
  for (int32_t h = head; h >= 0; h = tstamps_[h].prev)
    out.push_back(tstamps_[h].t);
  std::reverse(out.begin(), out.end());
  return out;
}

}  // namespace wenet_tpu
