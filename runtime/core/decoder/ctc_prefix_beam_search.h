// CTC prefix beam search over a persistent prefix-trie arena.
//
// Capability parity with reference
// runtime/core/decoder/ctc_prefix_beam_search.{h,cc} (blank/token split
// probability channels, viterbi timestamps, first/second beam pruning,
// context-graph boosting with final-backoff refund) — implemented with a
// different state representation:
//
//   * Prefixes are nodes in an append-only trie arena, so a hypothesis is
//     an int32 id instead of a std::vector<int> hash key; per-frame merges
//     dedup by node id.
//   * The beam is struct-of-arrays: parallel score/viterbi/context arrays
//     indexed by beam slot.
//   * Viterbi emission times are persistent singly-linked lists in a
//     second arena (O(1) extend/retime instead of O(U) vector copies).
#ifndef WENET_TPU_DECODER_CTC_PREFIX_BEAM_SEARCH_H_
#define WENET_TPU_DECODER_CTC_PREFIX_BEAM_SEARCH_H_

#include <cstdint>
#include <memory>
#include <unordered_map>
#include <vector>

#include "decoder/context_graph.h"
#include "decoder/search_interface.h"
#include "utils/utils.h"

namespace wenet_tpu {

struct CtcPrefixBeamSearchOptions {
  int blank = 0;
  int first_beam_size = 10;   // vocabulary pruning per frame
  int second_beam_size = 10;  // hypothesis beam
};

class CtcPrefixBeamSearch : public SearchInterface {
 public:
  explicit CtcPrefixBeamSearch(
      const CtcPrefixBeamSearchOptions& opts,
      const std::shared_ptr<ContextGraph>& context_graph = nullptr);

  void Search(const std::vector<std::vector<float>>& logp) override;
  void Reset() override;
  void FinalizeSearch() override;
  SearchType Type() const override { return SearchType::kPrefixBeamSearch; }

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
  int abs_time_step() const { return frame_; }

 private:
  // Beam state as parallel arrays; slot i describes one live prefix.
  struct Beam {
    std::vector<int32_t> node;      // prefix-trie node id
    std::vector<float> lp_b;        // log P(prefix, last frame blank)
    std::vector<float> lp_t;        // log P(prefix, last frame = last token)
    std::vector<float> vit_b;       // best single path ending blank
    std::vector<float> vit_t;       // best single path ending in token
    std::vector<int32_t> tl_b;      // time-list head of vit_b path (-1 none)
    std::vector<int32_t> tl_t;      // time-list head of vit_t path
    std::vector<float> last_lp;     // emission lp of final token on vit_t
    std::vector<int32_t> ctx_state;
    std::vector<float> ctx_bonus;

    size_t size() const { return node.size(); }
    void clear();
    // Appends a fresh slot with -inf scores for the given prefix node.
    int emplace(int32_t node_id, int32_t ctx_state_id, float ctx_bonus_v);
    float total(int i) const { return LogAdd(lp_b[i], lp_t[i]); }
    float ranked(int i) const { return total(i) + ctx_bonus[i]; }
    float viterbi(int i) const {
      return vit_b[i] > vit_t[i] ? vit_b[i] : vit_t[i];
    }
    int32_t viterbi_times(int i) const {
      return vit_b[i] > vit_t[i] ? tl_b[i] : tl_t[i];
    }
  };

  int32_t Child(int32_t parent, int32_t token);      // find-or-create
  int32_t PushTime(int32_t prev_head, int32_t t);    // append emission time
  int32_t RetimeLast(int32_t head, int32_t t);       // replace last emission
  int StaySlot(int src);                             // candidate: same prefix
  int ExtendSlot(int src, int32_t token);            // candidate: prefix+tok
  void ExpandFrame(const std::vector<float>& logp_t);
  void PruneAndPublish();
  std::vector<int> MaterializePrefix(int32_t node_id) const;
  std::vector<int> MaterializeTimes(int32_t head) const;

  CtcPrefixBeamSearchOptions opts_;
  std::shared_ptr<ContextGraph> context_graph_;
  int frame_ = 0;

  struct TrieNode {
    int32_t token;
    int32_t parent;
  };
  std::vector<TrieNode> trie_;
  std::unordered_map<uint64_t, int32_t> children_;

  struct TimeLink {
    int32_t t;
    int32_t prev;
  };
  std::vector<TimeLink> tstamps_;

  Beam beam_;
  Beam next_;
  std::unordered_map<int32_t, int> slot_of_;  // node id -> next_ slot

  // Published n-best (refreshed after every frame).
  std::vector<std::vector<int>> hypotheses_;
  std::vector<std::vector<int>> outputs_;
  std::vector<float> likelihood_;
  std::vector<float> viterbi_likelihood_;
  std::vector<std::vector<int>> times_;
};

}  // namespace wenet_tpu

#endif  // WENET_TPU_DECODER_CTC_PREFIX_BEAM_SEARCH_H_
