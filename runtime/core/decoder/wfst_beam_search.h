// WFST (LG) beam search: token-passing Viterbi over an on-the-fly
// composition of a lexicon trie and an n-gram backoff automaton, with CTC
// blank/repeat semantics tracked per token.
//
// Capability parity with reference
// runtime/core/decoder/ctc_wfst_beam_search.{h,cc} (TLG decode via kaldi
// LatticeFasterOnlineDecoder incl. blank-frame skipping w/ re-insertion
// :76-106 and decoded_frames_mapping_) — redesigned: no openfst/kaldi, the
// graph is |L|+|G| (failure-arc LM backoff applied exactly), and the CTC
// topology lives in the token key instead of a composed T graph.
// Graph file written by tools/fst/build_lg.py (format: wenet_celoss_tpu/
// lm/fst.py).
#ifndef WENET_TPU_DECODER_WFST_BEAM_SEARCH_H_
#define WENET_TPU_DECODER_WFST_BEAM_SEARCH_H_

#include <cstdint>
#include <limits>
#include <memory>
#include <string>
#include <unordered_map>
#include <vector>

#include "decoder/search_interface.h"
#include "utils/utils.h"

namespace wenet_tpu {

// Loaded LG graph (shared, immutable after Read).
class LgFst {
 public:
  struct LArc {
    uint32_t unit;
    uint32_t word;  // 0 = epsilon (interior arc)
    uint32_t next;
  };
  struct GArc {
    uint32_t word;
    uint32_t next;
    float cost;
  };

  bool Read(const std::string& path);

  int num_units() const { return num_units_; }
  const std::vector<std::string>& words() const { return words_; }
  uint32_t g_start() const { return g_start_; }

  const LArc* l_arcs_begin(uint32_t node) const {
    return l_arcs_.data() + l_offsets_[node];
  }
  const LArc* l_arcs_end(uint32_t node) const {
    return l_arcs_.data() + l_offsets_[node + 1];
  }
  float g_final(uint32_t state) const { return g_final_[state]; }

  // Failure-semantics LM advance; returns accumulated cost (inf if the
  // word is unknown at the unigram level) and writes the next state.
  float GAdvance(uint32_t state, uint32_t word, uint32_t* next) const;

 private:
  int num_units_ = 0;
  std::vector<uint32_t> l_offsets_;
  std::vector<LArc> l_arcs_;
  uint32_t g_start_ = 0;
  std::vector<uint32_t> g_offsets_;
  std::vector<GArc> g_arcs_;  // sorted by word within a state
  std::vector<uint32_t> g_backoff_state_;
  std::vector<float> g_backoff_cost_;
  std::vector<float> g_final_;
  std::vector<std::string> words_;
};

struct WfstBeamSearchOptions {
  int blank = 0;
  float beam = 16.0f;
  int max_active = 7000;
  float acoustic_scale = 1.0f;
  float lm_scale = 1.0f;
  int nbest = 10;
  float blank_skip_thresh = 0.98f;
  float word_penalty = 0.0f;
};

class WfstBeamSearch : public SearchInterface {
 public:
  WfstBeamSearch(std::shared_ptr<LgFst> fst,
                 const WfstBeamSearchOptions& opts);

  void Search(const std::vector<std::vector<float>>& logp) override;
  void Reset() override;
  void FinalizeSearch() override;
  SearchType Type() const override { return SearchType::kWfstBeamSearch; }

  const std::vector<std::vector<int>>& Inputs() const override {
    return inputs_;
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

 private:
  struct TokenKey {
    uint32_t l, g, last;
    bool operator==(const TokenKey& o) const {
      return l == o.l && g == o.g && last == o.last;
    }
  };
  struct TokenKeyHash {
    size_t operator()(const TokenKey& k) const {
      size_t h = k.l;
      h = h * 1000003u + k.g;
      h = h * 1000003u + k.last;
      return h;
    }
  };
  struct Token {
    float cost;
    int32_t bp;
  };
  struct Backpointer {
    uint32_t unit;
    uint32_t word;  // 0 = none
    int32_t frame;
    int32_t prev;
  };

  void ProcessFrame(int frame, const std::vector<float>& logp);
  // Fill outputs/inputs/likelihood/times from current tokens.
  void ComputeResults(bool final);
  void Backtrack(int32_t bp, std::vector<int>* units,
                 std::vector<int>* words, std::vector<int>* unit_times,
                 std::vector<int>* word_times) const;

  std::shared_ptr<LgFst> fst_;
  WfstBeamSearchOptions opts_;

  std::unordered_map<TokenKey, Token, TokenKeyHash> tokens_;
  std::vector<Backpointer> bp_arena_;
  int num_frames_ = 0;
  bool is_last_frame_blank_ = false;
  int last_best_ = -1;
  std::vector<float> last_frame_prob_;
  int last_skipped_frame_ = -1;

  std::vector<std::vector<int>> inputs_;
  std::vector<std::vector<int>> outputs_;
  std::vector<float> likelihood_;
  std::vector<std::vector<int>> times_;
};

}  // namespace wenet_tpu

#endif  // WENET_TPU_DECODER_WFST_BEAM_SEARCH_H_
