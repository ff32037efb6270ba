#include "decoder/wfst_beam_search.h"

#include <algorithm>
#include <cmath>
#include <cstdio>
#include <cstring>
#include <fstream>
#include <set>

namespace wenet_tpu {

namespace {
constexpr uint32_t kMagic = 0x574C4732;  // "WLG2"
constexpr float kInf = std::numeric_limits<float>::infinity();

template <typename T>
bool ReadRaw(std::ifstream& in, T* out, size_t n = 1) {
  in.read(reinterpret_cast<char*>(out), sizeof(T) * n);
  return static_cast<bool>(in);
}
}  // namespace

bool LgFst::Read(const std::string& path) {
  std::ifstream in(path, std::ios::binary);
  if (!in) return false;
  uint32_t magic, num_units, num_words, num_nodes, num_l_arcs;
  if (!ReadRaw(in, &magic) || magic != kMagic) return false;
  ReadRaw(in, &num_units);
  ReadRaw(in, &num_words);
  ReadRaw(in, &num_nodes);
  ReadRaw(in, &num_l_arcs);
  num_units_ = static_cast<int>(num_units);
  l_offsets_.resize(num_nodes + 1);
  ReadRaw(in, l_offsets_.data(), num_nodes + 1);
  l_arcs_.resize(num_l_arcs);
  // Python writes (unit, word, next) as 3 x u32 — matches LArc layout.
  static_assert(sizeof(LArc) == 12, "LArc must be packed");
  ReadRaw(in, l_arcs_.data(), num_l_arcs);

  uint32_t num_g, num_g_arcs;
  ReadRaw(in, &num_g);
  ReadRaw(in, &g_start_);
  ReadRaw(in, &num_g_arcs);
  g_offsets_.resize(num_g + 1);
  ReadRaw(in, g_offsets_.data(), num_g + 1);
  static_assert(sizeof(GArc) == 12, "GArc must be packed");
  g_arcs_.resize(num_g_arcs);
  ReadRaw(in, g_arcs_.data(), num_g_arcs);
  g_backoff_state_.resize(num_g);
  g_backoff_cost_.resize(num_g);
  for (uint32_t i = 0; i < num_g; ++i) {
    ReadRaw(in, &g_backoff_state_[i]);
    ReadRaw(in, &g_backoff_cost_[i]);
  }
  g_final_.resize(num_g);
  ReadRaw(in, g_final_.data(), num_g);

  uint32_t blob_len = 0;
  ReadRaw(in, &blob_len);
  std::string blob(blob_len, '\0');
  in.read(&blob[0], blob_len);
  words_.clear();
  size_t pos = 0;
  while (pos <= blob.size() && blob_len > 0) {
    size_t nl = blob.find('\n', pos);
    if (nl == std::string::npos) {
      words_.push_back(blob.substr(pos));
      break;
    }
    words_.push_back(blob.substr(pos, nl - pos));
    pos = nl + 1;
  }
  return static_cast<bool>(in);
}

float LgFst::GAdvance(uint32_t state, uint32_t word, uint32_t* next) const {
  float cost = 0.0f;
  uint32_t s = state;
  while (true) {
    const GArc* begin = g_arcs_.data() + g_offsets_[s];
    const GArc* end = g_arcs_.data() + g_offsets_[s + 1];
    const GArc* it = std::lower_bound(
        begin, end, word,
        [](const GArc& a, uint32_t w) { return a.word < w; });
    if (it != end && it->word == word) {
      *next = it->next;
      return cost + it->cost;
    }
    uint32_t b = g_backoff_state_[s];
    if (b == s) {  // unigram state, word unknown
      *next = s;
      return kInf;
    }
    cost += g_backoff_cost_[s];
    s = b;
  }
}

WfstBeamSearch::WfstBeamSearch(std::shared_ptr<LgFst> fst,
                               const WfstBeamSearchOptions& opts)
    : fst_(std::move(fst)), opts_(opts) {
  Reset();
}

void WfstBeamSearch::Reset() {
  tokens_.clear();
  bp_arena_.clear();
  num_frames_ = 0;
  is_last_frame_blank_ = false;
  last_best_ = -1;
  last_skipped_frame_ = -1;
  tokens_[{0, fst_->g_start(), static_cast<uint32_t>(opts_.blank)}] =
      {0.0f, -1};
  inputs_.clear();
  outputs_.clear();
  likelihood_.clear();
  times_.clear();
}

void WfstBeamSearch::Search(const std::vector<std::vector<float>>& logp) {
  for (const auto& frame_logp : logp) {
    float blank_score = std::exp(frame_logp[opts_.blank]);
    if (blank_score > opts_.blank_skip_thresh) {
      // Skip confident-blank frames (reference ctc_wfst_beam_search.cc:83).
      is_last_frame_blank_ = true;
      last_frame_prob_ = frame_logp;
      last_skipped_frame_ = num_frames_;
      ++num_frames_;
      continue;
    }
    int cur_best = static_cast<int>(
        std::max_element(frame_logp.begin(), frame_logp.end()) -
        frame_logp.begin());
    if (cur_best != opts_.blank && is_last_frame_blank_ &&
        cur_best == last_best_) {
      // Re-insert one skipped blank between identical symbols
      // (reference :93-99).
      ProcessFrame(last_skipped_frame_, last_frame_prob_);
    }
    last_best_ = cur_best;
    is_last_frame_blank_ = false;
    ProcessFrame(num_frames_, frame_logp);
    ++num_frames_;
  }
  if (!logp.empty()) ComputeResults(false);
}

void WfstBeamSearch::ProcessFrame(int frame,
                                  const std::vector<float>& logp) {
  const float ascale = opts_.acoustic_scale;
  const uint32_t blank = static_cast<uint32_t>(opts_.blank);
  float best = kInf;
  for (const auto& kv : tokens_) best = std::min(best, kv.second.cost);
  const float cutoff = best + opts_.beam;

  std::unordered_map<TokenKey, Token, TokenKeyHash> next_tokens;
  next_tokens.reserve(tokens_.size() * 2);
  auto offer = [&](const TokenKey& key, float cost, int32_t bp) {
    auto it = next_tokens.find(key);
    if (it == next_tokens.end()) {
      next_tokens.emplace(key, Token{cost, bp});
    } else if (cost < it->second.cost) {
      it->second = {cost, bp};
    }
  };

  const float blank_ac = -ascale * logp[blank];
  for (const auto& kv : tokens_) {
    const TokenKey& key = kv.first;
    const Token& tok = kv.second;
    if (tok.cost > cutoff) continue;
    // 1. blank (stay).
    offer({key.l, key.g, blank}, tok.cost + blank_ac, tok.bp);
    // 2. repeat last emission (stay).
    if (key.last != blank) {
      offer(key, tok.cost - ascale * logp[key.last], tok.bp);
    }
    // 3. advance through trie arcs.
    for (const LgFst::LArc* a = fst_->l_arcs_begin(key.l);
         a != fst_->l_arcs_end(key.l); ++a) {
      if (a->unit == key.last) continue;  // needs a blank in between
      if (a->unit >= logp.size()) continue;
      float c = tok.cost - ascale * logp[a->unit];
      if (c > cutoff + opts_.beam) continue;
      uint32_t g = key.g;
      if (a->word != 0) {
        uint32_t g2;
        float lmc = fst_->GAdvance(key.g, a->word, &g2);
        if (std::isinf(lmc)) continue;
        c += opts_.lm_scale * lmc + opts_.word_penalty;
        g = g2;
      }
      bp_arena_.push_back(
          {a->unit, a->word, frame, tok.bp});
      offer({a->next, g, a->unit}, c,
            static_cast<int32_t>(bp_arena_.size() - 1));
    }
  }

  // Prune: beam + max_active.
  float nbest_cut = kInf;
  {
    float new_best = kInf;
    for (const auto& kv : next_tokens)
      new_best = std::min(new_best, kv.second.cost);
    nbest_cut = new_best + opts_.beam;
    if (static_cast<int>(next_tokens.size()) > opts_.max_active) {
      std::vector<float> costs;
      costs.reserve(next_tokens.size());
      for (const auto& kv : next_tokens) costs.push_back(kv.second.cost);
      std::nth_element(costs.begin(), costs.begin() + opts_.max_active,
                       costs.end());
      nbest_cut = std::min(nbest_cut, costs[opts_.max_active]);
    }
  }
  tokens_.clear();
  for (const auto& kv : next_tokens) {
    if (kv.second.cost <= nbest_cut) tokens_.emplace(kv.first, kv.second);
  }
}

void WfstBeamSearch::Backtrack(int32_t bp, std::vector<int>* units,
                               std::vector<int>* words,
                               std::vector<int>* unit_times,
                               std::vector<int>* word_times) const {
  std::vector<int32_t> chain;
  for (int32_t i = bp; i >= 0; i = bp_arena_[i].prev) chain.push_back(i);
  std::reverse(chain.begin(), chain.end());
  size_t start = 0;
  for (size_t j = 0; j < chain.size(); ++j) {
    const Backpointer& e = bp_arena_[chain[j]];
    units->push_back(static_cast<int>(e.unit));
    unit_times->push_back(e.frame);
    if (e.word != 0) {
      words->push_back(static_cast<int>(e.word));
      word_times->push_back(bp_arena_[chain[start]].frame);
      start = j + 1;
    }
  }
}

void WfstBeamSearch::ComputeResults(bool final) {
  inputs_.clear();
  outputs_.clear();
  likelihood_.clear();
  times_.clear();

  // (cost, bp) candidates; at final time prefer complete-word tokens with
  // LM sentence-end cost.
  std::vector<std::pair<float, int32_t>> cands;
  if (final) {
    for (const auto& kv : tokens_) {
      if (kv.first.l != 0) continue;  // word in progress
      cands.emplace_back(
          kv.second.cost + opts_.lm_scale * fst_->g_final(kv.first.g),
          kv.second.bp);
    }
  }
  if (cands.empty()) {
    for (const auto& kv : tokens_) {
      cands.emplace_back(kv.second.cost, kv.second.bp);
    }
  }
  std::sort(cands.begin(), cands.end());

  std::set<std::vector<int>> seen;
  for (const auto& [cost, bp] : cands) {
    std::vector<int> units, words, unit_times, word_times;
    Backtrack(bp, &units, &words, &unit_times, &word_times);
    if (!seen.insert(words).second) continue;
    inputs_.push_back(std::move(units));
    outputs_.push_back(std::move(words));
    // Word-level start frames, aligned with Outputs() so AsrDecoder's
    // word_pieces line up (unit-level times from Backtrack are available
    // if a caller needs reference-style unit timestamps).
    times_.push_back(std::move(word_times));
    likelihood_.push_back(-cost);
    if (static_cast<int>(outputs_.size()) >= opts_.nbest) break;
  }
}

void WfstBeamSearch::FinalizeSearch() { ComputeResults(true); }

}  // namespace wenet_tpu
