// Hotword context graph: trie with per-token boost and fallback penalty.
// Capability parity with reference runtime/core/decoder/context_graph.{h,cc}
// (per-phrase chain with cumulative score and escape arcs back to start,
// :60-109) — built natively as a scored trie instead of an OpenFST
// determinization, which removes the openfst dependency while keeping the
// same decode-time semantics: +context_score per matched token, full refund
// when a partial match dies, boundary flags for word-level post-processing.
#ifndef WENET_TPU_DECODER_CONTEXT_GRAPH_H_
#define WENET_TPU_DECODER_CONTEXT_GRAPH_H_

#include <string>
#include <unordered_map>
#include <vector>

namespace wenet_tpu {

struct ContextConfig {
  int max_contexts = 5000;
  int max_context_length = 100;
  float context_score = 3.0f;
};

class ContextGraph {
 public:
  explicit ContextGraph(ContextConfig config = ContextConfig())
      : config_(config) {
    nodes_.push_back(Node{});  // root = 0
  }

  void Build(const std::vector<std::vector<int>>& token_ids) {
    int n = 0;
    for (const auto& ids : token_ids) {
      if (ids.empty() ||
          static_cast<int>(ids.size()) > config_.max_context_length)
        continue;
      if (++n > config_.max_contexts) break;
      int cur = 0;
      for (size_t i = 0; i < ids.size(); ++i) {
        auto it = nodes_[cur].children.find(ids[i]);
        if (it == nodes_[cur].children.end()) {
          nodes_.push_back(Node{});
          nodes_.back().depth = nodes_[cur].depth + 1;
          int idx = static_cast<int>(nodes_.size()) - 1;
          nodes_[cur].children[ids[i]] = idx;
          cur = idx;
        } else {
          cur = it->second;
        }
      }
      nodes_[cur].is_end = true;
    }
  }

  // Advance from state with word_id. Returns next state; *score is the
  // incremental context score of this transition; boundary flags mirror the
  // reference's start/end-boundary outputs (context_graph.cc:87-109).
  int GetNextState(int state, int word_id, float* score,
                   bool* is_start_boundary, bool* is_end_boundary) const {
    *score = 0.0f;
    *is_start_boundary = false;
    *is_end_boundary = false;
    const Node& node = nodes_[state];
    auto it = node.children.find(word_id);
    if (it != node.children.end()) {
      int next = it->second;
      *score += config_.context_score;
      if (state == 0) *is_start_boundary = true;
      if (nodes_[next].is_end) {
        *is_end_boundary = true;
        // A completed phrase that cannot be extended returns to root.
        if (nodes_[next].children.empty()) return 0;
      }
      return next;
    }
    // Fallback: refund the partial-match boost, then retry from root.
    *score -= config_.context_score * node.depth;
    auto root_it = nodes_[0].children.find(word_id);
    if (root_it != nodes_[0].children.end()) {
      *score += config_.context_score;
      *is_start_boundary = true;
      int next = root_it->second;
      if (nodes_[next].is_end) {
        *is_end_boundary = true;
        if (nodes_[next].children.empty()) return 0;
      }
      return next;
    }
    return 0;
  }

  // Score refunded if decoding ends inside a partial match
  // (reference UpdateFinalContext, ctc_prefix_beam_search.cc:215-234).
  float FinalScore(int state) const {
    return -config_.context_score * nodes_[state].depth;
  }

  int num_nodes() const { return static_cast<int>(nodes_.size()); }

 private:
  struct Node {
    std::unordered_map<int, int> children;
    int depth = 0;
    bool is_end = false;
  };
  ContextConfig config_;
  std::vector<Node> nodes_;
};

}  // namespace wenet_tpu

#endif  // WENET_TPU_DECODER_CONTEXT_GRAPH_H_
