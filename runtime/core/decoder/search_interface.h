// N-best search contract (capability parity with reference
// runtime/core/decoder/search_interface.h:34-56, incl. the fork's
// transducer variants).
#ifndef WENET_TPU_DECODER_SEARCH_INTERFACE_H_
#define WENET_TPU_DECODER_SEARCH_INTERFACE_H_

#include <vector>

namespace wenet_tpu {

enum class SearchType {
  kPrefixBeamSearch = 0,
  kWfstBeamSearch = 1,
  kRnntGreedySearch = 2,
  kRnntPrefixBeamSearch = 3,
};

class SearchInterface {
 public:
  virtual ~SearchInterface() {}
  // Frame-synchronous update with a chunk of CTC log-probs [T][V].
  virtual void Search(const std::vector<std::vector<float>>& logp) = 0;
  // Transducer path: append externally produced tokens (fork
  // rnnt_greedy_search.cc:69).
  virtual void Search(const std::vector<int>& hyp) {}
  virtual void Reset() = 0;
  virtual void FinalizeSearch() = 0;
  virtual SearchType Type() const = 0;

  virtual const std::vector<std::vector<int>>& Inputs() const = 0;
  virtual const std::vector<std::vector<int>>& Outputs() const = 0;
  virtual const std::vector<float>& Likelihood() const = 0;
  virtual const std::vector<std::vector<int>>& Times() const = 0;
};

}  // namespace wenet_tpu

#endif  // WENET_TPU_DECODER_SEARCH_INTERFACE_H_
