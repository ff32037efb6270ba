// Abstract streaming inference engine + chunk bookkeeping.
// Capability parity with reference runtime/core/decoder/asr_model.{h,cc}:24-137
// (num_frames_for_chunk, cached-feature carry, ForwardEncoder/
// AttentionRescoring contract). Concrete backends: SubprocessAsrModel
// (JAX/TPU worker over pipes — the TPU-native replacement for the
// TorchScript engine) and test mocks.
#ifndef WENET_TPU_DECODER_ASR_MODEL_H_
#define WENET_TPU_DECODER_ASR_MODEL_H_

#include <limits>
#include <memory>
#include <string>
#include <vector>

namespace wenet_tpu {

class AsrModel {
 public:
  virtual ~AsrModel() = default;

  int subsampling_rate() const { return subsampling_rate_; }
  int right_context() const { return right_context_; }
  int sos() const { return sos_; }
  int eos() const { return eos_; }
  int chunk_size() const { return chunk_size_; }
  void set_chunk_size(int chunk_size) { chunk_size_ = chunk_size; }
  void set_num_left_chunks(int n) { num_left_chunks_ = n; }

  // Frames of raw features needed for the next chunk (reference
  // asr_model.h:41): first chunk needs the full decoding window, later
  // chunks advance by the stride.
  int num_frames_for_chunk(bool start) const {
    if (chunk_size_ <= 0) return std::numeric_limits<int>::max() / 2;
    if (start) {
      return (chunk_size_ - 1) * subsampling_rate_ + right_context_ + 1;
    }
    return chunk_size_ * subsampling_rate_;
  }

  virtual void Reset() = 0;

  // Feed a feature chunk (stride frames advance; the implementation holds
  // the window overlap internally), returns subsampled CTC log-probs.
  virtual void ForwardEncoderChunk(
      const std::vector<std::vector<float>>& chunk_feats,
      std::vector<std::vector<float>>* ctc_log_probs) = 0;

  // Score n-best hypotheses with the attention decoder.
  virtual void AttentionRescoring(const std::vector<std::vector<int>>& hyps,
                                  float reverse_weight,
                                  std::vector<float>* rescoring_score) = 0;

  // Transducer streaming greedy over newly produced encoder frames
  // (fork capability, runtime rnnt_greedy_search.cc). Default: no tokens.
  virtual void RnntGreedyChunk(std::vector<int>* new_tokens) {
    new_tokens->clear();
  }

  // Utterance-final transducer prefix beam over all accumulated encoder
  // frames → n-best + scores (completes the capability the reference left
  // unfinished in rnnt_prefix_beam_search.cc). Default: empty.
  virtual void RnntBeamSearch(int beam,
                              std::vector<std::vector<int>>* hyps,
                              std::vector<float>* scores) {
    hyps->clear();
    scores->clear();
  }

 protected:
  int subsampling_rate_ = 4;
  int right_context_ = 6;
  int sos_ = 0;
  int eos_ = 0;
  int chunk_size_ = 16;
  int num_left_chunks_ = -1;
};

}  // namespace wenet_tpu

#endif  // WENET_TPU_DECODER_ASR_MODEL_H_
