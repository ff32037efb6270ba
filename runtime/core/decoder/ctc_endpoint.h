// CTC-based endpointing: 3 rules over trailing-blank duration.
// Capability parity with reference runtime/core/decoder/ctc_endpoint.{h,cc}
// (rule structs :23-55, IsEndpoint :50-78).
#ifndef WENET_TPU_DECODER_CTC_ENDPOINT_H_
#define WENET_TPU_DECODER_CTC_ENDPOINT_H_

#include <cmath>
#include <string>
#include <vector>

namespace wenet_tpu {

struct CtcEndpointRule {
  bool must_decoded_something;
  int min_trailing_silence;   // ms
  int min_utterance_length;   // ms

  CtcEndpointRule(bool must = true, int trailing = 1000, int utterance = 0)
      : must_decoded_something(must), min_trailing_silence(trailing),
        min_utterance_length(utterance) {}
};

struct CtcEndpointConfig {
  int blank = 0;
  float blank_threshold = 0.8f;  // prob; frame is "blank" above this
  // Rule1: no speech decoded yet, 5s of silence.
  CtcEndpointRule rule1{false, 5000, 0};
  // Rule2: something decoded, 1s trailing silence.
  CtcEndpointRule rule2{true, 1000, 0};
  // Rule3: utterance hit 20s regardless.
  CtcEndpointRule rule3{false, 0, 20000};
};

class CtcEndpoint {
 public:
  explicit CtcEndpoint(const CtcEndpointConfig& config = CtcEndpointConfig())
      : config_(config) {
    Reset();
  }

  void Reset() {
    num_frames_decoded_ = 0;
    num_frames_trailing_blank_ = 0;
  }

  void frame_shift_in_ms(int ms) { frame_shift_in_ms_ = ms; }

  // ctc_log_probs: chunk [T][V]; decoded_something: any non-blank output
  // so far. Returns true when an endpoint is detected.
  bool IsEndpoint(const std::vector<std::vector<float>>& ctc_log_probs,
                  bool decoded_something) {
    for (const auto& logp_t : ctc_log_probs) {
      float blank_prob = std::exp(logp_t[config_.blank]);
      ++num_frames_decoded_;
      if (blank_prob > config_.blank_threshold) {
        ++num_frames_trailing_blank_;
      } else {
        num_frames_trailing_blank_ = 0;
      }
    }
    int utterance_ms = num_frames_decoded_ * frame_shift_in_ms_;
    int trailing_ms = num_frames_trailing_blank_ * frame_shift_in_ms_;
    return RuleActivated(config_.rule1, decoded_something, trailing_ms,
                         utterance_ms) ||
           RuleActivated(config_.rule2, decoded_something, trailing_ms,
                         utterance_ms) ||
           RuleActivated(config_.rule3, decoded_something, trailing_ms,
                         utterance_ms);
  }

 private:
  static bool RuleActivated(const CtcEndpointRule& rule,
                            bool decoded_something, int trailing_ms,
                            int utterance_ms) {
    bool ok = (!rule.must_decoded_something || decoded_something) &&
              trailing_ms >= rule.min_trailing_silence &&
              utterance_ms >= rule.min_utterance_length;
    return ok && (rule.min_trailing_silence > 0 ||
                  rule.min_utterance_length > 0);
  }

  CtcEndpointConfig config_;
  int frame_shift_in_ms_ = 40;  // subsampled frame duration
  int num_frames_decoded_ = 0;
  int num_frames_trailing_blank_ = 0;
};

}  // namespace wenet_tpu

#endif  // WENET_TPU_DECODER_CTC_ENDPOINT_H_
