// Thread-safe streaming feature pipeline: audio producer → fbank → frame
// consumer. Capability parity with reference
// runtime/core/frontend/feature_pipeline.{h,cc}:59 (AcceptWaveform /
// Read(num_frames) blocking contract, residual-sample carry, input-finished
// handshake).
#ifndef WENET_TPU_FRONTEND_FEATURE_PIPELINE_H_
#define WENET_TPU_FRONTEND_FEATURE_PIPELINE_H_

#include <condition_variable>
#include <mutex>
#include <queue>
#include <string>
#include <vector>

#include "frontend/fbank.h"

namespace wenet_tpu {

struct FeaturePipelineConfig {
  int num_bins = 80;
  int sample_rate = 16000;
  int frame_length = 400;  // samples (25ms @ 16k)
  int frame_shift = 160;   // samples (10ms @ 16k)

  FeaturePipelineConfig() = default;
  FeaturePipelineConfig(int num_bins_in, int sample_rate_in)
      : num_bins(num_bins_in), sample_rate(sample_rate_in),
        frame_length(sample_rate_in / 1000 * 25),
        frame_shift(sample_rate_in / 1000 * 10) {}
};

class FeaturePipeline {
 public:
  explicit FeaturePipeline(const FeaturePipelineConfig& config)
      : config_(config),
        fbank_(config.num_bins, config.sample_rate,
               config.frame_length, config.frame_shift),
        input_finished_(false), num_frames_(0) {}

  // Producer side.
  void AcceptWaveform(const std::vector<float>& wav) {
    std::vector<std::vector<float>> feats;
    std::vector<float> buf(remained_wav_);
    buf.insert(buf.end(), wav.begin(), wav.end());
    int consumed_frames = fbank_.Compute(buf, &feats);
    int consumed = consumed_frames * config_.frame_shift;
    remained_wav_.assign(buf.begin() + consumed, buf.end());
    {
      std::lock_guard<std::mutex> lock(mutex_);
      for (auto& f : feats) {
        queue_.push(std::move(f));
        ++num_frames_;
      }
    }
    cv_.notify_one();
  }

  void set_input_finished() {
    {
      std::lock_guard<std::mutex> lock(mutex_);
      input_finished_ = true;
    }
    cv_.notify_all();
  }

  bool input_finished() const { return input_finished_; }

  // Consumer side: blocks until a frame or input end. Returns false at end.
  bool ReadOne(std::vector<float>* feat) {
    std::unique_lock<std::mutex> lock(mutex_);
    cv_.wait(lock, [this] { return !queue_.empty() || input_finished_; });
    if (queue_.empty()) return false;
    *feat = std::move(queue_.front());
    queue_.pop();
    return true;
  }

  // Read up to num_frames; returns false when the stream has ended (the
  // returned vector may still hold a final partial batch).
  bool Read(int num_frames, std::vector<std::vector<float>>* feats) {
    feats->clear();
    for (int i = 0; i < num_frames; ++i) {
      std::vector<float> f;
      if (!ReadOne(&f)) return false;
      feats->push_back(std::move(f));
    }
    return true;
  }

  int num_frames() const { return num_frames_; }
  int feature_dim() const { return config_.num_bins; }
  const FeaturePipelineConfig& config() const { return config_; }

  void Reset() {
    std::lock_guard<std::mutex> lock(mutex_);
    input_finished_ = false;
    num_frames_ = 0;
    remained_wav_.clear();
    while (!queue_.empty()) queue_.pop();
  }

 private:
  FeaturePipelineConfig config_;
  Fbank fbank_;
  std::vector<float> remained_wav_;
  std::queue<std::vector<float>> queue_;
  mutable std::mutex mutex_;
  std::condition_variable cv_;
  bool input_finished_;
  int num_frames_;
};

}  // namespace wenet_tpu

#endif  // WENET_TPU_FRONTEND_FEATURE_PIPELINE_H_
