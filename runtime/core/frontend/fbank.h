// Kaldi-compatible log-mel filterbank.
// Capability parity with reference runtime/core/frontend/fbank.h:31-218,
// numerically matched to the training-side JAX/numpy implementation
// (wenet_celoss_tpu/ops/fbank.py): snip_edges framing, optional dither,
// DC removal, 0.97 preemphasis, povey window, pow2 rFFT, power spectrum,
// triangular mel bins (low 20Hz, high nyquist), natural log with tiny floor.
#ifndef WENET_TPU_FRONTEND_FBANK_H_
#define WENET_TPU_FRONTEND_FBANK_H_

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <limits>
#include <random>
#include <vector>

#include "frontend/fft.h"

namespace wenet_tpu {

class Fbank {
 public:
  Fbank(int num_bins, int sample_rate, int frame_length, int frame_shift,
        float dither = 0.0f)
      : num_bins_(num_bins), sample_rate_(sample_rate),
        frame_length_(frame_length), frame_shift_(frame_shift),
        dither_(dither), fft_size_(NextPow2(frame_length)),
        fft_(NextPow2(frame_length)), generator_(0),
        distribution_(0.0f, 1.0f) {
    MakeWindow();
    MakeMelBanks();
  }

  static int NextPow2(int n) {
    int p = 1;
    while (p < n) p <<= 1;
    return p;
  }

  int NumFrames(int num_samples) const {
    if (num_samples < frame_length_) return 0;
    return 1 + (num_samples - frame_length_) / frame_shift_;
  }

  // wave: float samples in int16 range. feat: [num_frames * num_bins].
  int Compute(const std::vector<float>& wave,
              std::vector<std::vector<float>>* feat) {
    int num_frames = NumFrames(static_cast<int>(wave.size()));
    feat->resize(num_frames);
    std::vector<float> re(fft_size_), im(fft_size_);
    std::vector<float> frame(frame_length_);
    for (int f = 0; f < num_frames; ++f) {
      const float* start = wave.data() + f * frame_shift_;
      std::copy(start, start + frame_length_, frame.begin());
      if (dither_ > 0.0f) {
        for (auto& s : frame) s += dither_ * distribution_(generator_);
      }
      // DC removal.
      float mean = 0.0f;
      for (float s : frame) mean += s;
      mean /= frame_length_;
      for (auto& s : frame) s -= mean;
      // Preemphasis 0.97.
      for (int i = frame_length_ - 1; i > 0; --i)
        frame[i] -= 0.97f * frame[i - 1];
      frame[0] -= 0.97f * frame[0];
      // Window + zero pad.
      std::fill(re.begin(), re.end(), 0.0f);
      std::fill(im.begin(), im.end(), 0.0f);
      for (int i = 0; i < frame_length_; ++i) re[i] = frame[i] * window_[i];
      fft_.Transform(re.data(), im.data());
      // Power spectrum (first fft/2+1 bins).
      int half = fft_size_ / 2 + 1;
      std::vector<float> power(half);
      for (int i = 0; i < half; ++i)
        power[i] = re[i] * re[i] + im[i] * im[i];
      // Mel projection + log.
      auto& row = (*feat)[f];
      row.resize(num_bins_);
      for (int m = 0; m < num_bins_; ++m) {
        float e = 0.0f;
        for (int i = bank_start_[m]; i < bank_end_[m]; ++i)
          e += banks_[m][i - bank_start_[m]] * power[i];
        row[m] = std::log(std::max(
            e, std::numeric_limits<float>::min()));
      }
    }
    return num_frames;
  }

  int num_bins() const { return num_bins_; }

 private:
  void MakeWindow() {
    window_.resize(frame_length_);
    double a = 2.0 * M_PI / (frame_length_ - 1);
    for (int i = 0; i < frame_length_; ++i)
      window_[i] = static_cast<float>(
          std::pow(0.5 - 0.5 * std::cos(a * i), 0.85));  // povey
  }

  static double Mel(double f) { return 1127.0 * std::log(1.0 + f / 700.0); }

  void MakeMelBanks() {
    int half = fft_size_ / 2 + 1;
    double low = 20.0, high = 0.5 * sample_rate_;
    double mel_low = Mel(low), mel_high = Mel(high);
    double delta = (mel_high - mel_low) / (num_bins_ + 1);
    banks_.resize(num_bins_);
    bank_start_.resize(num_bins_);
    bank_end_.resize(num_bins_);
    for (int m = 0; m < num_bins_; ++m) {
      double left = mel_low + m * delta;
      double center = mel_low + (m + 1) * delta;
      double right = mel_low + (m + 2) * delta;
      int first = -1, last = -1;
      std::vector<float> weights;
      for (int i = 0; i < half; ++i) {
        double freq = static_cast<double>(i) * sample_rate_ / fft_size_;
        double mel = Mel(freq);
        double up = (mel - left) / (center - left);
        double down = (right - mel) / (right - center);
        double w = std::max(0.0, std::min(up, down));
        if (w > 0.0) {
          if (first < 0) first = i;
          last = i;
        }
      }
      if (first < 0) first = last = 0;
      bank_start_[m] = first;
      bank_end_[m] = last + 1;
      banks_[m].resize(last + 1 - first);
      for (int i = first; i <= last; ++i) {
        double freq = static_cast<double>(i) * sample_rate_ / fft_size_;
        double mel = Mel(freq);
        double up = (mel - left) / (center - left);
        double down = (right - mel) / (right - center);
        banks_[m][i - first] =
            static_cast<float>(std::max(0.0, std::min(up, down)));
      }
    }
  }

  int num_bins_, sample_rate_, frame_length_, frame_shift_;
  float dither_;
  int fft_size_;
  Fft fft_;
  std::vector<float> window_;
  std::vector<std::vector<float>> banks_;
  std::vector<int> bank_start_, bank_end_;
  std::default_random_engine generator_;
  std::normal_distribution<float> distribution_;
};

}  // namespace wenet_tpu

#endif  // WENET_TPU_FRONTEND_FBANK_H_
