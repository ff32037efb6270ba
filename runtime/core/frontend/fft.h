// Iterative radix-2 FFT with precomputed bit-reversal and twiddle tables.
// Capability parity with reference runtime/core/frontend/fft.{h,cc}:72.
#ifndef WENET_TPU_FRONTEND_FFT_H_
#define WENET_TPU_FRONTEND_FFT_H_

#include <cmath>
#include <cstddef>
#include <vector>

namespace wenet_tpu {

// In-place complex FFT over (real, imag) arrays of power-of-two length n.
class Fft {
 public:
  explicit Fft(int n) : n_(n) {
    // n must be a power of two.
    bitrev_.resize(n);
    int bits = 0;
    while ((1 << bits) < n) ++bits;
    for (int i = 0; i < n; ++i) {
      int r = 0;
      for (int b = 0; b < bits; ++b)
        if (i & (1 << b)) r |= 1 << (bits - 1 - b);
      bitrev_[i] = r;
    }
    cos_.resize(n / 2);
    sin_.resize(n / 2);
    for (int i = 0; i < n / 2; ++i) {
      cos_[i] = std::cos(-2.0 * M_PI * i / n);
      sin_[i] = std::sin(-2.0 * M_PI * i / n);
    }
  }

  void Transform(float* real, float* imag) const {
    const int n = n_;
    for (int i = 0; i < n; ++i) {
      int j = bitrev_[i];
      if (j > i) {
        std::swap(real[i], real[j]);
        std::swap(imag[i], imag[j]);
      }
    }
    for (int len = 2; len <= n; len <<= 1) {
      int half = len >> 1;
      int step = n / len;
      for (int i = 0; i < n; i += len) {
        for (int k = 0; k < half; ++k) {
          float wr = static_cast<float>(cos_[k * step]);
          float wi = static_cast<float>(sin_[k * step]);
          int a = i + k, b = i + k + half;
          float tr = real[b] * wr - imag[b] * wi;
          float ti = real[b] * wi + imag[b] * wr;
          real[b] = real[a] - tr;
          imag[b] = imag[a] - ti;
          real[a] += tr;
          imag[a] += ti;
        }
      }
    }
  }

  int size() const { return n_; }

 private:
  int n_;
  std::vector<int> bitrev_;
  std::vector<double> cos_, sin_;
};

}  // namespace wenet_tpu

#endif  // WENET_TPU_FRONTEND_FFT_H_
