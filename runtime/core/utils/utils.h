// Misc numeric helpers: TopK, LogAdd, Timer.
// Capability parity with reference runtime/core/utils/{utils.h:36, timer.h:22}.
#ifndef WENET_TPU_UTILS_UTILS_H_
#define WENET_TPU_UTILS_UTILS_H_

#include <algorithm>
#include <chrono>
#include <cmath>
#include <cstddef>
#include <limits>
#include <numeric>
#include <vector>

namespace wenet_tpu {

constexpr float kLogZero = -1e10f;

// log(exp(a) + exp(b)) stable.
inline float LogAdd(float a, float b) {
  if (a < b) std::swap(a, b);
  if (b <= kLogZero) return a;
  return a + std::log1p(std::exp(b - a));
}

// Indices + values of the k largest elements, descending.
template <typename T>
void TopK(const std::vector<T>& data, int k, std::vector<T>* values,
          std::vector<int>* indices) {
  int n = static_cast<int>(data.size());
  k = std::min(k, n);
  std::vector<int> idx(n);
  std::iota(idx.begin(), idx.end(), 0);
  std::partial_sort(idx.begin(), idx.begin() + k, idx.end(),
                    [&](int a, int b) { return data[a] > data[b]; });
  values->resize(k);
  indices->resize(k);
  for (int i = 0; i < k; ++i) {
    (*indices)[i] = idx[i];
    (*values)[i] = data[idx[i]];
  }
}

class Timer {
 public:
  Timer() : start_(std::chrono::steady_clock::now()) {}
  void Reset() { start_ = std::chrono::steady_clock::now(); }
  // Elapsed milliseconds.
  int Elapsed() const {
    auto now = std::chrono::steady_clock::now();
    return static_cast<int>(
        std::chrono::duration_cast<std::chrono::milliseconds>(now - start_)
            .count());
  }

 private:
  std::chrono::steady_clock::time_point start_;
};

}  // namespace wenet_tpu

#endif  // WENET_TPU_UTILS_UTILS_H_
