// Bounded MPMC blocking queue.
// Capability parity with reference runtime/core/utils/blocking_queue.h:30
// (producer/consumer contract used by the streaming feature pipeline).
#ifndef WENET_TPU_UTILS_BLOCKING_QUEUE_H_
#define WENET_TPU_UTILS_BLOCKING_QUEUE_H_

#include <condition_variable>
#include <cstddef>
#include <limits>
#include <mutex>
#include <queue>
#include <utility>
#include <vector>

namespace wenet_tpu {

template <typename T>
class BlockingQueue {
 public:
  explicit BlockingQueue(size_t capacity = std::numeric_limits<int>::max())
      : capacity_(capacity) {}

  BlockingQueue(const BlockingQueue&) = delete;
  BlockingQueue& operator=(const BlockingQueue&) = delete;

  void Push(const T& value) {
    std::unique_lock<std::mutex> lock(mutex_);
    not_full_.wait(lock, [this] { return queue_.size() < capacity_; });
    queue_.push(value);
    not_empty_.notify_one();
  }

  void Push(T&& value) {
    std::unique_lock<std::mutex> lock(mutex_);
    not_full_.wait(lock, [this] { return queue_.size() < capacity_; });
    queue_.push(std::move(value));
    not_empty_.notify_one();
  }

  T Pop() {
    std::unique_lock<std::mutex> lock(mutex_);
    not_empty_.wait(lock, [this] { return !queue_.empty(); });
    T value = std::move(queue_.front());
    queue_.pop();
    not_full_.notify_one();
    return value;
  }

  bool Empty() const {
    std::lock_guard<std::mutex> lock(mutex_);
    return queue_.empty();
  }

  size_t Size() const {
    std::lock_guard<std::mutex> lock(mutex_);
    return queue_.size();
  }

  void Clear() {
    std::lock_guard<std::mutex> lock(mutex_);
    while (!queue_.empty()) queue_.pop();
    not_full_.notify_all();
  }

 private:
  size_t capacity_;
  mutable std::mutex mutex_;
  std::condition_variable not_full_;
  std::condition_variable not_empty_;
  std::queue<T> queue_;
};

}  // namespace wenet_tpu

#endif  // WENET_TPU_UTILS_BLOCKING_QUEUE_H_
