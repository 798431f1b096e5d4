// Minimal thread_pool 4.0.0 API shim (rvaser/thread_pool) for building the
// reference vechat_racon binary offline for differential testing. API used by
// the reference: ThreadPool(n), Submit(f, args...) -> std::future,
// thread_map() -> map<thread::id, uint32_t>  (src/polisher.cpp:183,376,501).
#pragma once

#include <atomic>
#include <condition_variable>
#include <cstdint>
#include <functional>
#include <future>
#include <memory>
#include <mutex>
#include <queue>
#include <thread>
#include <unordered_map>
#include <vector>

namespace thread_pool {

class ThreadPool {
 public:
  explicit ThreadPool(std::size_t num_threads = std::thread::hardware_concurrency()) {
    if (num_threads == 0) num_threads = 1;
    threads_.reserve(num_threads);
    for (std::size_t i = 0; i < num_threads; ++i) {
      threads_.emplace_back([this] { Worker(); });
      thread_map_.emplace(threads_.back().get_id(), static_cast<std::uint32_t>(i));
    }
  }

  ThreadPool(const ThreadPool&) = delete;
  ThreadPool& operator=(const ThreadPool&) = delete;

  ~ThreadPool() {
    {
      std::unique_lock<std::mutex> lk(mutex_);
      done_ = true;
    }
    cv_.notify_all();
    for (auto& t : threads_) t.join();
  }

  std::size_t num_threads() const { return threads_.size(); }

  const std::unordered_map<std::thread::id, std::uint32_t>& thread_map() const {
    return thread_map_;
  }

  template <typename F, typename... Args>
  auto Submit(F&& f, Args&&... args)
      -> std::future<typename std::result_of<F(Args...)>::type> {
    using R = typename std::result_of<F(Args...)>::type;
    auto task = std::make_shared<std::packaged_task<R()>>(
        std::bind(std::forward<F>(f), std::forward<Args>(args)...));
    std::future<R> fut = task->get_future();
    {
      std::unique_lock<std::mutex> lk(mutex_);
      queue_.emplace([task] { (*task)(); });
    }
    cv_.notify_one();
    return fut;
  }

 private:
  void Worker() {
    for (;;) {
      std::function<void()> job;
      {
        std::unique_lock<std::mutex> lk(mutex_);
        cv_.wait(lk, [this] { return done_ || !queue_.empty(); });
        if (done_ && queue_.empty()) return;
        job = std::move(queue_.front());
        queue_.pop();
      }
      job();
    }
  }

  std::vector<std::thread> threads_;
  std::unordered_map<std::thread::id, std::uint32_t> thread_map_;
  std::queue<std::function<void()>> queue_;
  std::mutex mutex_;
  std::condition_variable cv_;
  bool done_ = false;
};

}  // namespace thread_pool
