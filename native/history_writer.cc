// Asynchronous record writer: a lock-guarded ring of fixed-size buffers
// drained by a background thread, so the Python simulation loop hands off
// device snapshots without blocking on disk.
//
// The reference holds its entire history in RAM and writes nothing
// (raytracer.py:124-136); at 1e6 rays a dense history is ~50 MB/frame, so
// long runs must stream.  This is the framework's native IO runtime,
// exposed to Python through ctypes (no pybind11 in the image).
//
// File format ("MSGW" v1): 16-byte header (magic, version, record_bytes),
// then records back to back.  Readers: msgwam_tpu/utils/history_io.py.

#include <condition_variable>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <deque>
#include <mutex>
#include <string>
#include <thread>
#include <vector>

namespace {

struct Writer {
  std::FILE* file = nullptr;
  uint64_t record_bytes = 0;
  uint64_t max_queue = 0;
  uint64_t records_written = 0;
  bool error = false;
  bool closing = false;

  std::deque<std::vector<uint8_t>> queue;
  std::mutex mu;
  std::condition_variable cv_push;   // signalled when queue shrinks
  std::condition_variable cv_drain;  // signalled when queue grows/closes
  std::thread thread;

  void run() {
    for (;;) {
      std::vector<uint8_t> rec;
      {
        std::unique_lock<std::mutex> lock(mu);
        cv_drain.wait(lock, [&] { return closing || !queue.empty(); });
        if (queue.empty()) {
          if (closing) return;
          continue;
        }
        rec = std::move(queue.front());
        queue.pop_front();
      }
      cv_push.notify_all();
      if (!error &&
          std::fwrite(rec.data(), 1, rec.size(), file) != rec.size()) {
        std::lock_guard<std::mutex> lock(mu);
        error = true;
      } else {
        std::lock_guard<std::mutex> lock(mu);
        ++records_written;
      }
    }
  }
};

constexpr char kMagic[4] = {'M', 'S', 'G', 'W'};
constexpr uint32_t kVersion = 1;

}  // namespace

extern "C" {

// Returns an opaque handle, or null on failure.
void* msgwam_writer_open(const char* path, uint64_t record_bytes,
                         uint64_t max_queue) {
  std::FILE* f = std::fopen(path, "wb");
  if (!f) return nullptr;
  uint32_t version = kVersion;
  uint64_t rb = record_bytes;
  if (std::fwrite(kMagic, 1, 4, f) != 4 ||
      std::fwrite(&version, sizeof(version), 1, f) != 1 ||
      std::fwrite(&rb, sizeof(rb), 1, f) != 1) {
    std::fclose(f);
    return nullptr;
  }
  auto* w = new Writer();
  w->file = f;
  w->record_bytes = record_bytes;
  w->max_queue = max_queue ? max_queue : 8;
  w->thread = std::thread([w] { w->run(); });
  return w;
}

// Copies the record and enqueues it; blocks only if the queue is full
// (backpressure).  Returns 0 on success, -1 on size mismatch or IO error.
int msgwam_writer_push(void* handle, const void* data, uint64_t nbytes) {
  auto* w = static_cast<Writer*>(handle);
  if (!w || nbytes != w->record_bytes) return -1;
  std::vector<uint8_t> rec(nbytes);
  std::memcpy(rec.data(), data, nbytes);
  {
    std::unique_lock<std::mutex> lock(w->mu);
    w->cv_push.wait(lock, [&] {
      return w->error || w->queue.size() < w->max_queue;
    });
    if (w->error) return -1;
    w->queue.push_back(std::move(rec));
  }
  w->cv_drain.notify_one();
  return 0;
}

// Number of records the queue is still holding (for monitoring).
uint64_t msgwam_writer_pending(void* handle) {
  auto* w = static_cast<Writer*>(handle);
  std::lock_guard<std::mutex> lock(w->mu);
  return w->queue.size();
}

// Drains, flushes, closes.  Returns records written, or -1 on IO error.
int64_t msgwam_writer_close(void* handle) {
  auto* w = static_cast<Writer*>(handle);
  if (!w) return -1;
  {
    std::lock_guard<std::mutex> lock(w->mu);
    w->closing = true;
  }
  w->cv_drain.notify_all();
  w->thread.join();
  std::fflush(w->file);
  std::fclose(w->file);
  int64_t out = w->error ? -1 : static_cast<int64_t>(w->records_written);
  delete w;
  return out;
}

}  // extern "C"
