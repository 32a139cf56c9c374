// Native host-side batch pipeline for aecf_tpu.
//
// Role: the framework's data-loader runtime — the TPU-native replacement for
// the torch DataLoader machinery the reference leans on
// (xrays/train_xrays_example.py:239-250).  Worker threads shuffle an epoch's
// indices and gather feature rows into a ring of contiguous batch buffers
// while the TPU consumes previous batches, so host gather time hides behind
// device step time.
//
// C ABI only (consumed via ctypes from aecf_tpu/data/loader.py); no Python.h
// dependency.  Build: g++ -O3 -march=native -shared -fPIC -pthread.

#include <atomic>
#include <condition_variable>
#include <cstdint>
#include <cstring>
#include <mutex>
#include <queue>
#include <random>
#include <thread>
#include <vector>

namespace {

struct Batch {
  std::vector<float> image;
  std::vector<float> text;
  std::vector<float> label;
  int64_t rows = 0;   // actual rows in this batch (tail batch may be short)
  int64_t epoch = 0;  // epoch this batch belongs to
};

struct Batcher {
  // Source arrays (borrowed; caller keeps them alive).
  const float* image;
  const float* text;
  const float* label;
  int64_t n;
  int64_t img_d, txt_d, lab_d;
  int64_t batch;
  bool drop_last;
  uint64_t seed;
  bool shuffle;

  // Ring of prefetched batches.
  size_t capacity;
  std::queue<Batch*> ready;
  std::queue<Batch*> free_list;
  std::vector<Batch*> all;

  std::mutex mu;
  std::condition_variable cv_ready;
  std::condition_variable cv_free;
  std::atomic<bool> stop{false};
  bool done = false;  // end-of-stream reached (guarded by mu); terminal
  std::thread worker;

  // Batch currently held by the consumer.
  Batch* held = nullptr;

  ~Batcher() {
    {
      std::lock_guard<std::mutex> lk(mu);
      stop = true;
    }
    cv_free.notify_all();
    cv_ready.notify_all();
    if (worker.joinable()) worker.join();
    for (Batch* b : all) delete b;
  }
};

void produce_epoch(Batcher* B, int64_t epoch) {
  std::vector<int64_t> idx(B->n);
  for (int64_t i = 0; i < B->n; ++i) idx[i] = i;
  if (B->shuffle) {
    std::mt19937_64 rng(B->seed + static_cast<uint64_t>(epoch) * 0x9e3779b97f4a7c15ULL);
    for (int64_t i = B->n - 1; i > 0; --i) {
      std::uniform_int_distribution<int64_t> dist(0, i);
      std::swap(idx[i], idx[dist(rng)]);
    }
  }

  for (int64_t start = 0; start < B->n; start += B->batch) {
    int64_t rows = std::min(B->batch, B->n - start);
    if (B->drop_last && rows < B->batch) break;

    Batch* out = nullptr;
    {
      std::unique_lock<std::mutex> lk(B->mu);
      B->cv_free.wait(lk, [&] { return B->stop || !B->free_list.empty(); });
      if (B->stop) return;
      out = B->free_list.front();
      B->free_list.pop();
    }

    out->rows = rows;
    out->epoch = epoch;
    float* img = out->image.data();
    float* txt = out->text.data();
    float* lab = out->label.data();
    for (int64_t r = 0; r < rows; ++r) {
      const int64_t src = idx[start + r];
      std::memcpy(img + r * B->img_d, B->image + src * B->img_d,
                  sizeof(float) * B->img_d);
      std::memcpy(txt + r * B->txt_d, B->text + src * B->txt_d,
                  sizeof(float) * B->txt_d);
      std::memcpy(lab + r * B->lab_d, B->label + src * B->lab_d,
                  sizeof(float) * B->lab_d);
    }

    {
      std::lock_guard<std::mutex> lk(B->mu);
      B->ready.push(out);
    }
    B->cv_ready.notify_one();
  }
}

void worker_loop(Batcher* B, int64_t epochs) {
  for (int64_t e = 0; e < epochs && !B->stop; ++e) produce_epoch(B, e);
  {
    std::lock_guard<std::mutex> lk(B->mu);
    B->ready.push(nullptr);  // end-of-stream sentinel
  }
  B->cv_ready.notify_one();
}

}  // namespace

extern "C" {

// Creates the pipeline and starts prefetching `epochs` epochs of batches.
void* aecf_batcher_create(const float* image, const float* text,
                          const float* label, int64_t n, int64_t img_d,
                          int64_t txt_d, int64_t lab_d, int64_t batch,
                          int64_t epochs, int32_t n_prefetch, uint64_t seed,
                          int32_t shuffle, int32_t drop_last) {
  if (n <= 0 || batch <= 0 || n_prefetch <= 0) return nullptr;
  auto* B = new Batcher();
  B->image = image;
  B->text = text;
  B->label = label;
  B->n = n;
  B->img_d = img_d;
  B->txt_d = txt_d;
  B->lab_d = lab_d;
  B->batch = batch;
  B->drop_last = drop_last != 0;
  B->seed = seed;
  B->shuffle = shuffle != 0;
  B->capacity = static_cast<size_t>(n_prefetch);
  for (size_t i = 0; i < B->capacity; ++i) {
    auto* b = new Batch();
    b->image.resize(static_cast<size_t>(batch) * img_d);
    b->text.resize(static_cast<size_t>(batch) * txt_d);
    b->label.resize(static_cast<size_t>(batch) * lab_d);
    B->all.push_back(b);
    B->free_list.push(b);
  }
  B->worker = std::thread(worker_loop, B, epochs);
  return B;
}

// Blocks for the next batch.  Returns the row count (0 = end of stream) and
// fills the pointers with views into an internal buffer that stays valid
// until the next acquire (the previously held batch is recycled).
int64_t aecf_batcher_acquire(void* handle, const float** image,
                             const float** text, const float** label,
                             int64_t* epoch) {
  auto* B = static_cast<Batcher*>(handle);
  if (B->held != nullptr) {
    {
      std::lock_guard<std::mutex> lk(B->mu);
      B->free_list.push(B->held);
    }
    B->cv_free.notify_one();
    B->held = nullptr;
  }
  Batch* b;
  {
    std::unique_lock<std::mutex> lk(B->mu);
    B->cv_ready.wait(lk,
                     [&] { return B->stop || B->done || !B->ready.empty(); });
    if (B->stop) return 0;
    if (B->done && B->ready.empty()) return 0;  // terminal: repeat acquires
    b = B->ready.front();                       // after EOS return 0 forever
    B->ready.pop();
    if (b == nullptr) {
      // end-of-stream sentinel: latch `done` so a retrying consumer does
      // not block on an empty queue with the worker already exited
      B->done = true;
      return 0;
    }
  }
  B->held = b;
  *image = b->image.data();
  *text = b->text.data();
  *label = b->label.data();
  if (epoch) *epoch = b->epoch;
  return b->rows;
}

void aecf_batcher_destroy(void* handle) {
  delete static_cast<Batcher*>(handle);
}

}  // extern "C"
