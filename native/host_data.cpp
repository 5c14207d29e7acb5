// Host-side data engine for libcontinual_tpu.
//
// The reference feeds the GPU through single-threaded Python DataLoader
// workers (reference core/data/dataset.py). Our device-resident pipeline
// only needs the host for bulk uint8 array work: assembling epoch/task
// arrays (exemplar-buffer concat, per-class subsampling) and gathering
// shuffled sample rows into contiguous transfer buffers. numpy does these
// single-threaded; this engine does them with a small thread pool and
// wide memcpy, exposed through a C ABI consumed via ctypes
// (no pybind11 in the image).
//
// Build: make -C native   (produces libhostdata.so)

#include <algorithm>
#include <atomic>
#include <cstdint>
#include <cstring>
#include <thread>
#include <vector>

namespace {

// Run fn(i) for i in [0, n) over a pool sized to hardware concurrency.
// ``total_bytes`` is the work size: thread creation costs ~50-100 us each,
// so small jobs (a 128-row transfer batch is ~400 KB) run serially — below
// the cutoff a single memcpy loop beats spawning a fleet of threads.
template <typename F>
void parallel_for(int64_t n, int64_t total_bytes, F fn) {
  constexpr int64_t kBytesPerThread = 4ll << 20;  // 4 MB of memcpy per thread
  unsigned hw = std::thread::hardware_concurrency();
  int64_t by_work = total_bytes > 0 ? total_bytes / kBytesPerThread : 0;
  int64_t n_threads = std::max<int64_t>(
      1, std::min<int64_t>(std::min<int64_t>(hw, n), by_work));
  if (n_threads == 1) {
    for (int64_t i = 0; i < n; ++i) fn(i);
    return;
  }
  // chunked dispatch: one atomic per CHUNK (not per row) — each row is a
  // single memcpy, so per-row fetch_add contention would dominate
  const int64_t chunk = std::max<int64_t>(1, n / (n_threads * 8));
  std::atomic<int64_t> next(0);
  std::vector<std::thread> pool;
  pool.reserve(n_threads);
  for (int64_t t = 0; t < n_threads; ++t) {
    pool.emplace_back([&]() {
      while (true) {
        int64_t start = next.fetch_add(chunk);
        if (start >= n) return;
        const int64_t end = std::min(n, start + chunk);
        for (int64_t i = start; i < end; ++i) fn(i);
      }
    });
  }
  for (auto& th : pool) th.join();
}

}  // namespace

extern "C" {

// Gather rows: out[i] = src[indices[i]] for row_bytes-sized rows.
void lct_gather_u8(const uint8_t* src, const int64_t* indices, uint8_t* out,
                   int64_t n_rows, int64_t row_bytes) {
  parallel_for(n_rows, n_rows * row_bytes, [&](int64_t i) {
    std::memcpy(out + i * row_bytes, src + indices[i] * row_bytes, row_bytes);
  });
}

// Concatenate two row blocks into out (buffer-into-task-data concat).
void lct_concat_u8(const uint8_t* a, int64_t n_a, const uint8_t* b,
                   int64_t n_b, uint8_t* out, int64_t row_bytes) {
  parallel_for(n_a + n_b, (n_a + n_b) * row_bytes, [&](int64_t i) {
    const uint8_t* srcp =
        (i < n_a) ? a + i * row_bytes : b + (i - n_a) * row_bytes;
    std::memcpy(out + i * row_bytes, srcp, row_bytes);
  });
}

// Fisher-Yates shuffle of an index array with the xorshift64* generator
// (deterministic given seed).
void lct_shuffled_indices(int64_t* out, int64_t n, uint64_t seed) {
  for (int64_t i = 0; i < n; ++i) out[i] = i;
  // splitmix64 the seed first: raw xorshift states for adjacent seeds
  // (epoch_seed = seed + epoch) produce correlated early outputs
  uint64_t s = seed + 0x9E3779B97F4A7C15ull;
  s = (s ^ (s >> 30)) * 0xBF58476D1CE4E5B9ull;
  s = (s ^ (s >> 27)) * 0x94D049BB133111EBull;
  s ^= s >> 31;
  if (!s) s = 0x9E3779B97F4A7C15ull;
  for (int64_t i = n - 1; i > 0; --i) {
    s ^= s >> 12;
    s ^= s << 25;
    s ^= s >> 27;
    uint64_t r = s * 0x2545F4914F6CDD1Dull;
    int64_t j = static_cast<int64_t>(r % static_cast<uint64_t>(i + 1));
    std::swap(out[i], out[j]);
  }
}

}  // extern "C"
