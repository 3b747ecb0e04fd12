// Threaded .npy batch loader (native side of the input pipeline).
//
// Role: the reference feeds the GPU through 16-32 DataLoader worker
// *processes* (models/darts_searchable.py:39-41). At the TPU step rate this
// framework reaches (~6.5k samples/s on one v5e chip for MM-IMDB search),
// per-sample Python npy reads become the bottleneck. This library reads a
// batch of .npy files into a caller-provided contiguous buffer with a C++
// thread pool - no Python allocator traffic, no GIL, one memcpy per file.
//
// Scope: little-endian '<f4' (float32) C-order arrays, npy format v1.0/2.0
// (the only format the MM-IMDB prepare tool emits). The Python wrapper
// validates shapes and falls back to numpy for anything else.
//
// Build: cc -O3 -shared -fPIC -pthread npy_loader.cpp -o libnpy_loader.so
// (driven by bmnas_tpu/native/build.py; loaded via ctypes).

#include <atomic>
#include <condition_variable>
#include <cstdint>
#include <locale.h>
#include <clocale>
#include <limits>
#include <cmath>
#include <cstdlib>
#include <fstream>
#include <cstdio>
#include <cstring>
#include <functional>
#include <mutex>
#include <queue>
#include <string>
#include <thread>
#include <vector>

namespace {

// Minimal npy header parse: returns payload offset and byte size, or -1.
// Header: \x93NUMPY <maj> <min> <hlen u16/u32> <dict>.
long long parse_npy_header(FILE* f, long long file_size) {
  unsigned char magic[8];
  if (fread(magic, 1, 8, f) != 8) return -1;
  if (memcmp(magic, "\x93NUMPY", 6) != 0) return -1;
  int major = magic[6];
  unsigned int hlen = 0;
  if (major == 1) {
    unsigned char b[2];
    if (fread(b, 1, 2, f) != 2) return -1;
    hlen = b[0] | (b[1] << 8);
    return 10 + (long long)hlen;
  } else if (major == 2) {
    unsigned char b[4];
    if (fread(b, 1, 4, f) != 4) return -1;
    hlen = b[0] | (b[1] << 8) | (b[2] << 16) | ((unsigned)b[3] << 24);
    return 12 + (long long)hlen;
  }
  return -1;
}

struct ThreadPool {
  explicit ThreadPool(int n) : stop_(false) {
    for (int i = 0; i < n; ++i) {
      workers_.emplace_back([this] {
        for (;;) {
          std::function<void()> task;
          {
            std::unique_lock<std::mutex> lk(mu_);
            cv_.wait(lk, [this] { return stop_ || !tasks_.empty(); });
            if (stop_ && tasks_.empty()) return;
            task = std::move(tasks_.front());
            tasks_.pop();
          }
          task();
        }
      });
    }
  }
  ~ThreadPool() {
    {
      std::lock_guard<std::mutex> lk(mu_);
      stop_ = true;
    }
    cv_.notify_all();
    for (auto& w : workers_) w.join();
  }
  void submit(std::function<void()> task) {
    {
      std::lock_guard<std::mutex> lk(mu_);
      tasks_.push(std::move(task));
    }
    cv_.notify_one();
  }

  std::vector<std::thread> workers_;
  std::queue<std::function<void()>> tasks_;
  std::mutex mu_;
  std::condition_variable cv_;
  bool stop_;
};

ThreadPool* g_pool = nullptr;
int g_pool_size = 0;
std::mutex g_pool_mu;

ThreadPool* pool(int nthreads) {
  std::lock_guard<std::mutex> lk(g_pool_mu);
  if (g_pool == nullptr || g_pool_size != nthreads) {
    delete g_pool;
    g_pool = new ThreadPool(nthreads);
    g_pool_size = nthreads;
  }
  return g_pool;
}

// Read one npy payload into dst (expects exactly `bytes` of payload).
// Returns 0 on success.
int read_one(const char* path, float* dst, long long bytes) {
  FILE* f = fopen(path, "rb");
  if (!f) return 1;
  fseek(f, 0, SEEK_END);
  long long fsize = ftell(f);
  fseek(f, 0, SEEK_SET);
  long long off = parse_npy_header(f, fsize);
  if (off < 0 || fsize - off < bytes) {
    fclose(f);
    return 2;
  }
  fseek(f, (long)off, SEEK_SET);
  size_t got = fread(dst, 1, (size_t)bytes, f);
  fclose(f);
  return got == (size_t)bytes ? 0 : 3;
}

}  // namespace

extern "C" {

// Load n files of uniform element count `elems` (float32) into `out`
// (n * elems floats, row i at out + i*elems). paths: array of C strings.
// Returns the number of failed reads (0 == all good).
int npy_load_batch(const char** paths, int n, long long elems, float* out,
                   int nthreads) {
  std::atomic<int> failures(0);
  std::atomic<int> done(0);
  std::mutex mu;
  std::condition_variable cv;
  ThreadPool* p = pool(nthreads);
  for (int i = 0; i < n; ++i) {
    p->submit([&, i] {
      if (read_one(paths[i], out + (long long)i * elems,
                   elems * (long long)sizeof(float)) != 0) {
        failures.fetch_add(1);
      }
      if (done.fetch_add(1) + 1 == n) {
        std::lock_guard<std::mutex> lk(mu);
        cv.notify_one();
      }
    });
  }
  std::unique_lock<std::mutex> lk(mu);
  cv.wait(lk, [&] { return done.load() == n; });
  return failures.load();
}

// Variable-size variant: per-file element counts and output offsets.
int npy_load_batch_var(const char** paths, int n, const long long* elems,
                       const long long* offsets, float* out, int nthreads) {
  std::atomic<int> failures(0);
  std::atomic<int> done(0);
  std::mutex mu;
  std::condition_variable cv;
  ThreadPool* p = pool(nthreads);
  for (int i = 0; i < n; ++i) {
    p->submit([&, i] {
      if (read_one(paths[i], out + offsets[i],
                   elems[i] * (long long)sizeof(float)) != 0) {
        failures.fetch_add(1);
      }
      if (done.fetch_add(1) + 1 == n) {
        std::lock_guard<std::mutex> lk(mu);
        cv.notify_one();
      }
    });
  }
  std::unique_lock<std::mutex> lk(mu);
  cv.wait(lk, [&] { return done.load() == n; });
  return failures.load();
}

}  // extern "C"

// ---------------------------------------------------------------------------
// NTU skeleton text parser (rebuild of datasets/ntu.py:38-78 semantics; see
// bmnas_tpu/data/ntu.py get_3d_skeleton). The Python parser costs ~13 ms per
// file and holds the GIL, so the dataset thread pool cannot hide it; this
// parser is called per file through ctypes (GIL released) and walks the file
// with strtol/strtof.
//
// File layout: line0 = num_frames; per frame: person_count, then per person
// a body-info line, a joint-count line, and 25 joint lines whose first 3
// floats are x y z. Persons beyond the first 2 are consumed but ignored.
// Output: caller-zeroed (3, max_T, 25, 2) float32, C order. NaN/inf are
// normalized like np.nan_to_num. Returns the file's frame count (store is
// clipped to max_T), or a negative errno-style code on malformed input.

static inline void skip_line(const char*& s, const char* end) {
  while (s < end && *s != '\n') ++s;
  if (s < end) ++s;
}

// strtof is locale-dependent (LC_NUMERIC comma-decimal locales would parse
// "0.5" as 0); pin the C locale like Python's float().
static locale_t c_locale() {
  static locale_t loc = newlocale(LC_ALL_MASK, "C", (locale_t)0);
  return loc;
}

extern "C" {

int ske_parse(const char* path, float* out, int max_T) {
  std::ifstream f(path, std::ios::binary | std::ios::ate);
  if (!f) return -1;
  std::streamsize size = f.tellg();
  f.seekg(0);
  std::string buf(static_cast<size_t>(size), '\0');
  if (!f.read(&buf[0], size)) return -2;
  const char* s = buf.c_str();
  const char* end = s + buf.size();

  char* next = nullptr;
  long T = std::strtol(s, &next, 10);
  if (next == s || T < 0) return -3;
  s = next;
  skip_line(s, end);

  const long long jointsM = 25LL * 2;          // stride of one t in (.., T, 25, 2)
  for (long t = 0; t < T; ++t) {
    long npers = std::strtol(s, &next, 10);
    if (next == s) return -4;
    s = next;
    skip_line(s, end);
    for (long p = 0; p < npers; ++p) {
      skip_line(s, end);                        // body-info line
      skip_line(s, end);                        // joint-count line
      for (int j = 0; j < 25; ++j) {
        // values must come from THIS line: a short/malformed joint line must
        // fail (negative code -> Python-oracle fallback), not silently pull
        // numbers from the next line (strtof skips newlines).
        const char* line_end =
            (const char*)memchr(s, '\n', (size_t)(end - s));
        if (line_end == nullptr) line_end = end;
        float v[3];
        for (int c = 0; c < 3; ++c) {
          v[c] = strtof_l(s, &next, c_locale());
          if (next == s || next > line_end) return -5;
          s = next;
          if (!std::isfinite(v[c])) {
            v[c] = std::isnan(v[c]) ? 0.0f
                 : (v[c] > 0 ? std::numeric_limits<float>::max()
                             : -std::numeric_limits<float>::max());
          }
        }
        skip_line(s, end);                      // rest of the joint line
        if (p < 2 && t < max_T) {
          long long base = (long long)t * jointsM + (long long)j * 2 + p;
          long long plane = (long long)max_T * jointsM;
          out[0 * plane + base] = v[0];
          out[1 * plane + base] = v[1];
          out[2 * plane + base] = v[2];
        }
      }
    }
  }
  return (int)T;
}

}  // extern "C"
