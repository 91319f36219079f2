// Native CT-slice loader: threaded .npy reader + prefetch pool.
//
// TPU-native replacement for the runtime role torch's C++ DataLoader workers
// play in the reference (4 worker processes feeding the trainer,
// reference src/DADiff.py:1582-1588).  A fixed thread pool decodes .npy
// slices (int16/float32/float64 -> float32) straight into caller-provided
// buffers; an async prefetch queue lets the Python loader overlap disk IO
// and HU windowing with TPU steps without multiprocessing overhead.
//
// C ABI (consumed via ctypes from founddiff_tpu/data/native.py):
//   fl_read_npy(path, out, cap, shape4)       synchronous single-file decode
//   fl_pool_create(threads) / fl_pool_destroy
//   fl_pool_submit(pool, path) -> ticket      async decode into pool slot
//   fl_pool_wait(pool, ticket, out, cap, shape4)

#include <atomic>
#include <condition_variable>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <deque>
#include <functional>
#include <memory>
#include <mutex>
#include <string>
#include <thread>
#include <unordered_map>
#include <vector>

namespace {

struct NpyArray {
  std::vector<float> data;
  int64_t shape[4] = {0, 0, 0, 0};
  int ndim = 0;
  bool ok = false;
};

// Minimal .npy (v1/v2) parser for C-contiguous little-endian arrays.
NpyArray read_npy(const std::string& path) {
  NpyArray out;
  FILE* f = std::fopen(path.c_str(), "rb");
  if (!f) return out;

  unsigned char magic[8];
  if (std::fread(magic, 1, 8, f) != 8 || std::memcmp(magic, "\x93NUMPY", 6)) {
    std::fclose(f);
    return out;
  }
  int major = magic[6];
  uint32_t header_len = 0;
  if (major == 1) {
    unsigned char b[2];
    if (std::fread(b, 1, 2, f) != 2) { std::fclose(f); return out; }
    header_len = b[0] | (b[1] << 8);
  } else {
    unsigned char b[4];
    if (std::fread(b, 1, 4, f) != 4) { std::fclose(f); return out; }
    header_len = b[0] | (b[1] << 8) | (b[2] << 16) | (b[3] << 24);
  }
  std::string header(header_len, '\0');
  if (std::fread(header.data(), 1, header_len, f) != header_len) {
    std::fclose(f);
    return out;
  }

  // dtype
  auto dpos = header.find("'descr':");
  if (dpos == std::string::npos) { std::fclose(f); return out; }
  auto q1 = header.find('\'', dpos + 8);
  auto q2 = header.find('\'', q1 + 1);
  std::string descr = header.substr(q1 + 1, q2 - q1 - 1);

  // fortran_order must be False
  if (header.find("'fortran_order': True") != std::string::npos) {
    std::fclose(f);
    return out;
  }

  // shape tuple
  auto spos = header.find("'shape':");
  auto p1 = header.find('(', spos);
  auto p2 = header.find(')', p1);
  std::string shape_str = header.substr(p1 + 1, p2 - p1 - 1);
  int64_t total = 1;
  {
    const char* s = shape_str.c_str();
    char* end = nullptr;
    while (*s && out.ndim < 4) {
      long long v = std::strtoll(s, &end, 10);
      if (end == s) break;
      out.shape[out.ndim++] = v;
      total *= v;
      s = end;
      while (*s == ',' || *s == ' ') ++s;
    }
  }
  if (out.ndim == 0) {  // scalar
    out.ndim = 1;
    out.shape[0] = 1;
  }

  out.data.resize(total);
  bool ok = false;
  if (descr == "<f4" || descr == "|f4") {
    ok = std::fread(out.data.data(), 4, total, f) == (size_t)total;
  } else if (descr == "<f8") {
    std::vector<double> tmp(total);
    ok = std::fread(tmp.data(), 8, total, f) == (size_t)total;
    for (int64_t i = 0; i < total; ++i) out.data[i] = (float)tmp[i];
  } else if (descr == "<i2") {
    std::vector<int16_t> tmp(total);
    ok = std::fread(tmp.data(), 2, total, f) == (size_t)total;
    for (int64_t i = 0; i < total; ++i) out.data[i] = (float)tmp[i];
  } else if (descr == "<u2") {
    std::vector<uint16_t> tmp(total);
    ok = std::fread(tmp.data(), 2, total, f) == (size_t)total;
    for (int64_t i = 0; i < total; ++i) out.data[i] = (float)tmp[i];
  } else if (descr == "<i4") {
    std::vector<int32_t> tmp(total);
    ok = std::fread(tmp.data(), 4, total, f) == (size_t)total;
    for (int64_t i = 0; i < total; ++i) out.data[i] = (float)tmp[i];
  } else if (descr == "<i8") {
    std::vector<int64_t> tmp(total);
    ok = std::fread(tmp.data(), 8, total, f) == (size_t)total;
    for (int64_t i = 0; i < total; ++i) out.data[i] = (float)tmp[i];
  }
  std::fclose(f);
  out.ok = ok;
  return out;
}

struct Pool {
  explicit Pool(int nthreads) : stop(false), next_ticket(0) {
    for (int i = 0; i < nthreads; ++i) {
      workers.emplace_back([this] { this->run(); });
    }
  }
  ~Pool() {
    {
      std::lock_guard<std::mutex> lk(mu);
      stop = true;
    }
    cv.notify_all();
    for (auto& t : workers) t.join();
  }

  int submit(const std::string& path) {
    std::lock_guard<std::mutex> lk(mu);
    int ticket = next_ticket++;
    queue.emplace_back(ticket, path);
    cv.notify_one();
    return ticket;
  }

  NpyArray wait(int ticket) {
    std::unique_lock<std::mutex> lk(mu);
    done_cv.wait(lk, [&] { return done.count(ticket) > 0; });
    NpyArray arr = std::move(done[ticket]);
    done.erase(ticket);
    return arr;
  }

 private:
  void run() {
    for (;;) {
      std::pair<int, std::string> job;
      {
        std::unique_lock<std::mutex> lk(mu);
        cv.wait(lk, [&] { return stop || !queue.empty(); });
        if (stop && queue.empty()) return;
        job = std::move(queue.front());
        queue.pop_front();
      }
      NpyArray arr = read_npy(job.second);
      {
        std::lock_guard<std::mutex> lk(mu);
        done[job.first] = std::move(arr);
      }
      done_cv.notify_all();
    }
  }

  std::vector<std::thread> workers;
  std::deque<std::pair<int, std::string>> queue;
  std::unordered_map<int, NpyArray> done;
  std::mutex mu;
  std::condition_variable cv, done_cv;
  bool stop;
  int next_ticket;
};

int copy_out(const NpyArray& arr, float* out, int64_t cap, int64_t* shape4) {
  if (!arr.ok) return -1;
  int64_t total = (int64_t)arr.data.size();
  if (total > cap) return -2;
  std::memcpy(out, arr.data.data(), total * sizeof(float));
  for (int i = 0; i < 4; ++i) shape4[i] = (i < arr.ndim) ? arr.shape[i] : 0;
  return (int)arr.ndim;
}

}  // namespace

extern "C" {

int fl_read_npy(const char* path, float* out, int64_t cap, int64_t* shape4) {
  return copy_out(read_npy(path), out, cap, shape4);
}

void* fl_pool_create(int nthreads) { return new Pool(nthreads); }

void fl_pool_destroy(void* pool) { delete static_cast<Pool*>(pool); }

int fl_pool_submit(void* pool, const char* path) {
  return static_cast<Pool*>(pool)->submit(path);
}

int fl_pool_wait(void* pool, int ticket, float* out, int64_t cap,
                 int64_t* shape4) {
  return copy_out(static_cast<Pool*>(pool)->wait(ticket), out, cap, shape4);
}

}  // extern "C"
