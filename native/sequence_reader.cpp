// Native sequence reader: background-threaded scan prefetcher.
//
// The reference's offline pipeline streams a rosbag through a bounded queue
// with backpressure (RosbagRangeDataProcessorRos.cpp:52-125 +
// CircularBuffer.hpp in /root/reference).  This is the equivalent native
// runtime component here: a producer thread decodes binary PCD scans from a
// directory into a bounded ring buffer while the Python/JAX pipeline
// consumes, overlapping disk IO + decode with device compute.
//
// C ABI (ctypes): seq_open / seq_next / seq_free_scan / seq_close.

#include <algorithm>
#include <atomic>
#include <condition_variable>
#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <deque>
#include <mutex>
#include <string>
#include <thread>
#include <vector>

#include <dirent.h>

extern "C" int64_t pcd_read(const char* path, float** out_xyz,
                            float** out_normals, float** out_rgb);
extern "C" void pcd_free(float* p);

namespace {

struct Scan {
  float* xyz = nullptr;
  int64_t n = 0;
  double timestamp = 0.0;
};

struct Reader {
  std::vector<std::string> files;
  std::deque<Scan> queue;
  std::mutex mu;
  std::condition_variable cv_producer, cv_consumer;
  size_t capacity = 4;
  size_t next_file = 0;
  std::atomic<bool> done{false};
  std::atomic<bool> stop{false};
  std::thread worker;
};

void produce(Reader* r) {
  for (size_t i = 0; i < r->files.size() && !r->stop; ++i) {
    float *xyz, *nrm, *rgb;
    int64_t n = pcd_read(r->files[i].c_str(), &xyz, &nrm, &rgb);
    if (nrm) pcd_free(nrm);
    if (rgb) pcd_free(rgb);
    Scan s;
    s.xyz = xyz;
    s.n = n > 0 ? n : 0;
    s.timestamp = (double)i * 0.1;  // filenames carry order; dt from config
    {
      std::unique_lock<std::mutex> lk(r->mu);
      r->cv_producer.wait(
          lk, [r] { return r->queue.size() < r->capacity || r->stop; });
      if (r->stop) {
        if (s.xyz) pcd_free(s.xyz);
        break;
      }
      r->queue.push_back(s);
    }
    r->cv_consumer.notify_one();
  }
  r->done = true;
  r->cv_consumer.notify_all();
}

}  // namespace

extern "C" {

// Opens a directory of .pcd scans (sorted by name); prefetch ring of
// `capacity` decoded scans. Returns a handle or nullptr.
void* seq_open(const char* folder, int capacity) {
  DIR* d = opendir(folder);
  if (!d) return nullptr;
  auto* r = new Reader();
  r->capacity = capacity > 0 ? (size_t)capacity : 4;
  struct dirent* e;
  while ((e = readdir(d)) != nullptr) {
    std::string name = e->d_name;
    if (name.size() > 4 && name.substr(name.size() - 4) == ".pcd") {
      r->files.push_back(std::string(folder) + "/" + name);
    }
  }
  closedir(d);
  std::sort(r->files.begin(), r->files.end());
  r->worker = std::thread(produce, r);
  return r;
}

int64_t seq_num_scans(void* handle) {
  return (int64_t) static_cast<Reader*>(handle)->files.size();
}

// Pops the next decoded scan; blocks until available. Returns point count,
// 0 at end of sequence, -1 on error. Caller frees *out_xyz via seq_free_scan.
int64_t seq_next(void* handle, float** out_xyz, double* out_timestamp) {
  auto* r = static_cast<Reader*>(handle);
  std::unique_lock<std::mutex> lk(r->mu);
  r->cv_consumer.wait(lk, [r] { return !r->queue.empty() || r->done; });
  if (r->queue.empty()) return 0;
  Scan s = r->queue.front();
  r->queue.pop_front();
  lk.unlock();
  r->cv_producer.notify_one();
  *out_xyz = s.xyz;
  *out_timestamp = s.timestamp;
  return s.n;
}

void seq_free_scan(float* xyz) { pcd_free(xyz); }

void seq_close(void* handle) {
  auto* r = static_cast<Reader*>(handle);
  r->stop = true;
  r->cv_producer.notify_all();
  if (r->worker.joinable()) r->worker.join();
  for (auto& s : r->queue) {
    if (s.xyz) pcd_free(s.xyz);
  }
  delete r;
}

}  // extern "C"
