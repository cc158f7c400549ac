// bihome_tpu native input pipeline: .bhpk pack reader + prefetch ring.
//
// The reference feeds training from DataLoader(num_workers=8) over per-image
// files (ref: train.py:80-281). Here the heavy synthesis is on-device
// (data/pipeline.py); the host's only job is shipping seeded-sampled uint8
// image batches fast enough to keep the chip busy. This library does that
// natively: images live in one mmap'd contiguous pack (.bhpk, written by
// preprocess_offline.py --pack), batch gather is a parallel memcpy out of the
// page cache, and an epoch runs through a producer thread filling a ring of
// preallocated batch buffers so Python only ever copies a ready batch.
//
// C API (ctypes-consumed by bihome_tpu/data/pack.py):
//   bhpk_open/close/count/height/width/channels
//   bhpk_gather(reader, indices, n, out, threads)
//   bhpk_epoch_start/next/finish        — prefetched epoch iterator
//
// Format v1 (little-endian):
//   0: "BHPK"  4: u32 version=1  8: u64 count
//   16: u32 height  20: u32 width  24: u32 channels  28: u32 reserved
//   32: count*H*W*C uint8, image-major

#include <atomic>
#include <condition_variable>
#include <cstdint>
#include <cstring>
#include <mutex>
#include <thread>
#include <vector>

#include <fcntl.h>
#include <sys/mman.h>
#include <sys/stat.h>
#include <unistd.h>

namespace {

struct Header {
  char magic[4];
  uint32_t version;
  uint64_t count;
  uint32_t height;
  uint32_t width;
  uint32_t channels;
  uint32_t reserved;
};
static_assert(sizeof(Header) == 32, "bhpk header is 32 bytes");

struct Reader {
  int fd = -1;
  const uint8_t* base = nullptr;  // mmap of the whole file
  size_t file_size = 0;
  Header hdr{};
  size_t image_bytes = 0;

  const uint8_t* image(uint64_t idx) const {
    return base + sizeof(Header) + idx * image_bytes;
  }
};

// Parallel gather: each worker copies a contiguous slice of the batch.
void gather_range(const Reader* r, const int64_t* idx, int64_t lo, int64_t hi,
                  uint8_t* out) {
  for (int64_t i = lo; i < hi; ++i) {
    std::memcpy(out + i * r->image_bytes, r->image(idx[i]), r->image_bytes);
  }
}

void gather(const Reader* r, const int64_t* idx, int64_t n, uint8_t* out,
            int threads) {
  if (threads <= 1 || n < 2 * threads) {
    gather_range(r, idx, 0, n, out);
    return;
  }
  std::vector<std::thread> pool;
  int64_t chunk = (n + threads - 1) / threads;
  for (int t = 0; t < threads; ++t) {
    int64_t lo = t * chunk;
    int64_t hi = std::min<int64_t>(n, lo + chunk);
    if (lo >= hi) break;
    pool.emplace_back(gather_range, r, idx, lo, hi, out);
  }
  for (auto& th : pool) th.join();
}

// Epoch prefetcher: producer thread fills a ring of batch buffers.
struct Epoch {
  const Reader* reader = nullptr;
  std::vector<int64_t> indices;
  int64_t batch = 0;
  int64_t steps = 0;
  int threads = 1;

  std::vector<std::vector<uint8_t>> ring;
  // ring slot states guarded by mu: filled[i] set by producer, cleared by
  // consumer. head = next slot the consumer reads, produced = batches done.
  std::mutex mu;
  std::condition_variable cv_produced, cv_consumed;
  std::vector<bool> filled;
  int64_t next_fill = 0;     // batch number the producer fills next
  int64_t next_read = 0;     // batch number the consumer reads next
  std::atomic<bool> stop{false};
  std::thread producer;

  void run() {
    for (int64_t b = 0; b < steps && !stop.load(); ++b) {
      size_t slot = b % ring.size();
      {
        std::unique_lock<std::mutex> lk(mu);
        cv_consumed.wait(lk, [&] { return !filled[slot] || stop.load(); });
        if (stop.load()) return;
      }
      gather(reader, indices.data() + b * batch, batch, ring[slot].data(),
             threads);
      {
        std::lock_guard<std::mutex> lk(mu);
        filled[slot] = true;
      }
      cv_produced.notify_one();
    }
  }
};

}  // namespace

extern "C" {

void* bhpk_open(const char* path) {
  int fd = ::open(path, O_RDONLY);
  if (fd < 0) return nullptr;
  struct stat st;
  if (fstat(fd, &st) != 0 || static_cast<size_t>(st.st_size) < sizeof(Header)) {
    ::close(fd);
    return nullptr;
  }
  void* map = mmap(nullptr, st.st_size, PROT_READ, MAP_PRIVATE, fd, 0);
  if (map == MAP_FAILED) {
    ::close(fd);
    return nullptr;
  }
  auto* r = new Reader();
  r->fd = fd;
  r->base = static_cast<const uint8_t*>(map);
  r->file_size = st.st_size;
  std::memcpy(&r->hdr, r->base, sizeof(Header));
  r->image_bytes = size_t(r->hdr.height) * r->hdr.width * r->hdr.channels;
  bool ok = std::memcmp(r->hdr.magic, "BHPK", 4) == 0 &&
            r->hdr.version == 1 && r->image_bytes > 0 &&
            sizeof(Header) + r->hdr.count * r->image_bytes <= r->file_size;
  if (!ok) {
    munmap(map, st.st_size);
    ::close(fd);
    delete r;
    return nullptr;
  }
  // Hint readahead for the sequential-ish epoch access pattern.
  madvise(const_cast<uint8_t*>(r->base), r->file_size, MADV_WILLNEED);
  return r;
}

void bhpk_close(void* handle) {
  auto* r = static_cast<Reader*>(handle);
  if (!r) return;
  munmap(const_cast<uint8_t*>(r->base), r->file_size);
  ::close(r->fd);
  delete r;
}

int64_t bhpk_count(void* h) { return static_cast<Reader*>(h)->hdr.count; }
int32_t bhpk_height(void* h) { return static_cast<Reader*>(h)->hdr.height; }
int32_t bhpk_width(void* h) { return static_cast<Reader*>(h)->hdr.width; }
int32_t bhpk_channels(void* h) {
  return static_cast<Reader*>(h)->hdr.channels;
}

// Copy images idx[0..n) into out ([n, H, W, C] uint8). Returns 0 on success.
int bhpk_gather(void* h, const int64_t* idx, int64_t n, uint8_t* out,
                int threads) {
  auto* r = static_cast<Reader*>(h);
  for (int64_t i = 0; i < n; ++i) {
    if (idx[i] < 0 || static_cast<uint64_t>(idx[i]) >= r->hdr.count) return -1;
  }
  gather(r, idx, n, out, threads);
  return 0;
}

// Start a prefetched epoch over `total` indices in batches of `batch`
// (total must be a multiple of batch; excess indices are ignored).
void* bhpk_epoch_start(void* h, const int64_t* idx, int64_t total,
                       int64_t batch, int depth, int threads) {
  auto* r = static_cast<Reader*>(h);
  if (batch <= 0 || total < batch) return nullptr;
  for (int64_t i = 0; i < total; ++i) {
    if (idx[i] < 0 || static_cast<uint64_t>(idx[i]) >= r->hdr.count)
      return nullptr;
  }
  auto* e = new Epoch();
  e->reader = r;
  e->indices.assign(idx, idx + total);
  e->batch = batch;
  e->steps = total / batch;
  e->threads = threads < 1 ? 1 : threads;
  int slots = depth < 1 ? 1 : depth;
  if (slots > e->steps) slots = e->steps;
  e->ring.resize(slots);
  for (auto& buf : e->ring) buf.resize(batch * r->image_bytes);
  e->filled.assign(slots, false);
  e->producer = std::thread(&Epoch::run, e);
  return e;
}

// Blocks until the next batch is ready, copies it to out. Returns 1 if a
// batch was written, 0 at end of epoch.
int bhpk_epoch_next(void* handle, uint8_t* out) {
  auto* e = static_cast<Epoch*>(handle);
  if (e->next_read >= e->steps) return 0;
  size_t slot = e->next_read % e->ring.size();
  {
    std::unique_lock<std::mutex> lk(e->mu);
    e->cv_produced.wait(lk, [&] { return e->filled[slot]; });
  }
  std::memcpy(out, e->ring[slot].data(), e->ring[slot].size());
  {
    std::lock_guard<std::mutex> lk(e->mu);
    e->filled[slot] = false;
  }
  e->cv_consumed.notify_one();
  e->next_read++;
  return 1;
}

void bhpk_epoch_finish(void* handle) {
  auto* e = static_cast<Epoch*>(handle);
  if (!e) return;
  e->stop.store(true);
  e->cv_consumed.notify_all();
  if (e->producer.joinable()) e->producer.join();
  delete e;
}

}  // extern "C"
