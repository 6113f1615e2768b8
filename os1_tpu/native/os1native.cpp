// Native host-runtime components for os1-tpu.
//
// The reference system is all-C++ (SURVEY.md §2); the TPU build keeps its
// compute path in XLA but implements the host runtime's hot paths natively:
//
//  * DBoW2 binary-vocabulary loader — one mmap'd pass over the 45-byte
//    records (the reference's ~100x binary-load win, README.md:24 /
//    TemplatedVocabulary.h:1563, reproduced here; the Python fallback parses
//    record-by-record and is ~100x slower on a 10^6-node vocabulary).
//  * SPSC frame ring buffer — the Video producer/consumer handover
//    (Video.cpp:40-73) as a lock-free-read mailbox with both lossless
//    (blocking) and realtime (latest-wins) modes.
//  * Grayscale conversion (BT.601) u8/RGB -> f32, the ingest-edge transform
//    (Tracking.cc:96-109).
//
// Exposed via a C ABI consumed with ctypes (no pybind11 in this toolchain).
#include <atomic>
#include <chrono>
#include <condition_variable>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <mutex>

#include <fcntl.h>
#include <sys/mman.h>
#include <sys/stat.h>
#include <unistd.h>

extern "C" {

// ---------------------------------------------------------------------------
// DBoW2 binary vocabulary loader.
// Record layout (45 bytes): parent int32 | isLeaf u8 | desc u8[32] | weight f64.
// ---------------------------------------------------------------------------

// Returns the node count (records + root) or -1; writes k and L.
int64_t vocab_count(const char* path, int32_t* k, int32_t* L) {
  struct stat st;
  if (stat(path, &st) != 0) return -1;
  FILE* f = fopen(path, "rb");
  if (!f) return -1;
  unsigned char header[4];
  if (fread(header, 1, 4, f) != 4) {
    fclose(f);
    return -1;
  }
  *k = header[0];
  *L = header[1];
  fclose(f);
  return (st.st_size - 4) / 45 + 1;
}

// Fills flat arrays sized for n_nodes (from vocab_count) and branching kb:
//   desc     [n_nodes * 8]  u32 (little-endian bit order)
//   children [n_nodes * kb] i32, -1 padded
//   weight   [n_nodes]      f32
//   word     [n_nodes]      i32, -1 for internal nodes
// Returns number of words, or -1 on error.
int64_t vocab_load(const char* path, uint32_t* desc, int32_t* children,
                   float* weight, int32_t* word, int64_t n_nodes,
                   int32_t kb) {
  int fd = open(path, O_RDONLY);
  if (fd < 0) return -1;
  struct stat st;
  if (fstat(fd, &st) != 0) {
    close(fd);
    return -1;
  }
  const unsigned char* data = static_cast<const unsigned char*>(
      mmap(nullptr, st.st_size, PROT_READ, MAP_PRIVATE, fd, 0));
  if (data == MAP_FAILED) {
    close(fd);
    return -1;
  }
  const int64_t n_rec = (st.st_size - 4) / 45;
  if (n_rec + 1 != n_nodes) {
    munmap(const_cast<unsigned char*>(data), st.st_size);
    close(fd);
    return -1;
  }

  int32_t* child_count = new int32_t[n_nodes]();
  memset(children, 0xFF, sizeof(int32_t) * n_nodes * kb);
  memset(word, 0xFF, sizeof(int32_t) * n_nodes);
  memset(desc, 0, sizeof(uint32_t) * 8);  // root has no descriptor
  weight[0] = 0.0f;

  int64_t n_words = 0;
  const unsigned char* p = data + 4;
  for (int64_t i = 1; i < n_nodes; ++i, p += 45) {
    int32_t parent;
    memcpy(&parent, p, 4);
    if (parent >= 0 && parent < n_nodes && child_count[parent] < kb) {
      children[parent * kb + child_count[parent]++] = static_cast<int32_t>(i);
    }
    const uint8_t is_leaf = p[4];
    memcpy(desc + i * 8, p + 5, 32);
    double w;
    memcpy(&w, p + 37, 8);
    weight[i] = static_cast<float>(w);
    if (is_leaf) word[i] = static_cast<int32_t>(n_words++);
  }
  delete[] child_count;
  munmap(const_cast<unsigned char*>(
             const_cast<unsigned char*>(data)),
         st.st_size);
  close(fd);
  return n_words;
}

// ---------------------------------------------------------------------------
// SPSC frame ring buffer (Video producer/consumer handover).
// ---------------------------------------------------------------------------

struct RingBuffer {
  uint8_t* data;
  int64_t slot_bytes;
  int64_t capacity;
  std::atomic<int64_t> head{0};  // next write sequence number
  std::atomic<int64_t> tail{0};  // next read sequence number
  bool realtime;                 // true: overwrite oldest (latest wins)
  std::mutex m;
  std::condition_variable cv;
  std::atomic<bool> closed{false};
};

void* ring_create(int64_t capacity, int64_t slot_bytes, int realtime) {
  RingBuffer* rb = new RingBuffer();
  rb->data = new uint8_t[capacity * slot_bytes];
  rb->slot_bytes = slot_bytes;
  rb->capacity = capacity;
  rb->realtime = realtime != 0;
  return rb;
}

void ring_destroy(void* h) {
  RingBuffer* rb = static_cast<RingBuffer*>(h);
  delete[] rb->data;
  delete rb;
}

void ring_close(void* h) {
  RingBuffer* rb = static_cast<RingBuffer*>(h);
  rb->closed = true;
  rb->cv.notify_all();
}

// Push one frame. Lossless mode blocks while full (up to timeout_ms);
// realtime mode drops the oldest. Returns 1 ok, 0 timeout/closed.
int ring_push(void* h, const uint8_t* frame, int64_t timeout_ms) {
  RingBuffer* rb = static_cast<RingBuffer*>(h);
  std::unique_lock<std::mutex> lk(rb->m);
  if (!rb->realtime) {
    if (!rb->cv.wait_for(lk, std::chrono::milliseconds(timeout_ms), [&] {
          return rb->closed || rb->head - rb->tail < rb->capacity;
        }))
      return 0;
    if (rb->closed) return 0;
  } else if (rb->head - rb->tail >= rb->capacity) {
    rb->tail++;  // drop oldest
  }
  const int64_t slot = rb->head % rb->capacity;
  memcpy(rb->data + slot * rb->slot_bytes, frame, rb->slot_bytes);
  rb->head++;
  rb->cv.notify_all();
  return 1;
}

// Pop one frame into out. Returns 1 ok, 0 timeout/closed-and-empty.
int ring_pop(void* h, uint8_t* out, int64_t timeout_ms) {
  RingBuffer* rb = static_cast<RingBuffer*>(h);
  std::unique_lock<std::mutex> lk(rb->m);
  if (!rb->cv.wait_for(lk, std::chrono::milliseconds(timeout_ms),
                       [&] { return rb->closed || rb->head > rb->tail; }))
    return 0;
  if (rb->head == rb->tail) return 0;  // closed and drained
  const int64_t slot = rb->tail % rb->capacity;
  memcpy(out, rb->data + slot * rb->slot_bytes, rb->slot_bytes);
  rb->tail++;
  rb->cv.notify_all();
  return 1;
}

int64_t ring_size(void* h) {
  RingBuffer* rb = static_cast<RingBuffer*>(h);
  return rb->head - rb->tail;
}

// ---------------------------------------------------------------------------
// Ingest-edge conversions.
// ---------------------------------------------------------------------------

void gray_u8_to_f32(const uint8_t* src, float* dst, int64_t n) {
  for (int64_t i = 0; i < n; ++i) dst[i] = static_cast<float>(src[i]);
}

// Interleaved RGB u8 -> BT.601 luminance f32.
void rgb_u8_to_gray_f32(const uint8_t* src, float* dst, int64_t n_pixels) {
  for (int64_t i = 0; i < n_pixels; ++i) {
    const float r = src[3 * i], g = src[3 * i + 1], b = src[3 * i + 2];
    dst[i] = 0.299f * r + 0.587f * g + 0.114f * b;
  }
}

}  // extern "C"
