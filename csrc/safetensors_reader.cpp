// Native safetensors reader: mmap + parallel tensor materialization.
//
// The reference framework's native layer is its CUDA kernel package plus
// pinned-memory async weight staging (lightx2v/common/offload/manager.py).
// On TPU the device side is XLA's, but checkpoint ingest (28 GB for
// Wan-14B) is host-bound: this module provides
//   * zero-copy mmap of safetensors files with MADV_WILLNEED readahead,
//   * a pthread pool that materializes (copies / bf16->f32 widens) many
//     tensors in parallel from the page cache,
// exposed through a minimal C ABI consumed via ctypes
// (lightx2v_tpu/utils/native_loader.py). Python parses the (small) JSON
// header; C++ moves the bytes.
//
// Build: csrc/build.sh -> lightx2v_tpu/_native/libsafetensors_reader.so

#include <cstdint>
#include <cstring>
#include <cstdio>
#include <cstdlib>
#include <fcntl.h>
#include <pthread.h>
#include <sys/mman.h>
#include <sys/stat.h>
#include <unistd.h>

#include <atomic>
#include <vector>

extern "C" {

struct StFile {
  int fd;
  uint8_t* data;
  size_t size;
  uint64_t header_len;
};

// ---------------------------------------------------------------- open/close
StFile* st_open(const char* path) {
  int fd = ::open(path, O_RDONLY);
  if (fd < 0) return nullptr;
  struct stat sb;
  if (fstat(fd, &sb) != 0 || sb.st_size < 8) {
    ::close(fd);
    return nullptr;
  }
  void* p = mmap(nullptr, sb.st_size, PROT_READ, MAP_PRIVATE, fd, 0);
  if (p == MAP_FAILED) {
    ::close(fd);
    return nullptr;
  }
  auto* f = new StFile();
  f->fd = fd;
  f->data = static_cast<uint8_t*>(p);
  f->size = sb.st_size;
  memcpy(&f->header_len, f->data, 8);
  if (8 + f->header_len > f->size) {
    munmap(p, sb.st_size);
    ::close(fd);
    delete f;
    return nullptr;
  }
  return f;
}

void st_close(StFile* f) {
  if (!f) return;
  munmap(f->data, f->size);
  ::close(f->fd);
  delete f;
}

uint64_t st_header_len(StFile* f) { return f->header_len; }
const char* st_header_ptr(StFile* f) { return reinterpret_cast<const char*>(f->data + 8); }
uint64_t st_data_size(StFile* f) { return f->size - 8 - f->header_len; }

// Kick off kernel readahead for the whole data section (or a slice).
void st_prefetch(StFile* f, uint64_t offset, uint64_t length) {
  uint8_t* base = f->data + 8 + f->header_len + offset;
  uintptr_t page = reinterpret_cast<uintptr_t>(base) & ~static_cast<uintptr_t>(4095);
  size_t span = (reinterpret_cast<uintptr_t>(base) - page) + length;
  madvise(reinterpret_cast<void*>(page), span, MADV_WILLNEED);
}

// ------------------------------------------------------------- copy workers
struct CopyJob {
  const uint8_t* src;
  uint8_t* dst;
  uint64_t nbytes;
  int widen_bf16;  // 1: src is bf16, dst is f32
};

struct Pool {
  std::vector<CopyJob>* jobs;
  std::atomic<size_t>* next;
};

static void* worker(void* arg) {
  auto* pool = static_cast<Pool*>(arg);
  for (;;) {
    size_t i = pool->next->fetch_add(1);
    if (i >= pool->jobs->size()) break;
    const CopyJob& j = (*pool->jobs)[i];
    if (j.widen_bf16) {
      const uint16_t* s = reinterpret_cast<const uint16_t*>(j.src);
      uint32_t* d = reinterpret_cast<uint32_t*>(j.dst);
      uint64_t n = j.nbytes / 2;
      for (uint64_t k = 0; k < n; ++k) d[k] = static_cast<uint32_t>(s[k]) << 16;
    } else {
      memcpy(j.dst, j.src, j.nbytes);
    }
  }
  return nullptr;
}

// Copy `count` tensors in parallel. offsets are relative to the data
// section; dsts are caller-allocated buffers. widen_bf16[i] upcasts.
int st_read_multi(StFile* f, uint64_t count, const uint64_t* offsets,
                  const uint64_t* nbytes, uint8_t** dsts,
                  const int32_t* widen_bf16, int num_threads) {
  const uint8_t* base = f->data + 8 + f->header_len;
  const uint64_t data_size = st_data_size(f);
  std::vector<CopyJob> jobs(count);
  for (uint64_t i = 0; i < count; ++i) {
    // Overflow-safe containment check: offsets[i] + nbytes[i] could wrap
    // on uint64, so compare against the remaining span instead.
    if (nbytes[i] > data_size || offsets[i] > data_size - nbytes[i]) return -1;
    jobs[i] = {base + offsets[i], dsts[i], nbytes[i], widen_bf16 ? widen_bf16[i] : 0};
  }
  std::atomic<size_t> next(0);
  Pool pool{&jobs, &next};
  if (num_threads < 1) num_threads = 1;
  if (num_threads > 64) num_threads = 64;
  std::vector<pthread_t> threads(num_threads - 1);
  for (auto& t : threads) pthread_create(&t, nullptr, worker, &pool);
  worker(&pool);
  for (auto& t : threads) pthread_join(t, nullptr);
  return 0;
}

}  // extern "C"
