// Shared-memory frame ring: zero-copy uint8 frame hand-off from simulator worker
// processes to the batching host loop.
//
// Role in the framework: the reference's env workers ship frames through torch
// tensors/pipes inside allenact/habitat vectorized samplers (SURVEY.md §2.4
// "vectorized env workers"). Here each worker owns one fixed-size slot in a POSIX
// shared-memory segment and publishes frames under a per-slot seqlock (seq odd =
// write in progress; readers retry on seq mismatch), so the reader can assemble a
// contiguous uint8 batch for TPU transfer without any serialization.
//
// C ABI only — bound from Python via ctypes (no pybind11 in this environment).

#include <atomic>
#include <cstdint>
#include <cstring>
#include <fcntl.h>
#include <sys/mman.h>
#include <sys/stat.h>
#include <unistd.h>

namespace {

struct Handle {
  void* base;
  std::size_t total;
  int nslots;
  std::size_t slot_bytes;   // payload bytes per slot
  char name[256];
};

constexpr std::size_t kAlign = 64;

inline std::size_t slot_stride(std::size_t slot_bytes) {
  std::size_t raw = sizeof(std::atomic<uint64_t>) + slot_bytes;
  return (raw + kAlign - 1) / kAlign * kAlign;
}

inline std::atomic<uint64_t>* slot_seq(Handle* h, int slot) {
  auto* p = static_cast<char*>(h->base) + slot * slot_stride(h->slot_bytes);
  return reinterpret_cast<std::atomic<uint64_t>*>(p);
}

inline unsigned char* slot_data(Handle* h, int slot) {
  auto* p = static_cast<char*>(h->base) + slot * slot_stride(h->slot_bytes);
  return reinterpret_cast<unsigned char*>(p + sizeof(std::atomic<uint64_t>));
}

Handle* map_segment(const char* name, int nslots, long slot_bytes, bool create) {
  int flags = create ? (O_CREAT | O_RDWR) : O_RDWR;
  int fd = shm_open(name, flags, 0600);
  if (fd < 0) return nullptr;
  std::size_t total = slot_stride(slot_bytes) * static_cast<std::size_t>(nslots);
  if (create && ftruncate(fd, static_cast<off_t>(total)) != 0) {
    close(fd);
    shm_unlink(name);
    return nullptr;
  }
  void* base = mmap(nullptr, total, PROT_READ | PROT_WRITE, MAP_SHARED, fd, 0);
  close(fd);
  if (base == MAP_FAILED) return nullptr;
  auto* h = new Handle();
  h->base = base;
  h->total = total;
  h->nslots = nslots;
  h->slot_bytes = static_cast<std::size_t>(slot_bytes);
  std::strncpy(h->name, name, sizeof(h->name) - 1);
  if (create) std::memset(base, 0, total);
  return h;
}

}  // namespace

extern "C" {

void* fr_create(const char* name, int nslots, long slot_bytes) {
  shm_unlink(name);  // stale segment from a crashed run
  return map_segment(name, nslots, slot_bytes, /*create=*/true);
}

void* fr_attach(const char* name, int nslots, long slot_bytes) {
  return map_segment(name, nslots, slot_bytes, /*create=*/false);
}

// Publish a frame: seq -> odd (write in progress), copy, seq -> even.
// The in-progress value is forced odd (s | 1) rather than blindly s + 1: if
// the previous writer died mid-write (respawned worker inheriting an odd seq),
// s + 1 would publish EVEN while the copy is in flight (torn reads accepted)
// and then park the slot on odd forever (every later read spins out). s | 1
// keeps readers retrying during the copy and restores even/stable parity.
void fr_write(void* handle, int slot, const unsigned char* data, long n) {
  auto* h = static_cast<Handle*>(handle);
  if (!h || slot < 0 || slot >= h->nslots) return;
  std::size_t count = static_cast<std::size_t>(n) < h->slot_bytes
                          ? static_cast<std::size_t>(n)
                          : h->slot_bytes;
  auto* seq = slot_seq(h, slot);
  uint64_t w = seq->load(std::memory_order_relaxed) | 1;
  seq->store(w, std::memory_order_release);           // odd: writer active
  std::atomic_thread_fence(std::memory_order_acquire);
  std::memcpy(slot_data(h, slot), data, count);
  seq->store(w + 1, std::memory_order_release);       // even: stable
}

// Read the latest stable frame; retries while a write is in flight.
// Returns the sequence number read, or -1 on error.
long fr_read(void* handle, int slot, unsigned char* out, long n) {
  auto* h = static_cast<Handle*>(handle);
  if (!h || slot < 0 || slot >= h->nslots) return -1;
  std::size_t count = static_cast<std::size_t>(n) < h->slot_bytes
                          ? static_cast<std::size_t>(n)
                          : h->slot_bytes;
  auto* seq = slot_seq(h, slot);
  for (int attempt = 0; attempt < 1 << 20; ++attempt) {
    uint64_t s0 = seq->load(std::memory_order_acquire);
    if (s0 & 1) continue;  // write in progress
    std::memcpy(out, slot_data(h, slot), count);
    std::atomic_thread_fence(std::memory_order_acquire);
    uint64_t s1 = seq->load(std::memory_order_acquire);
    if (s0 == s1) return static_cast<long>(s1);
  }
  return -1;
}

void fr_close(void* handle, int unlink_segment) {
  auto* h = static_cast<Handle*>(handle);
  if (!h) return;
  munmap(h->base, h->total);
  if (unlink_segment) shm_unlink(h->name);
  delete h;
}

}  // extern "C"
