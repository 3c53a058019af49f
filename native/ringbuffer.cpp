// Host-side ring replay buffer — native replacement for cpprb.
//
// The reference's torch path stores transitions in cpprb's C++/Cython ring
// buffer (torch_ver/src/replay_buffer.py:83,102,108: per-field env_dict,
// O(1) FIFO add, uniform batch sample).  This is the same capability as a
// small dependency-free C++ core driven through ctypes: preallocated
// contiguous arenas per field, memcpy adds (single or batched), and a
// gather-sample that fills caller-provided pinned buffers so the Python side
// can hand them straight to jax.device_put.
//
// Thread-safety: a mutex around add/sample so a host env-stepping thread can
// feed the buffer while the training thread samples (the async host->device
// pipeline SURVEY §7 calls out).

#include <cstdint>
#include <cstring>
#include <cstdlib>
#include <mutex>
#include <random>
#include <vector>

namespace {

struct Field {
  size_t item_bytes;   // bytes per single item (product of field shape * dtype size)
  std::vector<uint8_t> arena;  // capacity * item_bytes
};

struct RingBuffer {
  size_t capacity = 0;
  size_t cursor = 0;   // next write slot
  size_t size = 0;     // valid items
  std::vector<Field> fields;
  std::mt19937_64 rng;
  std::mutex mu;
};

}  // namespace

extern "C" {

// Create a buffer with `n_fields` fields; field i stores items of
// `item_bytes[i]` bytes.  Returns an opaque handle.
void* rb_create(uint64_t capacity, uint64_t n_fields, const uint64_t* item_bytes,
                uint64_t seed) {
  auto* rb = new RingBuffer();
  rb->capacity = capacity;
  rb->fields.resize(n_fields);
  rb->rng.seed(seed);
  for (uint64_t i = 0; i < n_fields; ++i) {
    rb->fields[i].item_bytes = item_bytes[i];
    rb->fields[i].arena.resize(capacity * item_bytes[i]);
  }
  return rb;
}

void rb_destroy(void* handle) { delete static_cast<RingBuffer*>(handle); }

uint64_t rb_size(void* handle) {
  auto* rb = static_cast<RingBuffer*>(handle);
  std::lock_guard<std::mutex> lock(rb->mu);
  return rb->size;
}

uint64_t rb_capacity(void* handle) {
  return static_cast<RingBuffer*>(handle)->capacity;
}

// Add `n_items` consecutive items; srcs[i] points at n_items*item_bytes[i]
// bytes for field i.  Handles wraparound with at most two memcpys per field.
void rb_add(void* handle, const void** srcs, uint64_t n_items) {
  auto* rb = static_cast<RingBuffer*>(handle);
  std::lock_guard<std::mutex> lock(rb->mu);
  const size_t cap = rb->capacity;
  for (size_t f = 0; f < rb->fields.size(); ++f) {
    Field& fld = rb->fields[f];
    const auto* src = static_cast<const uint8_t*>(srcs[f]);
    size_t pos = rb->cursor;
    size_t remaining = n_items;
    while (remaining > 0) {
      size_t chunk = std::min(remaining, cap - pos);
      std::memcpy(fld.arena.data() + pos * fld.item_bytes, src,
                  chunk * fld.item_bytes);
      src += chunk * fld.item_bytes;
      pos = (pos + chunk) % cap;
      remaining -= chunk;
    }
  }
  rb->cursor = (rb->cursor + n_items) % cap;
  rb->size = std::min(rb->size + n_items, cap);
}

// Uniform-with-replacement sample of `batch` items into dsts[i]
// (batch*item_bytes[i] bytes each).  Returns 0 on success, -1 if empty.
int rb_sample(void* handle, void** dsts, uint64_t batch) {
  auto* rb = static_cast<RingBuffer*>(handle);
  std::lock_guard<std::mutex> lock(rb->mu);
  if (rb->size == 0) return -1;
  std::uniform_int_distribution<size_t> dist(0, rb->size - 1);
  std::vector<size_t> idx(batch);
  for (uint64_t b = 0; b < batch; ++b) idx[b] = dist(rb->rng);
  for (size_t f = 0; f < rb->fields.size(); ++f) {
    Field& fld = rb->fields[f];
    auto* dst = static_cast<uint8_t*>(dsts[f]);
    for (uint64_t b = 0; b < batch; ++b) {
      std::memcpy(dst + b * fld.item_bytes,
                  fld.arena.data() + idx[b] * fld.item_bytes, fld.item_bytes);
    }
  }
  return 0;
}

// Deterministic gather by caller-provided indices (for tests/parity).
int rb_gather(void* handle, void** dsts, const uint64_t* indices,
              uint64_t batch) {
  auto* rb = static_cast<RingBuffer*>(handle);
  std::lock_guard<std::mutex> lock(rb->mu);
  if (rb->size == 0) return -1;
  for (size_t f = 0; f < rb->fields.size(); ++f) {
    Field& fld = rb->fields[f];
    auto* dst = static_cast<uint8_t*>(dsts[f]);
    for (uint64_t b = 0; b < batch; ++b) {
      if (indices[b] >= rb->size) return -2;
      std::memcpy(dst + b * fld.item_bytes,
                  fld.arena.data() + indices[b] * fld.item_bytes,
                  fld.item_bytes);
    }
  }
  return 0;
}

}  // extern "C"
