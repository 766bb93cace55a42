// starflashattention_tpu native runtime core.
//
// TPU-native counterpart of the reference's C++ host runtime
// (/root/reference/src/flash_attn.cu:937-1018 run_flash_decoder +
// examples/cpp harness): on TPU the kernel launching/scratch lifetime moved
// into XLA, so the native layer owns what remains host-side and latency
// critical in production serving — paged KV bookkeeping and the
// continuous-batching scheduler core. Exposed as a C ABI consumed via ctypes
// (no pybind11 dependency); Python fallbacks exist for environments without
// a toolchain.
//
// Build: `make -C native` -> native/libsfa_runtime.so

#include <cstdint>
#include <cstring>
#include <deque>
#include <unordered_map>
#include <vector>

extern "C" {

// ---------------------------------------------------------------------------
// Paged-KV page pool: O(1) alloc/free free-list + per-sequence page lists.
// Page 0 is the reserved null page (cache/paged.py convention).
// ---------------------------------------------------------------------------

struct PagePool {
  int num_pages;
  std::vector<int> free_list;             // stack of free physical pages
  std::unordered_map<int, std::vector<int>> seqs;  // handle -> page list
  int next_handle = 1;
};

void* sfa_pool_create(int num_pages) {
  if (num_pages < 2) return nullptr;
  auto* p = new PagePool();
  p->num_pages = num_pages;
  p->free_list.reserve(num_pages - 1);
  for (int i = num_pages - 1; i >= 1; --i) p->free_list.push_back(i);
  return p;
}

void sfa_pool_destroy(void* h) { delete static_cast<PagePool*>(h); }

int sfa_pool_free_count(void* h) {
  return static_cast<int>(static_cast<PagePool*>(h)->free_list.size());
}

// New sequence -> handle (>0), or 0 on failure.
int sfa_pool_seq_new(void* h) {
  auto* p = static_cast<PagePool*>(h);
  int handle = p->next_handle++;
  p->seqs.emplace(handle, std::vector<int>());
  return handle;
}

// Grow a sequence to cover new_len tokens; returns total pages held,
// or -1 if the pool is exhausted (caller may evict and retry).
int sfa_pool_seq_extend(void* h, int handle, int new_len, int page_size) {
  auto* p = static_cast<PagePool*>(h);
  auto it = p->seqs.find(handle);
  if (it == p->seqs.end() || page_size <= 0) return -1;
  auto& pages = it->second;
  int need = (new_len + page_size - 1) / page_size;
  int have = static_cast<int>(pages.size());
  if (need > have &&
      static_cast<int>(p->free_list.size()) < need - have)
    return -1;
  for (int i = have; i < need; ++i) {
    pages.push_back(p->free_list.back());
    p->free_list.pop_back();
  }
  return static_cast<int>(pages.size());
}

// Copy the sequence's page list into out (cap entries); returns count.
int sfa_pool_seq_pages(void* h, int handle, int* out, int cap) {
  auto* p = static_cast<PagePool*>(h);
  auto it = p->seqs.find(handle);
  if (it == p->seqs.end()) return -1;
  int n = static_cast<int>(it->second.size());
  int c = n < cap ? n : cap;
  std::memcpy(out, it->second.data(), c * sizeof(int));
  return n;
}

void sfa_pool_seq_free(void* h, int handle) {
  auto* p = static_cast<PagePool*>(h);
  auto it = p->seqs.find(handle);
  if (it == p->seqs.end()) return;
  for (int page : it->second) p->free_list.push_back(page);
  p->seqs.erase(it);
}

// Detach the handle's first n pages WITHOUT freeing them (ownership moves to
// the caller — the prefix-cache store, serving/prefix_cache.py). Writes the
// detached ids into out; returns n, or -1 if the handle owns fewer pages.
int sfa_pool_seq_release_prefix(void* h, int handle, int n, int* out) {
  auto* p = static_cast<PagePool*>(h);
  auto it = p->seqs.find(handle);
  if (it == p->seqs.end()) return -1;
  auto& pages = it->second;
  if (n > static_cast<int>(pages.size())) return -1;
  std::memcpy(out, pages.data(), n * sizeof(int));
  pages.erase(pages.begin(), pages.begin() + n);
  return n;
}

// Return loose pages (previously detached, now evicted from the prefix
// store) straight to the free list. The null page 0 is never enqueued.
void sfa_pool_free_raw(void* h, const int* pages, int n) {
  auto* p = static_cast<PagePool*>(h);
  for (int i = 0; i < n; ++i)
    if (pages[i] != 0) p->free_list.push_back(pages[i]);
}

// ---------------------------------------------------------------------------
// Continuous-batching scheduler core: FCFS queue + fixed decode slots.
// Mirrors serving/scheduler.py's semantics exactly (asserted by tests).
// ---------------------------------------------------------------------------

struct SchedCore {
  struct Req {
    int64_t uid;
    int prompt_len;
    int budget;
  };
  int num_slots;
  int max_seq_len;
  int capacity_slack;  // cache rows reserved for fixed-round overshoot
  std::deque<Req> queue;
  std::vector<Req> slots;      // slot state; uid < 0 => free
  SchedCore(int n, int cap, int slack)
      : num_slots(n), max_seq_len(cap), capacity_slack(slack) {
    slots.assign(n, Req{-1, 0, 0});
  }
};

void* sfa_sched_create(int num_slots, int max_seq_len, int capacity_slack) {
  return new SchedCore(num_slots, max_seq_len, capacity_slack);
}
void sfa_sched_destroy(void* h) { delete static_cast<SchedCore*>(h); }

// Returns 0 on accept, -1 if the request can never fit. The slack term
// matches serving/scheduler.py:submit — without it, the engine's fixed-size
// decode rounds could append past max_seq_len and clamp onto live KV rows.
int sfa_sched_submit(void* h, int64_t uid, int prompt_len, int max_new) {
  auto* s = static_cast<SchedCore*>(h);
  if (prompt_len + max_new + s->capacity_slack > s->max_seq_len) return -1;
  s->queue.push_back({uid, prompt_len, max_new});
  return 0;
}

// FCFS-fill free slots; writes (uid, slot) pairs; returns count admitted.
int sfa_sched_admit(void* h, int64_t* uids, int* slot_idx, int cap) {
  auto* s = static_cast<SchedCore*>(h);
  int n = 0;
  for (int i = 0; i < s->num_slots && n < cap; ++i) {
    if (s->queue.empty()) break;
    if (s->slots[i].uid < 0) {
      s->slots[i] = s->queue.front();
      s->queue.pop_front();
      uids[n] = s->slots[i].uid;
      slot_idx[n] = i;
      ++n;
    }
  }
  return n;
}

// Record n generated tokens (hit_eos: index of EOS within them or -1).
// Returns 1 if the slot retired, 0 otherwise.
int sfa_sched_record(void* h, int slot, int n_tokens, int eos_at) {
  auto* s = static_cast<SchedCore*>(h);
  auto& r = s->slots[slot];
  if (r.uid < 0) return 0;
  int usable = n_tokens < r.budget ? n_tokens : r.budget;
  if (eos_at >= 0 && eos_at < usable) {
    r.budget = 0;
  } else {
    r.budget -= usable;
  }
  if (r.budget <= 0) {
    r.uid = -1;
    return 1;
  }
  return 0;
}

int sfa_sched_budget(void* h, int slot) {
  return static_cast<SchedCore*>(h)->slots[slot].budget;
}

int64_t sfa_sched_slot_uid(void* h, int slot) {
  return static_cast<SchedCore*>(h)->slots[slot].uid;
}

int sfa_sched_active(void* h, int* mask, int cap) {
  auto* s = static_cast<SchedCore*>(h);
  int n = s->num_slots < cap ? s->num_slots : cap;
  for (int i = 0; i < n; ++i) mask[i] = s->slots[i].uid >= 0 ? 1 : 0;
  return n;
}

int sfa_sched_has_work(void* h) {
  auto* s = static_cast<SchedCore*>(h);
  if (!s->queue.empty()) return 1;
  for (auto& r : s->slots)
    if (r.uid >= 0) return 1;
  return 0;
}

}  // extern "C"

// ---------------------------------------------------------------------------
// Training data loader: mmap'd token corpus + deterministic window sampler.
// The analog slot in the reference is empty (it has no training at all,
// SURVEY.md §2); this is the native data path for models/train: the corpus
// stays out of the Python heap (page cache serves repeats), window gather +
// int32 widening run in C, and the xorshift64* stream makes every batch
// reproducible from (seed, draw index) — the Python twin implements the
// same generator bit-for-bit (utils/native.PyTokenLoader).
// ---------------------------------------------------------------------------

#include <fcntl.h>
#include <sys/mman.h>
#include <sys/stat.h>
#include <unistd.h>

extern "C" {

struct TokenLoader {
  const uint8_t* data = nullptr;
  size_t bytes = 0;
  int itemsize = 1;  // 1/2/4-byte little-endian tokens
  int64_t n_tokens = 0;
  uint64_t state = 0;  // xorshift64* state
};

static inline uint64_t sfa_xs64(uint64_t* s) {
  uint64_t x = *s;
  x ^= x >> 12;
  x ^= x << 25;
  x ^= x >> 27;
  *s = x;
  return x * 0x2545F4914F6CDD1DULL;
}

void* sfa_loader_open(const char* path, int itemsize, uint64_t seed) {
  if (itemsize != 1 && itemsize != 2 && itemsize != 4) return nullptr;
  int fd = open(path, O_RDONLY);
  if (fd < 0) return nullptr;
  struct stat st;
  if (fstat(fd, &st) != 0 || st.st_size < itemsize) {
    close(fd);
    return nullptr;
  }
  void* m = mmap(nullptr, st.st_size, PROT_READ, MAP_PRIVATE, fd, 0);
  close(fd);
  if (m == MAP_FAILED) return nullptr;
  auto* L = new TokenLoader();
  L->data = static_cast<const uint8_t*>(m);
  L->bytes = static_cast<size_t>(st.st_size);
  L->itemsize = itemsize;
  L->n_tokens = st.st_size / itemsize;
  L->state = seed ^ 0x9E3779B97F4A7C15ULL;
  if (L->state == 0) L->state = 1;
  return L;
}

int64_t sfa_loader_num_tokens(void* h) {
  return static_cast<TokenLoader*>(h)->n_tokens;
}

// Fill (batch, width) int32 rows with windows starting uniformly in
// [lo, hi - width] (hi <= 0 means the corpus end) — lo/hi carve train/val
// splits without copying. Returns 0, or -1 if the range can't fit a window.
int sfa_loader_next(void* h, int batch, int width, int64_t lo, int64_t hi,
                    int32_t* out) {
  auto* L = static_cast<TokenLoader*>(h);
  if (hi <= 0 || hi > L->n_tokens) hi = L->n_tokens;
  if (lo < 0) lo = 0;
  int64_t span = hi - lo - width;  // start in [lo, lo + span]
  if (span < 0 || batch < 1 || width < 1) return -1;
  for (int b = 0; b < batch; ++b) {
    int64_t start =
        lo + static_cast<int64_t>(sfa_xs64(&L->state) %
                                  static_cast<uint64_t>(span + 1));
    int32_t* row = out + static_cast<int64_t>(b) * width;
    const uint8_t* src = L->data + start * L->itemsize;
    switch (L->itemsize) {
      case 1:
        for (int i = 0; i < width; ++i) row[i] = src[i];
        break;
      case 2: {
        const uint16_t* s16 = reinterpret_cast<const uint16_t*>(src);
        for (int i = 0; i < width; ++i) row[i] = s16[i];
        break;
      }
      default: {
        const int32_t* s32 = reinterpret_cast<const int32_t*>(src);
        std::memcpy(row, s32, static_cast<size_t>(width) * 4);
        break;
      }
    }
  }
  return 0;
}

void sfa_loader_close(void* h) {
  auto* L = static_cast<TokenLoader*>(h);
  if (L->data) munmap(const_cast<uint8_t*>(L->data), L->bytes);
  delete L;
}

}  // extern "C"
