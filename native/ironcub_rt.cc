// ironcub_rt — native runtime support for the TPU MPC framework.
//
// The reference's runtime is C++ end to end (YARP devices, a 200 Hz control
// thread, blf VectorsCollectionServer telemetry). In the TPU build the
// compute path is JAX; this library provides the host-side runtime pieces
// that must not depend on the Python interpreter's timing:
//
//   * a lock-free single-producer/single-consumer telemetry ring buffer of
//     fixed-size float records (the VectorsCollectionServer analogue) with a
//     background drain to disk;
//   * a real-time loop pacer: absolute-deadline clock_nanosleep pacing with
//     overrun accounting (the driver's deadline warning,
//     variable_sampling_mpc.py:122-123, as a first-class mechanism);
//   * a monotonic high-resolution clock helper.
//
// Plain C ABI; consumed from Python via ctypes (runtime/native.py).

#include <atomic>
#include <chrono>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <ctime>
#include <thread>
#include <vector>

namespace {

struct Ring {
  std::vector<float> data;    // capacity * record_len
  std::vector<uint64_t> seq;  // record sequence numbers
  size_t capacity = 0;
  size_t record_len = 0;
  std::atomic<uint64_t> head{0};  // next write slot (producer)
  std::atomic<uint64_t> tail{0};  // next read slot (consumer)
  std::atomic<uint64_t> dropped{0};
};

struct Pacer {
  timespec next {};
  int64_t period_ns = 0;
  uint64_t ticks = 0;
  uint64_t overruns = 0;
  int64_t worst_late_ns = 0;
};

int64_t now_ns_monotonic() {
  timespec ts;
  clock_gettime(CLOCK_MONOTONIC, &ts);
  return int64_t(ts.tv_sec) * 1000000000ll + ts.tv_nsec;
}

void ts_add(timespec* t, int64_t ns) {
  t->tv_nsec += ns;
  while (t->tv_nsec >= 1000000000l) {
    t->tv_nsec -= 1000000000l;
    t->tv_sec += 1;
  }
}

}  // namespace

extern "C" {

// ---------------------------------------------------------------- ring ----

void* ring_create(size_t capacity, size_t record_len) {
  auto* r = new Ring();
  r->capacity = capacity;
  r->record_len = record_len;
  r->data.resize(capacity * record_len);
  r->seq.resize(capacity);
  return r;
}

void ring_destroy(void* h) { delete static_cast<Ring*>(h); }

// Producer: push one record. Returns 1 on success, 0 if the ring is full
// (the record is dropped and counted — telemetry must never block control).
int ring_push(void* h, const float* rec) {
  auto* r = static_cast<Ring*>(h);
  uint64_t head = r->head.load(std::memory_order_relaxed);
  uint64_t tail = r->tail.load(std::memory_order_acquire);
  if (head - tail >= r->capacity) {
    r->dropped.fetch_add(1, std::memory_order_relaxed);
    return 0;
  }
  size_t slot = head % r->capacity;
  std::memcpy(&r->data[slot * r->record_len], rec,
              r->record_len * sizeof(float));
  r->seq[slot] = head;
  r->head.store(head + 1, std::memory_order_release);
  return 1;
}

// Consumer: pop up to max_records into out; returns number popped.
size_t ring_pop(void* h, float* out, size_t max_records) {
  auto* r = static_cast<Ring*>(h);
  uint64_t tail = r->tail.load(std::memory_order_relaxed);
  uint64_t head = r->head.load(std::memory_order_acquire);
  size_t n = 0;
  while (tail < head && n < max_records) {
    size_t slot = tail % r->capacity;
    std::memcpy(out + n * r->record_len, &r->data[slot * r->record_len],
                r->record_len * sizeof(float));
    ++tail;
    ++n;
  }
  r->tail.store(tail, std::memory_order_release);
  return n;
}

uint64_t ring_dropped(void* h) {
  return static_cast<Ring*>(h)->dropped.load(std::memory_order_relaxed);
}

size_t ring_size(void* h) {
  auto* r = static_cast<Ring*>(h);
  return size_t(r->head.load(std::memory_order_acquire) -
                r->tail.load(std::memory_order_acquire));
}

// Drain the ring to a raw float32 file (appends). Returns records written.
size_t ring_drain_to_file(void* h, const char* path) {
  auto* r = static_cast<Ring*>(h);
  FILE* f = std::fopen(path, "ab");
  if (!f) return 0;
  std::vector<float> buf(r->record_len * 256);
  size_t total = 0;
  for (;;) {
    size_t n = ring_pop(h, buf.data(), 256);
    if (n == 0) break;
    std::fwrite(buf.data(), sizeof(float), n * r->record_len, f);
    total += n;
  }
  std::fclose(f);
  return total;
}

// --------------------------------------------------------------- pacer ----

void* pacer_create(double period_s) {
  auto* p = new Pacer();
  p->period_ns = int64_t(period_s * 1e9);
  clock_gettime(CLOCK_MONOTONIC, &p->next);
  ts_add(&p->next, p->period_ns);
  return p;
}

void pacer_destroy(void* h) { delete static_cast<Pacer*>(h); }

// Sleep until the next absolute deadline. Returns lateness in ns (negative
// when the deadline was met with slack). Deadlines accumulate absolutely, so
// jitter does not drift the schedule.
int64_t pacer_wait(void* h) {
  auto* p = static_cast<Pacer*>(h);
  int64_t deadline =
      int64_t(p->next.tv_sec) * 1000000000ll + p->next.tv_nsec;
  int64_t late = now_ns_monotonic() - deadline;
  if (late < 0) {
    clock_nanosleep(CLOCK_MONOTONIC, TIMER_ABSTIME, &p->next, nullptr);
  } else {
    ++p->overruns;
    if (late > p->worst_late_ns) p->worst_late_ns = late;
  }
  ++p->ticks;
  ts_add(&p->next, p->period_ns);
  return late;
}

uint64_t pacer_overruns(void* h) { return static_cast<Pacer*>(h)->overruns; }
int64_t pacer_worst_late_ns(void* h) {
  return static_cast<Pacer*>(h)->worst_late_ns;
}
uint64_t pacer_ticks(void* h) { return static_cast<Pacer*>(h)->ticks; }

// --------------------------------------------------------------- clock ----

int64_t monotonic_ns() { return now_ns_monotonic(); }

// -------------------------------------------------------------- stress ----

// Concurrent SPSC stress: a real producer thread races a real consumer
// thread through the acquire/release protocol — the only regime where the
// ring can be wrong. Each record is [seq, seq+0.25, seq+0.5, ...] so the
// consumer can detect both reordering and torn/corrupt records. Returns 0
// on success; a nonzero code identifies the first failure class:
//   1 = non-monotonic / duplicated sequence observed by the consumer
//   2 = intra-record corruption (torn read/write)
//   3 = record accounting mismatch (consumed + dropped != produced)
// Run it under the TSAN build (cmake -DIRONCUB_TSAN=ON) to also prove the
// protocol race-free under ThreadSanitizer.
int ring_stress(size_t capacity, size_t record_len, uint64_t n_records) {
  void* h = ring_create(capacity, record_len);
  auto* r = static_cast<Ring*>(h);
  std::atomic<int> error{0};
  std::atomic<uint64_t> consumed{0};
  std::atomic<bool> producer_done{false};

  std::thread producer([&] {
    std::vector<float> rec(record_len);
    for (uint64_t i = 0; i < n_records; ++i) {
      for (size_t j = 0; j < record_len; ++j)
        rec[j] = float(i % (1u << 22)) + 0.25f * float(j % 3);
      ring_push(h, rec.data());   // full ring -> counted drop, never blocks
    }
    producer_done.store(true, std::memory_order_release);
  });

  std::thread consumer([&] {
    std::vector<float> buf(record_len * 128);
    float last = -1.0f;
    bool have_last = false;
    for (;;) {
      size_t n = ring_pop(h, buf.data(), 128);
      for (size_t k = 0; k < n; ++k) {
        const float* rec = &buf[k * record_len];
        if (have_last && !(rec[0] > last) &&
            !(rec[0] == 0.0f && last > 0.0f)) {  // modulo wrap allowed
          error.store(1, std::memory_order_relaxed);
        }
        for (size_t j = 0; j < record_len; ++j) {
          if (rec[j] != rec[0] + 0.25f * float(j % 3)) {
            error.store(2, std::memory_order_relaxed);
          }
        }
        last = rec[0];
        have_last = true;
      }
      consumed.fetch_add(n, std::memory_order_relaxed);
      if (n == 0 && producer_done.load(std::memory_order_acquire) &&
          ring_size(h) == 0)
        break;
    }
  });

  producer.join();
  consumer.join();
  uint64_t dropped = ring_dropped(h);
  if (error.load() == 0 && consumed.load() + dropped != n_records)
    error.store(3);
  ring_destroy(h);
  return error.load();
}

}  // extern "C"

// Standalone entry point for the TSAN build: `ring_stress_bin N` runs the
// concurrent stress and exits with its error code (plus any TSAN report).
#ifdef IRONCUB_STRESS_MAIN
#include <cstdlib>
int main(int argc, char** argv) {
  uint64_t n = argc > 1 ? std::strtoull(argv[1], nullptr, 10) : 1000000ull;
  int rc = ring_stress(1024, 8, n);
  std::fprintf(stderr, "ring_stress(%llu records) -> %d\n",
               (unsigned long long)n, rc);
  return rc;
}
#endif
