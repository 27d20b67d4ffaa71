// como_runtime: native runtime primitives for the pipelined engine.
//
// Equivalent-of: the reference's torch.multiprocessing TupleTensorQueue
// layer (como/utils/multiprocessing.py) — bounded queues with blocking
// push/pop, drop-stale pop, shutdown wakeups — plus a monotonic pacing
// clock for real-time frame scheduling (reference ComoMp.py:97-110).
//
// Design: a fixed-capacity MPMC ring of 64-bit opaque tokens guarded by a
// pthread mutex + condvars.  Python keeps a token -> object registry; the
// native side never touches Python objects, so no GIL interaction and the
// queue operations can block without holding the interpreter.  Built as a
// plain shared library, bound via ctypes (no pybind11 in this image).

#include <cstdint>
#include <cstdlib>
#include <ctime>
#include <pthread.h>

namespace {

struct Ring {
  uint64_t* buf;
  int capacity;
  int head;   // next pop position
  int count;
  bool closed;
  pthread_mutex_t mu;
  pthread_cond_t not_empty;
  pthread_cond_t not_full;
};

inline void timespec_in_ms(timespec* ts, long ms) {
  clock_gettime(CLOCK_REALTIME, ts);
  ts->tv_sec += ms / 1000;
  ts->tv_nsec += (ms % 1000) * 1000000L;
  if (ts->tv_nsec >= 1000000000L) {
    ts->tv_sec += 1;
    ts->tv_nsec -= 1000000000L;
  }
}

}  // namespace

extern "C" {

void* crq_create(int capacity) {
  Ring* q = new Ring();
  q->buf = new uint64_t[capacity];
  q->capacity = capacity;
  q->head = 0;
  q->count = 0;
  q->closed = false;
  pthread_mutex_init(&q->mu, nullptr);
  pthread_cond_init(&q->not_empty, nullptr);
  pthread_cond_init(&q->not_full, nullptr);
  return q;
}

void crq_destroy(void* h) {
  Ring* q = static_cast<Ring*>(h);
  pthread_mutex_destroy(&q->mu);
  pthread_cond_destroy(&q->not_empty);
  pthread_cond_destroy(&q->not_full);
  delete[] q->buf;
  delete q;
}

// Push a token.  block=1: wait for space (until closed).  block=0 with a
// full queue: drops the OLDEST entry to make room (drop-stale producer
// semantics) and returns it so the caller can release the object;
// returns -1 (as u64) when nothing was dropped.  Returns -2 if closed.
int64_t crq_push(void* h, uint64_t token, int block, long timeout_ms) {
  Ring* q = static_cast<Ring*>(h);
  pthread_mutex_lock(&q->mu);
  int64_t dropped = -1;
  if (block) {
    while (q->count == q->capacity && !q->closed) {
      if (timeout_ms > 0) {
        timespec ts;
        timespec_in_ms(&ts, timeout_ms);
        if (pthread_cond_timedwait(&q->not_full, &q->mu, &ts) != 0) break;
      } else {
        pthread_cond_wait(&q->not_full, &q->mu);
      }
    }
    if (q->closed || q->count == q->capacity) {
      pthread_mutex_unlock(&q->mu);
      return -2;
    }
  } else if (q->count == q->capacity) {
    dropped = static_cast<int64_t>(q->buf[q->head]);
    q->head = (q->head + 1) % q->capacity;
    q->count--;
  }
  q->buf[(q->head + q->count) % q->capacity] = token;
  q->count++;
  pthread_cond_signal(&q->not_empty);
  pthread_mutex_unlock(&q->mu);
  return dropped;
}

// Pop one token; timeout_ms < 0 waits forever.  Returns -1 on timeout /
// empty-after-close.
int64_t crq_pop(void* h, long timeout_ms) {
  Ring* q = static_cast<Ring*>(h);
  pthread_mutex_lock(&q->mu);
  while (q->count == 0 && !q->closed) {
    if (timeout_ms >= 0) {
      timespec ts;
      timespec_in_ms(&ts, timeout_ms);
      if (pthread_cond_timedwait(&q->not_empty, &q->mu, &ts) != 0) break;
    } else {
      pthread_cond_wait(&q->not_empty, &q->mu);
    }
  }
  int64_t out = -1;
  if (q->count > 0) {
    out = static_cast<int64_t>(q->buf[q->head]);
    q->head = (q->head + 1) % q->capacity;
    q->count--;
    pthread_cond_signal(&q->not_full);
  }
  pthread_mutex_unlock(&q->mu);
  return out;
}

// Drain the queue and return only the newest token (reference
// pop_until_latest drop-stale semantics).  Older tokens are written to
// `stale_out` (size >= capacity) and their count to *n_stale so the
// caller can release them.  -1 when nothing available.
int64_t crq_pop_latest(void* h, long timeout_ms, uint64_t* stale_out,
                       int* n_stale) {
  Ring* q = static_cast<Ring*>(h);
  pthread_mutex_lock(&q->mu);
  if (q->count == 0 && !q->closed && timeout_ms != 0) {
    timespec ts;
    timespec_in_ms(&ts, timeout_ms < 0 ? 3600000 : timeout_ms);
    pthread_cond_timedwait(&q->not_empty, &q->mu, &ts);
  }
  int64_t out = -1;
  int n = 0;
  while (q->count > 0) {
    uint64_t tok = q->buf[q->head];
    q->head = (q->head + 1) % q->capacity;
    q->count--;
    if (q->count == 0) {
      out = static_cast<int64_t>(tok);
    } else {
      stale_out[n++] = tok;
    }
  }
  *n_stale = n;
  if (out >= 0) pthread_cond_broadcast(&q->not_full);
  pthread_mutex_unlock(&q->mu);
  return out;
}

int crq_size(void* h) {
  Ring* q = static_cast<Ring*>(h);
  pthread_mutex_lock(&q->mu);
  int n = q->count;
  pthread_mutex_unlock(&q->mu);
  return n;
}

void crq_close(void* h) {
  Ring* q = static_cast<Ring*>(h);
  pthread_mutex_lock(&q->mu);
  q->closed = true;
  pthread_cond_broadcast(&q->not_empty);
  pthread_cond_broadcast(&q->not_full);
  pthread_mutex_unlock(&q->mu);
}

// Monotonic clock helpers for real-time pacing.
double crt_now() {
  timespec ts;
  clock_gettime(CLOCK_MONOTONIC, &ts);
  return ts.tv_sec + 1e-9 * ts.tv_nsec;
}

void crt_sleep_until(double t_mono) {
  timespec ts;
  ts.tv_sec = static_cast<time_t>(t_mono);
  ts.tv_nsec = static_cast<long>((t_mono - ts.tv_sec) * 1e9);
  clock_nanosleep(CLOCK_MONOTONIC, TIMER_ABSTIME, &ts, nullptr);
}

}  // extern "C"
