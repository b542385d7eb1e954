// annlib: native CPU retrieval baselines for the rag_cobweb_tpu harness.
//
// Fills the role of the reference's third-party native baselines (FAISS flat
// IP/L2, hnswlib cosine graph — benchmark_utils.py:536-566), neither of which
// is installed in this image.  Exposed through a plain C ABI and loaded from
// Python with ctypes (rag_cobweb_tpu/bench/native.py).
//
// Contents:
//   * flat exact top-k (inner-product / L2 / cosine), multithreaded over
//     queries;
//   * a compact HNSW implementation (Malkov & Yashunin 2016): multi-layer
//     greedy descent + ef-bounded best-first search at layer 0, heuristic
//     neighbor selection, cosine or inner-product metric.
//
// Build: make -C native  (produces libannlib.so)

#include <algorithm>
#include <atomic>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <functional>
#include <memory>
#include <mutex>
#include <queue>
#include <random>
#include <thread>
#include <vector>

namespace {

// SIMD distance kernels.  -O3 alone cannot vectorize these: strict FP
// forbids reassociating the accumulation chain, so the scalar loop
// serializes one FMA per cycle.  Explicit intrinsics with 4 independent
// accumulators run at load bandwidth (~16x scalar at d=768 on AVX-512).
#if defined(__AVX512F__)
#include <immintrin.h>

inline float dot(const float* a, const float* b, int d) {
  __m512 s0 = _mm512_setzero_ps(), s1 = _mm512_setzero_ps();
  __m512 s2 = _mm512_setzero_ps(), s3 = _mm512_setzero_ps();
  int i = 0;
  for (; i + 64 <= d; i += 64) {
    s0 = _mm512_fmadd_ps(_mm512_loadu_ps(a + i), _mm512_loadu_ps(b + i), s0);
    s1 = _mm512_fmadd_ps(_mm512_loadu_ps(a + i + 16), _mm512_loadu_ps(b + i + 16), s1);
    s2 = _mm512_fmadd_ps(_mm512_loadu_ps(a + i + 32), _mm512_loadu_ps(b + i + 32), s2);
    s3 = _mm512_fmadd_ps(_mm512_loadu_ps(a + i + 48), _mm512_loadu_ps(b + i + 48), s3);
  }
  for (; i + 16 <= d; i += 16)
    s0 = _mm512_fmadd_ps(_mm512_loadu_ps(a + i), _mm512_loadu_ps(b + i), s0);
  if (i < d) {
    __mmask16 m = (__mmask16)((1u << (d - i)) - 1);
    s1 = _mm512_fmadd_ps(_mm512_maskz_loadu_ps(m, a + i),
                         _mm512_maskz_loadu_ps(m, b + i), s1);
  }
  return _mm512_reduce_add_ps(
      _mm512_add_ps(_mm512_add_ps(s0, s1), _mm512_add_ps(s2, s3)));
}

inline float l2sq(const float* a, const float* b, int d) {
  __m512 s0 = _mm512_setzero_ps(), s1 = _mm512_setzero_ps();
  __m512 s2 = _mm512_setzero_ps(), s3 = _mm512_setzero_ps();
  int i = 0;
  for (; i + 64 <= d; i += 64) {
    __m512 t0 = _mm512_sub_ps(_mm512_loadu_ps(a + i), _mm512_loadu_ps(b + i));
    __m512 t1 = _mm512_sub_ps(_mm512_loadu_ps(a + i + 16), _mm512_loadu_ps(b + i + 16));
    __m512 t2 = _mm512_sub_ps(_mm512_loadu_ps(a + i + 32), _mm512_loadu_ps(b + i + 32));
    __m512 t3 = _mm512_sub_ps(_mm512_loadu_ps(a + i + 48), _mm512_loadu_ps(b + i + 48));
    s0 = _mm512_fmadd_ps(t0, t0, s0);
    s1 = _mm512_fmadd_ps(t1, t1, s1);
    s2 = _mm512_fmadd_ps(t2, t2, s2);
    s3 = _mm512_fmadd_ps(t3, t3, s3);
  }
  for (; i + 16 <= d; i += 16) {
    __m512 t = _mm512_sub_ps(_mm512_loadu_ps(a + i), _mm512_loadu_ps(b + i));
    s0 = _mm512_fmadd_ps(t, t, s0);
  }
  if (i < d) {
    __mmask16 m = (__mmask16)((1u << (d - i)) - 1);
    __m512 t = _mm512_sub_ps(_mm512_maskz_loadu_ps(m, a + i),
                             _mm512_maskz_loadu_ps(m, b + i));
    s1 = _mm512_fmadd_ps(t, t, s1);
  }
  return _mm512_reduce_add_ps(
      _mm512_add_ps(_mm512_add_ps(s0, s1), _mm512_add_ps(s2, s3)));
}

#elif defined(__AVX2__) && defined(__FMA__)
#include <immintrin.h>

inline float hsum8(__m256 v) {
  __m128 lo = _mm256_castps256_ps128(v);
  __m128 hi = _mm256_extractf128_ps(v, 1);
  lo = _mm_add_ps(lo, hi);
  lo = _mm_hadd_ps(lo, lo);
  lo = _mm_hadd_ps(lo, lo);
  return _mm_cvtss_f32(lo);
}

inline float dot(const float* a, const float* b, int d) {
  __m256 s0 = _mm256_setzero_ps(), s1 = _mm256_setzero_ps();
  __m256 s2 = _mm256_setzero_ps(), s3 = _mm256_setzero_ps();
  int i = 0;
  for (; i + 32 <= d; i += 32) {
    s0 = _mm256_fmadd_ps(_mm256_loadu_ps(a + i), _mm256_loadu_ps(b + i), s0);
    s1 = _mm256_fmadd_ps(_mm256_loadu_ps(a + i + 8), _mm256_loadu_ps(b + i + 8), s1);
    s2 = _mm256_fmadd_ps(_mm256_loadu_ps(a + i + 16), _mm256_loadu_ps(b + i + 16), s2);
    s3 = _mm256_fmadd_ps(_mm256_loadu_ps(a + i + 24), _mm256_loadu_ps(b + i + 24), s3);
  }
  for (; i + 8 <= d; i += 8)
    s0 = _mm256_fmadd_ps(_mm256_loadu_ps(a + i), _mm256_loadu_ps(b + i), s0);
  float s = hsum8(_mm256_add_ps(_mm256_add_ps(s0, s1), _mm256_add_ps(s2, s3)));
  for (; i < d; ++i) s += a[i] * b[i];
  return s;
}

inline float l2sq(const float* a, const float* b, int d) {
  __m256 s0 = _mm256_setzero_ps(), s1 = _mm256_setzero_ps();
  int i = 0;
  for (; i + 16 <= d; i += 16) {
    __m256 t0 = _mm256_sub_ps(_mm256_loadu_ps(a + i), _mm256_loadu_ps(b + i));
    __m256 t1 = _mm256_sub_ps(_mm256_loadu_ps(a + i + 8), _mm256_loadu_ps(b + i + 8));
    s0 = _mm256_fmadd_ps(t0, t0, s0);
    s1 = _mm256_fmadd_ps(t1, t1, s1);
  }
  for (; i + 8 <= d; i += 8) {
    __m256 t = _mm256_sub_ps(_mm256_loadu_ps(a + i), _mm256_loadu_ps(b + i));
    s0 = _mm256_fmadd_ps(t, t, s0);
  }
  float s = hsum8(_mm256_add_ps(s0, s1));
  for (; i < d; ++i) {
    float t = a[i] - b[i];
    s += t * t;
  }
  return s;
}

#else

inline float dot(const float* a, const float* b, int d) {
  float s = 0.f;
  for (int i = 0; i < d; ++i) s += a[i] * b[i];
  return s;
}

inline float l2sq(const float* a, const float* b, int d) {
  float s = 0.f;
  for (int i = 0; i < d; ++i) {
    float t = a[i] - b[i];
    s += t * t;
  }
  return s;
}

#endif

void parallel_for(int64_t n, int threads, const std::function<void(int64_t)>& fn) {
  if (threads <= 1 || n < 2) {
    for (int64_t i = 0; i < n; ++i) fn(i);
    return;
  }
  std::atomic<int64_t> next(0);
  std::vector<std::thread> pool;
  int t = std::min<int64_t>(threads, n);
  pool.reserve(t);
  for (int j = 0; j < t; ++j) {
    pool.emplace_back([&] {
      for (;;) {
        int64_t i = next.fetch_add(1);
        if (i >= n) return;
        fn(i);
      }
    });
  }
  for (auto& th : pool) th.join();
}

// ------------------------------------------------------------------ //
// HNSW                                                               //
// ------------------------------------------------------------------ //

struct HnswIndex {
  int dim = 0;
  int M = 16;                    // max neighbors per node (layer > 0)
  int M0 = 32;                   // max neighbors at layer 0
  int ef_construction = 100;
  int ef_search = 50;
  bool cosine = true;
  int max_level = -1;
  int64_t entry = -1;
  std::vector<float> data;                 // normalized if cosine
  std::vector<int> levels;                 // level per node
  // adjacency: per level, per node, fixed slots (-1 empty)
  std::vector<std::vector<int64_t>> links; // links[l][node*cap + j]
  std::mt19937_64 rng{0x5eed};
  std::mutex mtx;  // guards entry/max_level only
  // Striped per-node locks for concurrent builds (hnswlib-style): each
  // link() mutates exactly ONE node's adjacency row, so one stripe lock
  // per call suffices — no nested locking, no deadlock, and concurrent
  // inserts touching different nodes no longer serialize on one mutex.
  static constexpr int64_t kLockStripes = 4096;  // power of two
  std::unique_ptr<std::mutex[]> node_locks{new std::mutex[kLockStripes]};

  std::mutex& lock_for(int64_t node) {
    return node_locks[node & (kLockStripes - 1)];
  }

  int64_t size() const { return levels.size(); }

  const float* vec(int64_t i) const { return data.data() + i * dim; }

  float dist(const float* a, const float* b) const {
    // smaller = closer
    return -dot(a, b, dim);  // vectors pre-normalized for cosine
  }

  int cap(int level) const { return level == 0 ? M0 : M; }

  int random_level() {
    std::uniform_real_distribution<double> u(0.0, 1.0);
    double r = u(rng);
    double ml = 1.0 / std::log(std::max(2, M));
    return static_cast<int>(-std::log(std::max(r, 1e-12)) * ml);
  }

  using Cand = std::pair<float, int64_t>;  // (dist, id)

  // best-first search at one layer; returns up to ef closest (max-heap)
  std::priority_queue<Cand> search_layer(const float* q, int64_t ep,
                                         int level, int ef) const {
    std::vector<uint8_t> visited(size(), 0);
    std::priority_queue<Cand, std::vector<Cand>, std::greater<Cand>> cands;
    std::priority_queue<Cand> best;  // max-heap on dist: top = worst kept
    float d0 = dist(q, vec(ep));
    cands.emplace(d0, ep);
    best.emplace(d0, ep);
    visited[ep] = 1;
    while (!cands.empty()) {
      auto [d, v] = cands.top();
      if (d > best.top().first && (int)best.size() >= ef) break;
      cands.pop();
      const int c = cap(level);
      const int64_t* nb = links[level].data() + v * c;
      for (int j = 0; j < c; ++j) {
        int64_t u = nb[j];
        if (u < 0 || visited[u]) continue;
        visited[u] = 1;
        float du = dist(q, vec(u));
        if ((int)best.size() < ef || du < best.top().first) {
          cands.emplace(du, u);
          best.emplace(du, u);
          if ((int)best.size() > ef) best.pop();
        }
      }
    }
    return best;
  }

  // heuristic neighbor selection (keep diverse close neighbors)
  std::vector<int64_t> select_neighbors(const float* q,
                                        std::vector<Cand> cands, int m) const {
    std::sort(cands.begin(), cands.end());
    std::vector<int64_t> out;
    for (auto& [d, v] : cands) {
      if ((int)out.size() >= m) break;
      bool ok = true;
      for (int64_t w : out) {
        if (dist(vec(v), vec(w)) < d) { ok = false; break; }
      }
      if (ok) out.push_back(v);
    }
    // backfill with closest if the heuristic was too strict
    for (auto& [d, v] : cands) {
      if ((int)out.size() >= m) break;
      if (std::find(out.begin(), out.end(), v) == out.end())
        out.push_back(v);
    }
    return out;
  }

  void link(int level, int64_t a, int64_t b) {
    const int c = cap(level);
    int64_t* nb = links[level].data() + a * c;
    for (int j = 0; j < c; ++j) {
      if (nb[j] < 0) { nb[j] = b; return; }
    }
    // full: re-select among existing + b
    std::vector<Cand> cands;
    cands.reserve(c + 1);
    for (int j = 0; j < c; ++j) cands.emplace_back(dist(vec(a), vec(nb[j])), nb[j]);
    cands.emplace_back(dist(vec(a), vec(b)), b);
    auto sel = select_neighbors(vec(a), cands, c);
    for (int j = 0; j < c; ++j) nb[j] = j < (int)sel.size() ? sel[j] : -1;
  }

  void ensure_levels(int level, int64_t n_nodes) {
    while ((int)links.size() <= level) {
      int l = links.size();
      links.emplace_back();
      links[l].assign(n_nodes * cap(l), -1);
    }
    for (int l = 0; l < (int)links.size(); ++l) {
      links[l].resize(n_nodes * cap(l), -1);
    }
  }

  void add(const float* x, int64_t id, int level) {
    {
      std::lock_guard<std::mutex> g(mtx);
      if (entry < 0) {
        entry = id;
        max_level = level;
        return;
      }
    }
    int64_t ep = entry;
    // greedy descent through upper layers
    for (int l = max_level; l > level; --l) {
      bool improved = true;
      float d = dist(x, vec(ep));
      while (improved) {
        improved = false;
        const int c = cap(l);
        const int64_t* nb = links[l].data() + ep * c;
        for (int j = 0; j < c; ++j) {
          if (nb[j] < 0) continue;
          float dn = dist(x, vec(nb[j]));
          if (dn < d) { d = dn; ep = nb[j]; improved = true; }
        }
      }
    }
    // insert at layers min(level, max_level)..0
    for (int l = std::min(level, max_level); l >= 0; --l) {
      auto best = search_layer(x, ep, l, ef_construction);
      std::vector<Cand> cands;
      while (!best.empty()) { cands.push_back(best.top()); best.pop(); }
      auto sel = select_neighbors(x, cands, cap(l));
      ep = sel.empty() ? ep : sel[0];
      for (int64_t v : sel) {
        {
          std::lock_guard<std::mutex> g(lock_for(id));
          link(l, id, v);
        }
        {
          std::lock_guard<std::mutex> g(lock_for(v));
          link(l, v, id);
        }
      }
    }
    if (level > max_level) {
      std::lock_guard<std::mutex> g(mtx);
      max_level = level;
      entry = id;
    }
  }

  void search(const float* q, int k, int64_t* out_ids, float* out_scores) const {
    if (entry < 0) {
      for (int i = 0; i < k; ++i) { out_ids[i] = -1; out_scores[i] = 0.f; }
      return;
    }
    int64_t ep = entry;
    for (int l = max_level; l > 0; --l) {
      bool improved = true;
      float d = dist(q, vec(ep));
      while (improved) {
        improved = false;
        const int c = cap(l);
        const int64_t* nb = links[l].data() + ep * c;
        for (int j = 0; j < c; ++j) {
          if (nb[j] < 0) continue;
          float dn = dist(q, vec(nb[j]));
          if (dn < d) { d = dn; ep = nb[j]; improved = true; }
        }
      }
    }
    auto best = search_layer(q, ep, 0, std::max(ef_search, k));
    std::vector<Cand> res;
    while (!best.empty()) { res.push_back(best.top()); best.pop(); }
    std::sort(res.begin(), res.end());
    for (int i = 0; i < k; ++i) {
      if (i < (int)res.size()) {
        out_ids[i] = res[i].second;
        out_scores[i] = -res[i].first;  // back to similarity
      } else {
        out_ids[i] = -1;
        out_scores[i] = 0.f;
      }
    }
  }
};

}  // namespace

extern "C" {

// ---------------- flat exact top-k ----------------
// metric: 0 = inner product, 1 = L2 (returns negative distance), 2 = cosine
void ann_flat_topk(const float* corpus, int64_t n, int dim,
                   const float* queries, int64_t nq, int k, int metric,
                   int threads, int64_t* out_ids, float* out_scores) {
  std::vector<float> norms;
  if (metric == 2) {
    norms.resize(n);
    for (int64_t i = 0; i < n; ++i)
      norms[i] = 1.f / std::max(1e-12f, std::sqrt(dot(corpus + i * dim,
                                                      corpus + i * dim, dim)));
  }
  // Corpus-blocked scan: with a query-outer loop every query re-streams
  // the whole corpus through DRAM (nq x the traffic).  Instead each
  // thread owns a TILE of queries and walks the corpus in L2-sized
  // blocks, so one block load is amortized across the whole tile.
  const int64_t kBlockBytes = 512 << 10;  // ~half a typical L2
  const int64_t block_rows =
      std::max<int64_t>(1, kBlockBytes / (int64_t)(dim * sizeof(float)));
  const int64_t tile_q = 32;
  const int64_t n_tiles = (nq + tile_q - 1) / tile_q;
  parallel_for(n_tiles, threads, [&](int64_t ti) {
    const int64_t q0 = ti * tile_q;
    const int64_t q1 = std::min(nq, q0 + tile_q);
    const int nt = (int)(q1 - q0);
    using P = std::pair<float, int64_t>;
    using Heap = std::priority_queue<P, std::vector<P>, std::greater<P>>;
    std::vector<Heap> heaps(nt);  // min-heaps
    std::vector<float> qns(nt, 1.f);
    if (metric == 2) {
      for (int j = 0; j < nt; ++j) {
        const float* q = queries + (q0 + j) * dim;
        qns[j] = 1.f / std::max(1e-12f, std::sqrt(dot(q, q, dim)));
      }
    }
    for (int64_t b = 0; b < n; b += block_rows) {
      const int64_t be = std::min(n, b + block_rows);
      for (int j = 0; j < nt; ++j) {
        const float* q = queries + (q0 + j) * dim;
        const float qn = qns[j];
        Heap& heap = heaps[j];
        for (int64_t i = b; i < be; ++i) {
          float s;
          if (metric == 1) s = -l2sq(q, corpus + i * dim, dim);
          else if (metric == 2) s = dot(q, corpus + i * dim, dim) * qn * norms[i];
          else s = dot(q, corpus + i * dim, dim);
          if ((int)heap.size() < k) heap.emplace(s, i);
          else if (s > heap.top().first) { heap.pop(); heap.emplace(s, i); }
        }
      }
    }
    for (int j = 0; j < nt; ++j) {
      const int64_t qi = q0 + j;
      std::vector<P> res;
      Heap& heap = heaps[j];
      while (!heap.empty()) { res.push_back(heap.top()); heap.pop(); }
      std::sort(res.rbegin(), res.rend());
      for (int i = 0; i < k; ++i) {
        if (i < (int)res.size()) {
          out_ids[qi * k + i] = res[i].second;
          out_scores[qi * k + i] = res[i].first;
        } else {
          out_ids[qi * k + i] = -1;
          out_scores[qi * k + i] = 0.f;
        }
      }
    }
  });
}

// ---------------- HNSW ----------------
void* ann_hnsw_create(int dim, int M, int ef_construction, int ef_search,
                      int cosine) {
  auto* idx = new HnswIndex();
  idx->dim = dim;
  idx->M = M;
  idx->M0 = 2 * M;
  idx->ef_construction = ef_construction;
  idx->ef_search = ef_search;
  idx->cosine = cosine != 0;
  return idx;
}

void ann_hnsw_add(void* handle, const float* xs, int64_t n) {
  auto* idx = static_cast<HnswIndex*>(handle);
  int64_t start = idx->size();
  idx->data.resize((start + n) * idx->dim);
  idx->levels.resize(start + n, 0);
  for (int64_t i = 0; i < n; ++i) {
    float* dst = idx->data.data() + (start + i) * idx->dim;
    std::memcpy(dst, xs + i * idx->dim, idx->dim * sizeof(float));
    if (idx->cosine) {
      float nm = std::sqrt(dot(dst, dst, idx->dim));
      if (nm > 1e-12f)
        for (int d = 0; d < idx->dim; ++d) dst[d] /= nm;
    }
  }
  // Pre-draw levels and pre-size every adjacency vector (no reallocation
  // during the concurrent phase), seed the graph sequentially, then insert
  // in parallel: searches run lock-free against the evolving graph; link
  // mutations take the index mutex — hnswlib-style concurrent build with
  // coarser locking.
  std::vector<int> new_levels(n);
  int top = std::max(idx->max_level, 0);
  for (int64_t i = 0; i < n; ++i) {
    new_levels[i] = idx->random_level();
    idx->levels[start + i] = new_levels[i];
    top = std::max(top, new_levels[i]);
  }
  idx->ensure_levels(top, start + n);
  int64_t seed_n = std::min<int64_t>(n, idx->entry < 0 ? 128 : 0);
  for (int64_t i = 0; i < seed_n; ++i)
    idx->add(idx->vec(start + i), start + i, new_levels[i]);
  int threads = std::max(1u, std::thread::hardware_concurrency());
  parallel_for(n - seed_n, threads, [&](int64_t j) {
    int64_t i = start + seed_n + j;
    idx->add(idx->vec(i), i, new_levels[seed_n + j]);
  });
}

void ann_hnsw_search(void* handle, const float* queries, int64_t nq, int k,
                     int threads, int64_t* out_ids, float* out_scores) {
  auto* idx = static_cast<HnswIndex*>(handle);
  std::vector<float> qbuf;
  const float* qdata = queries;
  if (idx->cosine) {
    qbuf.assign(queries, queries + nq * idx->dim);
    for (int64_t i = 0; i < nq; ++i) {
      float* q = qbuf.data() + i * idx->dim;
      float nm = std::sqrt(dot(q, q, idx->dim));
      if (nm > 1e-12f)
        for (int d = 0; d < idx->dim; ++d) q[d] /= nm;
    }
    qdata = qbuf.data();
  }
  parallel_for(nq, threads, [&](int64_t qi) {
    idx->search(qdata + qi * idx->dim, k, out_ids + qi * k,
                out_scores + qi * k);
  });
}

void ann_hnsw_set_ef(void* handle, int ef) {
  static_cast<HnswIndex*>(handle)->ef_search = ef;
}

int64_t ann_hnsw_size(void* handle) {
  return static_cast<HnswIndex*>(handle)->size();
}

void ann_hnsw_free(void* handle) {
  delete static_cast<HnswIndex*>(handle);
}

}  // extern "C"
