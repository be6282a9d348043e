// ThreadSanitizer driver for the native sampler (SURVEY.md §5 "Race
// detection"): builds a toy KG index in-process and hammers okst_sample
// with 8 threads over shared output buffers for many iterations. The
// sampler's safety argument is design-by-disjointness (each thread writes
// only its own batch slice; per-thread RNG streams; the shared Store is
// read-only after create) — this binary lets TSan check the argument
// instead of trusting it. Any data race aborts with a report (exit != 0).
//
// Build + run:  make tsan-check     (native/Makefile)
// The sampler TU is compiled INTO this binary with -fsanitize=thread — a
// tsan shared library cannot dlopen into an uninstrumented python.

#include <algorithm>
#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <map>
#include <tuple>
#include <vector>

extern "C" {
void* okst_create(const int32_t*, const int32_t*, const int32_t*, int64_t,
                  const int32_t*, const int32_t*, const int32_t*,
                  const int32_t*, const int32_t*, const int32_t*,
                  const int32_t*, int64_t, const int32_t*, int64_t,
                  const float*, int32_t, int32_t, int32_t);
void okst_destroy(void*);
void okst_sample(void*, uint64_t, int32_t, int32_t, int32_t, int32_t,
                 int64_t, int64_t, int32_t*, int32_t*, int32_t*, float*);
}

namespace {
uint64_t rng_state = 42;
uint64_t nextr() {
  rng_state += 0x9e3779b97f4a7c15ull;
  uint64_t z = rng_state;
  z = (z ^ (z >> 30)) * 0xbf58476d1ce4e5b9ull;
  z = (z ^ (z >> 27)) * 0x94d049bb133111ebull;
  return z ^ (z >> 31);
}
}  // namespace

int main() {
  const int32_t n_ent = 500, n_rel = 8;
  const int64_t n_train = 6000;

  // random triples, then group adjacency like data/index.py: sorted tail
  // lists per (h, r), head lists per (t, r), rel lists per (h, t), each
  // stored as strictly-increasing complement offsets adj[i] = val[i] - i
  std::vector<int32_t> h(n_train), t(n_train), r(n_train);
  std::map<std::pair<int32_t, int32_t>, std::vector<int32_t>> hr, tr;
  std::map<std::pair<int32_t, int32_t>, std::vector<int32_t>> ht;
  for (int64_t i = 0; i < n_train; ++i) {
    h[i] = (int32_t)(nextr() % n_ent);
    t[i] = (int32_t)(nextr() % n_ent);
    r[i] = (int32_t)(nextr() % n_rel);
    hr[{h[i], r[i]}].push_back(t[i]);
    tr[{t[i], r[i]}].push_back(h[i]);
    ht[{h[i], t[i]}].push_back(r[i]);
  }
  auto build = [](std::map<std::pair<int32_t, int32_t>,
                           std::vector<int32_t>>& groups,
                  std::vector<int32_t>& adj,
                  std::map<std::pair<int32_t, int32_t>,
                           std::pair<int32_t, int32_t>>& where) {
    for (auto& kv : groups) {
      auto& v = kv.second;
      std::sort(v.begin(), v.end());
      v.erase(std::unique(v.begin(), v.end()), v.end());
      where[kv.first] = {(int32_t)adj.size(), (int32_t)v.size()};
      for (size_t i = 0; i < v.size(); ++i)
        adj.push_back(v[i] - (int32_t)i);
    }
  };
  std::vector<int32_t> hr_adj, tr_adj, ht_adj;
  std::map<std::pair<int32_t, int32_t>, std::pair<int32_t, int32_t>> hrw,
      trw, htw;
  build(hr, hr_adj, hrw);
  build(tr, tr_adj, trw);
  build(ht, ht_adj, htw);

  // per-triple windows; tr offsets are shifted past hr in the shared
  // ent_adj array (sampling/host.py does the same)
  std::vector<int32_t> hr_off(n_train), hr_cnt(n_train), tr_off(n_train),
      tr_cnt(n_train), ht_off(n_train), ht_cnt(n_train);
  for (int64_t i = 0; i < n_train; ++i) {
    auto a = hrw[{h[i], r[i]}];
    hr_off[i] = a.first; hr_cnt[i] = a.second;
    auto b = trw[{t[i], r[i]}];
    tr_off[i] = b.first + (int32_t)hr_adj.size(); tr_cnt[i] = b.second;
    auto c = htw[{h[i], t[i]}];
    ht_off[i] = c.first; ht_cnt[i] = c.second;
  }
  std::vector<int32_t> ent_adj(hr_adj);
  ent_adj.insert(ent_adj.end(), tr_adj.begin(), tr_adj.end());
  std::vector<float> p(n_rel, 0.5f);

  void* st = okst_create(h.data(), t.data(), r.data(), n_train,
                         hr_off.data(), hr_cnt.data(), tr_off.data(),
                         tr_cnt.data(), ht_off.data(), ht_cnt.data(),
                         ent_adj.data(), (int64_t)ent_adj.size(),
                         ht_adj.data(), (int64_t)ht_adj.size(), p.data(),
                         n_ent, n_rel, /*n_threads=*/8);

  const int32_t batch = 512, neg_e = 2, neg_r = 1;
  const int64_t n = (int64_t)batch * (1 + neg_e + neg_r);
  std::vector<int32_t> oh(n), ot(n), orr(n);
  std::vector<float> oy(n);
  int64_t checksum = 0;
  for (int iter = 0; iter < 200; ++iter) {
    okst_sample(st, 1000 + iter, batch, neg_e, neg_r, /*bern=*/1, 0, 0,
                oh.data(), ot.data(), orr.data(), oy.data());
    for (int64_t i = 0; i < n; ++i) {
      if (oh[i] < 0 || oh[i] >= n_ent || ot[i] < 0 || ot[i] >= n_ent ||
          orr[i] < 0 || orr[i] >= n_rel) {
        std::fprintf(stderr, "out-of-range sample at %lld\n",
                     (long long)i);
        return 2;
      }
      checksum += oh[i] + ot[i] + orr[i];
    }
  }
  okst_destroy(st);
  std::printf("tsan driver OK (checksum %lld)\n", (long long)checksum);
  return 0;
}
