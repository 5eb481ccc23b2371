// Microbenchmark for the split/intern hot path: decomposes
// ht_split_intern cost into (a) pure word-boundary split, (b) split +
// hash, (c) full split + local intern, so optimization work targets the
// real bottleneck.  Build & run:
//   g++ -O3 -march=native -std=c++17 split_bench.cpp -o /tmp/split_bench -pthread
//   /tmp/split_bench /tmp/corpus8.bin /tmp/corpus8.off
#include <chrono>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <cstdlib>
#include <vector>

// pull in the library internals directly
#define HUTOKEN_BENCH_MAIN 1
#include "../src/hutoken_host.cpp"

using Clock = std::chrono::steady_clock;

static double ms_since(Clock::time_point t0) {
  return std::chrono::duration<double, std::milli>(Clock::now() - t0).count();
}

int main(int argc, char** argv) {
  if (argc < 3) return 1;
  FILE* f = fopen(argv[1], "rb");
  fseek(f, 0, SEEK_END);
  long n = ftell(f);
  fseek(f, 0, SEEK_SET);
  std::vector<uint8_t> text(static_cast<size_t>(n), 0);
  if (fread(text.data(), 1, size_t(n), f) != size_t(n)) return 1;
  fclose(f);
  f = fopen(argv[2], "rb");
  fseek(f, 0, SEEK_END);
  long no = ftell(f) / 8;
  fseek(f, 0, SEEK_SET);
  std::vector<int64_t> offs(static_cast<size_t>(no), 0);
  if (fread(offs.data(), 8, size_t(no), f) != size_t(no)) return 1;
  fclose(f);
  int64_t n_docs = no - 1;
  printf("%ld bytes, %lld docs\n", n, (long long)n_docs);

  for (int rep = 0; rep < 3; ++rep) {
    // (a) pure split, single thread
    {
      std::vector<std::pair<int64_t, int64_t>> words;
      words.reserve(2000000);
      auto t0 = Clock::now();
      words.clear();
      split_words(text.data(), size_t(n), words);
      printf("split scalar 1T: %.1f ms (%zu words)\n", ms_since(t0), words.size());
      words.clear();
      t0 = Clock::now();
      split_words_fast(text.data(), size_t(n), words);
      printf("split fast 1T: %.1f ms (%zu words)\n", ms_since(t0), words.size());
      if (rep == 0) {  // verify SIMD == scalar, per document
        std::vector<std::pair<int64_t, int64_t>> a, b;
        size_t bad = 0;
        for (int64_t d = 0; d + 1 < no; ++d) {
          a.clear(); b.clear();
          const uint8_t* doc = text.data() + offs[size_t(d)];
          size_t dn = size_t(offs[size_t(d) + 1] - offs[size_t(d)]);
          split_words(doc, dn, a);
          split_words_fast(doc, dn, b);
          if (a != b) { bad++; if (bad < 3) printf("MISMATCH doc %lld (%zu vs %zu words)\n", (long long)d, a.size(), b.size()); }
        }
        printf("verify: %zu mismatching docs of %lld\n", bad, (long long)(no - 1));
        size_t simd_words = 0;
        std::vector<int32_t> st;
        auto tv = Clock::now();
        for (int64_t d = 0; d + 1 < no; ++d) {
          st.clear();
          const uint8_t* doc = text.data() + offs[size_t(d)];
          size_t dn = size_t(offs[size_t(d) + 1] - offs[size_t(d)]);
          split_starts_hybrid(doc, dn, st);
          simd_words += st.size();
        }
        printf("per-doc hybrid pass: %.1f ms (%zu words)\n",
               ms_since(tv), simd_words);
      }
      std::vector<int32_t> starts;
      starts.reserve(2000000);
      t0 = Clock::now();
      split_starts_hybrid(text.data(), size_t(n), starts);
      printf("starts hybrid 1T: %.1f ms (%zu starts)\n", ms_since(t0), starts.size());
      // hash only via hash_word
      uint64_t acc = 0;
      t0 = Clock::now();
      for (auto& [s, e] : words) acc ^= hash_word(text.data() + s, size_t(e - s));
      printf("hash_word 1T: %.1f ms (acc %llx)\n", ms_since(t0), (unsigned long long)acc);
    }
    // (b) split + hash every word
    {
      std::vector<std::pair<int64_t, int64_t>> words;
      words.reserve(2000000);
      words.clear();
      split_words(text.data(), size_t(n), words);
      auto t0 = Clock::now();
      uint64_t acc = 0;
      for (auto& [s, e] : words)
        acc ^= hash_bytes(text.data() + s, size_t(e - s));
      printf("hash 1T: %.1f ms (acc %llx)\n", ms_since(t0),
             (unsigned long long)acc);
    }
    // (c) full ht_split_intern, as the engine calls it
    {
      Interner* it = ht_interner_create();
      int32_t* wg;
      int64_t* dwo;
      int64_t* noff;
      int32_t* nl;
      auto t0 = Clock::now();
      ht_split_intern(it, text.data(), offs.data(), n_docs, &wg, &dwo, &noff,
                      &nl);
      printf("split_intern cold: %.1f ms (%lld uniq)\n", ms_since(t0),
             (long long)ht_interner_count(it));
      free(wg); free(dwo); free(noff); free(nl);
      t0 = Clock::now();
      ht_split_intern(it, text.data(), offs.data(), n_docs, &wg, &dwo, &noff,
                      &nl);
      printf("split_intern warm: %.1f ms\n", ms_since(t0));
      free(wg); free(dwo); free(noff); free(nl);
      ht_interner_destroy(it);
    }
  }
  return 0;
}
