// Standalone profiling harness for the native whole-stream HE parser.
//
// Usage: profile_parse <reps> <stream.aac>...
//
// Loops hh_parse_he_stream_qwire over the given ADTS streams (the bench
// workload path, codec/batch.QwirePipelinedDecoder._parse_group) so the
// hot host-parse loop can be profiled with gprof / timed standalone,
// without Python or ctypes in the way.
//
// Build (from repo root):
//   g++ -O3 -march=native -ffp-contract=off -fno-math-errno -std=c++17 \
//       -pg -o /tmp/profile_parse tools/profile_parse.cc
// Run + report:
//   cd /tmp && ./profile_parse 50 /tmp/heaac_bench_distinct/s*.aac
//   gprof /tmp/profile_parse /tmp/gmon.out | head -60

#include <chrono>
#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <fstream>
#include <string>
#include <vector>

#include "../heaac_tpu/native/aac_host.cc"

static const int kRates[16] = {96000, 88200, 64000, 48000, 44100, 32000,
                               24000, 22050, 16000, 12000, 11025, 8000,
                               7350,  0,     0,     0};

int main(int argc, char** argv) {
  if (argc < 3) {
    fprintf(stderr, "usage: %s <reps> <stream.aac>...\n", argv[0]);
    return 2;
  }
  int reps = atoi(argv[1]);
  ht_init();  // VLC/codebook tables (native/__init__.py calls this on load)
  std::vector<std::vector<uint8_t>> streams;
  for (int i = 2; i < argc; i++) {
    std::ifstream f(argv[i], std::ios::binary);
    if (!f) { fprintf(stderr, "cannot open %s\n", argv[i]); return 2; }
    streams.emplace_back(std::istreambuf_iterator<char>(f),
                         std::istreambuf_iterator<char>());
  }
  const int T = 64, LANES = 8, RECW = 4, EDGEN = 8;
  std::vector<uint8_t> heap(64 << 20);
  std::vector<int32_t> recs((int64_t)T * LANES * RECW);
  std::vector<int32_t> info(8), cedges(EDGEN * 3);
  std::vector<float> cgains((int64_t)T * EDGEN);

  int64_t total_frames = 0, rep0_frames = 0, rep0_bytes = 0;
  uint64_t hash = 1469598103934665603ull;  // FNV over rep-0 wire output
  auto t0 = std::chrono::steady_clock::now();
  for (int r = 0; r < reps; r++) {
    int64_t cur = 0;
    for (auto& s : streams) {
      int si = (s[2] >> 2) & 0xF;
      int cc = ((s[2] & 1) << 2) | (s[3] >> 6);
      int64_t cur0 = cur;
      int nf = hh_parse_he_stream_qwire(
          s.data(), (int64_t)s.size(), si, kRates[si], cc, heap.data(),
          (int64_t)heap.size(), &cur, recs.data(), T, LANES, 0,
          info.data(), cedges.data(), cgains.data(), EDGEN);
      if (nf < 0) { fprintf(stderr, "parse failed: %d\n", nf); return 1; }
      total_frames += nf;
      if (r == 0) {
        rep0_frames += nf;
        rep0_bytes += (cur - cur0) + (int64_t)nf * RECW * 4;
        for (int64_t k = cur0; k < cur; k++)
          hash = (hash ^ heap[k]) * 1099511628211ull;
        for (size_t k = 0; k < recs.size(); k++)
          hash = (hash ^ (uint64_t)(uint32_t)recs[k]) * 1099511628211ull;
      }
      if (cur > (int64_t)heap.size() - (4 << 20)) cur = 0;
    }
  }
  auto t1 = std::chrono::steady_clock::now();
  double secs = std::chrono::duration<double>(t1 - t0).count();
  printf("%lld frames in %.3fs = %.2f us/frame  (wire hash %016llx, "
         "%.1f B/frame-lane)\n",
         (long long)total_frames, secs, secs / total_frames * 1e6,
         (unsigned long long)hash,
         (double)rep0_bytes / (double)(rep0_frames ? rep0_frames : 1));
#ifdef HH_PROF
  uint64_t ftot = hhprof::cyc[0] ? hhprof::cyc[0] : 1;
  for (int i = 0; i < 32; i++) {
    if (!hhprof::cnt[i]) continue;
    printf("  [%2d] %-22s %12llu cyc  %6.1f%%  %8.1f cyc/call  "
           "(%llu calls, %.0f cyc/frame)\n",
           i, hhprof::names[i], (unsigned long long)hhprof::cyc[i],
           100.0 * hhprof::cyc[i] / ftot,
           (double)hhprof::cyc[i] / hhprof::cnt[i],
           (unsigned long long)hhprof::cnt[i],
           (double)hhprof::cyc[i] / total_frames);
  }
#endif
  return 0;
}
