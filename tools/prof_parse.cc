// Host-parse profiling harness: runs the native whole-stream qwire parse
// (hh_parse_he_stream_qwire, the bench's hot path) in a loop over stream
// files so gprof/perf can attribute time inside the parser.  Build:
//   g++ -O2 -pg -march=native -ffp-contract=off -fno-math-errno \
//       -std=c++17 -o /tmp/prof_parse tools/prof_parse.cc
//   /tmp/prof_parse REPS stream1.aac [stream2.aac ...]
//   gprof /tmp/prof_parse gmon.out | head -40
// (-O2 + -pg: -O3 inlines too aggressively for useful attribution.)
#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <vector>
#include <string>
#include <chrono>

#include "../heaac_tpu/native/aac_host.cc"

static std::vector<uint8_t> slurp(const char* path) {
  FILE* f = fopen(path, "rb");
  if (!f) { perror(path); exit(1); }
  fseek(f, 0, SEEK_END);
  long n = ftell(f);
  fseek(f, 0, SEEK_SET);
  std::vector<uint8_t> v(n);
  if (fread(v.data(), 1, n, f) != (size_t)n) { perror("read"); exit(1); }
  fclose(f);
  return v;
}

int main(int argc, char** argv) {
  if (argc < 3) {
    fprintf(stderr, "usage: %s REPS stream.aac [...]\n", argv[0]);
    return 2;
  }
  int reps = atoi(argv[1]);
  std::vector<std::vector<uint8_t>> streams;
  for (int i = 2; i < argc; i++) streams.push_back(slurp(argv[i]));
  if (ht_init() != 0) { fprintf(stderr, "ht_init failed\n"); return 1; }

  const int MAXF = 4096;
  std::vector<uint8_t> heap(64 << 20);
  std::vector<int32_t> recs((size_t)MAXF * 8 * 8, 0);
  std::vector<int32_t> info(8), cedges(24 * 3);
  std::vector<float> cgains((size_t)MAXF * 24);

  int64_t frames_total = 0;
  auto t0 = std::chrono::steady_clock::now();
  for (int r = 0; r < reps; r++) {
    for (auto& s : streams) {
      // ADTS header: sampling index bits 18-21, chan config bits 23-25
      int si = (s[2] >> 2) & 0xF;
      int cc = ((s[2] & 1) << 2) | (s[3] >> 6);
      static const int rates[] = {96000, 88200, 64000, 48000, 44100,
                                  32000, 24000, 22050, 16000, 12000,
                                  11025, 8000, 7350, 0, 0, 0};
      int64_t cur = 0;
      int n = hh_parse_he_stream_qwire(
          s.data(), (int64_t)s.size(), si, rates[si], cc, heap.data(),
          (int64_t)heap.size(), &cur, recs.data(), MAXF, 8, 0,
          info.data(), cedges.data(), cgains.data(), 24);
      if (n < 0) { fprintf(stderr, "parse rc=%d\n", n); return 1; }
      frames_total += n;
    }
  }
  auto t1 = std::chrono::steady_clock::now();
  double us = std::chrono::duration<double, std::micro>(t1 - t0).count();
  printf("%lld frames in %.1f ms -> %.2f us/frame\n",
         (long long)frames_total, us / 1e3, us / frames_total);
  return 0;
}
