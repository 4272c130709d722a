// Native host front-end: AAC-LC individual_channel_stream parsing.
//
// This is the performance-critical half of the host side — the analogue of
// the reference's get_bits.h bit reader + aacdec.c syntax/VLC/dequant layer
// (spectral Huffman decode is the one inherently serial loop of the codec,
// SURVEY.md §3.5).  Behavior contract matches the Python reference
// implementation in heaac_tpu/bitstream/aac_syntax.py bit for bit; the
// Python layer remains the orchestrator (ADTS framing, elements, SBR/PS
// side info) and calls in here per SCE/CPE via ctypes.
//
// Scaling contract: "no-bias" flavor (sf_offset=60) — float spectra arrive
// at the device pre-scaled so PCM lands in +/-32768.
#include <cmath>
#include <cstdint>
#include <cstring>

#include "tables.inc"

// Optional cycle-level stage profiler (the analogue of the reference's
// START_TIMER/STOP_TIMER rdtsc macros, libavutil/timer.h).  Zero-cost
// unless the TU is built with -DHH_PROF (tools/profile_parse.cc does;
// the production .so never defines it).
#ifdef HH_PROF
#include <x86intrin.h>
namespace hhprof {
inline uint64_t cyc[32], cnt[32];
inline const char* names[32];
struct Scope {
  int i;
  uint64_t s;
  Scope(int i, const char* n) : i(i), s(__rdtsc()) { names[i] = n; }
  ~Scope() {
    cyc[i] += __rdtsc() - s;
    cnt[i]++;
  }
};
}  // namespace hhprof
#define HH_PROF_SCOPE(i, name) hhprof::Scope hh_prof_scope_##i(i, name)
#else
#define HH_PROF_SCOPE(i, name)
#endif

namespace {

// ---------------------------------------------------------------- bits ----
struct Bits {
  const uint8_t* buf;
  int64_t nbits;
  int64_t pos;
};

static inline uint32_t showbits(const Bits& b, int n) {
  // MSB-first peek of up to 25 bits.  Fast path: one unaligned 64-bit
  // load + byteswap (the analogue of the reference's UPDATE_CACHE,
  // get_bits.h:131); byte-wise fallback near the window end so we never
  // read past the logical bit limit's byte span.
  int64_t byte = b.pos >> 3;
  int shift = (int)(b.pos & 7);
  uint64_t v;
  if ((byte + 8) * 8 <= b.nbits) {
    memcpy(&v, b.buf + byte, 8);
    v = __builtin_bswap64(v);
  } else {
    v = 0;
    for (int i = 0; i < 8; i++) {
      uint64_t c = (byte + i) * 8 < b.nbits ? b.buf[byte + i] : 0;
      v = (v << 8) | c;
    }
  }
  return (uint32_t)((v >> (64 - shift - n)) & ((1ull << n) - 1));
}

static inline uint32_t getbits(Bits* b, int n) {
  uint32_t v = showbits(*b, n);
  b->pos += n;
  return v;
}

static inline uint32_t getbit(Bits* b) { return getbits(b, 1); }

// MSB-aligned 64-bit window at the current position (>= 57 valid bits):
// one load feeds a VLC code plus its sign bits in the hot spectral loop
static inline uint64_t peek64(const Bits& b) {
  int64_t byte = b.pos >> 3;
  int shift = (int)(b.pos & 7);
  uint64_t v;
  if ((byte + 8) * 8 <= b.nbits) {
    memcpy(&v, b.buf + byte, 8);
    v = __builtin_bswap64(v);
  } else {
    v = 0;
    for (int i = 0; i < 8; i++) {
      uint64_t c = (byte + i) * 8 < b.nbits ? b.buf[byte + i] : 0;
      v = (v << 8) | c;
    }
  }
  return v << shift;
}

// ----------------------------------------------------------------- vlc ----
// two-level table: a 1<<lb (lb <= 10, 4 KB) first level that stays hot in
// L1, one int32 entry per prefix: (len << 16) | sym, sym 0xFFFF = invalid.
// Codes longer than lb bits store a negative marker -((sub_off << 5) |
// extra_bits) pointing into per-prefix subtables indexed by the next
// extra_bits bits.  (A flat full-width table costs 2 MB for the 19-bit
// scalefactor/ESC books and misses cache on nearly every lookup —
// measured ~35 ns/symbol vs ~8 ns two-level.)
struct Vlc {
  int max_bits;
  int lb;
  int32_t* ent;
  int32_t* sub;
};

static Vlc vlc_sf;
static Vlc vlc_spec[12];  // 1..11

static void build_vlc(Vlc* v, const uint32_t* codes, const uint8_t* bits,
                      int n) {
  int mb = 0;
  for (int i = 0; i < n; i++)
    if (bits[i] > mb) mb = bits[i];
  v->max_bits = mb;
  int lb = mb < 10 ? mb : 10;
  v->lb = lb;
  size_t size = (size_t)1 << lb;
  v->ent = new int32_t[size];
  for (size_t i = 0; i < size; i++) v->ent[i] = 0xFFFF;
  int gmax[1 << 10] = {0};
  for (int i = 0; i < n; i++)
    if (bits[i] > lb) {
      uint32_t pre = codes[i] >> (bits[i] - lb);
      if (bits[i] > gmax[pre]) gmax[pre] = bits[i];
    }
  int64_t total = 0;
  for (size_t p = 0; p < size; p++)
    if (gmax[p]) total += (int64_t)1 << (gmax[p] - lb);
  v->sub = total ? new int32_t[total] : nullptr;
  for (int64_t i = 0; i < total; i++) v->sub[i] = 0xFFFF;
  int64_t cur = 0;
  int64_t suboff[1 << 10];
  for (size_t p = 0; p < size; p++)
    if (gmax[p]) {
      suboff[p] = cur;
      v->ent[p] = -(int32_t)((cur << 5) | (gmax[p] - lb));
      cur += (int64_t)1 << (gmax[p] - lb);
    }
  for (int i = 0; i < n; i++) {
    if (!bits[i]) continue;
    int32_t e = ((int32_t)bits[i] << 16) | i;
    if (bits[i] <= lb) {
      uint32_t lo = codes[i] << (lb - bits[i]);
      uint32_t hi = lo + (1u << (lb - bits[i]));
      for (uint32_t c = lo; c < hi; c++) v->ent[c] = e;
    } else {
      uint32_t pre = codes[i] >> (bits[i] - lb);
      int span = gmax[pre] - bits[i];
      uint32_t low = (codes[i] & ((1u << (bits[i] - lb)) - 1)) << span;
      for (uint32_t c = low; c < low + (1u << span); c++)
        v->sub[suboff[pre] + c] = e;
    }
  }
}

// inline two-level VLC read against a register cursor (shared by the
// envelope/noise/PS band loops; vlc_get's per-call pos round trip and
// window rebuild dominate these short symbol streams)
static inline int vlc_get_at(const uint8_t* buf, int64_t nbits,
                             int64_t* pos, const Vlc& v) {
  int64_t byte = *pos >> 3;
  uint64_t w;
  if (__builtin_expect((byte + 8) * 8 <= nbits, 1)) {
    memcpy(&w, buf + byte, 8);
    w = __builtin_bswap64(w);
  } else {
    w = 0;
    for (int i = 0; i < 8; i++) {
      uint64_t c = (byte + i) * 8 < nbits ? buf[byte + i] : 0;
      w = (w << 8) | c;
    }
  }
  w <<= *pos & 7;
  uint32_t pre = (uint32_t)(w >> (64 - v.lb));
  int32_t e = v.ent[pre];
  if (__builtin_expect(e < 0, 0)) {
    int extra = (-e) & 31;
    int64_t soff = (-e) >> 5;
    uint32_t si = (uint32_t)((w >> (64 - v.lb - extra))
                             & ((1u << extra) - 1));
    e = v.sub[soff + si];
  }
  int sym = e & 0xFFFF;
  if (sym == 0xFFFF) return -1;
  *pos += e >> 16;
  return sym;
}

// Cached-window VLC cursor: one 8-byte fetch serves a run of short
// symbols (vlc_get_at rebuilds the 64-bit window per call, which
// dominates the PS/SBR side-huffman loops at ~15 cyc/symbol overhead).
// The window holds 64 - (base & 7) valid bits; refill when the next
// symbol's worst case (v.max_bits) could cross that edge.
struct VCur {
  const uint8_t* buf;
  int64_t nbits;
  int64_t pos;
  uint64_t w;
  int64_t base;
  int nv;
  void refill();
  inline int sym(const Vlc& v) {
    int off = (int)(pos - base);
    if (__builtin_expect(off + v.max_bits > nv, 0)) {
      refill();
      off = 0;
    }
    uint32_t pre = (uint32_t)((w << off) >> (64 - v.lb));
    int32_t e = v.ent[pre];
    if (__builtin_expect(e < 0, 0)) {
      int extra = (-e) & 31;
      int64_t soff = (-e) >> 5;
      uint32_t si = (uint32_t)(((w << off) >> (64 - v.lb - extra))
                               & ((1u << extra) - 1));
      e = v.sub[soff + si];
    }
    int s = e & 0xFFFF;
    if (s == 0xFFFF) return -1;
    pos += e >> 16;
    return s;
  }
};

static inline int vlc_get(Bits* b, const Vlc& v) {
  uint32_t pre = showbits(*b, v.lb);
  int32_t e = v.ent[pre];
  if (__builtin_expect(e < 0, 0)) {
    int extra = (-e) & 31;
    int64_t off = (-e) >> 5;
    uint32_t idx = showbits(*b, v.lb + extra) & ((1u << extra) - 1);
    e = v.sub[off + idx];
  }
  int s = e & 0xFFFF;
  if (s == 0xFFFF) return -1;
  b->pos += e >> 16;
  return s;
}

// codebook geometry (ISO 13818-7): dim, lav, signed
static const int cb_dim[12] = {0, 4, 4, 4, 4, 2, 2, 2, 2, 2, 2, 2};
static const int cb_lav[12] = {0, 1, 1, 2, 2, 4, 4, 7, 7, 12, 12, 16};
static const int cb_signed[12] = {0, 1, 1, 0, 0, 1, 1, 0, 0, 0, 0, 0};

// unpacked codeword value tuples + per-code nonzero counts, built at init
static int8_t* cb_vals[12];
static int8_t* cb_nz[12];
// cb1/2 (|v|<=1 signed quads, the dominant books at low rates): the qwire
// QUAD token byte for each of the 81 codes, and per-code float values
static uint8_t cb_quadtok[3][81];
// cb5/6 (signed pairs, |v|<=4): qwire PAIR token per code where both
// values fit [-3,3], else 0 (emit as singles/escapes)
static uint8_t cb_pairtok[7][81];
static float* cb_valsf[12];
// signed dequant magnitudes: (v<0 ? -1 : +1) * cbrt_tab[|v|] per tuple
// value — premultiplying by s reproduces (neg?-mag:mag)*s bit-exactly
static float* cb_dqsf[12];

static void build_codebooks() {
  for (int cb = 1; cb <= 11; cb++) {
    int dim = cb_dim[cb], lav = cb_lav[cb];
    int mod = cb_signed[cb] ? 2 * lav + 1 : lav + 1;
    int off = cb_signed[cb] ? lav : 0;
    size_t n = 1;
    for (int d = 0; d < dim; d++) n *= (size_t)mod;
    cb_vals[cb] = new int8_t[n * dim];
    cb_nz[cb] = new int8_t[n];
    for (size_t idx = 0; idx < n; idx++) {
      size_t v = idx;
      int nz = 0;
      for (int d = dim - 1; d >= 0; d--) {
        int8_t val = (int8_t)((int)(v % mod) - off);
        cb_vals[cb][idx * dim + d] = val;
        nz += val != 0;
        v /= mod;
      }
      cb_nz[cb][idx] = (int8_t)nz;
    }
    cb_valsf[cb] = new float[n * dim];
    cb_dqsf[cb] = new float[n * dim];
    for (size_t k = 0; k < n * dim; k++) {
      int vv = cb_vals[cb][k];
      cb_valsf[cb][k] = (float)vv;
      float mag = ht_cbrt[vv < 0 ? -vv : vv];
      cb_dqsf[cb][k] = vv < 0 ? -mag : mag;
    }
    if (cb <= 2)
      for (size_t idx = 0; idx < n; idx++) {
        int c = 0, pw = 1;
        for (int d = 0; d < 4; d++, pw *= 3)
          c += (cb_vals[cb][idx * 4 + d] + 1) * pw;
        cb_quadtok[cb][idx] = (uint8_t)(0x99 + c);
      }
    if (cb == 5 || cb == 6)
      for (size_t idx = 0; idx < n; idx++) {
        int v0 = cb_vals[cb][idx * 2], v1 = cb_vals[cb][idx * 2 + 1];
        cb_pairtok[cb][idx] =
            (v0 >= -3 && v0 <= 3 && v1 >= -3 && v1 <= 3)
                ? (uint8_t)(0x41 + (v0 + 3) * 7 + (v1 + 3))
                : 0;
      }
  }
}

// -------------------------------------------------------------- context ----
struct IcsInfo {
  int window_sequence;
  int use_kb_window;
  int max_sfb;
  int num_windows;
  int num_window_groups;
  int group_len[8];
  const int* swb_offset;
  int num_swb;
  int tns_max_bands;
  // AAC-Main frequency-domain prediction side info (aacdec.c:624-641)
  int predictor_present;
  int predictor_reset_group;
  int pred_nmax;               // min(max_sfb, pred_sfb_max)
  uint8_t prediction_used[64];
};

struct Tns {
  int present;
  int n_filt[8];
  int length[8][4];
  int direction[8][4];
  int order[8][4];
  float coef[8][4][20];
};

struct Chan {
  IcsInfo ics;
  Tns tns;
  int band_type[120];
  int band_run_end[120];
  float sf[120];
  uint16_t sfwb[120];  // qwire capture: pow2sf index | sign<<15 per band
};

// Quantized-wire capture (codec/qwire.py): while parsing, record each
// position's quantized integer + scalefactor word, and mark positions whose
// final float is NOT a plain (+-cbrt[n])*(+-pow2sf[si]) product (PNS, M/S,
// intensity, pulses, TNS) so the tokenizer ships them as raw f32 words.
// Single-threaded by design (one parse at a time per process).
enum { QW_MAX_LANES = 8, QW_MAX_ELEMS = 6 };

struct QwCapture {
  int on = 0;
  int n_lanes = 2;
  const float* base[QW_MAX_LANES] = {nullptr};
  int16_t q[QW_MAX_LANES][1024];
  uint16_t sfw[QW_MAX_LANES][1024];
  uint8_t raw[QW_MAX_LANES][1024];
  // occupancy bitmap: a q/sfw/raw entry is valid for this frame only if
  // its bit is set — clearing 128 B/lane per frame instead of the 10 KB
  // q/sfw arrays, and giving the tokenizer ctz-based zero-run scans
  uint64_t act[QW_MAX_LANES][16];
  int lane_of(const float* coef) const {
    for (int l = 1; l < n_lanes; l++)
      if (coef == base[l]) return l;
    return 0;
  }
  void set(int lane, int64_t p) { act[lane][p >> 6] |= 1ull << (p & 63); }
  void mark_raw(int lane, int64_t p) {
    raw[lane][p] = 1;
    set(lane, p);
  }
  void reset(const float* c0, const float* c1) {  // legacy 2-lane entry
    n_lanes = 2;
    base[0] = c0;
    base[1] = c1;
    memset(act, 0, 2 * sizeof(act[0]));
    memset(raw, 0, 2 * sizeof(raw[0]));
  }
  void reset_frame(int n) {
    n_lanes = n;
    memset(act, 0, n * sizeof(act[0]));
    memset(raw, 0, n * sizeof(raw[0]));
  }
};
static QwCapture g_qw;

// Direct token emission (the fast path): for long-window SCE frames with
// no TNS/pulses, spectral decode order equals output order, so the
// coefficient tokens are emitted inline during parse_spectrum — no capture
// stores, no second tokenizer pass.  Cross-tuple PAIR/QUAD packing is lost
// (a few bytes per frame); decode semantics are identical.
struct QwDirect {
  uint8_t* tok = nullptr;   // caller scratch
  uint8_t* ext = nullptr;
  int nt = 0, ne = 0;
  int pos = 0;              // next output position not yet covered
  int cur_sf = -1;
  void zrun_to(int p) {
    int n = p - pos;
    while (n > 0) {
      int s = n > 64 ? 64 : n;
      tok[nt++] = (uint8_t)s;
      n -= s;
    }
    pos = p;
  }
  void set_sf(uint16_t sw) {
    if ((int)sw != cur_sf) {
      int d = cur_sf >= 0 ? (int)sw - cur_sf : 1 << 20;
      if (d >= -11 && d <= 10
          && ((sw ^ (unsigned)cur_sf) & 0x8000) == 0) {
        tok[nt++] = (uint8_t)(0xF5 + d);  // 1-byte SETSF_DELTA
      } else {
        tok[nt++] = 0x94;
        ext[ne++] = (uint8_t)(sw & 0xFF);
        ext[ne++] = (uint8_t)(sw >> 8);
      }
      cur_sf = sw;
    }
  }
  void value(int v) {  // emit one value token at pos (sf already set)
    int av = v < 0 ? -v : v;
    if (av >= 4 && av <= 19) {
      tok[nt++] = (uint8_t)(0x72 + ((v < 0) << 4) + (av - 4));
    } else if (av <= 127) {
      tok[nt++] = 0x92;
      ext[ne++] = (uint8_t)(v & 0xFF);
    } else {
      tok[nt++] = 0x93;
      ext[ne++] = (uint8_t)(v & 0xFF);
      ext[ne++] = (uint8_t)((v >> 8) & 0xFF);
    }
    pos++;
  }
  void pair(int v0, int v1) {  // |v| <= 3 both, same sf, two positions
    tok[nt++] = (uint8_t)(0x41 + (v0 + 3) * 7 + (v1 + 3));
    pos += 2;
  }
  void raw_span(const float* src, int n) {  // n raw f32 values at pos
    while (n > 0) {
      int c = n > 4 ? 4 : n;
      tok[nt++] = (uint8_t)(0x94 + c);
      memcpy(ext + ne, src, 4 * c);
      ne += 4 * c;
      src += c;
      n -= c;
      pos += c;
    }
  }
};
static QwDirect* g_qwd = nullptr;      // active during parse_spectrum
static QwDirect* g_qwd_arm = nullptr;  // candidate for the next SCE parse

static inline void hh_arm_direct(QwDirect* d) {
  g_qwd_arm = d;
  g_qwd = nullptr;
}
static inline int hh_disarm_direct() {
  g_qwd_arm = nullptr;
  int used = g_qwd != nullptr;
  g_qwd = nullptr;
  return used;
}

// per-channel CPE arming: ht_parse_cpe activates one candidate per
// parse_ics call (gated on ms_present == 0: M/S rewrites both channels'
// floats after parse, so those frames stay on the capture path)
static QwDirect* g_qwd_cpe[2] = {nullptr, nullptr};
static int g_qwd_cpe_used[2] = {0, 0};
static inline void hh_arm_cpe(QwDirect* d0, QwDirect* d1) {
  g_qwd_cpe[0] = d0;
  g_qwd_cpe[1] = d1;
  g_qwd_cpe_used[0] = g_qwd_cpe_used[1] = 0;
}
static inline void hh_take_cpe_direct(int* u0, int* u1) {
  *u0 = g_qwd_cpe_used[0];
  *u1 = g_qwd_cpe_used[1];
  g_qwd_cpe[0] = g_qwd_cpe[1] = nullptr;
  g_qwd_cpe_used[0] = g_qwd_cpe_used[1] = 0;
}

// ---- wire v4 spec-mode capture (raw spectral bits; ops/spec_huff.py) ----
static inline uint64_t wnd64(const uint8_t* buf, int64_t nbits,
                             int64_t at) {
  int64_t byte = at >> 3;
  uint64_t x;
  if (__builtin_expect((byte + 8) * 8 <= nbits, 1)) {
    memcpy(&x, buf + byte, 8);
    x = __builtin_bswap64(x);
  } else {
    x = 0;
    for (int i = 0; i < 8; i++) {
      uint64_t c = (byte + i) * 8 < nbits ? buf[byte + i] : 0;
      x = (x << 8) | c;
    }
  }
  return x << (at & 7);
}

void VCur::refill() {
  base = pos;
  w = wnd64(buf, nbits, pos);
  nv = 64 - (int)(pos & 7);
}

// length-walk table: [cb][11-bit window] -> total advance in bits (code +
// sign bits) in bits 0-5, cb11 escape count in bits 6-7; 0 = slow path
// (code longer than 11 bits or invalid window).  The walk costs ~6
// cycles/code vs ~40 for the full value decode — the spec-mode lane
// never needs the values (the device Huffman-decodes the raw bits).
static uint8_t cb_walk[12][2048];
// NOTE(perf, measured 2026-08-19): a multi-symbol variant of this table
// (11-bit window -> greedy run of complete codes, advancing 1-3 codes per
// lookup) was built and benchmarked; it ran ~7% SLOWER end-to-end on the
// bench corpus -- the extra 4 KB/book of L1 pressure and the per-run
// break branch cost more than the saved lookups (real streams average
// only ~1.3 codes per 11-bit window with the mid-rate pair books).

struct SpecCap {
  int ok = 0;        // capture valid for the lane just parsed
  int max_sfb = 0;   // per GROUP (== n_bands for long windows)
  int n_bands = 0;   // num_window_groups * max_sfb (<= 120)
  int is8 = 0;       // EIGHT_SHORT lane (W3_SHORT; grouping byte leads)
  uint8_t grouping = 0;   // 7-bit scale_factor_grouping field
  uint8_t band_cb[120];
  int64_t bandpos[121];
  int64_t sf_start = 0, sf_end = 0;  // sf-huffman region bit span
  uint16_t sfidx0v = 0;   // first coded band's absolute pow2sf index
  int sf_walked = 0;      // sf region length-walked, ch->sf/sfwb NOT
                          // filled; demotes re-parse with gg
  int gg = 0;             // global_gain (for the demote re-parse)
  const uint8_t* buf = nullptr;
  int64_t nbits = 0;
  // device-M/S CPE pairs (raw bits predate the host butterfly):
  // 0 = none, 1 = left lane (carries the mask), 2 = right lane
  int ms_flag = 0;
  uint8_t ms_mask[120];    // per (group, sfb) band, n_bands entries
};
// armed capture slot for the next SCE/LFE parse_ics (qwire path only);
// one slot per lane so multi-element frames keep every capture
static SpecCap* g_spec_active = nullptr;
// one-shot Chan storage for the next ht_parse_sce/cpe call (dependent-
// CCE frames keep TNS state alive past the element loop)
static Chan* g_chan_export[2] = {nullptr, nullptr};
// per-channel CPE capture slots, armed alongside hh_arm_cpe
static SpecCap* g_spec_cpe[2] = {nullptr, nullptr};
static inline void hh_arm_cpe_spec(SpecCap* s0, SpecCap* s1) {
  g_spec_cpe[0] = s0;
  g_spec_cpe[1] = s1;
}

// ------------------------- AAC-Main prediction ----------------------------
// Frequency-domain prediction (aacdec.c:1247-1322; behavioral reference
// bitstream/aac_syntax.apply_prediction).  Stream object type for the
// whole-stream parser: 2 = LC (default), 1 = Main.  Prediction state is
// per lane and persists across frames: the caller arms g_pred_export with
// the lane's 672x6 float state (columns cor0 cor1 var0 var1 r0 r1) before
// each element parse, one-shot like g_chan_export.
static const int PRED_N = 672;
static int g_object_type = 2;
static float* g_pred_export[2] = {nullptr, nullptr};

static void pred_reset_state(float* st) {
  for (int k = 0; k < PRED_N; k++) {
    float* s = st + 6 * k;
    s[0] = s[1] = s[4] = s[5] = 0.0f;
    s[2] = s[3] = 1.0f;
  }
}

// emulated-float16 roundings: bit-identical to aac_syntax._flt16_* (the
// uint32 bias trick the reference uses, aacdec.c:1229-1245)
static inline float flt16_round(float x) {
  uint32_t i;
  memcpy(&i, &x, 4);
  i = (i + 0x00008000u) & 0xFFFF0000u;
  memcpy(&x, &i, 4);
  return x;
}
static inline float flt16_even(float x) {
  uint32_t i;
  memcpy(&i, &x, 4);
  i = (i + 0x00007FFFu + ((i & 0x00010000u) >> 16)) & 0xFFFF0000u;
  memcpy(&x, &i, 4);
  return x;
}
static inline float flt16_trunc(float x) {
  uint32_t i;
  memcpy(&i, &x, 4);
  i = i & 0xFFFF0000u;
  memcpy(&x, &i, 4);
  return x;
}

// Apply one frame of prediction to a dequantized long-window spectrum and
// advance the per-lane state; EIGHT_SHORT frames reset the state instead.
// Every bin whose stored value changes is marked raw for the qwire
// emitter (value tokens were captured pre-prediction).  Float-op order
// matches aac_syntax.apply_prediction exactly (per-op f32 rounding; the
// build uses -ffp-contract=off).
static void apply_main_prediction(float* coef, float* st,
                                  const IcsInfo* ics, int sampling_index) {
  if (ics->window_sequence == 2) {
    pred_reset_state(st);
    return;
  }
  const float SFS = -0.0009765625f;  // SF_SCALE, codec/decoder.py:22
  const float a = 0.953125f, alpha = 0.90625f;
  int pmax = ht_pred_sfb_max[sampling_index];
  int kmax =
      ics->swb_offset[pmax < ics->num_swb ? pmax : ics->num_swb];
  uint8_t en[1024];
  memset(en, 0, kmax);
  if (ics->predictor_present) {
    for (int sfb = 0; sfb < ics->pred_nmax; sfb++)
      if (ics->prediction_used[sfb]) {
        int k0 = ics->swb_offset[sfb];
        int k1b = ics->swb_offset[sfb + 1];
        if (k1b > kmax) k1b = kmax;  // numpy slice-clip semantics
        for (int k = k0; k < k1b; k++) en[k] = 1;
      }
  }
  int ql = g_qw.on ? g_qw.lane_of(coef) : -1;
  for (int k = 0; k < kmax; k++) {
    float* s = st + 6 * k;
    float cor0 = s[0], cor1 = s[1], var0 = s[2], var1 = s[3];
    float r0 = s[4], r1 = s[5];
    float k1 = var0 > 1.0f ? cor0 * flt16_even(a / var0) : 0.0f;
    float k2 = var1 > 1.0f ? cor1 * flt16_even(a / var1) : 0.0f;
    float pv = flt16_round(k1 * r0 + k2 * r1);
    if (en[k]) {
      float old = coef[k];
      float nv = old + pv * SFS;
      coef[k] = nv;
      uint32_t bo, bn;
      memcpy(&bo, &old, 4);
      memcpy(&bn, &nv, 4);
      if (bo != bn && ql >= 0) g_qw.mark_raw(ql, k);
    }
    float e0 = coef[k] / SFS;
    float e1 = e0 - k1 * r0;
    s[1] = flt16_trunc(alpha * cor1 + r1 * e1);
    s[3] = flt16_trunc(alpha * var1 + 0.5f * (r1 * r1 + e1 * e1));
    s[0] = flt16_trunc(alpha * cor0 + r0 * e0);
    s[2] = flt16_trunc(alpha * var0 + 0.5f * (r0 * r0 + e0 * e0));
    s[5] = flt16_trunc(a * (r0 - k1 * e0));
    s[4] = flt16_trunc(a * e0);
  }
  if (ics->predictor_reset_group)
    for (int i = ics->predictor_reset_group - 1; i < PRED_N; i += 30) {
      float* s = st + 6 * i;
      s[0] = s[1] = s[4] = s[5] = 0.0f;
      s[2] = s[3] = 1.0f;
    }
}

#ifdef HH_WALK_V1
static int walk_spectrum(Bits* b, const Chan* ch, int64_t* bandpos) {
  const IcsInfo* ics = &ch->ics;
  const int* offsets = ics->swb_offset;
  const uint8_t* buf = b->buf;
  const int64_t nbits = b->nbits;
  int64_t pos = b->pos;
  int idx = 0;
  for (int g = 0; g < ics->num_window_groups; g++)
  for (int i = 0; i < ics->max_sfb; i++, idx++) {
    bandpos[idx] = pos;
    int bt = ch->band_type[idx];
    if (bt == 0) continue;
    const uint8_t* walk = cb_walk[bt];
    // a group's windows share the band's section contiguously (the
    // decode loop iterates windows inside the band, aacdec.c:1032)
    int ncodes =
        ics->group_len[g] * (offsets[i + 1] - offsets[i]) / cb_dim[bt];
    int c = 0;
#ifdef HH_PROF
    hhprof::cnt[20] += ncodes;  // codes walked
    hhprof::names[20] = "walk codes";
    hhprof::cyc[20]++;          // bands
#endif
    while (c < ncodes) {
#ifdef HH_PROF
      hhprof::cnt[21]++;        // window refills
      hhprof::names[21] = "walk windows";
#endif
      uint64_t w = wnd64(buf, nbits, pos);
      int used = 0;
      while (c < ncodes && used <= 44) {
        uint8_t e = walk[(uint32_t)((w << used) >> 53)];
        if (__builtin_expect(e != 0 && e < 64, 1)) {
          used += e;
          c++;
          continue;
        }
        break;
      }
      pos += used;
      if (pos > nbits) return -1;
      if (c >= ncodes) break;
      // slow path: long code or cb11 escape sequence
      int64_t p2 = pos;
      int code = vlc_get_at(buf, nbits, &p2, vlc_spec[bt]);
      if (code < 0) return -1;
      if (!cb_signed[bt]) p2 += cb_nz[bt][code];
      if (bt == 11) {
        const int8_t* tv = cb_vals[11] + code * 2;
        for (int d = 0; d < 2; d++) {
          if (tv[d] == 16) {
            uint64_t u = wnd64(buf, nbits, p2);
            int n1 = u == ~0ull ? 64 : __builtin_clzll(~u);
            if (n1 > 8) return -1;
            p2 += 2 * n1 + 5;
          }
        }
      }
      if (p2 > nbits) return -1;
      pos = p2;
      c++;
    }
  }
  bandpos[idx] = pos;
  b->pos = pos;
  return 0;
}
#else
// v2 walk: one rolling 64-bit window shared ACROSS bands (the v1 loop
// refilled per band and per 44 consumed bits with a mispredicted exit
// branch each time; measured ~51 refills + 40 band setups per frame on
// the bench corpus).  The window advances by `used` only at refill/
// slow-path/return boundaries; band starts record base + used.
static int walk_spectrum(Bits* b, const Chan* ch, int64_t* bandpos) {
  const IcsInfo* ics = &ch->ics;
  const int* offsets = ics->swb_offset;
  const uint8_t* buf = b->buf;
  const int64_t nbits = b->nbits;
  int64_t pos = b->pos;      // window base
  uint64_t w = wnd64(buf, nbits, pos);
  int used = 0;              // bits consumed past the base
  int idx = 0;
  for (int g = 0; g < ics->num_window_groups; g++)
  for (int i = 0; i < ics->max_sfb; i++, idx++) {
    bandpos[idx] = pos + used;
    int bt = ch->band_type[idx];
    if (bt == 0) continue;
    const uint8_t* walk = cb_walk[bt];
    // a group's windows share the band's section contiguously (the
    // decode loop iterates windows inside the band, aacdec.c:1032)
    int ncodes =
        ics->group_len[g] * (offsets[i + 1] - offsets[i]) / cb_dim[bt];
    int c = 0;
#ifdef HH_PROF
    hhprof::cnt[20] += ncodes;  // codes walked
    hhprof::names[20] = "walk codes";
    hhprof::cyc[20]++;          // bands
#endif
    while (c < ncodes) {
      uint8_t e = walk[(uint32_t)((w << used) >> 53)];
      if (__builtin_expect((uint8_t)(e - 1) < 63 && used <= 44, 1)) {
        used += e;
        c++;
        continue;
      }
      if (used > 44) {  // refill
#ifdef HH_PROF
        hhprof::cnt[21]++;      // window refills
        hhprof::names[21] = "walk windows";
#endif
        pos += used;
        used = 0;
        if (pos > nbits) return -1;
        w = wnd64(buf, nbits, pos);
        continue;
      }
      // slow path: long code or cb11 escape sequence
      int64_t p2 = pos + used;
      int code = vlc_get_at(buf, nbits, &p2, vlc_spec[bt]);
      if (code < 0) return -1;
      if (!cb_signed[bt]) p2 += cb_nz[bt][code];
      if (bt == 11) {
        const int8_t* tv = cb_vals[11] + code * 2;
        for (int d = 0; d < 2; d++) {
          if (tv[d] == 16) {
            uint64_t u = wnd64(buf, nbits, p2);
            int n1 = u == ~0ull ? 64 : __builtin_clzll(~u);
            if (n1 > 8) return -1;
            p2 += 2 * n1 + 5;
          }
        }
      }
      if (p2 > nbits) return -1;
      pos = p2;
      used = 0;
      w = wnd64(buf, nbits, pos);
      c++;
    }
  }
  bandpos[idx] = pos + used;
  b->pos = pos + used;
  if (b->pos > nbits) return -1;
  return 0;
}
#endif  // HH_WALK_V1

// --------------------------------------------------------------- parse ----
static int parse_ics_info(Bits* b, IcsInfo* ics, int sampling_index) {
  if (getbit(b)) return -1;  // reserved
  ics->window_sequence = getbits(b, 2);
  ics->use_kb_window = getbit(b);
  ics->num_window_groups = 1;
  ics->group_len[0] = 1;
  if (ics->window_sequence == 2) {  // EIGHT_SHORT
    ics->max_sfb = getbits(b, 4);
    for (int i = 0; i < 7; i++) {
      if (getbit(b))
        ics->group_len[ics->num_window_groups - 1]++;
      else {
        ics->num_window_groups++;
        ics->group_len[ics->num_window_groups - 1] = 1;
      }
    }
    ics->num_windows = 8;
    ics->swb_offset = ht_swb_128[sampling_index];
    ics->num_swb = ht_num_swb_128[sampling_index];
    ics->tns_max_bands = ht_tns_max_128[sampling_index];
  } else {
    ics->max_sfb = getbits(b, 6);
    ics->num_windows = 1;
    ics->swb_offset = ht_swb_1024[sampling_index];
    ics->num_swb = ht_num_swb_1024[sampling_index];
    ics->tns_max_bands = ht_tns_max_1024[sampling_index];
    if (getbit(b)) {  // predictor_data_present
      if (g_object_type != 1) return -2;  // only AAC Main handled natively
      ics->predictor_present = 1;
      if (getbit(b)) {
        ics->predictor_reset_group = getbits(b, 5);
        if (ics->predictor_reset_group < 1 ||
            ics->predictor_reset_group > 30)
          return -1;
      }
      int nmax = ics->max_sfb < ht_pred_sfb_max[sampling_index]
                     ? ics->max_sfb
                     : ht_pred_sfb_max[sampling_index];
      ics->pred_nmax = nmax;
      for (int i = 0; i < nmax; i++)
        ics->prediction_used[i] = (uint8_t)getbit(b);
    }
  }
  if (ics->max_sfb > ics->num_swb) return -1;
  return 0;
}

static int parse_band_types(Bits* b, Chan* ch) {
  IcsInfo* ics = &ch->ics;
  int bits = ics->window_sequence == 2 ? 3 : 5;
  int esc = (1 << bits) - 1;
  int idx = 0;
  for (int g = 0; g < ics->num_window_groups; g++) {
    int k = 0;
    while (k < ics->max_sfb) {
      int sect_end = k;
      int bt = getbits(b, 4);
      if (bt == 12) return -1;
      int incr;
      do {
        incr = getbits(b, bits);
        sect_end += incr;
      } while (incr == esc);
      if (b->pos > b->nbits) return -1;
      if (sect_end > ics->max_sfb) return -1;
      for (; k < sect_end; k++) {
        ch->band_type[idx] = bt;
        ch->band_run_end[idx++] = sect_end;
      }
    }
  }
  return 0;
}

static int parse_scalefactors(Bits* b, Chan* ch, int global_gain) {
  IcsInfo* ics = &ch->ics;
  int sf_off = 60 + (ics->window_sequence == 2 ? 12 : 0);
  int offset[3] = {global_gain, global_gain - 90, 100};
  int noise_flag = 1;
  int idx = 0;
  VCur c{b->buf, b->nbits, b->pos};
  c.refill();
  for (int g = 0; g < ics->num_window_groups; g++) {
    for (int i = 0; i < ics->max_sfb;) {
      int run_end = ch->band_run_end[idx];
      int bt = ch->band_type[idx];
      if (bt == 0) {  // ZERO
        for (; i < run_end; i++, idx++) {
          ch->sf[idx] = 0.f;
          ch->sfwb[idx] = 0;
        }
      } else if (bt == 14 || bt == 15) {  // intensity
        for (; i < run_end; i++, idx++) {
          int d = c.sym(vlc_sf);
          if (d < 0) { b->pos = c.pos; return -1; }
          offset[2] += d - 60;
          if ((unsigned)offset[2] > 255u) { b->pos = c.pos; return -1; }
          ch->sf[idx] = ht_pow2sf[-offset[2] + 300];
          ch->sfwb[idx] = (uint16_t)((-offset[2] + 300) | 0x8000);
        }
      } else if (bt == 13) {  // noise
        for (; i < run_end; i++, idx++) {
          if (noise_flag-- > 0) {
            b->pos = c.pos;
            offset[1] += (int)getbits(b, 9) - 256;
            c.pos = b->pos;
            c.refill();
          } else {
            int d = c.sym(vlc_sf);
            if (d < 0) { b->pos = c.pos; return -1; }
            offset[1] += d - 60;
          }
          if ((unsigned)offset[1] > 255u) { b->pos = c.pos; return -1; }
          ch->sf[idx] = -ht_pow2sf[offset[1] + sf_off + 100];
          ch->sfwb[idx] = (uint16_t)(offset[1] + sf_off + 100);
        }
      } else {
        for (; i < run_end; i++, idx++) {
          int d = c.sym(vlc_sf);
          if (d < 0) { b->pos = c.pos; return -1; }
          offset[0] += d - 60;
          if ((unsigned)offset[0] > 255u) { b->pos = c.pos; return -1; }
          ch->sf[idx] = -ht_pow2sf[offset[0] + sf_off];
          ch->sfwb[idx] = (uint16_t)(offset[0] + sf_off);
        }
      }
    }
  }
  b->pos = c.pos;
  return 0;
}

// Length-walk of the scalefactor region for spec-capture-eligible lanes
// (regular/ZERO bands only -- eligibility pre-checked from the band
// types): the device decodes the sf delta chain from the raw bits
// (ops/spec_huff.py), so no per-band sf/sfwb stores or pow2sf lookups
// are needed; only the delta chain itself (kept for the exact 0-255
// range validation of parse_scalefactors) and the FIRST coded band's
// absolute index (the wire's sfidx0).  On a later demote the caller
// re-parses the region with full values (intra-frame, no stale state).
static int walk_scalefactors(Bits* b, Chan* ch, int global_gain,
                             int* sfidx0) {
  IcsInfo* ics = &ch->ics;
  int sf_off = 60 + (ics->window_sequence == 2 ? 12 : 0);
  int offset0 = global_gain;
  int first = -1;
  int idx = 0;
  VCur c{b->buf, b->nbits, b->pos};
  c.refill();
  for (int g = 0; g < ics->num_window_groups; g++) {
    for (int i = 0; i < ics->max_sfb;) {
      int run_end = ch->band_run_end[idx];
      if (ch->band_type[idx] == 0) {
        idx += run_end - i;
        i = run_end;
        continue;
      }
      for (; i < run_end; i++, idx++) {
        int d = c.sym(vlc_sf);
        if (d < 0) { b->pos = c.pos; return -1; }
        offset0 += d - 60;
        if ((unsigned)offset0 > 255u) { b->pos = c.pos; return -1; }
        if (first < 0) first = offset0 + sf_off;
      }
    }
  }
  b->pos = c.pos;
  *sfidx0 = first < 0 ? 0 : first;
  return 0;
}

static int parse_pulses(Bits* b, const IcsInfo* ics, int* pos, int* amp,
                        int* count) {
  int num = getbits(b, 2) + 1;
  int swb = getbits(b, 6);
  if (swb >= ics->num_swb) return -1;
  pos[0] = ics->swb_offset[swb] + (int)getbits(b, 5);
  if (pos[0] > 1023) return -1;
  amp[0] = getbits(b, 4);
  for (int i = 1; i < num; i++) {
    pos[i] = (int)getbits(b, 5) + pos[i - 1];
    if (pos[i] > 1023) return -1;
    amp[i] = getbits(b, 4);
  }
  *count = num;
  return 0;
}

static int parse_tns(Bits* b, Chan* ch) {
  IcsInfo* ics = &ch->ics;
  Tns* t = &ch->tns;
  t->present = 1;
  int is8 = ics->window_sequence == 2;
  int tns_max_order = is8 ? 7 : 12;  // LC only
  for (int w = 0; w < ics->num_windows; w++) {
    t->n_filt[w] = getbits(b, 2 - is8);
    if (t->n_filt[w]) {
      int coef_res = getbit(b);
      for (int f = 0; f < t->n_filt[w]; f++) {
        t->length[w][f] = getbits(b, 6 - 2 * is8);
        t->order[w][f] = getbits(b, 5 - 2 * is8);
        if (t->order[w][f] > tns_max_order) return -1;
        if (t->order[w][f]) {
          t->direction[w][f] = getbit(b);
          int coef_compress = getbit(b);
          int coef_len = coef_res + 3 - coef_compress;
          const float* map = coef_compress
              ? (coef_res ? ht_tns_map_1_4 : ht_tns_map_1_3)
              : (coef_res ? ht_tns_map_0_4 : ht_tns_map_0_3);
          for (int i = 0; i < t->order[w][f]; i++)
            t->coef[w][f][i] = map[getbits(b, coef_len)];
        } else {
          t->direction[w][f] = 0;
        }
      }
    }
  }
  return 0;
}

static int parse_spectrum(Bits* b, Chan* ch, float* coef, uint32_t* rng) {
  IcsInfo* ics = &ch->ics;
  memset(coef, 0, 1024 * sizeof(float));
  const int* offsets = ics->swb_offset;
  int idx = 0;
  float* gbase = coef;
  QwDirect* qd = g_qwd;
  const int qcap = g_qw.on && !qd;
  const int qlane = qcap ? g_qw.lane_of(coef) : 0;
  for (int g = 0; g < ics->num_window_groups; g++) {
    int g_len = ics->group_len[g];
    for (int i = 0; i < ics->max_sfb; i++, idx++) {
      int bt = ch->band_type[idx];
      int off = offsets[i];
      int off_len = offsets[i + 1] - off;
      if (bt == 0 || bt == 14 || bt == 15) continue;
      if (bt == 13) {  // PNS (aacdec.c:1016-1029)
        for (int grp = 0; grp < g_len; grp++) {
          float* cfo = gbase + grp * 128 + off;
          for (int k = 0; k < off_len; k++) {
            *rng = *rng * 1664525u + 1013904223u;
            cfo[k] = (float)(int32_t)*rng;
          }
          float energy = 0.f;
          for (int k = 0; k < off_len; k++) energy += cfo[k] * cfo[k];
          float scale = ch->sf[idx] / sqrtf(energy);
          for (int k = 0; k < off_len; k++) cfo[k] *= scale;
          if (qcap) {
            int64_t p0 = cfo - coef;
            for (int k = 0; k < off_len; k++)
              g_qw.mark_raw(qlane, p0 + k);
          } else if (qd) {
            qd->zrun_to((int)(cfo - coef));
            qd->raw_span(cfo, off_len);
          }
        }
      } else {
        const Vlc& v = vlc_spec[bt];
        const int8_t* vals = cb_vals[bt];
        const int8_t* nzs = cb_nz[bt];
        int dim = cb_dim[bt];
        int sgn = cb_signed[bt];
        float s = ch->sf[idx];
        uint16_t sw = ch->sfwb[idx];
        int16_t* qq = g_qw.q[qlane];
        uint16_t* qs = g_qw.sfw[qlane];
        // register-resident bit cursor: the serial pos->window->LUT->pos
        // chain is the whole decode's critical path, so keep it out of
        // memory across symbols (the reference's OPEN_READER/CLOSE_READER
        // discipline, get_bits.h:100-330)
        int64_t pos = b->pos;
        const uint8_t* buf = b->buf;
        const int64_t nbits = b->nbits;
        auto wnd = [&](int64_t at) -> uint64_t {
          int64_t byte = at >> 3;
          uint64_t x;
          if (__builtin_expect((byte + 8) * 8 <= nbits, 1)) {
            memcpy(&x, buf + byte, 8);
            x = __builtin_bswap64(x);
          } else {
            x = 0;
            for (int i = 0; i < 8; i++) {
              uint64_t c = (byte + i) * 8 < nbits ? buf[byte + i] : 0;
              x = (x << 8) | c;
            }
          }
          return x << (at & 7);
        };
        for (int grp = 0; grp < g_len; grp++) {
          float* cf = gbase + grp * 128 + off;
          int k = 0;
          // four quad-codes per 64-bit window for cb1/2 (max 11 bits per
          // code, 44 <= 57 valid bits): the serial pos->load->bswap chain
          // amortizes over 16 coefficients
          if (sgn && dim == 4 && bt <= 2) {
            const float* tvfb = cb_valsf[bt];
            const uint8_t* qtok = cb_quadtok[bt];
            for (; k + 16 <= off_len; k += 16) {
              uint64_t w = wnd(pos);
              int used = 0;
              for (int blk = 0; blk < 4; blk++) {
                uint64_t wb = w << used;
                uint32_t pre = (uint32_t)(wb >> (64 - v.lb));
                int32_t e = v.ent[pre];
                if (__builtin_expect(e < 0, 0)) {
                  int extra = (-e) & 31;
                  int64_t soff = (-e) >> 5;
                  uint32_t si = (uint32_t)((wb >> (64 - v.lb - extra))
                                           & ((1u << extra) - 1));
                  e = v.sub[soff + si];
                }
                int code = e & 0xFFFF;
                if (code == 0xFFFF) {
                  b->pos = pos;
                  return -1;
                }
                used += e >> 16;
                const int8_t* tv = vals + code * 4;
                const float* tvf = tvfb + code * 4;
                int kb = k + blk * 4;
                cf[kb] = tv[0] ? tvf[0] * s : 0.f;
                cf[kb + 1] = tv[1] ? tvf[1] * s : 0.f;
                cf[kb + 2] = tv[2] ? tvf[2] * s : 0.f;
                cf[kb + 3] = tv[3] ? tvf[3] * s : 0.f;
                int nzq = nzs[code];
                if (qcap && nzq) {
                  int64_t p = (cf - coef) + kb;
                  for (int d = 0; d < 4; d++)
                    if (tv[d]) {
                      qq[p + d] = (int16_t)tv[d];
                      qs[p + d] = sw;
                      g_qw.set(qlane, p + d);
                    }
                } else if (qd && nzq) {
                  qd->zrun_to((int)(cf - coef) + kb);
                  qd->set_sf(sw);
                  qd->tok[qd->nt++] = qtok[code];
                  qd->pos += 4;
                }
              }
              pos += used;
            }
          }
          // four signed-pair codes per window for cb5/6 (max 13 bits,
          // no sign bits): same amortization as the cb1/2 block above
          if (sgn && dim == 2) {
            const float* tvfb = cb_dqsf[bt];
            const uint8_t* ptok = cb_pairtok[bt];
            for (; k + 8 <= off_len; k += 8) {
              uint64_t w = wnd(pos);
              int used = 0;
              for (int blk = 0; blk < 4; blk++) {
                uint64_t wb = w << used;
                uint32_t pre = (uint32_t)(wb >> (64 - v.lb));
                int32_t e = v.ent[pre];
                if (__builtin_expect(e < 0, 0)) {
                  int extra = (-e) & 31;
                  int64_t soff = (-e) >> 5;
                  uint32_t si = (uint32_t)((wb >> (64 - v.lb - extra))
                                           & ((1u << extra) - 1));
                  e = v.sub[soff + si];
                }
                int code = e & 0xFFFF;
                if (code == 0xFFFF) {
                  b->pos = pos;
                  return -1;
                }
                used += e >> 16;
                const int8_t* tv = vals + code * 2;
                const float* tvf = tvfb + code * 2;
                int kb = k + blk * 2;
                cf[kb] = tv[0] ? tvf[0] * s : 0.f;
                cf[kb + 1] = tv[1] ? tvf[1] * s : 0.f;
                int nzq = nzs[code];
                if (qcap && nzq) {
                  int64_t p = (cf - coef) + kb;
                  for (int d = 0; d < 2; d++)
                    if (tv[d]) {
                      qq[p + d] = (int16_t)tv[d];
                      qs[p + d] = sw;
                      g_qw.set(qlane, p + d);
                    }
                } else if (qd && nzq) {
                  int base = (int)(cf - coef) + kb;
                  qd->set_sf(sw);
                  if (ptok[code]) {
                    qd->zrun_to(base);
                    qd->tok[qd->nt++] = ptok[code];
                    qd->pos += 2;
                  } else {
                    if (tv[0]) {
                      qd->zrun_to(base);
                      qd->value(tv[0]);
                    }
                    if (tv[1]) {
                      qd->zrun_to(base + 1);
                      qd->value(tv[1]);
                    }
                  }
                }
              }
              pos += used;
            }
          }
          // two pair-codes per 64-bit window for the hot unsigned-pair
          // books: a code + signs tops out at 21 bits, so two fit in the
          // 57 valid bits and the serial pos->load->bswap chain halves
          if (dim == 2 && !sgn && bt != 11) {
            for (; k + 4 <= off_len; k += 4) {
              uint64_t w = wnd(pos);
              uint32_t pre = (uint32_t)(w >> (64 - v.lb));
              int32_t e = v.ent[pre];
              if (__builtin_expect(e < 0, 0)) {
                int extra = (-e) & 31;
                int64_t soff = (-e) >> 5;
                uint32_t si = (uint32_t)((w >> (64 - v.lb - extra))
                                         & ((1u << extra) - 1));
                e = v.sub[soff + si];
              }
              int code = e & 0xFFFF;
              if (code == 0xFFFF) {
                b->pos = pos;
                return -1;
              }
              int clen = e >> 16;
              const int8_t* tv = vals + code * 2;
              int nz = nzs[code];
              uint32_t sbits = (uint32_t)((w << clen) >> 33) >> (31 - nz);
              int v0 = tv[0], v1 = tv[1];
              int nz0 = v0 != 0, nz1 = v1 != 0;
              int neg0 = (int)(sbits >> ((nz - 1) & 31)) & nz0;
              int neg1 = (int)(sbits >> ((nz - nz0 - 1) & 31)) & nz1;
              float m0 = ht_cbrt[v0], m1 = ht_cbrt[v1];
              cf[k] = (neg0 ? -m0 : m0) * s;
              cf[k + 1] = (neg1 ? -m1 : m1) * s;
              int used = clen + nz;
              // second code from the same window
              uint64_t w2 = w << used;
              uint32_t pre2 = (uint32_t)(w2 >> (64 - v.lb));
              int32_t e2 = v.ent[pre2];
              if (__builtin_expect(e2 < 0, 0)) {
                int extra = (-e2) & 31;
                int64_t soff = (-e2) >> 5;
                uint32_t si = (uint32_t)((w2 >> (64 - v.lb - extra))
                                         & ((1u << extra) - 1));
                e2 = v.sub[soff + si];
              }
              int code2 = e2 & 0xFFFF;
              if (code2 == 0xFFFF) {
                b->pos = pos;
                return -1;
              }
              int clen2 = e2 >> 16;
              const int8_t* tw = vals + code2 * 2;
              int nzB = nzs[code2];
              uint32_t sbits2 =
                  (uint32_t)((w2 << clen2) >> 33) >> (31 - nzB);
              int v2 = tw[0], v3 = tw[1];
              int nz2 = v2 != 0, nz3 = v3 != 0;
              int neg2 = (int)(sbits2 >> ((nzB - 1) & 31)) & nz2;
              int neg3 = (int)(sbits2 >> ((nzB - nz2 - 1) & 31)) & nz3;
              float m2 = ht_cbrt[v2], m3 = ht_cbrt[v3];
              cf[k + 2] = (neg2 ? -m2 : m2) * s;
              cf[k + 3] = (neg3 ? -m3 : m3) * s;
              pos += used + clen2 + nzB;
              if (qcap) {
                int64_t pp = (cf - coef) + k;
                qq[pp] = (int16_t)(neg0 ? -v0 : v0);
                qq[pp + 1] = (int16_t)(neg1 ? -v1 : v1);
                qq[pp + 2] = (int16_t)(neg2 ? -v2 : v2);
                qq[pp + 3] = (int16_t)(neg3 ? -v3 : v3);
                qs[pp] = qs[pp + 1] = qs[pp + 2] = qs[pp + 3] = sw;
                uint64_t* aw = &g_qw.act[qlane][pp >> 6];
                *aw |= (((uint64_t)nz0) | ((uint64_t)nz1 << 1)
                        | ((uint64_t)nz2 << 2) | ((uint64_t)nz3 << 3))
                       << (pp & 63);
              } else if (qd && (nz0 | nz1 | nz2 | nz3)) {
                int base = (int)(cf - coef) + k;
                qd->set_sf(sw);
                if (nz0 | nz1) {
                  if (v0 <= 3 && v1 <= 3) {
                    qd->zrun_to(base);
                    qd->pair(neg0 ? -v0 : v0, neg1 ? -v1 : v1);
                  } else {
                    if (nz0) {
                      qd->zrun_to(base);
                      qd->value(neg0 ? -v0 : v0);
                    }
                    if (nz1) {
                      qd->zrun_to(base + 1);
                      qd->value(neg1 ? -v1 : v1);
                    }
                  }
                }
                if (nz2 | nz3) {
                  if (v2 <= 3 && v3 <= 3) {
                    qd->zrun_to(base + 2);
                    qd->pair(neg2 ? -v2 : v2, neg3 ? -v3 : v3);
                  } else {
                    if (nz2) {
                      qd->zrun_to(base + 2);
                      qd->value(neg2 ? -v2 : v2);
                    }
                    if (nz3) {
                      qd->zrun_to(base + 3);
                      qd->value(neg3 ? -v3 : v3);
                    }
                  }
                }
              }
            }
          }
          for (; k < off_len; k += dim) {
            // one 64-bit window serves the code, its sign bits and (re-
            // windowed when needed) the cb11 escape sequences
            uint64_t w = wnd(pos);
            uint32_t pre = (uint32_t)(w >> (64 - v.lb));
            int32_t e = v.ent[pre];
            if (__builtin_expect(e < 0, 0)) {
              int extra = (-e) & 31;
              int64_t soff = (-e) >> 5;
              uint32_t si = (uint32_t)((w >> (64 - v.lb - extra))
                                       & ((1u << extra) - 1));
              e = v.sub[soff + si];
            }
            int code = e & 0xFFFF;
            if (code == 0xFFFF) {
              b->pos = pos;
              return -1;
            }
            int clen = e >> 16;
            const int8_t* tv = vals + code * dim;
            if (sgn && dim == 4 && bt <= 2) {
              // |v| <= 1 signed quads (cb 1/2): no sign bits, the token
              // is a direct per-code lookup, and four values store as
              // tvf[d]*s (cbrt[1] == 1.0f, so +-1 -> +-s bit-exactly;
              // zeros write literal 0.f to keep the dense-path floats
              // identical to the reference +0.0)
              pos += clen;
              const float* tvf = cb_valsf[bt] + code * 4;
              cf[k] = tv[0] ? tvf[0] * s : 0.f;
              cf[k + 1] = tv[1] ? tvf[1] * s : 0.f;
              cf[k + 2] = tv[2] ? tvf[2] * s : 0.f;
              cf[k + 3] = tv[3] ? tvf[3] * s : 0.f;
              int nzq = nzs[code];
              if (qcap && nzq) {
                int64_t p = (cf - coef) + k;
                for (int d = 0; d < 4; d++)
                  if (tv[d]) {
                    qq[p + d] = (int16_t)tv[d];
                    qs[p + d] = sw;
                    g_qw.set(qlane, p + d);
                  }
              } else if (qd && nzq) {
                qd->zrun_to((int)(cf - coef) + k);
                qd->set_sf(sw);
                qd->tok[qd->nt++] = cb_quadtok[bt][code];
                qd->pos += 4;
              }
            } else if (sgn) {
              pos += clen;
              int nzany = 0;
              for (int d = 0; d < dim; d++) {
                int av = tv[d] < 0 ? -tv[d] : tv[d];
                float mag = ht_cbrt[av];
                cf[k + d] = (tv[d] < 0 ? -mag : mag) * s;
                nzany |= tv[d];
                if (qcap && tv[d]) {
                  int64_t p = (cf - coef) + k + d;
                  qq[p] = (int16_t)tv[d];
                  qs[p] = sw;
                  g_qw.set(qlane, p);
                }
              }
              if (qd && nzany) {
                int base = (int)(cf - coef) + k;
                if (dim == 4 && tv[0] >= -1 && tv[0] <= 1 && tv[1] >= -1
                    && tv[1] <= 1 && tv[2] >= -1 && tv[2] <= 1
                    && tv[3] >= -1 && tv[3] <= 1) {
                  qd->zrun_to(base);
                  qd->set_sf(sw);
                  qd->tok[qd->nt++] = (uint8_t)(
                      0x99 + (tv[0] + 1) + 3 * (tv[1] + 1)
                      + 9 * (tv[2] + 1) + 27 * (tv[3] + 1));
                  qd->pos += 4;
                } else {
                  for (int d = 0; d < dim; d += 2) {
                    int a = tv[d], bb = d + 1 < dim ? tv[d + 1] : 0;
                    if (!a && !bb) continue;
                    qd->set_sf(sw);
                    if (d + 1 < dim && a >= -3 && a <= 3 && bb >= -3
                        && bb <= 3) {
                      qd->zrun_to(base + d);
                      qd->pair(a, bb);
                    } else {
                      if (a) {
                        qd->zrun_to(base + d);
                        qd->value(a);
                      }
                      if (bb) {
                        qd->zrun_to(base + d + 1);
                        qd->value(bb);
                      }
                    }
                  }
                }
              }
            } else if (dim == 2 && __builtin_expect(
                           bt != 11 || (tv[0] != 16 && tv[1] != 16), 1)) {
              // branchless unsigned pair (cb 7-10 + non-escape cb11):
              // sign bits for nonzero values first (aacdec.c:1085-1174).
              // Data-dependent branches mispredict on ~random spectra;
              // masked selects keep the pipeline full.
              int nz = nzs[code];
              // top nz bits of (w << clen); shift counts clamped so nz=0
              // stays defined (results are masked by nz0/nz1 anyway)
              uint32_t sbits = (uint32_t)((w << clen) >> 33) >> (31 - nz);
              int v0 = tv[0], v1 = tv[1];
              int nz0 = v0 != 0, nz1 = v1 != 0;
              int neg0 = (int)(sbits >> ((nz - 1) & 31)) & nz0;
              int neg1 = (int)(sbits >> ((nz - nz0 - 1) & 31)) & nz1;
              float m0 = ht_cbrt[v0], m1 = ht_cbrt[v1];
              cf[k] = (neg0 ? -m0 : m0) * s;
              cf[k + 1] = (neg1 ? -m1 : m1) * s;
              if (qcap) {
                int64_t p = (cf - coef) + k;
                qq[p] = (int16_t)(neg0 ? -v0 : v0);
                qq[p + 1] = (int16_t)(neg1 ? -v1 : v1);
                qs[p] = sw;
                qs[p + 1] = sw;
                uint64_t* aw = &g_qw.act[qlane][p >> 6];
                // pair never straddles a 64-bit word (k even, dim 2)
                *aw |= ((uint64_t)nz0 << (p & 63))
                       | ((uint64_t)nz1 << ((p + 1) & 63));
              } else if (qd && (nz0 | nz1)) {
                int base = (int)(cf - coef) + k;
                int sv0 = neg0 ? -v0 : v0;
                int sv1 = neg1 ? -v1 : v1;
                qd->set_sf(sw);
                if (v0 <= 3 && v1 <= 3) {
                  qd->zrun_to(base);
                  qd->pair(sv0, sv1);
                } else {
                  if (nz0) {
                    qd->zrun_to(base);
                    qd->value(sv0);
                  }
                  if (nz1) {
                    qd->zrun_to(base + 1);
                    qd->value(sv1);
                  }
                }
              }
              pos += clen + nz;
            } else {
              // generic unsigned path (cb 3/4 quads + cb11 escapes)
              int nz = nzs[code];
              uint32_t sbits =
                  nz ? (uint32_t)((w << clen) >> (64 - nz)) : 0;
              int used = clen + nz;
              int bit = nz;
              for (int d = 0; d < dim; d++) {
                int vv = tv[d];
                if (!vv) {
                  cf[k + d] = 0.f;
                  continue;
                }
                bit--;
                if (bt == 11 && vv == 16) {  // escape (aacdec.c:1177-1207)
                  if (used > 34) {  // re-window: 2nd escape can pass bit 57
                    pos += used;
                    used = 0;
                    w = wnd(pos);
                  }
                  uint64_t u = w << used;
                  int n1 = u == ~0ull ? 64 : __builtin_clzll(~u);
                  if (n1 > 8) {
                    b->pos = pos;
                    return -1;
                  }
                  int n = n1 + 4;
                  used += n1 + 1;
                  vv = (1 << n) + (int)((w << used) >> (64 - n));
                  used += n;
                }
                float mag = ht_cbrt[vv];
                int neg = (sbits >> bit) & 1;
                cf[k + d] = (neg ? -mag : mag) * s;
                if (qcap) {
                  int64_t p = (cf - coef) + k + d;
                  qq[p] = (int16_t)(neg ? -vv : vv);
                  qs[p] = sw;
                  g_qw.set(qlane, p);
                } else if (qd) {
                  qd->zrun_to((int)(cf - coef) + k + d);
                  qd->set_sf(sw);
                  qd->value(neg ? -vv : vv);
                }
              }
              pos += used;
            }
          }
        }
        b->pos = pos;
      }
    }
    gbase += g_len * 128;
  }
  return 0;
}

static void apply_pulses(float* coef, const Chan* ch, const int* pos,
                         const int* amp, int count) {
  const int* offsets = ch->ics.swb_offset;
  int idx = 0;
  for (int i = 0; i < count; i++) {
    float co = coef[pos[i]];
    while (offsets[idx + 1] <= pos[i]) idx++;
    if (ch->band_type[idx] != 13 && ch->sf[idx] != 0.f) {
      float ico = -(float)amp[i];
      if (co != 0.f) {
        co /= ch->sf[idx];
        ico = co / sqrtf(sqrtf(fabsf(co))) + (co > 0 ? -ico : ico);
      }
      coef[pos[i]] = cbrtf(fabsf(ico)) * ico * ch->sf[idx];
      if (g_qw.on) g_qw.mark_raw(g_qw.lane_of(coef), pos[i]);
    }
  }
}

// TNS all-pole filter (aacdec.c:1698-1736 behavior)
static void apply_tns(float* coef, Chan* ch) {
  IcsInfo* ics = &ch->ics;
  Tns* t = &ch->tns;
  // the IIR rewrites arbitrary spans; ship the whole lane raw (rare)
  if (g_qw.on) {
    int ql = g_qw.lane_of(coef);
    memset(g_qw.raw[ql], 1, 1024);
    memset(g_qw.act[ql], 0xFF, sizeof(g_qw.act[ql]));
  }
  int mmm = ics->tns_max_bands < ics->max_sfb ? ics->tns_max_bands
                                              : ics->max_sfb;
  for (int w = 0; w < ics->num_windows; w++) {
    int bottom = ics->num_swb;
    for (int f = 0; f < t->n_filt[w]; f++) {
      int top = bottom;
      bottom = top - t->length[w][f];
      if (bottom < 0) bottom = 0;
      int order = t->order[w][f];
      if (!order) continue;
      // reflection -> direct form (lpc.h:61-103, normalize=0)
      float lpc[20];
      for (int i = 0; i < order; i++) {
        float r = -t->coef[w][f][i];
        lpc[i] = r;
        for (int j = 0; j < (i + 1) >> 1; j++) {
          float fv = lpc[j];
          float bv = lpc[i - 1 - j];
          lpc[j] = fv + r * bv;
          lpc[i - 1 - j] = bv + r * fv;
        }
      }
      int bi = bottom < mmm ? bottom : mmm;
      int ti = top < mmm ? top : mmm;
      int start = ics->swb_offset[bi];
      int end = ics->swb_offset[ti];
      int size = end - start;
      if (size <= 0) continue;
      int inc = 1;
      if (t->direction[w][f]) {
        inc = -1;
        start = end - 1;
      }
      start += w * 128;
      for (int m = 0; m < size; m++, start += inc) {
        int lim = m < order ? m : order;
        for (int i = 1; i <= lim; i++)
          coef[start] -= coef[start - i * inc] * lpc[i - 1];
      }
    }
  }
}

static int parse_ics(Bits* b, Chan* ch, int sampling_index, int common_window,
                     float* coef, uint32_t* rng) {
  HH_PROF_SCOPE(1, "parse_ics total");
  int global_gain = getbits(b, 8);
  if (!common_window) {
    int r = parse_ics_info(b, &ch->ics, sampling_index);
    if (r) return r;
  }
  {
    HH_PROF_SCOPE(2, "band_types");
    if (parse_band_types(b, ch)) return -1;
  }
  // spec-capture pre-check from the band types alone: capture-eligible
  // lanes skip the sf VALUE decode entirely (the device decodes the
  // chain from the raw bits; walk_scalefactors keeps the exact range
  // validation and yields sfidx0).  A later demote (pulses/TNS/walk
  // failure/size) re-parses the region with values — intra-frame, so
  // nothing goes stale.
  SpecCap* sc = g_spec_active;
  int is8 = ch->ics.num_windows == 8;
  int nbands = ch->ics.num_window_groups * ch->ics.max_sfb;
  int pre_ok = 0, nsec = 0;
  if (sc && (ch->ics.num_windows == 1 || is8)
      && (is8 || ch->ics.num_window_groups == 1)
      && ch->ics.max_sfb > 0 && nbands <= 120 && g_object_type != 1) {
    int badp = 0;
    for (int g = 0, idx = 0; g < ch->ics.num_window_groups && !badp; g++)
      for (int i = 0; i < ch->ics.max_sfb; i++, idx++) {
        int bt = ch->band_type[idx];
        if (bt >= 12) {  // noise / intensity: device fast path can't
          badp = 1;
          break;
        }
        // runs never cross a group boundary (section_data is per group)
        if (i == 0 || bt != ch->band_type[idx - 1]) nsec++;
      }
    pre_ok = !badp && nsec <= 31;
  }
  int64_t sf_start = b->pos;   // sf-region bit span (raw-bits wire mode)
  int sf_walked = 0, sfidx0w = 0;
  {
    HH_PROF_SCOPE(3, "scalefactors");
    if (pre_ok) {
      if (walk_scalefactors(b, ch, global_gain, &sfidx0w)) return -1;
      sf_walked = 1;
    } else {
      if (parse_scalefactors(b, ch, global_gain)) return -1;
    }
  }
  int64_t sf_end = b->pos;
  int pulse_pos[4], pulse_amp[4], pulse_count = 0;
  if (getbit(b)) {
    // frame-error returns never read the sf values, so a walked region
    // needs no re-parse on these paths
    if (ch->ics.window_sequence == 2) return -1;
    if (parse_pulses(b, &ch->ics, pulse_pos, pulse_amp, &pulse_count))
      return -1;
  }
  ch->tns.present = 0;
  if (getbit(b)) {
    if (parse_tns(b, ch)) return -1;
  }
  if (getbit(b)) return -2;  // SSR
  // wire v4 spec capture: ship the raw spectral bits (no value decode at
  // all) when nothing rewrites the spectrum after the VLC loop and the
  // sf walk fits the 6-bit wire deltas; the device Huffman-decodes
  // (ops/spec_huff.py).  Falls through to the full decode otherwise.
  if (sc) sc->ok = 0;
  if (pre_ok && !ch->tns.present && !pulse_count) {
    int bad = 0;
    // the sf region ships as raw bits; it must fit the device's SFB
    // classify axis (ops/spec_huff.SFB = 768, margin for window reads)
    if (sf_end - sf_start > 768 - 24) bad = 1;
    if (!bad) {
      HH_PROF_SCOPE(4, "walk_spectrum+cap");
      int64_t bp0 = b->pos;
      if (walk_spectrum(b, ch, sc->bandpos) == 0
          && sc->bandpos[nbands] - sc->bandpos[0] < (1 << 13)) {
        sc->ok = 1;
        sc->ms_flag = 0;
        sc->max_sfb = ch->ics.max_sfb;
        sc->n_bands = nbands;
        sc->is8 = is8;
        sc->grouping = 0;
        if (is8) {  // bit (7-w): window w shares window w-1's group
          int w = 0;
          for (int g = 0; g < ch->ics.num_window_groups; g++)
            for (int r = 0; r < ch->ics.group_len[g]; r++, w++)
              if (r >= 1) sc->grouping |= (uint8_t)(1 << (7 - w));
        }
        for (int i = 0; i < nbands; i++)
          sc->band_cb[i] = (uint8_t)ch->band_type[i];
        if (sf_walked) {
          sc->sfidx0v = (uint16_t)sfidx0w;
        } else {
          sc->sfidx0v = 0;
          for (int f = 0; f < nbands; f++)
            if (ch->band_type[f] >= 1) {
              sc->sfidx0v = ch->sfwb[f];
              break;
            }
        }
        sc->sf_walked = sf_walked;
        sc->gg = global_gain;
        sc->sf_start = sf_start;
        sc->sf_end = sf_end;
        sc->buf = b->buf;
        sc->nbits = b->nbits;
        return 0;
      }
      b->pos = bp0;  // spec block too big: full decode + tokens instead
      sc->ok = 0;
    }
  }
  if (sf_walked) {
    // demoted to the full decode: re-parse the sf region with values
    // (the walk already validated the chain, so this cannot fail)
    int64_t save = b->pos;
    b->pos = sf_start;
    if (parse_scalefactors(b, ch, global_gain)) return -1;
    b->pos = save;
  }
  // direct token emission only when decode order == output order and no
  // post-pass rewrites coefficients (long window, no TNS, no pulses, no
  // intensity bands — those are filled from the other channel later)
  int has_is = 0;
  if (g_qwd_arm)
    for (int i = 0; i < ch->ics.num_window_groups * ch->ics.max_sfb; i++)
      has_is |= ch->band_type[i] >= 14;
  g_qwd = (g_qwd_arm && ch->ics.num_window_groups == 1
           && ch->ics.num_windows == 1 && !ch->tns.present && !pulse_count
           && !has_is)
              ? g_qwd_arm
              : nullptr;
  if (g_qwd) {
    g_qwd->nt = g_qwd->ne = 0;
    g_qwd->pos = 0;
    g_qwd->cur_sf = -1;
  }
  {
    HH_PROF_SCOPE(5, "parse_spectrum(full)");
    if (parse_spectrum(b, ch, coef, rng)) {
      g_qwd = nullptr;
      return -1;
    }
  }
  if (pulse_count) apply_pulses(coef, ch, pulse_pos, pulse_amp, pulse_count);
  return 0;
}

static void fill_meta(const Chan* ch, int32_t* meta) {
  meta[0] = ch->ics.window_sequence;
  meta[1] = ch->ics.use_kb_window;
  meta[2] = ch->ics.max_sfb;
  meta[3] = ch->ics.num_windows;
  meta[4] = ch->ics.num_window_groups;
  for (int i = 0; i < 8; i++) meta[5 + i] = ch->ics.group_len[i];
  meta[13] = ch->tns.present;
}

}  // namespace

extern "C" {

int ht_init() {
  static int done = 0;
  if (done) return 0;
  build_vlc(&vlc_sf, ht_sf_codes, ht_sf_bits, 121);
#define BV(n, arr_c, arr_b, cnt) \
  build_vlc(&vlc_spec[n], arr_c, arr_b, cnt)
  BV(1, ht_spec_codes_1, ht_spec_bits_1, 81);
  BV(2, ht_spec_codes_2, ht_spec_bits_2, 81);
  BV(3, ht_spec_codes_3, ht_spec_bits_3, 81);
  BV(4, ht_spec_codes_4, ht_spec_bits_4, 81);
  BV(5, ht_spec_codes_5, ht_spec_bits_5, 81);
  BV(6, ht_spec_codes_6, ht_spec_bits_6, 81);
  BV(7, ht_spec_codes_7, ht_spec_bits_7, 64);
  BV(8, ht_spec_codes_8, ht_spec_bits_8, 64);
  BV(9, ht_spec_codes_9, ht_spec_bits_9, 169);
  BV(10, ht_spec_codes_10, ht_spec_bits_10, 169);
  BV(11, ht_spec_codes_11, ht_spec_bits_11, 289);
#undef BV
  build_codebooks();
  // spec-mode length-walk LUTs (one entry per 11-bit window; codes longer
  // than 11 bits fall to the two-level VLC slow path)
  {
    const uint32_t* cds[12] = {nullptr, ht_spec_codes_1, ht_spec_codes_2,
                               ht_spec_codes_3, ht_spec_codes_4,
                               ht_spec_codes_5, ht_spec_codes_6,
                               ht_spec_codes_7, ht_spec_codes_8,
                               ht_spec_codes_9, ht_spec_codes_10,
                               ht_spec_codes_11};
    const uint8_t* bts[12] = {nullptr, ht_spec_bits_1, ht_spec_bits_2,
                              ht_spec_bits_3, ht_spec_bits_4,
                              ht_spec_bits_5, ht_spec_bits_6,
                              ht_spec_bits_7, ht_spec_bits_8,
                              ht_spec_bits_9, ht_spec_bits_10,
                              ht_spec_bits_11};
    const int cnt[12] = {0, 81, 81, 81, 81, 81, 81, 64, 64, 169, 169, 289};
    for (int cb = 1; cb <= 11; cb++) {
      memset(cb_walk[cb], 0, sizeof(cb_walk[cb]));
      for (int ci = 0; ci < cnt[cb]; ci++) {
        int len = bts[cb][ci];
        if (len > 11) continue;
        int adv = len + (cb_signed[cb] ? 0 : cb_nz[cb][ci]);
        int nesc = 0;
        if (cb == 11) {
          const int8_t* tv = cb_vals[11] + ci * 2;
          nesc = (tv[0] == 16) + (tv[1] == 16);
        }
        uint8_t e = (uint8_t)(adv | (nesc << 6));
        uint32_t base = cds[cb][ci] << (11 - len);
        for (uint32_t j = 0; j < (1u << (11 - len)); j++)
          cb_walk[cb][base + j] = e;
      }
    }
  }
  done = 1;
  return 0;
}

// Parse one SCE/LFE individual channel stream.  Returns 0 on success,
// -2 if the stream needs the Python fallback (AAC Main / SSR), -1 on error.
int ht_parse_sce(const uint8_t* buf, int64_t nbits, int64_t* pos,
                 int sampling_index, float* coeffs, int32_t* meta,
                 uint32_t* rng_state, int apply_tns_now) {
  Bits b{buf, nbits, *pos};
  Chan local;
  // dependent-CCE frames defer TNS past the spectral coupling add
  // (aacdec.c:1870-1890 ordering): the caller provides Chan storage so
  // the TNS filter state survives the element loop (one-shot arming)
  Chan* chp = g_chan_export[0] ? g_chan_export[0] : &local;
  g_chan_export[0] = nullptr;
  float* pst = g_pred_export[0];
  g_pred_export[0] = nullptr;
  Chan& ch = *chp;
  // parse_ics fills every field it later reads; only the band maps need
  // zeroing (apply_pulses may walk past max_sfb) — a full Chan memset is
  // ~10 KB/frame of the TNS coef array alone
  memset(&ch.ics, 0, sizeof(ch.ics));
  memset(ch.band_type, 0, sizeof(ch.band_type));
  memset(ch.sf, 0, sizeof(ch.sf));
  int r = parse_ics(&b, &ch, sampling_index, 0, coeffs, rng_state);
  if (r) return r;
  // Main: prediction right after the spectrum decode, before TNS
  // (aacdec.c:1381; TNS is only parsed in decode_ics, applied later)
  if (g_object_type == 1 && pst)
    apply_main_prediction(coeffs, pst, &ch.ics, sampling_index);
  if (ch.tns.present && apply_tns_now) apply_tns(coeffs, &ch);
  fill_meta(&ch, meta);
  *pos = b.pos;
  return 0;
}

// Parse a channel_pair_element (aacdec.c:1460-1494 behavior, LC tools).
int ht_parse_cpe(const uint8_t* buf, int64_t nbits, int64_t* pos,
                 int sampling_index, float* coeffs0, float* coeffs1,
                 int32_t* meta0, int32_t* meta1, uint32_t* rng_state,
                 int apply_tns_now) {
  Bits b{buf, nbits, *pos};
  Chan l0, l1;
  Chan& ch0 = g_chan_export[0] ? *g_chan_export[0] : l0;
  Chan& ch1 = g_chan_export[1] ? *g_chan_export[1] : l1;
  g_chan_export[0] = g_chan_export[1] = nullptr;
  float* pst0 = g_pred_export[0];
  float* pst1 = g_pred_export[1];
  g_pred_export[0] = g_pred_export[1] = nullptr;
  // targeted zeroing (see ht_parse_sce): skip the 10 KB full-struct memset
  memset(&ch0.ics, 0, sizeof(ch0.ics));
  memset(ch0.band_type, 0, sizeof(ch0.band_type));
  memset(ch0.sf, 0, sizeof(ch0.sf));
  memset(&ch1.ics, 0, sizeof(ch1.ics));
  memset(ch1.band_type, 0, sizeof(ch1.band_type));
  memset(ch1.sf, 0, sizeof(ch1.sf));
  uint8_t ms_mask[128];
  memset(ms_mask, 0, sizeof(ms_mask));
  int ms_present = 0;
  int common_window = getbit(&b);
  if (common_window) {
    int r = parse_ics_info(&b, &ch0.ics, sampling_index);
    if (r) return r;
    ch1.ics = ch0.ics;
    ms_present = getbits(&b, 2);
    if (ms_present == 3) return -1;
    int nmask = ch0.ics.num_window_groups * ch0.ics.max_sfb;
    if (ms_present == 1)
      for (int i = 0; i < nmask; i++) ms_mask[i] = (uint8_t)getbit(&b);
    else if (ms_present == 2)
      memset(ms_mask, 1, nmask);
  }
  int allow_direct = ms_present == 0;
  SpecCap* scc[2] = {g_spec_cpe[0], g_spec_cpe[1]};
  g_spec_cpe[0] = g_spec_cpe[1] = nullptr;  // one-shot arming
  for (int c = 0; c < 2; c++)
    if (scc[c]) scc[c]->ok = 0;
  g_qwd_arm = allow_direct ? g_qwd_cpe[0] : nullptr;
  if (g_qwd_arm) {
    g_qwd_arm->nt = g_qwd_arm->ne = 0;
  }
  g_spec_active = scc[0];
  int r = parse_ics(&b, &ch0, sampling_index, common_window, coeffs0,
                    rng_state);
  g_spec_active = nullptr;
  g_qwd_cpe_used[0] = g_qwd != nullptr;
  g_qwd = nullptr;
  if (r) {
    g_qwd_arm = nullptr;
    return r;
  }
  g_qwd_arm = allow_direct ? g_qwd_cpe[1] : nullptr;
  g_spec_active = scc[1];
  r = parse_ics(&b, &ch1, sampling_index, common_window, coeffs1, rng_state);
  g_spec_active = nullptr;
  g_qwd_cpe_used[1] = g_qwd != nullptr;
  g_qwd = nullptr;
  g_qwd_arm = nullptr;
  if (r) return r;

  // spec-capture (raw-bits) CPE lanes: decide device vs host stereo tools.
  // Raw bits predate the M/S butterfly and intensity fill, so
  //  - effective M/S needs BOTH channels captured (the device butterflies
  //    the pair, W3_MS_LEFT/RIGHT) or neither (host butterfly + tokens);
  //  - intensity in ch1 excludes ch1 from capture (band-type gate) and
  //    needs ch0's decoded VALUES on the host, so a captured ch0 gets its
  //    spectrum re-decoded (capture stays valid — ch0's own output equals
  //    its raw-bits decode when no M/S touches it).
  int cap0 = scc[0] && scc[0]->ok, cap1 = scc[1] && scc[1]->ok;
  int nmask = common_window ? ch0.ics.num_window_groups * ch0.ics.max_sfb
                            : 0;
  int ms_eff = 0;
  if (ms_present)
    for (int i = 0; i < nmask; i++)
      ms_eff |= ms_mask[i] && ch0.band_type[i] < 13 && ch1.band_type[i] < 13;
  int intens = 0;
  for (int i = 0;
       i < ch1.ics.num_window_groups * ch1.ics.max_sfb && !intens; i++)
    intens |= ch1.band_type[i] >= 14;
  int device_ms = ms_eff && cap0 && cap1;
  if (device_ms) {
    scc[0]->ms_flag = 1;
    scc[1]->ms_flag = 2;
    // per (group, sfb) band in read order — the device maps bins through
    // the same band index (ops/spec_huff.py f_q), so EIGHT_SHORT pairs
    // butterfly correctly too
    for (int i = 0; i < scc[0]->n_bands; i++)
      scc[0]->ms_mask[i] = (uint8_t)(ms_mask[i] != 0);
  } else {
    // host path needs real values for any captured channel feeding the
    // M/S butterfly; intensity only reads ch0 (capture stays valid).
    // sf-walked captures re-parse their sf region first (parse_spectrum
    // dequants through ch->sf, which the walk never filled).
    Chan* chp[2] = {&ch0, &ch1};
    float* cfp[2] = {coeffs0, coeffs1};
    for (int c = 0; c < 2; c++) {
      int need = c == 0 ? (cap0 && (ms_eff || intens)) : (cap1 && ms_eff);
      if (!need) continue;
      if (scc[c]->sf_walked) {
        Bits sb{buf, nbits, scc[c]->sf_start};
        if (parse_scalefactors(&sb, chp[c], scc[c]->gg)) return -1;
        scc[c]->sf_walked = 0;
      }
      Bits rb{buf, nbits, scc[c]->bandpos[0]};
      if (parse_spectrum(&rb, chp[c], cfp[c], rng_state)) return -1;
      if (ms_eff) scc[c]->ok = 0;
    }
  }

  if (common_window && ms_present && !device_ms) {
    // M/S (aacdec.c:1390-1411)
    const int* offsets = ch0.ics.swb_offset;
    int idx = 0;
    float* c0 = coeffs0;
    float* c1 = coeffs1;
    for (int g = 0; g < ch0.ics.num_window_groups; g++) {
      for (int i = 0; i < ch0.ics.max_sfb; i++, idx++) {
        if (ms_mask[idx] && ch0.band_type[idx] < 13 &&
            ch1.band_type[idx] < 13) {
          for (int grp = 0; grp < ch0.ics.group_len[g]; grp++) {
            for (int k = offsets[i]; k < offsets[i + 1]; k++) {
              float a = c0[grp * 128 + k];
              float bb = c1[grp * 128 + k];
              c0[grp * 128 + k] = a + bb;
              c1[grp * 128 + k] = a - bb;
              if (g_qw.on) {
                // lanes are global in multi-element layouts: resolve from
                // the coefficient base, never hardcode 0/1
                int64_t p = (c0 - coeffs0) + grp * 128 + k;
                g_qw.mark_raw(g_qw.lane_of(coeffs0), p);
                g_qw.mark_raw(g_qw.lane_of(coeffs1), p);
              }
            }
          }
        }
      }
      c0 += ch0.ics.group_len[g] * 128;
      c1 += ch0.ics.group_len[g] * 128;
    }
  }
  // Main: prediction lands between M/S and intensity (aacdec.c:1487-1493
  // for common_window; for !common_window the reference predicts inside
  // each decode_ics — state is per channel, so deferring both to this
  // point is value-identical and still precedes the intensity fill)
  if (g_object_type == 1 && pst0 && pst1) {
    apply_main_prediction(coeffs0, pst0, &ch0.ics, sampling_index);
    apply_main_prediction(coeffs1, pst1, &ch1.ics, sampling_index);
  }
  {  // intensity stereo (aacdec.c:1420-1451)
    const int* offsets = ch1.ics.swb_offset;
    int idx = 0;
    float* c0 = coeffs0;
    float* c1 = coeffs1;
    for (int g = 0; g < ch1.ics.num_window_groups; g++) {
      for (int i = 0; i < ch1.ics.max_sfb;) {
        int bt = ch1.band_type[idx];
        if (bt == 14 || bt == 15) {
          int end = ch1.band_run_end[idx];
          for (; i < end; i++, idx++) {
            int c = -1 + 2 * (ch1.band_type[idx] - 14);
            if (ms_present) c *= 1 - 2 * ms_mask[idx];
            float scale = (float)c * ch1.sf[idx];
            for (int grp = 0; grp < ch1.ics.group_len[g]; grp++)
              for (int k = offsets[i]; k < offsets[i + 1]; k++) {
                c1[grp * 128 + k] = scale * c0[grp * 128 + k];
                if (g_qw.on)
                  g_qw.mark_raw(g_qw.lane_of(coeffs1),
                                (c1 - coeffs1) + grp * 128 + k);
              }
          }
        } else {
          int end = ch1.band_run_end[idx];
          idx += end - i;
          i = end;
        }
      }
      c0 += ch1.ics.group_len[g] * 128;
      c1 += ch1.ics.group_len[g] * 128;
    }
  }
  if (apply_tns_now) {
    if (ch0.tns.present) apply_tns(coeffs0, &ch0);
    if (ch1.tns.present) apply_tns(coeffs1, &ch1);
  }
  fill_meta(&ch0, meta0);
  fill_meta(&ch1, meta1);
  *pos = b.pos;
  return 0;
}

// Whole-stream ADTS parse for plain LC layouts (channel configs 1-7):
// ADTS framing + the per-frame element loop run entirely natively, with
// per-lane window-sequence chaining and per-frame error isolation (a bad
// frame becomes silence in its lanes; the ADTS length field resyncs).
// The analogue of the reference's packet loop + aac_decode_frame parse half
// (aac_ac3_parser.c:26 + aacdec.c:1973-2076) for the batched host path.
//
// lane_base: [128] lane index for (etype<<4)|tag, -1 if not part of the
// layout (elements may appear in any order; the reference encoder emits
// SCE-first while the layout map lists CPE-first).  n_lanes = total output
// lanes.  meta_out stride is 8 per lane: [ws, wsp, kbd, kbdp, tns_present,
// err, 0, 0].  Returns #frames parsed, or -2 when the stream needs the
// Python fallback (PCE/CCE/Main/SSR or an unexpected element).
int ht_parse_stream(const uint8_t* buf, int64_t nbytes, int sampling_index,
                    const int32_t* lane_base, int n_lanes,
                    float* coeffs_out, int32_t* meta_out, int max_frames) {
  uint32_t rng = 0;
  int frame = 0;
  int64_t off = 0;  // byte offset
  // per-lane window chain state
  int prev_ws[64], prev_kbd[64];
  for (int i = 0; i < n_lanes && i < 64; i++) {
    prev_ws[i] = 0;
    prev_kbd[i] = 0;
  }
  if (n_lanes > 64) return -2;
  // AAC-Main: per-lane predictor state (single-threaded, like the qwire
  // path's hh_pred_state); restore the LC default on every exit
  int main_latch = 0;
  static float st_pred_state[64][PRED_N * 6];
  struct AotGuard {
    ~AotGuard() {
      g_object_type = 2;
      g_pred_export[0] = g_pred_export[1] = nullptr;
    }
  } aot_guard;
  while (off + 7 <= nbytes && frame < max_frames) {
    // resynchronize on the ADTS syncword (aac_ac3_parser.c:26)
    if (buf[off] != 0xFF || (buf[off + 1] & 0xF6) != 0xF0) {
      off++;
      continue;
    }
    int prot_absent = buf[off + 1] & 1;
    int64_t flen = ((int64_t)(buf[off + 3] & 3) << 11) |
                   ((int64_t)buf[off + 4] << 3) | (buf[off + 5] >> 5);
    if (flen < 7 || off + flen > nbytes) break;
    // object type is per FRAME (aacdec.c:1989 re-reads the header);
    // mid-stream LC<->Main flips just freeze/resume the predictor state
    int aot = ((buf[off + 2] >> 6) & 3) + 1;
    if (aot != 1 && aot != 2) return -2;
    if (frame == 0)
      for (int l = 0; l < n_lanes; l++) pred_reset_state(st_pred_state[l]);
    main_latch = aot == 1;
    g_object_type = main_latch ? 1 : 2;
    int64_t body = (off + (prot_absent ? 7 : 9)) * 8;
    Bits b{buf, (off + flen) * 8, body};

    float* fc = coeffs_out + (int64_t)frame * n_lanes * 1024;
    int32_t* fm = meta_out + (int64_t)frame * n_lanes * 8;
    memset(fc, 0, sizeof(float) * n_lanes * 1024);
    for (int l = 0; l < n_lanes; l++) {
      fm[l * 8 + 0] = 0;
      fm[l * 8 + 1] = prev_ws[l];
      fm[l * 8 + 2] = 0;
      fm[l * 8 + 3] = prev_kbd[l];
      fm[l * 8 + 4] = 0;
      fm[l * 8 + 5] = 1;  // err until parsed
    }

    int filled = 0, bad = 0;
    for (;;) {
      if (b.pos + 3 > b.nbits) {
        bad = 1;
        break;
      }
      int etype = getbits(&b, 3);
      if (etype == 7) break;  // END
      if (etype == 6) {       // FIL
        int cnt = getbits(&b, 4);
        if (cnt == 15) cnt += getbits(&b, 8) - 1;
        b.pos += 8 * cnt;
        if (b.pos > b.nbits) {
          bad = 1;
          break;
        }
        continue;
      }
      if (etype == 4) {  // DSE (aacdec.c:1582)
        getbits(&b, 4);
        int align = getbit(&b);
        int cnt = getbits(&b, 8);
        if (cnt == 255) cnt += getbits(&b, 8);
        if (align) b.pos = (b.pos + 7) & ~7;
        b.pos += 8 * cnt;
        if (b.pos > b.nbits) {
          bad = 1;
          break;
        }
        continue;
      }
      if (etype != 0 && etype != 1 && etype != 3) return -2;  // PCE/CCE
      int tag = getbits(&b, 4);
      int lane = lane_base[(etype << 4) | tag];
      if (lane < 0) return -2;  // element outside the layout
      int r;
      if (etype == 1) {  // CPE: reuse the pair parser body via ht_parse_cpe
        int64_t p = b.pos;
        int32_t m0[16], m1[16];
        if (main_latch) {
          g_pred_export[0] = st_pred_state[lane];
          g_pred_export[1] = st_pred_state[lane + 1];
        }
        r = ht_parse_cpe(buf, b.nbits, &p, sampling_index,
                         fc + (int64_t)lane * 1024,
                         fc + (int64_t)(lane + 1) * 1024, m0, m1, &rng, 1);
        if (r == -2) return -2;
        if (r) {
          bad = 1;
          break;
        }
        b.pos = p;
        for (int c = 0; c < 2; c++) {
          const int32_t* m = c ? m1 : m0;
          int32_t* dst = fm + (lane + c) * 8;
          dst[0] = m[0];
          dst[2] = m[1];
          dst[4] = m[13];
          dst[5] = 0;
        }
        filled += 2;
      } else {  // SCE / LFE
        int64_t p = b.pos;
        int32_t m0[16];
        if (main_latch) g_pred_export[0] = st_pred_state[lane];
        r = ht_parse_sce(buf, b.nbits, &p, sampling_index,
                         fc + (int64_t)lane * 1024, m0, &rng, 1);
        if (r == -2) return -2;
        if (r) {
          bad = 1;
          break;
        }
        b.pos = p;
        int32_t* dst = fm + lane * 8;
        dst[0] = m0[0];
        dst[2] = m0[1];
        dst[4] = m0[13];
        dst[5] = 0;
        filled++;
      }
    }
    if (!bad && filled != n_lanes) bad = 1;
    if (bad) {
      // frame becomes silence; window chain continues unchanged
      memset(fc, 0, sizeof(float) * n_lanes * 1024);
      for (int l = 0; l < n_lanes; l++) {
        fm[l * 8 + 0] = prev_ws[l];
        fm[l * 8 + 2] = prev_kbd[l];
        fm[l * 8 + 5] = 1;
      }
    }
    for (int l = 0; l < n_lanes; l++) {
      prev_ws[l] = fm[l * 8 + 0];
      prev_kbd[l] = fm[l * 8 + 2];
    }
    off += flen;
    frame++;
  }
  return frame;
}

}  // extern "C"

#include "he_host.inc"
