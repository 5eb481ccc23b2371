// hutoken-tpu native host runtime.
//
// Host-side tokenization engine with a C ABI for ctypes:
//   * parser word splitting (same character classes as the Python
//     pretokenize module; behavioral spec: reference src/parser.c),
//   * byte/char remapping (spec: reference src/pretokenizer.c:30-100),
//   * exact scalar greedy BPE, string-rank and merge-rank paths
//     (spec: reference src/core.c:66-337 — merge the valid adjacent
//     pair minimizing (rank, left_index) until none remains),
//   * batched encode/decode with a std::thread pool over documents,
//   * word-level dedup + seed packing for the TPU device path.
//
// This is a from-scratch C++17 implementation: flat open-addressed
// hash maps keyed by 64-bit mixes of byte strings, arena-free (vectors
// + reserve), slices as (ptr,len) pairs.
//
// Build: make -C native   ->  native/libhutoken_host.so

#include <algorithm>
#include <atomic>
#include <chrono>
#include <cctype>
#include <cstdint>
#include <cstdlib>
#include <cstring>
#include <string>
#include <thread>
#include <vector>

#if defined(__x86_64__)
#include <immintrin.h>
#endif

namespace {

// MSVC portability shims (the AVX-512 splitter section is x86-64
// GCC/Clang only and compiles out elsewhere; these cover the two
// stray builtins used on the portable paths)
#if !defined(__GNUC__) && !defined(__clang__)
#define __builtin_prefetch(addr, rw, locality) ((void)0)
#endif


// ---------------------------------------------------------------- hashing

inline uint64_t mix64(uint64_t x) {
  x ^= x >> 33;
  x *= 0xff51afd7ed558ccdULL;
  x ^= x >> 33;
  x *= 0xc4ceb9fe1a85ec53ULL;
  x ^= x >> 33;
  return x;
}

inline uint64_t hash_bytes(const uint8_t* p, size_t n) {
  uint64_t h = 1469598103934665603ULL ^ (n * 0x9E3779B97F4A7C15ULL);
  size_t i = 0;
  while (i + 8 <= n) {
    uint64_t k;
    std::memcpy(&k, p + i, 8);
    h = mix64(h ^ k);
    i += 8;
  }
  uint64_t tail = 0;
  for (size_t j = 0; i + j < n; ++j) tail |= uint64_t(p[i + j]) << (8 * j);
  return mix64(h ^ tail);
}

// ------------------------------------------------- bytes -> id flat map

struct StrMap {
  // open addressing; slots store (hash, offset, len, id)
  struct Slot {
    uint64_t hash = 0;
    int64_t off = -1;
    int32_t len = 0;
    int32_t id = 0;
  };
  std::vector<uint8_t> pool;
  std::vector<Slot> slots;
  uint64_t mask = 0;
  size_t count = 0;

  void reserve_slots(size_t n) {
    size_t cap = 16;
    while (cap < 2 * n + 8) cap <<= 1;
    slots.assign(cap, Slot{});
    mask = cap - 1;
  }

  void set(const uint8_t* p, int32_t len, int32_t id) {
    if (count * 2 >= slots.size()) grow();
    uint64_t h = hash_bytes(p, size_t(len));
    size_t i = h & mask;
    while (slots[i].off >= 0) {
      if (slots[i].hash == h && slots[i].len == len &&
          std::memcmp(pool.data() + slots[i].off, p, size_t(len)) == 0) {
        slots[i].id = id;  // last-wins, like hashmap_set
        return;
      }
      i = (i + 1) & mask;
    }
    int64_t off = int64_t(pool.size());
    pool.insert(pool.end(), p, p + len);
    slots[i] = Slot{h, off, len, id};
    ++count;
  }

  // lookup of the concatenation of two byte ranges without copying
  bool get2(const uint8_t* a, int32_t la, const uint8_t* b, int32_t lb,
            int32_t* out) const {
    uint8_t buf[512];
    const uint8_t* p;
    int32_t len = la + lb;
    std::string heap;
    if (len <= int32_t(sizeof(buf))) {
      std::memcpy(buf, a, size_t(la));
      std::memcpy(buf + la, b, size_t(lb));
      p = buf;
    } else {
      heap.assign(reinterpret_cast<const char*>(a), size_t(la));
      heap.append(reinterpret_cast<const char*>(b), size_t(lb));
      p = reinterpret_cast<const uint8_t*>(heap.data());
    }
    return get(p, len, out);
  }

  bool get(const uint8_t* p, int32_t len, int32_t* out) const {
    if (slots.empty()) return false;
    uint64_t h = hash_bytes(p, size_t(len));
    size_t i = h & mask;
    while (slots[i].off >= 0) {
      if (slots[i].hash == h && slots[i].len == len &&
          std::memcmp(pool.data() + slots[i].off, p, size_t(len)) == 0) {
        *out = slots[i].id;
        return true;
      }
      i = (i + 1) & mask;
    }
    return false;
  }

  void grow() {
    std::vector<Slot> old;
    old.swap(slots);
    size_t cap = std::max<size_t>(old.size() * 2, 16);
    slots.assign(cap, Slot{});
    mask = cap - 1;
    for (const Slot& s : old) {
      if (s.off < 0) continue;
      size_t i = s.hash & mask;
      while (slots[i].off >= 0) i = (i + 1) & mask;
      slots[i] = s;
    }
  }
};

// ------------------------------------------------ (id,id) -> value map

struct PairMap {
  struct Slot {
    int64_t key = -1;
    int32_t rank = 0;
    int32_t merged = 0;
  };
  std::vector<Slot> slots;
  uint64_t mask = 0;
  size_t count = 0;

  void reserve_slots(size_t n) {
    size_t cap = 16;
    while (cap < 2 * n + 8) cap <<= 1;
    slots.assign(cap, Slot{});
    mask = cap - 1;
  }

  void set(int32_t a, int32_t b, int32_t rank, int32_t merged) {
    if (slots.empty()) reserve_slots(16);
    if (count * 2 >= slots.size()) grow();
    int64_t key = (int64_t(a) << 32) | uint32_t(b);
    size_t i = mix64(uint64_t(key)) & mask;
    while (slots[i].key >= 0) {
      if (slots[i].key == key) {
        slots[i].rank = rank;
        slots[i].merged = merged;
        return;
      }
      i = (i + 1) & mask;
    }
    slots[i] = Slot{key, rank, merged};
    ++count;
  }

  bool get(int32_t a, int32_t b, int32_t* rank, int32_t* merged) const {
    if (slots.empty() || a < 0 || b < 0) return false;
    int64_t key = (int64_t(a) << 32) | uint32_t(b);
    size_t i = mix64(uint64_t(key)) & mask;
    while (slots[i].key >= 0) {
      if (slots[i].key == key) {
        *rank = slots[i].rank;
        *merged = slots[i].merged;
        return true;
      }
      i = (i + 1) & mask;
    }
    return false;
  }

  void grow() {
    std::vector<Slot> old;
    old.swap(slots);
    size_t cap = std::max<size_t>(old.size() * 2, 16);
    slots.assign(cap, Slot{});
    mask = cap - 1;
    for (const Slot& s : old) {
      if (s.key < 0) continue;
      size_t i = mix64(uint64_t(s.key)) & mask;
      while (slots[i].key >= 0) i = (i + 1) & mask;
      slots[i] = s;
    }
  }
};

// --------------------------------------------------------------- parser

inline int u8len(uint8_t b) {
  if ((b & 0x80) == 0) return 1;
  if ((b & 0xE0) == 0xC0) return 2;
  if ((b & 0xF0) == 0xE0) return 3;
  if ((b & 0xF8) == 0xF0) return 4;
  return 1;
}

// decode with validation of continuation bytes; 0 on invalid (the parser
// classes treat invalid sequences as un-consumable, spec src/parser.c:144)
inline uint32_t decode_utf8_checked(const uint8_t* p, const uint8_t* end,
                                    int* len) {
  if (p >= end) return 0;
  uint8_t b0 = p[0];
  if (b0 < 0x80) {
    *len = 1;
    return b0;
  }
  if ((b0 & 0xE0) == 0xC0) {
    if (p + 1 >= end || (p[1] & 0xC0) != 0x80) return 0;
    *len = 2;
    return (uint32_t(b0 & 0x1F) << 6) | (p[1] & 0x3F);
  }
  if ((b0 & 0xF0) == 0xE0) {
    if (p + 2 >= end || (p[1] & 0xC0) != 0x80 || (p[2] & 0xC0) != 0x80)
      return 0;
    *len = 3;
    return (uint32_t(b0 & 0x0F) << 12) | (uint32_t(p[1] & 0x3F) << 6) |
           (p[2] & 0x3F);
  }
  if ((b0 & 0xF8) == 0xF0) {
    if (p + 3 >= end || (p[1] & 0xC0) != 0x80 || (p[2] & 0xC0) != 0x80 ||
        (p[3] & 0xC0) != 0x80)
      return 0;
    *len = 4;
    return (uint32_t(b0 & 0x07) << 18) | (uint32_t(p[1] & 0x3F) << 12) |
           (uint32_t(p[2] & 0x3F) << 6) | (p[3] & 0x3F);
  }
  return 0;
}

inline bool is_hu_alpha(uint32_t cp) {
  if ((cp >= 'a' && cp <= 'z') || (cp >= 'A' && cp <= 'Z')) return true;
  switch (cp) {
    case 0x00E1: case 0x00E9: case 0x00ED: case 0x00F3: case 0x00FA:
    case 0x0151: case 0x0171: case 0x00FC: case 0x00F6:
    case 0x00C1: case 0x00C9: case 0x00CD: case 0x00D3: case 0x00DA:
    case 0x0150: case 0x0170: case 0x00DC: case 0x00D6:
      return true;
    default:
      return false;
  }
}

inline bool is_ws(uint32_t cp) {
  return cp == ' ' || cp == '\t' || cp == '\n' || cp == '\v' || cp == '\f' ||
         cp == '\r';
}

inline bool is_dig(uint32_t cp) { return cp >= '0' && cp <= '9'; }

inline bool is_oth(uint32_t cp) {
  return cp != 0 && !is_ws(cp) && !is_hu_alpha(cp) && !is_dig(cp);
}

// per-ASCII-byte class bits for the split fast path (multi-byte chars
// take the decode path; bytes >= 0x80 are never matched by the table)
enum : uint8_t { CLS_ALPHA = 1, CLS_DIGIT = 2, CLS_OTH = 4, CLS_WS = 8 };
struct AsciiClassTable {
  uint8_t t[256] = {};
  AsciiClassTable() {
    for (int b = 0; b < 0x80; ++b) {
      uint32_t cp = uint32_t(b);
      if (is_ws(cp))
        t[b] = CLS_WS;
      else if (is_hu_alpha(cp))
        t[b] = CLS_ALPHA;
      else if (is_dig(cp))
        t[b] = CLS_DIGIT;
      else if (cp != 0)
        t[b] = CLS_OTH;
    }
  }
};
const AsciiClassTable kAscii;

// emit word slices [start, end) into out; returns count
size_t split_words(const uint8_t* text, size_t n,
                   std::vector<std::pair<int64_t, int64_t>>& out) {
  const uint8_t* end = text + n;
  size_t pos = 0;
  while (pos < n) {
    // class cascade with one optional leading 0x20
    bool matched = false;
    for (int cls = 0; cls < 3 && !matched; ++cls) {
      const uint8_t want = cls == 0 ? CLS_ALPHA : cls == 1 ? CLS_DIGIT : CLS_OTH;
      size_t s = pos;
      if (text[s] == ' ') ++s;
      size_t e = s;
      while (e < n) {
        uint8_t b = text[e];
        if (b < 0x80) {  // ASCII fast path: one table load per byte
          if (kAscii.t[b] != want) break;
          ++e;
          continue;
        }
        int len = 0;
        uint32_t cp = decode_utf8_checked(text + e, end, &len);
        bool ok = cls == 0   ? is_hu_alpha(cp)
                  : cls == 1 ? is_dig(cp)
                             : is_oth(cp);
        if (cp == 0 || !ok) break;
        e += size_t(len);
      }
      if (e > s) {
        out.emplace_back(int64_t(pos), int64_t(e));
        pos = e;
        matched = true;
      }
    }
    if (matched) continue;
    if (text[pos] == ' ') {
      size_t e = pos + 1;
      while (e < n && text[e] == ' ') ++e;
      out.emplace_back(int64_t(pos), int64_t(e));
      pos = e;
      continue;
    }
    out.emplace_back(int64_t(pos), int64_t(pos + 1));
    ++pos;
  }
  return out.size();
}

// ----------------------------------------------- SIMD split fast path
//
// The scalar splitter above re-scans each position once per class in
// the cascade.  For ASCII text (the overwhelmingly common case) the
// token-START positions are a pure function of a 3-byte local window,
// so they vectorize: classify 64 bytes per instruction via a 128-entry
// VPERMI2B table, derive a 64-bit "token starts here" mask with shifts
// and boolean ops, and extract set bits.  Equivalence with the scalar
// cascade (same classes, same [ ]?-glue and space-run semantics as
// reference src/parser.c:14-141) is fuzz-checked in tests/test_native.py.
//
// Derivation of the start rule for ASCII byte i (classes: A alpha,
// D digit, O other, W space 0x20, S single-char = \t\n\v\f\r and NUL):
//   * W: start iff byte i-1 is not a space (a space after content opens
//     either a glued "[ ]word" token or a space run; later spaces of a
//     run are continuations),
//   * S: always a start (each is its own token),
//   * A/D/O: if byte i-1 is a space, the space GLUED to this run iff it
//     was single (i.e. byte i-2 is not a space) — so start iff i-2 is
//     also a space; otherwise start iff byte i-1 has a different class.
// With "out of range" treated as not-a-space / class-less, position 0
// is always a start under the same formula.

enum : uint8_t { SC_A = 1, SC_D = 2, SC_O = 3, SC_W = 4, SC_S = 5 };

struct SimdClassTable {
  alignas(64) uint8_t t[128];
  SimdClassTable() {
    for (int b = 0; b < 128; ++b) {
      uint32_t cp = uint32_t(b);
      if (cp == ' ')
        t[b] = SC_W;
      else if (is_ws(cp) || cp == 0)
        t[b] = SC_S;
      else if (is_dig(cp))
        t[b] = SC_D;
      else if (is_hu_alpha(cp))
        t[b] = SC_A;
      else
        t[b] = SC_O;
    }
  }
};

// 64-entry membership tables for the accented-alpha SECOND byte of a
// 2-byte char (indexed by low 6 bits: continuation bytes are
// 0x80..0xBF, so the low 6 bits are unique).  One table per lead byte.
struct HuAccentTables {
  alignas(64) uint8_t c3[64] = {};  // U+00C0..U+00FF page
  alignas(64) uint8_t c5[64] = {};  // U+0140..U+017F page
  HuAccentTables() {
    for (uint8_t b : {0x81, 0x89, 0x8D, 0x93, 0x96, 0x9A, 0x9C, 0xA1, 0xA9,
                      0xAD, 0xB3, 0xB6, 0xBA, 0xBC})
      c3[b & 0x3F] = 0xFF;  // ÁÉÍÓÖÚÜ áéíóöúü
    for (uint8_t b : {0x90, 0x91, 0xB0, 0xB1}) c5[b & 0x3F] = 0xFF;  // ŐőŰű
  }
};

// Carry state across split windows: whether the previous byte (sp1) and
// the one before it (sp2) were 0x20, and the previous byte's effective
// run class (0 = none/space/single-char, SC_A/SC_D/SC_O otherwise).
struct SplitState {
  bool sp1 = false;
  bool sp2 = false;
  uint8_t pcls = 0;
};

// Scalar char-at-a-time start emission with the same state machine the
// SIMD windows implement; serves regions the vector path cannot
// (3/4-byte chars, 2-byte pages other than 0xC3/0xC5, invalid UTF-8).
// Processes whole characters from *i until at least `stop` (or n).
void scalar_starts_chars(const uint8_t* text, size_t* i, size_t stop,
                         size_t n, SplitState& st,
                         std::vector<int32_t>& starts) {
  const uint8_t* end = text + n;
  while (*i < n && *i < stop) {
    size_t p = *i;
    uint8_t b = text[p];
    int clen = 1;
    uint8_t cls;  // effective class of this char
    if (b < 0x80) {
      if (b == ' ')
        cls = SC_W;
      else if (is_ws(b) || b == 0)
        cls = SC_S;
      else if (is_dig(b))
        cls = SC_D;
      else if (is_hu_alpha(b))
        cls = SC_A;
      else
        cls = SC_O;
    } else {
      uint32_t cp = decode_utf8_checked(text + p, end, &clen);
      if (cp == 0) {
        cls = SC_S;  // invalid sequence: single-byte token
        clen = 1;
      } else {
        cls = is_hu_alpha(cp) ? SC_A : SC_O;  // no multibyte ws/digits
      }
    }
    bool start;
    if (cls == SC_W) {
      start = !st.sp1;
    } else if (cls == SC_S) {
      start = true;
    } else {
      start = st.sp1 ? st.sp2 : (st.pcls != cls);
    }
    if (start) starts.push_back(int32_t(p));
    st.sp2 = (clen == 1) ? st.sp1 : false;
    st.sp1 = (cls == SC_W);
    st.pcls = (cls == SC_A || cls == SC_D || cls == SC_O) ? cls : 0;
    *i += size_t(clen);
  }
}

#if defined(__x86_64__)
// One 64-byte window of the vector splitter.  Returns the number of
// bytes consumed (emitting starts and advancing `st`), or 0 when the
// window contains bytes outside the supported alphabet (state and
// output untouched; the caller runs the scalar path for a stretch).
__attribute__((target("avx512f,avx512bw,avx512vbmi,bmi,bmi2")))
size_t split_window_avx512(const uint8_t* text, size_t i, size_t n,
                           SplitState& st, std::vector<int32_t>& starts) {
  // Supported: ASCII plus valid 2-byte sequences led by 0xC3/0xC5 (the
  // Latin-1/Latin-Ext-A pages that hold every Hungarian accent and most
  // Western European letters; accented-alpha pairs class as A, other
  // such pairs as O).
  static const SimdClassTable kTbl;
  static const HuAccentTables kAcc;
  const __m512i tbl0 = _mm512_load_si512(kTbl.t);
  const __m512i tbl1 = _mm512_load_si512(kTbl.t + 64);
  const __m512i acc3 = _mm512_load_si512(kAcc.c3);
  const __m512i acc5 = _mm512_load_si512(kAcc.c5);
  const __m512i vspace = _mm512_set1_epi8(' ');
  const __m512i vS = _mm512_set1_epi8(char(SC_S));
  const __m512i vA = _mm512_set1_epi8(char(SC_A));
  const __m512i vD = _mm512_set1_epi8(char(SC_D));
  const __m512i vO = _mm512_set1_epi8(char(SC_O));
  const __m512i vC3 = _mm512_set1_epi8(char(0xC3));
  const __m512i vC5 = _mm512_set1_epi8(char(0xC5));
  const __m512i vhi2 = _mm512_set1_epi8(char(0xC0));
  const __m512i vcontpat = _mm512_set1_epi8(char(0x80));

  size_t rem = n - i;
  uint64_t valid = (rem >= 64) ? ~0ULL : ((1ULL << rem) - 1);
  __m512i z = (rem >= 64)
                  ? _mm512_loadu_si512(text + i)
                  : _mm512_maskz_loadu_epi8(__mmask64(valid), text + i);
  size_t wlen = rem >= 64 ? 64 : rem;
  uint64_t high = _mm512_movepi8_mask(z) & valid;
  __m512i cls = _mm512_permutex2var_epi8(tbl0, z, tbl1);
  uint64_t msp = _mm512_cmpeq_epi8_mask(z, vspace) & valid;
  uint64_t mS = _mm512_cmpeq_epi8_mask(cls, vS) & valid & ~high;
  uint64_t mA = _mm512_cmpeq_epi8_mask(cls, vA) & valid & ~high;
  uint64_t mD = _mm512_cmpeq_epi8_mask(cls, vD) & valid & ~high;
  uint64_t mO = _mm512_cmpeq_epi8_mask(cls, vO) & valid & ~high;
  uint64_t mcont = 0;
  if (high) {
    uint64_t mc3 = _mm512_cmpeq_epi8_mask(z, vC3) & valid;
    uint64_t mc5 = _mm512_cmpeq_epi8_mask(z, vC5) & valid;
    uint64_t mlead = mc3 | mc5;
    mcont =
        _mm512_cmpeq_epi8_mask(_mm512_and_si512(z, vhi2), vcontpat) & valid;
    if ((mlead | mcont) != high) return 0;  // unsupported multibyte char
    // a lead as the window's last byte: its pair spills into the next
    // window — shrink this window by one and reprocess it there
    uint64_t last_bit = 1ULL << (wlen - 1);
    if (mlead & last_bit) {
      if (wlen == 1) return 0;  // lone lead (invalid or window-straddling)
      wlen -= 1;
      valid &= ~last_bit;
      msp &= valid; mS &= valid; mA &= valid; mD &= valid; mO &= valid;
      mc3 &= valid; mc5 &= valid; mlead &= valid; mcont &= valid;
    }
    if ((mlead << 1) != mcont) return 0;  // stray/unpaired bytes
    // classify each 2-byte char at its continuation position, then
    // spread to the lead (the lead is always in-window, see above)
    uint64_t a3 = _mm512_movepi8_mask(_mm512_permutexvar_epi8(z, acc3));
    uint64_t a5 = _mm512_movepi8_mask(_mm512_permutexvar_epi8(z, acc5));
    uint64_t acc_cont = mcont & (((mc3 << 1) & a3) | ((mc5 << 1) & a5));
    uint64_t alpha2 = acc_cont | (acc_cont >> 1);
    uint64_t oth_cont = mcont & ~acc_cont;
    mA |= alpha2;
    mO |= oth_cont | (oth_cont >> 1);
  }
  uint64_t cA = st.pcls == SC_A ? 1u : 0u;
  uint64_t cD = st.pcls == SC_D ? 1u : 0u;
  uint64_t cO = st.pcls == SC_O ? 1u : 0u;
  uint64_t psp = (msp << 1) | uint64_t(st.sp1);
  uint64_t psp2 = (msp << 2) | (uint64_t(st.sp2) | (uint64_t(st.sp1) << 1));
  uint64_t same = (mA & ((mA << 1) | cA)) | (mD & ((mD << 1) | cD)) |
                  (mO & ((mO << 1) | cO));
  uint64_t mcontent_start = (mA | mD | mO) & ~mcont;
  uint64_t start = (msp & ~psp) | mS |
                   (mcontent_start & ((psp & psp2) | (~psp & ~same)));
  start &= valid;
  while (start) {
    starts.push_back(int32_t(i + size_t(_tzcnt_u64(start))));
    start = _blsr_u64(start);
  }
  if (wlen >= 2) {
    st.sp2 = (msp >> (wlen - 2)) & 1;
    st.sp1 = (msp >> (wlen - 1)) & 1;
  } else {
    st.sp2 = st.sp1;
    st.sp1 = msp & 1;
  }
  uint64_t lastb = 1ULL << (wlen - 1);
  st.pcls = (mA & lastb)   ? uint8_t(SC_A)
            : (mD & lastb) ? uint8_t(SC_D)
            : (mO & lastb) ? uint8_t(SC_O)
                           : uint8_t(0);
  return wlen;
}

inline bool have_simd_split() {
  static const bool ok = __builtin_cpu_supports("avx512vbmi") &&
                         __builtin_cpu_supports("avx512bw") &&
                         __builtin_cpu_supports("bmi") &&
                         __builtin_cpu_supports("bmi2");
  return ok;
}
#else
inline bool have_simd_split() { return false; }
inline size_t split_window_avx512(const uint8_t*, size_t, size_t, SplitState&,
                                  std::vector<int32_t>&) {
  return 0;
}
#endif

// Full-stream token-start emission: vector windows with scalar
// char-level fallback for unsupported stretches.  Produces exactly the
// token starts of the scalar cascade splitter (fuzz-verified).
void split_starts_hybrid(const uint8_t* text, size_t n,
                         std::vector<int32_t>& starts) {
  SplitState st;
  size_t i = 0;
  const bool simd = have_simd_split();
  while (i < n) {
    size_t got = simd ? split_window_avx512(text, i, n, st, starts) : 0;
    if (got) {
      i += got;
    } else {
      // scalar for (at least) one window's worth of chars, then retry
      scalar_starts_chars(text, &i, i + 64, n, st, starts);
    }
  }
}


// split via the SIMD fast path when possible; scalar cascade otherwise
// (non-ASCII documents, non-AVX-512 hosts)
void split_words_fast(const uint8_t* text, size_t n,
                      std::vector<std::pair<int64_t, int64_t>>& out) {
  if (have_simd_split() && n) {
    static thread_local std::vector<int32_t> starts;
    starts.clear();
    split_starts_hybrid(text, n, starts);
    size_t nw = starts.size();
    out.reserve(out.size() + nw);
    for (size_t w = 0; w < nw; ++w) {
      int64_t sp = starts[w];
      int64_t ep = (w + 1 < nw) ? int64_t(starts[w + 1]) : int64_t(n);
      out.emplace_back(sp, ep);
    }
    return;
  }
  split_words(text, n, out);
}

// Words of <= 16 bytes pack injectively into a (lo, hi, len) triple —
// two possibly-overlapping 8-byte loads (every byte covered, so
// equality of the triple IS byte equality).  Interners compare the
// triple inline instead of dereferencing a byte pool, which removes
// the second cache miss from the per-occurrence hot path.
inline void word_key16(const uint8_t* p, size_t n, uint64_t* lo,
                       uint64_t* hi) {
  uint64_t a = 0, b = 0;
  if (n > 8) {
    std::memcpy(&a, p, 8);
    std::memcpy(&b, p + n - 8, 8);
    b >>= (16 - n) * 8;  // drop the bytes that overlap `a`
  } else if (n == 8) {
    std::memcpy(&a, p, 8);
  } else if (n >= 4) {
    uint32_t x, y;
    std::memcpy(&x, p, 4);
    std::memcpy(&y, p + n - 4, 4);
    a = (uint64_t(y) << 32) | x;
  } else if (n > 0) {
    a = p[0] | (uint64_t(p[n >> 1]) << 8) | (uint64_t(p[n - 1]) << 16);
  }
  *lo = a;
  *hi = b;
}

inline uint64_t hash_key16(uint64_t lo, uint64_t hi, size_t n) {
  uint64_t h = 1469598103934665603ULL ^ (n * 0x9E3779B97F4A7C15ULL);
  return mix64(mix64(h ^ lo) ^ hi);
}

// Word key + hash for any length: <= 16 uses the packed triple (hi/lo
// loaded), > 16 uses first/last 8 bytes as a cheap prefilter plus the
// full hash.  One formula for every path that feeds an interner / word
// cache; process-wide consistent, never persisted.
inline uint64_t word_key_hash(const uint8_t* p, size_t n, uint64_t* lo,
                              uint64_t* hi) {
  if (n <= 16) {
    word_key16(p, n, lo, hi);
    return hash_key16(*lo, *hi, n);
  }
  std::memcpy(lo, p, 8);
  std::memcpy(hi, p + n - 8, 8);
  return hash_bytes(p, n);
}

inline uint64_t hash_word(const uint8_t* p, size_t n) {
  uint64_t lo, hi;
  return word_key_hash(p, n, &lo, &hi);
}

// ---------------------------------------------------------------- engine

struct Engine {
  StrMap vocab;                        // spelling -> id (last wins)
  PairMap merges;                      // id-path rules
  bool has_merges = false;
  std::vector<std::string> special;    // 256-entry replacement table
  std::vector<bool> has_special;
  std::string prefix;
  bool is_byte_encoder = false;
  // decode tables
  std::vector<std::string> id2str;
  int64_t vocab_size = 0;
  // reverse remap patterns sorted by length desc, plus a first-byte
  // dispatch table so non-matching positions cost one probe
  std::vector<std::pair<std::string, int>> rev_patterns;
  std::vector<std::vector<std::pair<std::string, int>>> rev_by_first =
      std::vector<std::vector<std::pair<std::string, int>>>(256);
  size_t max_pattern_len = 0;
  // O(1) reverse-remap tables for the common byte-encoder case: every
  // replacement spelling is one char of <= 2 bytes (the GPT-2 table)
  std::vector<int16_t> rev1 = std::vector<int16_t>(256, -1);
  std::vector<int16_t> rev2 = std::vector<int16_t>(65536, -1);
  bool rev_fast = false;

  Engine() : special(256), has_special(256, false) {}

  // length of a <0xNN..> literal at p, or -1 (spec: src/core.c:35-47)
  static int hex_literal_len(const uint8_t* p, size_t n) {
    if (n < 4 || p[0] != '<' || p[1] != '0' || (p[2] != 'x' && p[2] != 'X'))
      return -1;
    size_t i = 3;
    while (i < n && std::isxdigit(p[i])) ++i;
    if (i < n && p[i] == '>') return int(i) + 1;
    return -1;
  }

  // scalar greedy merge, string path: elements are slices of `spelled`
  void encode_string_path(const std::string& spelled,
                          std::vector<int32_t>& out) const {
    const uint8_t* s = reinterpret_cast<const uint8_t*>(spelled.data());
    size_t n = spelled.size();
    // seed: per char, <0xNN> literals whole (thread-local scratch avoids
    // per-word allocation churn)
    static thread_local std::vector<std::pair<int32_t, int32_t>> elems;
    elems.clear();
    size_t i = 0;
    while (i < n) {
      int ln = hex_literal_len(s + i, n - i);
      if (ln <= 0) ln = u8len(s[i]);
      elems.emplace_back(int32_t(i), int32_t(ln));
      i += size_t(ln);
    }
    size_t m = elems.size();
    if (m > 1) {
      static thread_local std::vector<int32_t> ranks;
      ranks.assign(m - 1, 0);
      auto rank_of = [&](size_t j) -> int32_t {
        int32_t id;
        if (vocab.get2(s + elems[j].first, elems[j].second,
                       s + elems[j + 1].first, elems[j + 1].second, &id))
          return id;
        return INT32_MAX;
      };
      for (size_t j = 0; j + 1 < m; ++j) ranks[j] = rank_of(j);
      while (true) {
        int32_t best = INT32_MAX;
        size_t bi = SIZE_MAX;
        for (size_t j = 0; j + 1 < m; ++j) {
          if (ranks[j] < best) {
            best = ranks[j];
            bi = j;
          }
        }
        if (bi == SIZE_MAX) break;
        elems[bi].second += elems[bi + 1].second;
        elems.erase(elems.begin() + bi + 1);
        ranks.erase(ranks.begin() + bi);
        --m;
        if (bi > 0) ranks[bi - 1] = rank_of(bi - 1);
        if (bi + 1 < m) ranks[bi] = rank_of(bi);
      }
    }
    for (size_t j = 0; j < m; ++j) {
      int32_t id;
      out.push_back(vocab.get(s + elems[j].first, elems[j].second, &id) ? id
                                                                        : -1);
    }
  }

  // scalar greedy merge, id path (merges.txt ranks)
  void encode_id_path(const std::string& spelled,
                      std::vector<int32_t>& out) const {
    const uint8_t* s = reinterpret_cast<const uint8_t*>(spelled.data());
    size_t n = spelled.size();
    std::vector<int32_t> ids;
    size_t i = 0;
    while (i < n) {
      int ln = u8len(s[i]);
      int32_t id;
      ids.push_back(vocab.get(s + i, ln, &id) ? id : -1);
      i += size_t(ln);
    }
    size_t m = ids.size();
    if (m > 1) {
      std::vector<int32_t> ranks(m - 1);
      auto rank_of = [&](size_t j) -> int32_t {
        int32_t r, mg;
        return merges.get(ids[j], ids[j + 1], &r, &mg) ? r : INT32_MAX;
      };
      for (size_t j = 0; j + 1 < m; ++j) ranks[j] = rank_of(j);
      while (true) {
        int32_t best = INT32_MAX;
        size_t bi = SIZE_MAX;
        for (size_t j = 0; j + 1 < m; ++j) {
          if (ranks[j] < best) {
            best = ranks[j];
            bi = j;
          }
        }
        if (bi == SIZE_MAX) break;
        int32_t r = 0, mg = 0;
        merges.get(ids[bi], ids[bi + 1], &r, &mg);
        ids[bi] = mg;
        ids.erase(ids.begin() + bi + 1);
        ranks.erase(ranks.begin() + bi);
        --m;
        if (bi > 0) ranks[bi - 1] = rank_of(bi - 1);
        if (bi + 1 < m) ranks[bi] = rank_of(bi);
      }
    }
    out.insert(out.end(), ids.begin(), ids.end());
  }

  void encode_word(const uint8_t* w, size_t n, bool with_prefix,
                   std::vector<int32_t>& out) const {
    std::string spelled;
    spelled.reserve(n * 2 + prefix.size());
    if (with_prefix && !prefix.empty())
      spelled.append(prefix);  // glued unremapped before the word's remap
    remap_no_prefix(w, n, spelled);
    if (spelled.empty()) return;
    if (has_merges)
      encode_id_path(spelled, out);
    else
      encode_string_path(spelled, out);
  }

  void remap_no_prefix(const uint8_t* w, size_t n, std::string& out) const {
    size_t i = 0;
    while (i < n) {
      uint8_t b = w[i];
      size_t clen = is_byte_encoder ? 1 : size_t(u8len(b));
      if (has_special[b]) {
        out.append(special[b]);
      } else if (is_byte_encoder && b >= 0x80) {
        out.push_back(char(0xC0 | (b >> 6)));
        out.push_back(char(0x80 | (b & 0x3F)));
      } else {
        out.append(reinterpret_cast<const char*>(w + i),
                   std::min(clen, n - i));
      }
      i += clen;
    }
  }

  // Per-thread memoization of word -> token span (pure speedup; words
  // are Zipf-distributed so batch encodes hit the cache heavily).  Keys
  // point into the caller's text blob, which outlives the call.
  struct WordCache {
    struct Slot {
      uint64_t hash = 0;
      const uint8_t* ptr = nullptr;
      int32_t len = 0;
      int64_t off = -1;  // into toks; -1 = empty slot
      int32_t cnt = 0;
    };
    std::vector<Slot> slots = std::vector<Slot>(1 << 12);
    uint64_t mask = (1 << 12) - 1;
    size_t count = 0;
    std::vector<int32_t> toks;

    const Slot* find(const uint8_t* p, int32_t len, uint64_t h) const {
      size_t i = h & mask;
      while (slots[i].ptr != nullptr) {
        if (slots[i].hash == h && slots[i].len == len &&
            std::memcmp(slots[i].ptr, p, size_t(len)) == 0)
          return &slots[i];
        i = (i + 1) & mask;
      }
      return nullptr;
    }

    void insert(const uint8_t* p, int32_t len, uint64_t h,
                const int32_t* t, size_t n) {
      if ((count + 1) * 2 >= slots.size()) grow();
      size_t i = h & mask;
      while (slots[i].ptr != nullptr) i = (i + 1) & mask;
      slots[i] = Slot{h, p, len, int64_t(toks.size()), int32_t(n)};
      toks.insert(toks.end(), t, t + n);
      ++count;
    }

    void grow() {
      std::vector<Slot> old;
      old.swap(slots);
      slots.assign(old.size() * 2, Slot{});
      mask = slots.size() - 1;
      for (auto& s : old) {
        if (s.ptr == nullptr) continue;
        size_t i = s.hash & mask;
        while (slots[i].ptr != nullptr) i = (i + 1) & mask;
        slots[i] = s;
      }
    }
  };

  // full-document encode (prefix state machine: src/core.c:364-366,421-450)
  void encode_doc(const uint8_t* text, size_t n, std::vector<int32_t>& out,
                  WordCache* cache = nullptr) const {
    static thread_local std::vector<std::pair<int64_t, int64_t>> words;
    words.clear();
    split_words_fast(text, n, words);
    bool add_prefix = n == 0 || text[0] != ' ';
    bool add_prefix_token = !add_prefix;
    static thread_local std::vector<int32_t> tmp;
    for (auto& [s, e] : words) {
      if (e <= s) continue;
      if (add_prefix_token && !prefix.empty()) {
        // standalone prefix run: remap + per-char seed + string merge
        std::string sp;
        remap_no_prefix(reinterpret_cast<const uint8_t*>(prefix.data()),
                        prefix.size(), sp);
        encode_string_path_per_char(sp, out);
        add_prefix_token = false;
      }
      bool glued = add_prefix && !prefix.empty();
      if (cache != nullptr && !glued) {
        int32_t len = int32_t(e - s);
        uint64_t h = hash_word(text + s, size_t(len));
        if (const WordCache::Slot* hit = cache->find(text + s, len, h)) {
          out.insert(out.end(), cache->toks.begin() + hit->off,
                     cache->toks.begin() + hit->off + hit->cnt);
        } else {
          tmp.clear();
          encode_word(text + s, size_t(len), false, tmp);
          cache->insert(text + s, len, h, tmp.data(), tmp.size());
          out.insert(out.end(), tmp.begin(), tmp.end());
        }
      } else {
        encode_word(text + s, size_t(e - s), add_prefix, out);
      }
      add_prefix = false;
    }
  }

  // per-char seeding without <0xNN> grouping (prefix run, src/core.c:432-437)
  void encode_string_path_per_char(const std::string& spelled,
                                   std::vector<int32_t>& out) const {
    // identical to encode_string_path but seeds per char only
    std::string tmp = spelled;
    // reuse by temporarily encoding with hex grouping disabled
    const uint8_t* s = reinterpret_cast<const uint8_t*>(tmp.data());
    size_t n = tmp.size();
    std::vector<std::pair<int32_t, int32_t>> elems;
    size_t i = 0;
    while (i < n) {
      int ln = u8len(s[i]);
      elems.emplace_back(int32_t(i), int32_t(ln));
      i += size_t(ln);
    }
    size_t m = elems.size();
    if (m > 1) {
      std::vector<int32_t> ranks(m - 1);
      auto rank_of = [&](size_t j) -> int32_t {
        int32_t id;
        if (vocab.get2(s + elems[j].first, elems[j].second,
                       s + elems[j + 1].first, elems[j + 1].second, &id))
          return id;
        return INT32_MAX;
      };
      for (size_t j = 0; j + 1 < m; ++j) ranks[j] = rank_of(j);
      while (true) {
        int32_t best = INT32_MAX;
        size_t bi = SIZE_MAX;
        for (size_t j = 0; j + 1 < m; ++j)
          if (ranks[j] < best) { best = ranks[j]; bi = j; }
        if (bi == SIZE_MAX) break;
        elems[bi].second += elems[bi + 1].second;
        elems.erase(elems.begin() + bi + 1);
        ranks.erase(ranks.begin() + bi);
        --m;
        if (bi > 0) ranks[bi - 1] = rank_of(bi - 1);
        if (bi + 1 < m) ranks[bi] = rank_of(bi);
      }
    }
    for (size_t j = 0; j < m; ++j) {
      int32_t id;
      out.push_back(vocab.get(s + elems[j].first, elems[j].second, &id) ? id
                                                                        : -1);
    }
  }

  // decode one document: ids -> bytes -> reverse remap (src/core.c:513-581,
  // src/pretokenizer.c:197-296).  Returns false on out-of-range id.
  bool decode_doc(const int32_t* ids, int64_t n, std::string& out) const {
    std::string raw;
    for (int64_t i = 0; i < n; ++i) {
      if (ids[i] < 0 || ids[i] >= vocab_size) return false;
      if (ids[i] < int64_t(id2str.size())) raw.append(id2str[ids[i]]);
    }
    const uint8_t* p = reinterpret_cast<const uint8_t*>(raw.data());
    size_t len = raw.size();
    size_t i = 0;
    if (!prefix.empty() && len >= prefix.size() &&
        std::memcmp(raw.data(), prefix.data(), prefix.size()) == 0)
      i = prefix.size();
    if (rev_fast && is_byte_encoder) {
      // per-char table lookups (same semantics as the scan below when
      // every pattern is a single <= 2-byte char: patterns cannot
      // overlap char boundaries, so longest-match == exact-char match)
      out.reserve(out.size() + (len - i));
      while (i < len) {
        uint8_t b0 = p[i];
        if (b0 < 0x80) {
          int16_t r = rev1[b0];
          out.push_back(r >= 0 ? char(uint8_t(r)) : char(b0));
          ++i;
          continue;
        }
        if ((b0 & 0xE0) == 0xC0 && i + 1 < len) {
          uint8_t b1 = p[i + 1];
          int16_t r = rev2[(size_t(b0) << 8) | b1];
          if (r >= 0) {
            out.push_back(char(uint8_t(r)));
          } else {
            uint32_t cp = (uint32_t(b0 & 0x1F) << 6) | (b1 & 0x3F);
            out.push_back(cp < 256 ? char(uint8_t(cp)) : '?');
          }
          i += 2;
          continue;
        }
        int cl = 0;
        uint32_t cp;
        if ((b0 & 0xF0) == 0xE0 && i + 2 < len) { cp = 0x10000; cl = 3; }
        else if ((b0 & 0xF8) == 0xF0 && i + 3 < len) { cp = 0x10000; cl = 4; }
        else { cp = 0xFFFD; cl = 1; }
        out.push_back(cp < 256 ? char(uint8_t(cp)) : '?');
        i += size_t(cl);
      }
      return true;
    }
    while (i < len) {
      bool matched = false;
      for (auto& [pat, idx] : rev_by_first[p[i]]) {
        if (pat.size() <= len - i &&
            std::memcmp(raw.data() + i, pat.data(), pat.size()) == 0) {
          out.push_back(char(uint8_t(idx)));
          i += pat.size();
          matched = true;
          break;
        }
      }
      if (matched) continue;
      if (is_byte_encoder) {
        int cl = 0;
        uint32_t cp;
        uint8_t b0 = p[i];
        if (b0 < 0x80) { cp = b0; cl = 1; }
        else if ((b0 & 0xE0) == 0xC0 && i + 1 < len) {
          cp = (uint32_t(b0 & 0x1F) << 6) | (p[i + 1] & 0x3F); cl = 2;
        } else if ((b0 & 0xF0) == 0xE0 && i + 2 < len) {
          cp = 0x10000; cl = 3;
        } else if ((b0 & 0xF8) == 0xF0 && i + 3 < len) {
          cp = 0x10000; cl = 4;
        } else { cp = 0xFFFD; cl = 1; }
        out.push_back(cp < 256 ? char(uint8_t(cp)) : '?');
        i += size_t(cl);
      } else {
        int cl = u8len(p[i]);
        out.append(raw, i, size_t(cl));
        i += size_t(cl);
      }
    }
    return true;
  }
};


// ------------------------------- shared split+intern worker machinery

// Per-worker word map: short words (<= 16B) compare by the packed
// (lo, hi, len) triple only — no pool dereference on the hot path;
// long words fall back to memcmp against their first occurrence.
struct LocalWordMap {
  struct Slot {
    uint64_t lo = 0, hi = 0;
    int64_t off = -1;  // absolute first-occurrence offset; -1 = empty
    int32_t len = 0;
    int32_t idx = 0;
  };
  const uint8_t* text = nullptr;  // base for long-word comparisons
  std::vector<Slot> slots = std::vector<Slot>(1 << 13);
  uint64_t mask = (1 << 13) - 1;
  size_t count = 0;
  std::vector<int64_t> uoff;
  std::vector<int32_t> ulen;
  std::vector<uint64_t> ulo, uhi, uh;

  int32_t intern_keyed(int64_t abs_off, const uint8_t* p, int32_t len,
                       uint64_t lo, uint64_t hi, uint64_t h) {
    size_t i = h & mask;
    if (len <= 16) {
      while (slots[i].off >= 0) {
        const Slot& s = slots[i];
        if (s.len == len && s.lo == lo && s.hi == hi) return s.idx;
        i = (i + 1) & mask;
      }
    } else {
      while (slots[i].off >= 0) {
        const Slot& s = slots[i];
        if (s.len == len && s.lo == lo && s.hi == hi &&
            std::memcmp(text + s.off, p, size_t(len)) == 0)
          return s.idx;
        i = (i + 1) & mask;
      }
    }
    int32_t id = int32_t(count);
    slots[i] = Slot{lo, hi, abs_off, len, id};
    uoff.push_back(abs_off);
    ulen.push_back(len);
    ulo.push_back(lo);
    uhi.push_back(hi);
    uh.push_back(h);
    if (++count * 2 >= slots.size()) grow();
    return id;
  }

  int32_t intern(int64_t abs_off, const uint8_t* p, int32_t len) {
    uint64_t lo, hi;
    uint64_t h = word_key_hash(p, size_t(len), &lo, &hi);
    return intern_keyed(abs_off, p, len, lo, hi, h);
  }

  void grow() {
    std::vector<Slot> old;
    old.swap(slots);
    slots.assign(old.size() * 2, Slot{});
    mask = slots.size() - 1;
    for (auto& s : old) {
      if (s.off < 0) continue;
      size_t i = uh[size_t(s.idx)] & mask;
      while (slots[i].off >= 0) i = (i + 1) & mask;
      slots[i] = s;
    }
  }
};

inline int split_thread_count() {
  return std::min<int>(std::max(1u, std::thread::hardware_concurrency()), 16);
}

// Parallel split + local intern over documents: each worker pulls whole
// documents, splits (SIMD hybrid when available), and dedups against
// its own map; refs are worker-local ids remapped by the caller after
// a serial unique-set merge.
void run_split_intern_workers(const uint8_t* text, const int64_t* doc_offsets,
                              int64_t n_docs, int n_threads,
                              std::vector<LocalWordMap>& locals,
                              std::vector<std::vector<int32_t>>& doc_refs,
                              std::vector<uint8_t>& doc_owner) {
  std::atomic<int64_t> next(0);
  auto worker = [&](int t) {
    LocalWordMap& loc = locals[size_t(t)];
    loc.text = text;
    std::vector<std::pair<int64_t, int64_t>> words;
    std::vector<int32_t> starts;
    while (true) {
      int64_t d = next.fetch_add(1);
      if (d >= n_docs) break;
      doc_owner[size_t(d)] = uint8_t(t);
      const uint8_t* doc = text + doc_offsets[d];
      size_t dn = size_t(doc_offsets[d + 1] - doc_offsets[d]);
      auto& refs = doc_refs[size_t(d)];
      if (have_simd_split()) {
        starts.clear();
        split_starts_hybrid(doc, dn, starts);
        size_t nw = starts.size();
        refs.reserve(nw);
        // software-pipelined probing: key+prefetch a chunk of words,
        // then probe — overlapping the map's cache misses
        constexpr size_t CH = 32;
        uint64_t klo[CH], khi[CH], kh[CH];
        int32_t klen[CH];
        int32_t kofs[CH];
        for (size_t base = 0; base < nw; base += CH) {
          size_t m = std::min(CH, nw - base);
          for (size_t j = 0; j < m; ++j) {
            size_t w = base + j;
            int64_t sp = starts[w];
            int64_t ep = (w + 1 < nw) ? int64_t(starts[w + 1]) : int64_t(dn);
            kofs[j] = int32_t(sp);
            klen[j] = int32_t(ep - sp);
            kh[j] = word_key_hash(doc + sp, size_t(klen[j]), &klo[j], &khi[j]);
            __builtin_prefetch(&loc.slots[kh[j] & loc.mask], 0, 1);
          }
          for (size_t j = 0; j < m; ++j)
            refs.push_back(loc.intern_keyed(doc_offsets[d] + kofs[j],
                                            doc + kofs[j], klen[j], klo[j],
                                            khi[j], kh[j]));
        }
        continue;
      }
      words.clear();
      split_words(doc, dn, words);
      refs.reserve(words.size());
      for (auto& [sp, ep] : words) {
        if (ep <= sp) continue;
        refs.push_back(
            loc.intern(doc_offsets[d] + sp, doc + sp, int32_t(ep - sp)));
      }
    }
  };
  if (n_threads == 1) {
    worker(0);
  } else {
    std::vector<std::thread> pool;
    for (int t = 1; t < n_threads; ++t) pool.emplace_back(worker, t);
    worker(0);
    for (auto& th : pool) th.join();
  }
}

// remap worker-local per-doc refs to global ids into one flat array
int32_t* remap_doc_refs(const std::vector<std::vector<int32_t>>& doc_refs,
                        const std::vector<uint8_t>& doc_owner,
                        const std::vector<std::vector<int32_t>>& remap,
                        const std::vector<int64_t>& dwo, int64_t n_docs,
                        int n_threads) {
  int64_t total_words = dwo[size_t(n_docs)];
  auto* word_ref = static_cast<int32_t*>(
      malloc(sizeof(int32_t) * size_t(std::max<int64_t>(total_words, 1))));
  std::atomic<int64_t> next(0);
  auto remap_worker = [&]() {
    while (true) {
      int64_t d = next.fetch_add(1);
      if (d >= n_docs) break;
      const auto& rm = remap[doc_owner[size_t(d)]];
      const auto& refs = doc_refs[size_t(d)];
      int32_t* dst = word_ref + dwo[size_t(d)];
      for (size_t i = 0; i < refs.size(); ++i) dst[i] = rm[size_t(refs[i])];
    }
  };
  std::vector<std::thread> pool;
  for (int t = 1; t < n_threads; ++t) pool.emplace_back(remap_worker);
  remap_worker();
  for (auto& th : pool) th.join();
  return word_ref;
}

}  // namespace

// ----------------------------------------------------------------- C ABI

extern "C" {

Engine* ht_create() { return new Engine(); }
void ht_destroy(Engine* e) { delete e; }

int ht_set_vocab(Engine* e, const uint8_t* bytes, const int64_t* offsets,
                 const int32_t* ids, int64_t n, int64_t vocab_size) {
  e->vocab.reserve_slots(size_t(n));
  int32_t max_id = -1;
  for (int64_t i = 0; i < n; ++i) {
    int32_t len = int32_t(offsets[i + 1] - offsets[i]);
    e->vocab.set(bytes + offsets[i], len, ids[i]);
    max_id = std::max(max_id, ids[i]);
  }
  e->vocab_size = vocab_size;
  e->id2str.assign(size_t(max_id) + 1, std::string());
  for (int64_t i = 0; i < n; ++i) {
    int32_t len = int32_t(offsets[i + 1] - offsets[i]);
    // decode table mirrors the surviving hashmap entries (last wins)
    int32_t id;
    if (e->vocab.get(bytes + offsets[i], len, &id) && id == ids[i]) {
      e->id2str[size_t(ids[i])].assign(
          reinterpret_cast<const char*>(bytes + offsets[i]), size_t(len));
    }
  }
  return 0;
}

int ht_set_merges(Engine* e, const int32_t* left, const int32_t* right,
                  const int32_t* rank, const int32_t* merged, int64_t n) {
  e->merges.reserve_slots(size_t(n));
  for (int64_t i = 0; i < n; ++i)
    e->merges.set(left[i], right[i], rank[i], merged[i]);
  e->has_merges = n > 0;
  return 0;
}

int ht_set_special(Engine* e, const uint8_t* bytes, const int64_t* offsets,
                   const int32_t* idx, int64_t n) {
  for (int64_t i = 0; i < n; ++i) {
    int b = idx[i];
    if (b < 0 || b > 255) continue;
    e->special[b].assign(
        reinterpret_cast<const char*>(bytes + offsets[i]),
        size_t(offsets[i + 1] - offsets[i]));
    e->has_special[b] = true;
  }
  e->rev_patterns.clear();
  for (int b = 0; b < 256; ++b)
    if (e->has_special[b]) e->rev_patterns.emplace_back(e->special[b], b);
  std::sort(e->rev_patterns.begin(), e->rev_patterns.end(),
            [](auto& x, auto& y) { return x.first.size() > y.first.size(); });
  for (auto& v : e->rev_by_first) v.clear();
  for (auto& pr : e->rev_patterns)
    if (!pr.first.empty())
      e->rev_by_first[uint8_t(pr.first[0])].push_back(pr);
  e->rev1.assign(256, -1);
  e->rev2.assign(65536, -1);
  e->rev_fast = true;
  for (auto& pr : e->rev_patterns) {
    const std::string& pat = pr.first;
    if (pat.size() == 1 && uint8_t(pat[0]) < 0x80) {
      e->rev1[uint8_t(pat[0])] = int16_t(pr.second);
    } else if (pat.size() == 2 && (uint8_t(pat[0]) & 0xE0) == 0xC0) {
      e->rev2[(size_t(uint8_t(pat[0])) << 8) | uint8_t(pat[1])] =
          int16_t(pr.second);
    } else {
      // multi-char patterns, and >= 0x80 single-byte patterns (which
      // the positional scan can match inside a multi-byte char):
      // longest-match scan path
      e->rev_fast = false;
    }
  }
  return 0;
}

void ht_set_options(Engine* e, int is_byte_encoder, const uint8_t* prefix,
                    int64_t prefix_len) {
  e->is_byte_encoder = is_byte_encoder != 0;
  e->prefix.assign(reinterpret_cast<const char*>(prefix), size_t(prefix_len));
}

// Encode a batch of documents.  texts = concatenated UTF-8; doc_offsets has
// n_docs+1 entries.  Output: caller passes result callback-free contract —
// we allocate; caller frees with ht_free_*.
int64_t ht_encode_batch(Engine* e, const uint8_t* text,
                        const int64_t* doc_offsets, int64_t n_docs,
                        int n_threads, int32_t** out_tokens,
                        int64_t** out_offsets) {
  std::vector<std::vector<int32_t>> results(static_cast<size_t>(n_docs));
  n_threads = std::max(1, n_threads);
  std::atomic<int64_t> next(0);
  auto worker = [&]() {
    Engine::WordCache cache;  // per-worker word memoization
    while (true) {
      int64_t i = next.fetch_add(1);
      if (i >= n_docs) break;
      e->encode_doc(text + doc_offsets[i],
                    size_t(doc_offsets[i + 1] - doc_offsets[i]),
                    results[size_t(i)], &cache);
    }
  };
  if (n_threads == 1) {
    worker();
  } else {
    std::vector<std::thread> pool;
    for (int t = 0; t < n_threads; ++t) pool.emplace_back(worker);
    for (auto& th : pool) th.join();
  }
  int64_t total = 0;
  for (auto& r : results) total += int64_t(r.size());
  auto* offs = static_cast<int64_t*>(malloc(sizeof(int64_t) * (n_docs + 1)));
  auto* toks = static_cast<int32_t*>(malloc(sizeof(int32_t) * std::max<int64_t>(total, 1)));
  int64_t pos = 0;
  for (int64_t i = 0; i < n_docs; ++i) {
    offs[i] = pos;
    std::memcpy(toks + pos, results[size_t(i)].data(),
                results[size_t(i)].size() * sizeof(int32_t));
    pos += int64_t(results[size_t(i)].size());
  }
  offs[n_docs] = pos;
  *out_tokens = toks;
  *out_offsets = offs;
  return total;
}

// Encode a set of standalone words (no document semantics: no prefix,
// no splitting — each (offset,len) slice is one parser word).  Used by
// the device engine for stream-tail stragglers: words that never filled
// a device block get the exact scalar path here instead of paying a
// padded-launch round trip.  Returns total tokens; out_spans has
// n_words+1 prefix offsets.
int64_t ht_encode_words(Engine* e, const uint8_t* text, const int64_t* offs,
                        const int32_t* lens, int64_t n_words, int n_threads,
                        int32_t** out_tokens, int64_t** out_spans) {
  n_threads = std::max(1, std::min<int>(n_threads, 16));
  std::vector<std::vector<int32_t>> chunk_toks{size_t(n_threads)};
  std::vector<std::vector<int32_t>> chunk_cnt{size_t(n_threads)};
  int64_t per = (n_words + n_threads - 1) / std::max(1, n_threads);
  auto worker = [&](int t) {
    int64_t lo = per * t;
    int64_t hi = std::min(n_words, lo + per);
    auto& toks = chunk_toks[size_t(t)];
    auto& cnt = chunk_cnt[size_t(t)];
    cnt.reserve(size_t(std::max<int64_t>(hi - lo, 0)));
    for (int64_t i = lo; i < hi; ++i) {
      size_t before = toks.size();
      e->encode_word(text + offs[i], size_t(lens[i]), false, toks);
      cnt.push_back(int32_t(toks.size() - before));
    }
  };
  if (n_threads == 1) {
    worker(0);
  } else {
    std::vector<std::thread> pool;
    for (int t = 1; t < n_threads; ++t) pool.emplace_back(worker, t);
    worker(0);
    for (auto& th : pool) th.join();
  }
  int64_t total = 0;
  for (auto& v : chunk_toks) total += int64_t(v.size());
  auto* toks = static_cast<int32_t*>(
      malloc(sizeof(int32_t) * size_t(std::max<int64_t>(total, 1))));
  auto* spans = static_cast<int64_t*>(
      malloc(sizeof(int64_t) * size_t(n_words + 1)));
  int64_t pos = 0;
  int64_t w = 0;
  for (int t = 0; t < n_threads; ++t) {
    if (!chunk_toks[size_t(t)].empty())
      std::memcpy(toks + pos, chunk_toks[size_t(t)].data(),
                  chunk_toks[size_t(t)].size() * sizeof(int32_t));
    for (int32_t c : chunk_cnt[size_t(t)]) {
      spans[w++] = pos;
      pos += c;
    }
  }
  spans[w] = pos;
  *out_tokens = toks;
  *out_spans = spans;
  return total;
}

// Decode a batch.  tokens flat + offsets; returns 0 on success, -1 on any
// out-of-range id (first error wins, like src/lib.c:1055-1062).
int ht_decode_batch(Engine* e, const int32_t* tokens,
                    const int64_t* offsets, int64_t n_docs, int n_threads,
                    uint8_t** out_bytes, int64_t** out_offsets) {
  std::vector<std::string> results(static_cast<size_t>(n_docs));
  std::atomic<int64_t> next(0);
  std::atomic<bool> failed(false);
  n_threads = std::max(1, n_threads);
  auto worker = [&]() {
    while (!failed.load(std::memory_order_relaxed)) {
      int64_t i = next.fetch_add(1);
      if (i >= n_docs) break;
      if (!e->decode_doc(tokens + offsets[i], offsets[i + 1] - offsets[i],
                         results[size_t(i)]))
        failed.store(true);
    }
  };
  if (n_threads == 1) {
    worker();
  } else {
    std::vector<std::thread> pool;
    for (int t = 0; t < n_threads; ++t) pool.emplace_back(worker);
    for (auto& th : pool) th.join();
  }
  if (failed.load()) return -1;
  int64_t total = 0;
  for (auto& r : results) total += int64_t(r.size());
  auto* offs = static_cast<int64_t*>(malloc(sizeof(int64_t) * (n_docs + 1)));
  auto* data = static_cast<uint8_t*>(malloc(size_t(std::max<int64_t>(total, 1))));
  int64_t pos = 0;
  for (int64_t i = 0; i < n_docs; ++i) {
    offs[i] = pos;
    std::memcpy(data + pos, results[size_t(i)].data(), results[size_t(i)].size());
    pos += int64_t(results[size_t(i)].size());
  }
  offs[n_docs] = pos;
  *out_bytes = data;
  *out_offsets = offs;
  return 0;
}

// Split + dedup only: words of all documents mapped to unique-word
// indices; unique words returned as (offset,len) slices into the input
// blob.  Feeds the TPU packing path; no per-word seed computation here.
int64_t ht_split_dedup_slices(const uint8_t* text, const int64_t* doc_offsets,
                              int64_t n_docs,
                              int32_t** out_word_ref,      // per doc-word
                              int64_t** out_doc_word_offsets,  // n_docs+1
                              int64_t** out_uniq_offsets,  // [n_uniq]
                              int32_t** out_uniq_lens) {   // [n_uniq]
  // Fused single pass: each worker pulls whole documents, splits,
  // hashes, and dedups against its own local map, emitting worker-local
  // unique ids.  The same word may become a unique in several workers;
  // a cheap serial merge (over ~uniques, not words) builds the global
  // id space, and a final parallel pass remaps the per-doc refs.  Every
  // input byte is read once; there is no intermediate word array.
  int n_threads = split_thread_count();
  std::vector<LocalWordMap> locals{size_t(n_threads)};
  std::vector<std::vector<int32_t>> doc_refs(static_cast<size_t>(n_docs));
  std::vector<uint8_t> doc_owner(
      static_cast<size_t>(std::max<int64_t>(n_docs, 1)));
  run_split_intern_workers(text, doc_offsets, n_docs, n_threads, locals,
                           doc_refs, doc_owner);

  // serial merge of the local unique sets into a global id space
  std::vector<int64_t> uoff;
  std::vector<int32_t> ulen;
  std::vector<std::vector<int32_t>> remap{size_t(n_threads)};
  {
    LocalWordMap merged;
    merged.text = text;
    size_t total_local = 0;
    for (auto& loc : locals) total_local += loc.count;
    size_t cap = 1 << 13;
    while (cap < 2 * total_local + 8) cap <<= 1;
    merged.slots.assign(cap, LocalWordMap::Slot{});
    merged.mask = cap - 1;
    for (int t = 0; t < n_threads; ++t) {
      LocalWordMap& loc = locals[size_t(t)];
      remap[size_t(t)].resize(loc.count);
      for (size_t u = 0; u < loc.count; ++u)
        remap[size_t(t)][u] = merged.intern_keyed(
            loc.uoff[u], text + loc.uoff[u], loc.ulen[u], loc.ulo[u],
            loc.uhi[u], loc.uh[u]);
    }
    uoff.swap(merged.uoff);
    ulen.swap(merged.ulen);
  }
  int64_t n_uniq = int64_t(uoff.size());

  // doc offsets + parallel remap of per-doc refs into the flat output
  std::vector<int64_t> dwo(size_t(n_docs) + 1, 0);
  for (int64_t d = 0; d < n_docs; ++d)
    dwo[size_t(d) + 1] = dwo[size_t(d)] + int64_t(doc_refs[size_t(d)].size());
  int32_t* word_ref =
      remap_doc_refs(doc_refs, doc_owner, remap, dwo, n_docs, n_threads);

  auto copy_i64 = [](const std::vector<int64_t>& v) {
    auto* p = static_cast<int64_t*>(
        malloc(sizeof(int64_t) * std::max<size_t>(v.size(), 1)));
    std::memcpy(p, v.data(), v.size() * sizeof(int64_t));
    return p;
  };
  auto copy_i32v = [](const std::vector<int32_t>& v) {
    auto* p = static_cast<int32_t*>(
        malloc(sizeof(int32_t) * std::max<size_t>(v.size(), 1)));
    std::memcpy(p, v.data(), v.size() * sizeof(int32_t));
    return p;
  };
  *out_word_ref = word_ref;
  *out_doc_word_offsets = copy_i64(dwo);
  *out_uniq_offsets = copy_i64(uoff);
  *out_uniq_lens = copy_i32v(ulen);
  return n_uniq;
}

// ------------------------------------------------ persistent interner
//
// Word -> dense gid map that survives across batch calls, so the engine
// resolves only words it has never seen (the reference recomputes every
// word every time; interning is a pure speedup with identical output).
// Unique word bytes are copied into an owned pool (caller blobs die
// between calls).

struct Interner {
  struct Slot {
    uint64_t lo = 0, hi = 0;
    int64_t gid = -1;
    int32_t len = 0;
    int32_t pad = 0;
  };
  std::vector<uint8_t> pool;    // bytes of long (> 16B) words only
  std::vector<int64_t> poff;    // gid -> pool offset (-1 = short word)
  std::vector<int32_t> plen;    // gid -> length
  std::vector<uint64_t> phash;  // gid -> hash (grow-time rehash)
  std::vector<Slot> slots = std::vector<Slot>(1 << 13);
  uint64_t mask = (1 << 13) - 1;

  int64_t count() const { return int64_t(plen.size()); }

  void reset() {
    pool.clear();
    poff.clear();
    plen.clear();
    phash.clear();
    slots.assign(1 << 13, Slot{});
    mask = (1 << 13) - 1;
  }

  int64_t intern_keyed(const uint8_t* p, int32_t len, uint64_t lo,
                       uint64_t hi, uint64_t h) {
    size_t i = h & mask;
    if (len <= 16) {
      while (slots[i].gid >= 0) {
        const Slot& s = slots[i];
        if (s.len == len && s.lo == lo && s.hi == hi) return s.gid;
        i = (i + 1) & mask;
      }
    } else {
      while (slots[i].gid >= 0) {
        const Slot& s = slots[i];
        if (s.len == len && s.lo == lo && s.hi == hi &&
            std::memcmp(pool.data() + poff[size_t(s.gid)], p, size_t(len)) ==
                0)
          return s.gid;
        i = (i + 1) & mask;
      }
    }
    int64_t gid = count();
    slots[i] = Slot{lo, hi, gid, len, 0};
    if (len > 16) {
      poff.push_back(int64_t(pool.size()));
      pool.insert(pool.end(), p, p + len);
    } else {
      poff.push_back(-1);
    }
    plen.push_back(len);
    phash.push_back(h);
    if (size_t(count()) * 2 >= slots.size()) grow();
    return gid;
  }

  void grow() {
    std::vector<Slot> old;
    old.swap(slots);
    slots.assign(old.size() * 2, Slot{});
    mask = slots.size() - 1;
    for (auto& s : old) {
      if (s.gid < 0) continue;
      size_t i = phash[size_t(s.gid)] & mask;
      while (slots[i].gid >= 0) i = (i + 1) & mask;
      slots[i] = s;
    }
  }
};

// Assemble per-document token streams from unique-word spans: for each
// doc-word reference, copy its span out of the token pool.  Replaces the
// engine's numpy gather assembly (the per-byte cost there is index
// arithmetic; here it is two parallel passes of adds + memcpy).
int64_t ht_assemble(const int32_t* word_ref, int64_t total_words,
                    const int64_t* doc_word_offsets, int64_t n_docs,
                    const int64_t* span_start, const int64_t* span_len,
                    const int32_t* pool,
                    int32_t** out_tokens, int64_t** out_doc_offsets) {
  (void)total_words;  // implied by doc_word_offsets[n_docs]
  static const bool timing = getenv("HUTOKEN_NATIVE_TIMING") != nullptr;
  auto tw0 = std::chrono::steady_clock::now();
  auto lap = [&](const char* what) {
    if (!timing) return;
    auto now = std::chrono::steady_clock::now();
    fprintf(stderr, "[ht-native] assemble %s: %.1f ms\n", what,
            std::chrono::duration<double, std::milli>(now - tw0).count());
    tw0 = now;
  };
  auto* doc_off = static_cast<int64_t*>(
      malloc(sizeof(int64_t) * size_t(n_docs + 1)));
  int n_threads = split_thread_count();

  // pass 1: per-doc token counts (parallel over doc ranges)
  {
    std::atomic<int64_t> next(0);
    auto worker = [&]() {
      while (true) {
        int64_t d = next.fetch_add(1);
        if (d >= n_docs) break;
        int64_t total = 0;
        for (int64_t w = doc_word_offsets[d]; w < doc_word_offsets[d + 1]; ++w)
          total += span_len[word_ref[w]];
        doc_off[d + 1] = total;  // counts first; prefix-summed below
      }
    };
    std::vector<std::thread> pool_t;
    for (int t = 1; t < n_threads; ++t) pool_t.emplace_back(worker);
    worker();
    for (auto& th : pool_t) th.join();
  }
  lap("pass1");
  doc_off[0] = 0;
  for (int64_t d = 0; d < n_docs; ++d) doc_off[d + 1] += doc_off[d];
  int64_t total_tokens = doc_off[n_docs];
  auto* toks = static_cast<int32_t*>(
      malloc(sizeof(int32_t) * size_t(std::max<int64_t>(total_tokens, 1))));
  lap("malloc");

  // pass 2: copy spans (parallel over doc ranges; disjoint outputs)
  {
    std::atomic<int64_t> next(0);
    auto worker = [&]() {
      while (true) {
        int64_t d = next.fetch_add(1);
        if (d >= n_docs) break;
        int64_t pos = doc_off[d];
        for (int64_t w = doc_word_offsets[d]; w < doc_word_offsets[d + 1];
             ++w) {
          int32_t ref = word_ref[w];
          int64_t len = span_len[ref];
          std::memcpy(toks + pos, pool + span_start[ref],
                      size_t(len) * sizeof(int32_t));
          pos += len;
        }
      }
    };
    std::vector<std::thread> pool_t;
    for (int t = 1; t < n_threads; ++t) pool_t.emplace_back(worker);
    worker();
    for (auto& th : pool_t) th.join();
  }
  lap("pass2");
  *out_tokens = toks;
  *out_doc_offsets = doc_off;
  return total_tokens;
}

// Two-call assembly ABI (faster form of ht_assemble): spans arrive
// packed one int64 per unique word (start << 24 | len, len < 2^24 —
// the caller checks), outputs land in CALLER-allocated buffers (no
// result copy on the Python side), and the copy loop uses fixed
// 16-byte chunks for the short spans that dominate real text (a word
// is 1-4 tokens almost always; per-word memcpy dispatch overhead is
// the bulk of ht_assemble's cost).  The caller guarantees 4 int32 of
// readable slack after the last pool span (overreads never cross the
// buffer end); writes stay exact at each document's final word so
// parallel doc ranges never touch a neighbour's output.
int64_t ht_assemble_counts(const int32_t* word_ref,
                           const int64_t* doc_word_offsets, int64_t n_docs,
                           const int64_t* span_packed,
                           int64_t* doc_off /* n_docs+1, caller-alloc */) {
  int n_threads = split_thread_count();
  {
    std::atomic<int64_t> next(0);
    auto worker = [&]() {
      while (true) {
        int64_t d = next.fetch_add(1);
        if (d >= n_docs) break;
        int64_t total = 0;
        for (int64_t w = doc_word_offsets[d]; w < doc_word_offsets[d + 1];
             ++w)
          total += span_packed[word_ref[w]] & 0xFFFFFF;
        doc_off[d + 1] = total;
      }
    };
    std::vector<std::thread> pool_t;
    for (int t = 1; t < n_threads; ++t) pool_t.emplace_back(worker);
    worker();
    for (auto& th : pool_t) th.join();
  }
  doc_off[0] = 0;
  for (int64_t d = 0; d < n_docs; ++d) doc_off[d + 1] += doc_off[d];
  return doc_off[n_docs];
}

void ht_assemble_fill(const int32_t* word_ref,
                      const int64_t* doc_word_offsets, int64_t n_docs,
                      const int64_t* span_packed, const int32_t* pool,
                      const int64_t* doc_off,
                      int32_t* toks /* caller-alloc, doc_off[n_docs] */) {
  int n_threads = split_thread_count();
  std::atomic<int64_t> next(0);
  auto worker = [&]() {
    while (true) {
      int64_t d = next.fetch_add(1);
      if (d >= n_docs) break;
      int64_t pos = doc_off[d];
      int64_t doc_end = doc_off[d + 1];
      for (int64_t w = doc_word_offsets[d]; w < doc_word_offsets[d + 1];
           ++w) {
        int64_t pk = span_packed[word_ref[w]];
        const int32_t* src = pool + (pk >> 24);
        int64_t len = pk & 0xFFFFFF;
        int32_t* dst = toks + pos;
        if (pos + ((len + 3) & ~int64_t(3)) <= doc_end) {
          // 16-byte chunks; the (< 4 token) overhang stays inside this
          // doc's own region and is overwritten by the doc's next words
          std::memcpy(dst, src, 16);
          for (int64_t c = 4; c < len; c += 4)
            std::memcpy(dst + c, src + c, 16);
        } else {
          // near the doc end the overhang would cross into the next
          // doc's range (owned by another thread): copy exactly
          std::memcpy(dst, src, size_t(len) * sizeof(int32_t));
        }
        pos += len;
      }
    }
  };
  std::vector<std::thread> pool_t;
  for (int t = 1; t < n_threads; ++t) pool_t.emplace_back(worker);
  worker();
  for (auto& th : pool_t) th.join();
}

Interner* ht_interner_create() { return new Interner(); }
void ht_interner_destroy(Interner* it) { delete it; }
int64_t ht_interner_count(Interner* it) { return it->count(); }
void ht_interner_reset(Interner* it) { it->reset(); }

// Split + intern against the persistent map.  Like ht_split_dedup_slices
// but word refs are GLOBAL gids stable across calls; only first-seen
// words are reported back (as [prev_count, new_count) with their first
// occurrence offsets into the caller's text).  Returns prev_count, or -1
// on error; new_count = ht_interner_count afterwards.
int64_t ht_split_intern(Interner* interner, const uint8_t* text,
                        const int64_t* doc_offsets, int64_t n_docs,
                        int32_t** out_word_gids,         // per doc-word
                        int64_t** out_doc_word_offsets,  // n_docs+1
                        int64_t** out_new_offsets,       // [new-prev]
                        int32_t** out_new_lens) {        // [new-prev]
  int n_threads = split_thread_count();
  std::vector<LocalWordMap> locals{size_t(n_threads)};
  std::vector<std::vector<int32_t>> doc_refs(static_cast<size_t>(n_docs));
  std::vector<uint8_t> doc_owner(
      static_cast<size_t>(std::max<int64_t>(n_docs, 1)));
  run_split_intern_workers(text, doc_offsets, n_docs, n_threads, locals,
                           doc_refs, doc_owner);

  // serial merge of the local unique sets into the PERSISTENT map
  int64_t prev_count = interner->count();
  std::vector<int64_t> new_off;
  std::vector<int32_t> new_len;
  std::vector<std::vector<int32_t>> remap{size_t(n_threads)};
  for (int t = 0; t < n_threads; ++t) {
    LocalWordMap& loc = locals[size_t(t)];
    remap[size_t(t)].resize(loc.count);
    for (size_t u = 0; u < loc.count; ++u) {
      int64_t before = interner->count();
      int64_t gid = interner->intern_keyed(text + loc.uoff[u], loc.ulen[u],
                                           loc.ulo[u], loc.uhi[u], loc.uh[u]);
      if (gid == before) {  // first-ever sighting
        new_off.push_back(loc.uoff[u]);
        new_len.push_back(loc.ulen[u]);
      }
      remap[size_t(t)][u] = int32_t(gid);
    }
  }

  std::vector<int64_t> dwo(size_t(n_docs) + 1, 0);
  for (int64_t d = 0; d < n_docs; ++d)
    dwo[size_t(d) + 1] = dwo[size_t(d)] + int64_t(doc_refs[size_t(d)].size());
  int32_t* word_gids =
      remap_doc_refs(doc_refs, doc_owner, remap, dwo, n_docs, n_threads);

  auto* dwo_out = static_cast<int64_t*>(
      malloc(sizeof(int64_t) * (size_t(n_docs) + 1)));
  std::memcpy(dwo_out, dwo.data(), (size_t(n_docs) + 1) * sizeof(int64_t));
  auto* no_out = static_cast<int64_t*>(
      malloc(sizeof(int64_t) * std::max<size_t>(new_off.size(), 1)));
  std::memcpy(no_out, new_off.data(), new_off.size() * sizeof(int64_t));
  auto* nl_out = static_cast<int32_t*>(
      malloc(sizeof(int32_t) * std::max<size_t>(new_len.size(), 1)));
  std::memcpy(nl_out, new_len.data(), new_len.size() * sizeof(int32_t));
  *out_word_gids = word_gids;
  *out_doc_word_offsets = dwo_out;
  *out_new_offsets = no_out;
  *out_new_lens = nl_out;
  return prev_count;
}


// Split + intern over PER-DOCUMENT buffers (no concatenated blob): the
// caller passes one pointer+length per document, and first-seen words
// come back as a compact byte blob + lengths.  Saves the O(corpus)
// join copy and lets the engine resolve new words from a few-KB blob
// instead of gathering from the full corpus.
int64_t ht_split_intern_docs(Interner* interner, const uint8_t* const* docs,
                             const int64_t* lens, int64_t n_docs,
                             int32_t** out_word_gids,  // per doc-word
                             int64_t** out_doc_word_offsets,  // n_docs+1
                             uint8_t** out_new_blob,   // concat new words
                             int32_t** out_new_lens,   // [new-prev]
                             int64_t* out_new_count) {
  int n_threads = split_thread_count();
  // pointer-keyed local maps: first-occurrence pointers stay valid for
  // the duration of the call (the caller holds the doc buffers)
  struct PSlot {
    uint64_t lo = 0, hi = 0;
    const uint8_t* ptr = nullptr;
    int32_t len = 0;
    int32_t idx = 0;
  };
  struct PLocal {
    std::vector<PSlot> slots = std::vector<PSlot>(1 << 13);
    uint64_t mask = (1 << 13) - 1;
    size_t count = 0;
    std::vector<const uint8_t*> uptr;
    std::vector<int32_t> ulen;
    std::vector<uint64_t> ulo, uhi, uh;

    int32_t intern_keyed(const uint8_t* p, int32_t len, uint64_t lo,
                         uint64_t hi, uint64_t h) {
      size_t i = h & mask;
      if (len <= 16) {
        while (slots[i].ptr != nullptr) {
          const PSlot& s = slots[i];
          if (s.len == len && s.lo == lo && s.hi == hi) return s.idx;
          i = (i + 1) & mask;
        }
      } else {
        while (slots[i].ptr != nullptr) {
          const PSlot& s = slots[i];
          if (s.len == len && s.lo == lo && s.hi == hi &&
              std::memcmp(s.ptr, p, size_t(len)) == 0)
            return s.idx;
          i = (i + 1) & mask;
        }
      }
      int32_t id = int32_t(count);
      slots[i] = PSlot{lo, hi, p, len, id};
      uptr.push_back(p);
      ulen.push_back(len);
      ulo.push_back(lo);
      uhi.push_back(hi);
      uh.push_back(h);
      if (++count * 2 >= slots.size()) grow();
      return id;
    }
    void grow() {
      std::vector<PSlot> old;
      old.swap(slots);
      slots.assign(old.size() * 2, PSlot{});
      mask = slots.size() - 1;
      for (auto& s : old) {
        if (s.ptr == nullptr) continue;
        size_t i = uh[size_t(s.idx)] & mask;
        while (slots[i].ptr != nullptr) i = (i + 1) & mask;
        slots[i] = s;
      }
    }
  };
  std::vector<PLocal> locals{size_t(n_threads)};
  std::vector<std::vector<int32_t>> doc_refs(static_cast<size_t>(n_docs));
  std::vector<uint8_t> doc_owner(
      static_cast<size_t>(std::max<int64_t>(n_docs, 1)));
  {
    std::atomic<int64_t> next(0);
    auto worker = [&](int t) {
      PLocal& loc = locals[size_t(t)];
      std::vector<std::pair<int64_t, int64_t>> words;
      std::vector<int32_t> starts;
      while (true) {
        int64_t d = next.fetch_add(1);
        if (d >= n_docs) break;
        doc_owner[size_t(d)] = uint8_t(t);
        const uint8_t* doc = docs[d];
        size_t dn = size_t(lens[d]);
        auto& refs = doc_refs[size_t(d)];
        if (have_simd_split()) {
          starts.clear();
          split_starts_hybrid(doc, dn, starts);
          size_t nw = starts.size();
          refs.reserve(nw);
          constexpr size_t CH = 32;
          uint64_t klo[CH], khi[CH], kh[CH];
          int32_t klen[CH];
          int32_t kofs[CH];
          for (size_t base = 0; base < nw; base += CH) {
            size_t m = std::min(CH, nw - base);
            for (size_t j = 0; j < m; ++j) {
              size_t w = base + j;
              int64_t sp = starts[w];
              int64_t ep =
                  (w + 1 < nw) ? int64_t(starts[w + 1]) : int64_t(dn);
              kofs[j] = int32_t(sp);
              klen[j] = int32_t(ep - sp);
              kh[j] =
                  word_key_hash(doc + sp, size_t(klen[j]), &klo[j], &khi[j]);
              __builtin_prefetch(&loc.slots[kh[j] & loc.mask], 0, 1);
            }
            for (size_t j = 0; j < m; ++j)
              refs.push_back(loc.intern_keyed(doc + kofs[j], klen[j], klo[j],
                                              khi[j], kh[j]));
          }
          continue;
        }
        words.clear();
        split_words(doc, dn, words);
        refs.reserve(words.size());
        for (auto& [sp, ep] : words) {
          if (ep <= sp) continue;
          uint64_t lo, hi;
          int32_t len = int32_t(ep - sp);
          uint64_t h = word_key_hash(doc + sp, size_t(len), &lo, &hi);
          refs.push_back(loc.intern_keyed(doc + sp, len, lo, hi, h));
        }
      }
    };
    if (n_threads == 1) {
      worker(0);
    } else {
      std::vector<std::thread> pool;
      for (int t = 1; t < n_threads; ++t) pool.emplace_back(worker, t);
      worker(0);
      for (auto& th : pool) th.join();
    }
  }

  // serial merge into the PERSISTENT map; collect new words' bytes
  int64_t prev_count = interner->count();
  std::vector<uint8_t> new_blob;
  std::vector<int32_t> new_len;
  std::vector<std::vector<int32_t>> remap{size_t(n_threads)};
  for (int t = 0; t < n_threads; ++t) {
    PLocal& loc = locals[size_t(t)];
    remap[size_t(t)].resize(loc.count);
    for (size_t u = 0; u < loc.count; ++u) {
      int64_t before = interner->count();
      int64_t gid = interner->intern_keyed(loc.uptr[u], loc.ulen[u],
                                           loc.ulo[u], loc.uhi[u], loc.uh[u]);
      if (gid == before) {  // first-ever sighting
        new_blob.insert(new_blob.end(), loc.uptr[u],
                        loc.uptr[u] + loc.ulen[u]);
        new_len.push_back(loc.ulen[u]);
      }
      remap[size_t(t)][u] = int32_t(gid);
    }
  }

  std::vector<int64_t> dwo(size_t(n_docs) + 1, 0);
  for (int64_t d = 0; d < n_docs; ++d)
    dwo[size_t(d) + 1] = dwo[size_t(d)] + int64_t(doc_refs[size_t(d)].size());
  int32_t* word_gids =
      remap_doc_refs(doc_refs, doc_owner, remap, dwo, n_docs, n_threads);

  auto* dwo_out = static_cast<int64_t*>(
      malloc(sizeof(int64_t) * (size_t(n_docs) + 1)));
  std::memcpy(dwo_out, dwo.data(), (size_t(n_docs) + 1) * sizeof(int64_t));
  auto* blob_out = static_cast<uint8_t*>(
      malloc(std::max<size_t>(new_blob.size(), 1)));
  std::memcpy(blob_out, new_blob.data(), new_blob.size());
  auto* nl_out = static_cast<int32_t*>(
      malloc(sizeof(int32_t) * std::max<size_t>(new_len.size(), 1)));
  std::memcpy(nl_out, new_len.data(), new_len.size() * sizeof(int32_t));
  *out_word_gids = word_gids;
  *out_doc_word_offsets = dwo_out;
  *out_new_blob = blob_out;
  *out_new_lens = nl_out;
  *out_new_count = int64_t(new_len.size());
  return prev_count;
}

void ht_free_i32(int32_t* p) { free(p); }
void ht_free_i64(int64_t* p) { free(p); }
void ht_free_u8(uint8_t* p) { free(p); }

// Pack selected ragged words from a byte blob into a caller-allocated
// dense [k, width] row matrix (zero padding).  Replaces the engine's
// numpy fancy-scatter pack on the resolve critical path: per-word
// memcpy runs at memory speed and k is ~1e5 per group.
void ht_pack_rows(const uint8_t* blob, const int64_t* offs,
                  const int64_t* lens, const int64_t* sel, int64_t k,
                  int64_t width, uint8_t* out) {
  std::memset(out, 0, size_t(k) * size_t(width));
  for (int64_t i = 0; i < k; ++i) {
    const int64_t w = sel ? sel[i] : i;
    const int64_t n = lens[w] < width ? lens[w] : width;
    std::memcpy(out + size_t(i) * size_t(width), blob + offs[w], size_t(n));
  }
}

}  // extern "C"
