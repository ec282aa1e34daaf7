// refpack: native index-construction library for hsa-tpu.
//
// Plain C ABI (loaded from Python via ctypes — pybind11 is unavailable in
// this environment, SURVEY.md §7.1).  Covers the reference lineage's index
// build path (`bwtindex.c`: fasta→pac→bwt→sa) minus FASTA parsing, which the
// Python layer handles: suffix array (SA-IS), BWT + primary, sampled-SA mark
// structures, and 2-bit packing.
//
// All functions return 0 on success, negative on error.  Caller allocates
// all output buffers (numpy arrays on the Python side).

#include <cstdint>
#include <cstring>

#include "sais.hpp"

extern "C" {

int rp_version() { return 1; }

// SA of text+$ (n+1 entries).  Chooses int32 internally when n+1 < 2^31.
int rp_suffix_array64(const uint8_t* text, int64_t n, int64_t* sa_out) {
  if (n < 0) return -1;
  if (n + 2 < (int64_t)1 << 31) {
    std::vector<int32_t> sa32((size_t)n + 1);
    refpack::suffix_array<int32_t>(text, (int32_t)n, sa32.data());
    for (int64_t i = 0; i <= n; ++i) sa_out[i] = sa32[(size_t)i];
  } else {
    refpack::suffix_array<int64_t>(text, n, sa_out);
  }
  return 0;
}

// Test hook: always use the int64 SA-IS instantiation (the production entry
// only selects it for n+2 >= 2^31; this keeps the big-genome path covered by
// small tests).
int rp_suffix_array64_force(const uint8_t* text, int64_t n, int64_t* sa_out) {
  if (n < 0) return -1;
  refpack::suffix_array<int64_t>(text, n, sa_out);
  return 0;
}

// Stored BWT (sentinel row removed, length n) + primary rank.
// text codes 0..3; sa has n+1 entries.
int rp_bwt_from_sa(const uint8_t* text, const int64_t* sa, int64_t n,
                   uint8_t* bwt_out, int64_t* primary_out) {
  int64_t j = 0, primary = -1;
  for (int64_t r = 0; r <= n; ++r) {
    int64_t p = sa[r];
    if (p == 0) {
      primary = r;
    } else {
      bwt_out[j++] = text[p - 1];
    }
  }
  if (primary < 0 || j != n) return -1;
  *primary_out = primary;
  return 0;
}

// Fused build: SA + BWT + primary + text-position-sampled SA marks.
//   marks_out: one byte per rank r in 0..n, 1 iff sa[r] % sa_intv == 0
//   samples_out: SA values of marked ranks in rank order (caller sizes it
//                at (n / sa_intv) + 2; actual count returned via n_samples)
// sa_out may be NULL if the full SA is not wanted (it is still computed
// internally).
int rp_build(const uint8_t* text, int64_t n, int64_t sa_intv,
             int64_t* sa_out, uint8_t* bwt_out, int64_t* primary_out,
             uint8_t* marks_out, int64_t* samples_out, int64_t* n_samples_out) {
  std::vector<int64_t> sa_buf;
  int64_t* sa = sa_out;
  if (!sa) {
    sa_buf.resize((size_t)n + 1);
    sa = sa_buf.data();
  }
  if (rp_suffix_array64(text, n, sa) != 0) return -1;
  if (rp_bwt_from_sa(text, sa, n, bwt_out, primary_out) != 0) return -2;
  int64_t ns = 0;
  for (int64_t r = 0; r <= n; ++r) {
    if (sa[r] % sa_intv == 0) {
      marks_out[r] = 1;
      samples_out[ns++] = sa[r];
    } else {
      marks_out[r] = 0;
    }
  }
  *n_samples_out = ns;
  return 0;
}

// 2-bit pack codes (0..3) little-end-first within each byte: 4 codes/byte.
// The packed form is the `.pac` analog (lineage: bntseq.c).
int rp_pack_2bit(const uint8_t* codes, int64_t n, uint8_t* packed_out) {
  int64_t nb = (n + 3) / 4;
  std::memset(packed_out, 0, (size_t)nb);
  for (int64_t i = 0; i < n; ++i)
    packed_out[i >> 2] |= (uint8_t)((codes[i] & 3) << ((i & 3) << 1));
  return 0;
}

int rp_unpack_2bit(const uint8_t* packed, int64_t n, uint8_t* codes_out) {
  for (int64_t i = 0; i < n; ++i)
    codes_out[i] = (packed[i >> 2] >> ((i & 3) << 1)) & 3;
  return 0;
}

}  // extern "C"

// ---------------------------------------------------------------------------
// FASTQ batch reader (lineage: kseq.h + bwaseqio.c roles).
// Parses records out of an in-memory (typically mmap'd) buffer directly into
// the search engine's batch layout: codes [max_reads x max_len] filled with
// PAD=5, plus name/qual byte ranges into the buffer (zero-copy for Python).
// ---------------------------------------------------------------------------

namespace {
struct CodeTable {
  uint8_t t[256];
  CodeTable() {
    for (int i = 0; i < 256; ++i) t[i] = 4;
    t['A'] = t['a'] = 0;
    t['C'] = t['c'] = 1;
    t['G'] = t['g'] = 2;
    t['T'] = t['t'] = 3;
  }
};
const CodeTable kCodes;

inline const char* find_nl(const char* p, const char* end) {
  while (p < end && *p != '\n') ++p;
  return p;
}
}  // namespace

extern "C" {

// Returns #reads parsed (>=0) or -1 on malformed input. *pos_io advances to
// the first unconsumed byte. Over-long reads are truncated to max_len (true
// length still reported in lens_out, capped at 1<<20).
int rp_fastq_batch(const char* buf, int64_t buflen, int64_t* pos_io,
                   int32_t max_reads, int32_t max_len,
                   uint8_t* codes_out, int32_t* lens_out,
                   int64_t* name_off, int32_t* name_len,
                   int64_t* qual_off, int32_t* qual_len) {
  const char* base = buf;
  const char* p = buf + *pos_io;
  const char* end = buf + buflen;
  int n = 0;
  while (n < max_reads) {
    const char* rec_start = p;
    while (p < end && (*p == '\n' || *p == '\r')) ++p;
    if (p >= end) break;
    if (*p != '@') return -1;
    const char* h = p + 1;
    const char* he = find_nl(h, end);
    if (he >= end) { p = rec_start; break; }  // incomplete record: stop
    const char* hs_end = h;
    while (hs_end < he && *hs_end != ' ' && *hs_end != '\t' && *hs_end != '\r')
      ++hs_end;
    const char* s = he + 1;
    const char* se = find_nl(s, end);
    if (se >= end) { p = rec_start; break; }
    const char* plus = se + 1;
    if (plus >= end || *plus != '+') { p = rec_start; break; }
    const char* pe = find_nl(plus, end);
    if (pe >= end) { p = rec_start; break; }
    const char* q = pe + 1;
    int64_t slen = se - s;
    if (slen > 0 && s[slen - 1] == '\r') --slen;
    if (q + slen > end) { p = rec_start; break; }
    const char* qe = q + slen;

    name_off[n] = h - base;
    name_len[n] = (int32_t)(hs_end - h);
    qual_off[n] = q - base;
    qual_len[n] = (int32_t)slen;
    int32_t L = (int32_t)(slen < max_len ? slen : max_len);
    uint8_t* row = codes_out + (int64_t)n * max_len;
    for (int32_t i = 0; i < L; ++i) row[i] = kCodes.t[(uint8_t)s[i]];
    for (int32_t i = L; i < max_len; ++i) row[i] = 5;  // PAD
    lens_out[n] = (int32_t)(slen < (1 << 20) ? slen : (1 << 20));
    ++n;
    p = qe;
    if (p < end && *p == '\r') ++p;
    if (p < end && *p == '\n') ++p;
  }
  *pos_io = p - base;
  return n;
}

}  // extern "C"
