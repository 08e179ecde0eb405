// Host-side streaming rANS range coder for deepsvc_tpu.
//
// A clean-room 64-bit rANS (asymmetric numeral system) implementation in
// the style of Duda / ryg's public-domain rans64: 16-bit probability
// precision, uint32 renormalization, LIFO encoding (the buffered encoder
// accumulates ops and encodes in reverse on flush so the decoder reads
// forward).
//
// Out-of-range values use an escape symbol (the last entry of each CDF
// row, carrying the tail mass) followed by raw bypass nibbles pushed
// directly into the rANS state.
//
// Interface mirrors the reference's entropy-coding runtime surface
// (SURVEY.md §2.5): (symbols, indexes, cdfs, cdf_lengths, offsets)
// batched encode, plus a streaming decoder for the serial channel-AR
// slice chain (decode_stream per slice over one contiguous bitstream).
//
// TPU division of labor: the accelerator computes per-symbol CDF row
// indexes and integer symbols; this code only moves bytes.

#include <cstdint>
#include <cstring>
#include <vector>

namespace {

constexpr uint32_t kPrecision = 16;                  // probability bits
constexpr uint64_t kRansLow = 1ull << 31;            // renorm lower bound
constexpr uint32_t kBypassBits = 4;                  // bypass nibble width
constexpr uint32_t kMaxBypass = (1u << kBypassBits) - 1;

struct RansEncState {
  uint64_t x = kRansLow;
  // Encoded words, emitted back-to-front (we reverse at flush).
  std::vector<uint32_t> words;

  inline void put(uint32_t start, uint32_t freq) {
    // renormalize: keep x < (kRansLow >> kPrecision << 32) * freq
    uint64_t x_max = ((kRansLow >> kPrecision) << 32) * freq;
    while (x >= x_max) {
      words.push_back(static_cast<uint32_t>(x));
      x >>= 32;
    }
    x = ((x / freq) << kPrecision) + (x % freq) + start;
  }

  inline void put_bypass(uint32_t val) {
    // push kBypassBits raw bits
    uint64_t x_max = ((kRansLow >> kBypassBits) << 32);
    while (x >= x_max) {
      words.push_back(static_cast<uint32_t>(x));
      x >>= 32;
    }
    x = (x << kBypassBits) | (val & kMaxBypass);
  }
};

struct RansDecState {
  uint64_t x = 0;
  const uint32_t* ptr = nullptr;
  const uint32_t* end = nullptr;

  void init(const uint8_t* stream, size_t nbytes) {
    ptr = reinterpret_cast<const uint32_t*>(stream);
    end = ptr + nbytes / 4;
    x = 0;
    if (ptr + 2 <= end) {
      x = (static_cast<uint64_t>(ptr[1]) << 32) | ptr[0];
      ptr += 2;
    } else if (ptr + 1 <= end) {
      x = ptr[0];
      ptr += 1;
    }
  }

  inline uint32_t peek() const {
    return static_cast<uint32_t>(x & ((1u << kPrecision) - 1));
  }

  inline void advance(uint32_t start, uint32_t freq) {
    uint64_t mask = (1u << kPrecision) - 1;
    x = freq * (x >> kPrecision) + (x & mask) - start;
    while (x < kRansLow && ptr < end) {
      x = (x << 32) | *ptr++;
    }
  }

  inline uint32_t get_bypass() {
    uint32_t v = static_cast<uint32_t>(x & kMaxBypass);
    x >>= kBypassBits;
    while (x < kRansLow && ptr < end) {
      x = (x << 32) | *ptr++;
    }
    return v;
  }
};

// One buffered encode op. kind 0: cdf symbol (start/freq); kind 1: bypass
// nibble (val).
struct EncOp {
  uint32_t a;  // start | val
  uint32_t b;  // freq  | unused
  uint8_t kind;
};

struct Encoder {
  std::vector<EncOp> ops;
};

struct Decoder {
  RansDecState st;
  std::vector<uint8_t> stream;  // owned copy (padded to 4 bytes)
};

inline void lookup(const int32_t* cdf_row, int32_t cdf_len, uint32_t cum,
                   int32_t* sym, uint32_t* start, uint32_t* freq) {
  // binary search: find s with cdf[s] <= cum < cdf[s+1]
  int32_t lo = 0, hi = cdf_len - 1;
  while (hi - lo > 1) {
    int32_t mid = (lo + hi) >> 1;
    if (static_cast<uint32_t>(cdf_row[mid]) <= cum)
      lo = mid;
    else
      hi = mid;
  }
  *sym = lo;
  *start = static_cast<uint32_t>(cdf_row[lo]);
  *freq = static_cast<uint32_t>(cdf_row[lo + 1]) - *start;
}

// Append the ops for one (value, cdf row) pair to `ops` in FORWARD order.
void push_symbol_ops(std::vector<EncOp>& ops, int32_t value,
                     const int32_t* cdf_row, int32_t cdf_len,
                     int32_t offset) {
  const int32_t max_value = cdf_len - 2;  // escape symbol id
  int32_t raw = value - offset;
  int32_t sym = raw;
  uint32_t overflow = 0;
  bool bypass = false;
  if (raw < 0) {
    overflow = static_cast<uint32_t>(-2 * (int64_t)raw - 1);
    bypass = true;
  } else if (raw >= max_value) {
    overflow = static_cast<uint32_t>(2 * ((int64_t)raw - max_value));
    bypass = true;
  }
  if (bypass) sym = max_value;

  uint32_t start = static_cast<uint32_t>(cdf_row[sym]);
  uint32_t freq = static_cast<uint32_t>(cdf_row[sym + 1]) - start;
  ops.push_back({start, freq, 0});

  if (bypass) {
    // count nibbles (64-bit shift: n*kBypassBits reaches 32 for
    // overflow >= 2^28, and a 32-bit shift-by-32 is UB / x86 no-op,
    // which would spin this loop forever)
    uint32_t n = 0;
    while ((static_cast<uint64_t>(overflow) >> (n * kBypassBits)) != 0) ++n;
    // encode nibble count, kMaxBypass-ary unary
    uint32_t v = n;
    while (v >= kMaxBypass) {
      ops.push_back({kMaxBypass, 0, 1});
      v -= kMaxBypass;
    }
    ops.push_back({v, 0, 1});
    // low-to-high nibbles
    for (uint32_t i = 0; i < n; ++i) {
      ops.push_back({(overflow >> (i * kBypassBits)) & kMaxBypass, 0, 1});
    }
  }
}

int flush_ops(const std::vector<EncOp>& ops, uint8_t* out, int capacity) {
  RansEncState st;
  // LIFO: encode in reverse so decode reads forward.
  for (auto it = ops.rbegin(); it != ops.rend(); ++it) {
    if (it->kind == 0)
      st.put(it->a, it->b);
    else
      st.put_bypass(it->a);
  }
  // Final state: push high then low so that after the full reversal the
  // stream starts [low32, high32, ...] — the decoder's init order.
  st.words.push_back(static_cast<uint32_t>(st.x >> 32));
  st.words.push_back(static_cast<uint32_t>(st.x));
  int nbytes = static_cast<int>(st.words.size() * 4);
  if (nbytes > capacity) return -nbytes;  // caller retries with bigger buffer
  // words were emitted in encode order; decoder consumes them in reverse.
  uint32_t* w = reinterpret_cast<uint32_t*>(out);
  size_t n = st.words.size();
  for (size_t i = 0; i < n; ++i) w[i] = st.words[n - 1 - i];
  return nbytes;
}

int decode_symbols(RansDecState& st, const int32_t* indexes, int n,
                   const int32_t* cdfs, int cdf_stride,
                   const int32_t* cdf_lengths, const int32_t* offsets,
                   int32_t* out_values) {
  for (int i = 0; i < n; ++i) {
    const int32_t row = indexes[i];
    const int32_t* cdf_row = cdfs + static_cast<int64_t>(row) * cdf_stride;
    const int32_t cdf_len = cdf_lengths[row];
    const int32_t max_value = cdf_len - 2;

    uint32_t cum = st.peek();
    int32_t sym;
    uint32_t start, freq;
    lookup(cdf_row, cdf_len, cum, &sym, &start, &freq);
    st.advance(start, freq);

    int64_t raw = sym;
    if (sym == max_value) {
      // bypass: nibble count then nibbles
      uint32_t n_nib = 0;
      uint32_t v = st.get_bypass();
      while (v == kMaxBypass) {
        n_nib += kMaxBypass;
        v = st.get_bypass();
      }
      n_nib += v;
      uint32_t overflow = 0;
      for (uint32_t k = 0; k < n_nib; ++k) {
        // a corrupt stream can claim arbitrarily large n_nib (unary
        // kMaxBypass-ary count); always consume the nibble to stay in
        // stream sync, but only OR it in while the shift is defined —
        // at k*kBypassBits >= 32 even the 64-bit shift would hit UB at
        // k >= 16 (ADVICE r2 #4)
        uint32_t nib = st.get_bypass();
        if (k * kBypassBits < 32) {
          overflow |= nib << (k * kBypassBits);
        }
      }
      // invert zigzag (64-bit: overflow+1 must not wrap at UINT32_MAX)
      if (overflow & 1) {
        raw = -((static_cast<int64_t>(overflow) + 1) / 2);
      } else {
        raw = static_cast<int64_t>(overflow) / 2 + max_value;
      }
    }
    out_values[i] = static_cast<int32_t>(raw + offsets[row]);
  }
  return 0;
}

}  // namespace

extern "C" {

// ----------------------------- one-shot API -----------------------------

int rans_encode_with_indexes(const int32_t* symbols, const int32_t* indexes,
                             int n, const int32_t* cdfs, int cdf_stride,
                             const int32_t* cdf_lengths,
                             const int32_t* offsets, uint8_t* out,
                             int capacity) {
  std::vector<EncOp> ops;
  ops.reserve(n + 8);
  for (int i = 0; i < n; ++i) {
    const int32_t row = indexes[i];
    push_symbol_ops(ops, symbols[i],
                    cdfs + static_cast<int64_t>(row) * cdf_stride,
                    cdf_lengths[row], offsets[row]);
  }
  return flush_ops(ops, out, capacity);
}

int rans_decode_with_indexes(const uint8_t* stream, int nbytes,
                             const int32_t* indexes, int n,
                             const int32_t* cdfs, int cdf_stride,
                             const int32_t* cdf_lengths,
                             const int32_t* offsets, int32_t* out_values) {
  RansDecState st;
  st.init(stream, nbytes);
  return decode_symbols(st, indexes, n, cdfs, cdf_stride, cdf_lengths,
                        offsets, out_values);
}

// --------------------------- buffered encoder ---------------------------

void* rans_encoder_new() { return new Encoder(); }

void rans_encoder_free(void* enc) { delete static_cast<Encoder*>(enc); }

void rans_encoder_push(void* enc, const int32_t* symbols,
                       const int32_t* indexes, int n, const int32_t* cdfs,
                       int cdf_stride, const int32_t* cdf_lengths,
                       const int32_t* offsets) {
  Encoder* e = static_cast<Encoder*>(enc);
  for (int i = 0; i < n; ++i) {
    const int32_t row = indexes[i];
    push_symbol_ops(e->ops, symbols[i],
                    cdfs + static_cast<int64_t>(row) * cdf_stride,
                    cdf_lengths[row], offsets[row]);
  }
}

int rans_encoder_flush(void* enc, uint8_t* out, int capacity) {
  Encoder* e = static_cast<Encoder*>(enc);
  int r = flush_ops(e->ops, out, capacity);
  if (r >= 0) e->ops.clear();
  return r;
}

// --------------------------- streaming decoder --------------------------

void* rans_decoder_new(const uint8_t* stream, int nbytes) {
  Decoder* d = new Decoder();
  size_t padded = (static_cast<size_t>(nbytes) + 3) & ~size_t(3);
  d->stream.assign(padded, 0);
  std::memcpy(d->stream.data(), stream, nbytes);
  d->st.init(d->stream.data(), padded);
  return d;
}

void rans_decoder_free(void* dec) { delete static_cast<Decoder*>(dec); }

int rans_decoder_decode_stream(void* dec, const int32_t* indexes, int n,
                               const int32_t* cdfs, int cdf_stride,
                               const int32_t* cdf_lengths,
                               const int32_t* offsets, int32_t* out_values) {
  Decoder* d = static_cast<Decoder*>(dec);
  return decode_symbols(d->st, indexes, n, cdfs, cdf_stride, cdf_lengths,
                        offsets, out_values);
}

}  // extern "C"
