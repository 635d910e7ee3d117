// sodimage — C++ host-side IMAGE kernels for the sod_tpu framework.
//
// The measured bound of both end-to-end products is per-core host image
// work (docs/PERFORMANCE.md): /predict pays PIL decode + LANCZOS restore
// + heatmap + 3x PNG encode (~73 ms/request against a model path doing
// 1800+ img/s), and the train loader pays the photometric augmentation
// (jitter + gaussian blur) of the reference pipeline
// (ref app.py:296-334 and datasets/base_dataset.py:103-136).  These
// kernels replace the hot stages:
//
//   * png_encode        — fast PNG writer: PNG filter (none/sub) + a
//                         fixed-Huffman deflate with distance-1 run
//                         matches.  zlib level-1 measures ~29 MB/s on
//                         one core of this host and compresses photo
//                         data by only ~5%; the fixed-Huffman path is
//                         bit-packing speed with byte-run LZ, which is
//                         where mask/heatmap PNGs actually compress.
//                         Lossless: any PNG decoder round-trips the
//                         exact pixels (test-locked against PIL).
//   * resample_u8       — PIL-exact (bit-identical) separable resampling
//                         (bilinear / Lanczos-3), the /predict resize
//                         and mask-restore stages.
//   * jet_blend         — heatmap LUT + integer average blend in one
//                         pass (bit-identical to the Python LUT path).
//   * blur_mirror_f32   — separable Gaussian with reflect-101 border,
//                         the scipy.correlate1d twin (same float32
//                         accumulation order along each axis).
//   * affine_clip_f32 / saturate_clip_f32 / gray_mean_f32 — the
//                         torchvision-equivalent color-jitter ops as
//                         single fused passes over the float32 image.
//
// Build: `make` in this directory (g++ -O3 -shared, links -lz for
// crc32/adler32 only).

#include <cstdint>
#include <cstring>
#include <cmath>
#include <vector>
#include <algorithm>

#include <zlib.h>   // crc32(), adler32()

extern "C" {

// ===========================================================================
// Fast PNG encoder: fixed-Huffman deflate + distance-1 run matches
// ===========================================================================

namespace {

struct BitWriter {
  uint8_t* out;
  int64_t cap;
  int64_t pos = 0;
  uint64_t acc = 0;
  int nbits = 0;
  bool overflow = false;

  // deflate packs bits LSB-first
  inline void put(uint32_t bits, int n) {
    acc |= (uint64_t)bits << nbits;
    nbits += n;
    while (nbits >= 8) {
      if (pos >= cap) { overflow = true; nbits = 0; return; }
      out[pos++] = (uint8_t)(acc & 0xff);
      acc >>= 8;
      nbits -= 8;
    }
  }
  inline void flush_byte() {
    if (nbits > 0) {
      if (pos >= cap) { overflow = true; return; }
      out[pos++] = (uint8_t)(acc & 0xff);
      acc = 0;
      nbits = 0;
    }
  }
};

// Huffman codes are written MSB-first into the LSB-first stream: store
// them pre-reversed.
inline uint32_t rev_bits(uint32_t v, int n) {
  uint32_t r = 0;
  for (int i = 0; i < n; ++i) { r = (r << 1) | (v & 1); v >>= 1; }
  return r;
}

struct FixedCodes {
  uint16_t lit_code[256];
  uint8_t lit_len[256];
  // length codes 257..285: huffman code (reversed) + bit length, plus
  // extra-bit count and base length
  uint16_t len_code[29];
  uint8_t len_bits[29];
  uint8_t len_extra[29];
  uint16_t len_base[29];
  uint16_t eob_code;   // literal 256
  FixedCodes() {
    for (int v = 0; v < 144; ++v) {
      lit_code[v] = (uint16_t)rev_bits(0x30 + v, 8);
      lit_len[v] = 8;
    }
    for (int v = 144; v < 256; ++v) {
      lit_code[v] = (uint16_t)rev_bits(0x190 + (v - 144), 9);
      lit_len[v] = 9;
    }
    eob_code = (uint16_t)rev_bits(0, 7);          // symbol 256: 7 bits
    static const uint16_t base[29] = {
        3, 4, 5, 6, 7, 8, 9, 10, 11, 13, 15, 17, 19, 23, 27, 31,
        35, 43, 51, 59, 67, 83, 99, 115, 131, 163, 195, 227, 258};
    static const uint8_t extra[29] = {
        0, 0, 0, 0, 0, 0, 0, 0, 1, 1, 1, 1, 2, 2, 2, 2,
        3, 3, 3, 3, 4, 4, 4, 4, 5, 5, 5, 5, 0};
    for (int i = 0; i < 29; ++i) {
      int sym = 257 + i;
      len_base[i] = base[i];
      len_extra[i] = extra[i];
      if (sym <= 279) {           // 7-bit codes 0000001..0010111
        len_code[i] = (uint16_t)rev_bits(sym - 256, 7);
        len_bits[i] = 7;
      } else {                    // 8-bit codes 11000000..11000111
        len_code[i] = (uint16_t)rev_bits(0xC0 + (sym - 280), 8);
        len_bits[i] = 8;
      }
    }
  }
};

const FixedCodes kFixed;

// length value (3..258) -> length-code index 0..28, exact table
struct LenSymTable {
  uint8_t sym[259];
  LenSymTable() {
    for (int i = 0; i < 29; ++i) {
      int lo = kFixed.len_base[i];
      int hi = (i == 28) ? 258
                         : kFixed.len_base[i] + (1 << kFixed.len_extra[i]) - 1;
      if (hi > 258) hi = 258;
      for (int l = lo; l <= hi && l <= 258; ++l) sym[l] = (uint8_t)i;
    }
    sym[258] = 28;
  }
};
const LenSymTable kLenSym;

inline void emit_literal(BitWriter& bw, uint8_t v) {
  bw.put(kFixed.lit_code[v], kFixed.lit_len[v]);
}

// match with distance 1 (byte run), length 3..258
inline void emit_run(BitWriter& bw, int length) {
  int s = kLenSym.sym[length];
  bw.put(kFixed.len_code[s], kFixed.len_bits[s]);
  if (kFixed.len_extra[s])
    bw.put((uint32_t)(length - kFixed.len_base[s]), kFixed.len_extra[s]);
  // distance code 0 (dist 1): 5 bits, value 0 — reversed is still 0
  bw.put(0, 5);
}

// deflate `data` as ONE final fixed-huffman block with distance-1 run
// matches.  Returns compressed size or -1 on overflow.
int64_t deflate_fixed(const uint8_t* data, int64_t n, uint8_t* out,
                      int64_t cap) {
  BitWriter bw{out, cap};
  bw.put(1, 1);      // BFINAL
  bw.put(1, 2);      // BTYPE=01 fixed huffman
  int64_t i = 0;
  while (i < n) {
    uint8_t v = data[i];
    // how long does this byte repeat?
    int64_t j = i + 1;
    int64_t maxrun = std::min<int64_t>(n, i + 1 + 258 * 4);
    while (j < maxrun && data[j] == v) ++j;
    int64_t run = j - i;            // total identical bytes incl. first
    emit_literal(bw, v);
    int64_t rest = run - 1;         // matchable at distance 1
    while (rest >= 3) {
      int take = (int)std::min<int64_t>(rest, 258);
      // avoid leaving a 1..2 byte tail that cannot be a match (fine as
      // literals, but shortening keeps the tail >= 3 when possible)
      if (rest - take > 0 && rest - take < 3 && take > 3)
        take -= (3 - (int)(rest - take));
      emit_run(bw, take);
      rest -= take;
    }
    for (int64_t k = 0; k < rest; ++k) emit_literal(bw, v);
    i += run;
    if (bw.overflow) return -1;
  }
  bw.put(kFixed.eob_code, 7);       // end of block
  bw.flush_byte();
  return bw.overflow ? -1 : bw.pos;
}

inline void put_be32(uint8_t* p, uint32_t v) {
  p[0] = (uint8_t)(v >> 24);
  p[1] = (uint8_t)(v >> 16);
  p[2] = (uint8_t)(v >> 8);
  p[3] = (uint8_t)v;
}

int64_t png_chunk(uint8_t* out, const char tag[4], const uint8_t* data,
                  int64_t n) {
  put_be32(out, (uint32_t)n);
  std::memcpy(out + 4, tag, 4);
  if (n) std::memcpy(out + 8, data, n);
  uint32_t crc = crc32(0L, Z_NULL, 0);
  crc = crc32(crc, out + 4, (uInt)(4 + n));
  put_be32(out + 8 + n, crc);
  return 12 + n;
}

}  // namespace

// img: [h, w, c] uint8 row-major, c in {1, 3}.  filter: 0 = none,
// 1 = sub (left-delta; better runs on smooth images).  Writes a complete
// PNG stream to `out`; returns its length, or -1 if `max_len` is too
// small (callers size it at raw*9/8 + 4096).
int64_t png_encode(const uint8_t* img, int64_t h, int64_t w, int64_t c,
                   int filter, uint8_t* out, int64_t max_len) {
  if (c != 1 && c != 3) return -1;
  const int64_t stride = w * c;
  const int64_t rawn = h * (1 + stride);
  std::vector<uint8_t> raw((size_t)rawn);
  for (int64_t r = 0; r < h; ++r) {
    uint8_t* dst = raw.data() + r * (1 + stride);
    const uint8_t* src = img + r * stride;
    dst[0] = (uint8_t)(filter ? 1 : 0);
    if (!filter) {
      std::memcpy(dst + 1, src, stride);
    } else {                       // sub filter: delta from pixel-left
      for (int64_t k = 0; k < c; ++k) dst[1 + k] = src[k];
      for (int64_t k = c; k < stride; ++k)
        dst[1 + k] = (uint8_t)(src[k] - src[k - c]);
    }
  }

  // layout: sig(8) IHDR(25) IDAT(12+comp) IEND(12)
  if (max_len < 8 + 25 + 12 + 12) return -1;
  static const uint8_t sig[8] = {0x89, 'P', 'N', 'G', '\r', '\n', 0x1a,
                                 '\n'};
  std::memcpy(out, sig, 8);
  int64_t pos = 8;
  uint8_t ihdr[13];
  put_be32(ihdr, (uint32_t)w);
  put_be32(ihdr + 4, (uint32_t)h);
  ihdr[8] = 8;                               // bit depth
  ihdr[9] = (c == 1) ? 0 : 2;                // gray / truecolor
  ihdr[10] = ihdr[11] = ihdr[12] = 0;
  pos += png_chunk(out + pos, "IHDR", ihdr, 13);

  // IDAT: zlib header + fixed-huffman deflate + adler32
  uint8_t* idat = out + pos + 8;             // chunk data starts after
                                             // len+tag; fill len later
  int64_t cap = max_len - pos - 12 - 12;     // minus IDAT+IEND overhead
  if (cap < 8) return -1;
  idat[0] = 0x78;                            // zlib CMF
  idat[1] = 0x01;                            // FLG (no dict, fastest)
  int64_t comp = deflate_fixed(raw.data(), rawn, idat + 2, cap - 6);
  if (comp < 0) return -1;
  uint32_t ad = adler32(1L, raw.data(), (uInt)rawn);
  put_be32(idat + 2 + comp, ad);
  int64_t idat_n = 2 + comp + 4;
  // write the chunk framing around the already-written payload
  put_be32(out + pos, (uint32_t)idat_n);
  std::memcpy(out + pos + 4, "IDAT", 4);
  uint32_t crc = crc32(0L, Z_NULL, 0);
  crc = crc32(crc, out + pos + 4, (uInt)(4 + idat_n));
  put_be32(out + pos + 8 + idat_n, crc);
  pos += 12 + idat_n;

  pos += png_chunk(out + pos, "IEND", nullptr, 0);
  return pos;
}

// ===========================================================================
// PIL-exact separable resampling (bilinear / Lanczos-3) on uint8
// ===========================================================================

namespace {

// Pillow Resample.c PRECISION_BITS
constexpr int kPrecisionBits = 32 - 8 - 2;

inline double filt_bilinear(double x) {
  if (x < 0.0) x = -x;
  return (x < 1.0) ? 1.0 - x : 0.0;
}

inline double sinc(double x) {
  if (x == 0.0) return 1.0;
  x *= M_PI;
  return std::sin(x) / x;
}

inline double filt_lanczos(double x) {
  if (x < 0.0) x = -x;
  return (x < 3.0) ? sinc(x) * sinc(x / 3.0) : 0.0;
}

// Pillow precompute_coeffs: per-output-pixel integer kernels.
// Returns ksize; fills bounds[2*out] (xmin, xmax-xmin) and
// kk[out*ksize] int32 coefficients.
int precompute_coeffs(int64_t in_size, int64_t out_size, int filter_id,
                      std::vector<int>& bounds, std::vector<int32_t>& kk) {
  double (*filt)(double) = filter_id ? filt_lanczos : filt_bilinear;
  double support = filter_id ? 3.0 : 1.0;
  double scale = (double)in_size / (double)out_size;
  double filterscale = scale < 1.0 ? 1.0 : scale;
  double ss = 1.0 / filterscale;
  double supp = support * filterscale;
  int ksize = (int)std::ceil(supp) * 2 + 1;
  bounds.assign((size_t)out_size * 2, 0);
  kk.assign((size_t)out_size * ksize, 0);
  std::vector<double> prekk(ksize);
  for (int64_t xx = 0; xx < out_size; ++xx) {
    double center = (xx + 0.5) * scale;
    double ww = 0.0;
    int xmin = (int)(center - supp + 0.5);
    if (xmin < 0) xmin = 0;
    int xmax = (int)(center + supp + 0.5);
    if (xmax > in_size) xmax = (int)in_size;
    xmax -= xmin;
    for (int x = 0; x < xmax; ++x) {
      double wv = filt((x + xmin - center + 0.5) * ss);
      prekk[x] = wv;
      ww += wv;
    }
    for (int x = 0; x < xmax; ++x)
      if (ww != 0.0) prekk[x] /= ww;
    int32_t* k = kk.data() + xx * ksize;
    for (int x = 0; x < xmax; ++x) {
      double v = prekk[x] * (1 << kPrecisionBits);
      k[x] = (int32_t)(v < 0 ? v - 0.5 : v + 0.5);
    }
    for (int x = xmax; x < ksize; ++x) k[x] = 0;
    bounds[xx * 2] = xmin;
    bounds[xx * 2 + 1] = xmax;
  }
  return ksize;
}

inline uint8_t clip8(int32_t v) {
  v >>= kPrecisionBits;
  if (v < 0) return 0;
  if (v > 255) return 255;
  return (uint8_t)v;
}

// horizontal pass: [h, in_w, c] -> [h, out_w, c]
void resample_h(const uint8_t* src, int64_t h, int64_t in_w, int64_t c,
                uint8_t* dst, int64_t out_w, const std::vector<int>& bounds,
                const std::vector<int32_t>& kk, int ksize) {
  const int32_t half = 1 << (kPrecisionBits - 1);
  for (int64_t r = 0; r < h; ++r) {
    const uint8_t* row = src + r * in_w * c;
    uint8_t* orow = dst + r * out_w * c;
    if (c == 3) {                 // RGB: three accumulators, one tap loop
      for (int64_t xx = 0; xx < out_w; ++xx) {
        int xmin = bounds[xx * 2], xmax = bounds[xx * 2 + 1];
        const int32_t* k = kk.data() + xx * ksize;
        const uint8_t* p = row + (int64_t)xmin * 3;
        int32_t s0 = half, s1 = half, s2 = half;
        for (int x = 0; x < xmax; ++x) {
          int32_t kv = k[x];
          s0 += (int32_t)p[0] * kv;
          s1 += (int32_t)p[1] * kv;
          s2 += (int32_t)p[2] * kv;
          p += 3;
        }
        uint8_t* o = orow + xx * 3;
        o[0] = clip8(s0);
        o[1] = clip8(s1);
        o[2] = clip8(s2);
      }
    } else {
      for (int64_t xx = 0; xx < out_w; ++xx) {
        int xmin = bounds[xx * 2], xmax = bounds[xx * 2 + 1];
        const int32_t* k = kk.data() + xx * ksize;
        int32_t ss = half;
        const uint8_t* p = row + xmin;
        for (int x = 0; x < xmax; ++x) ss += (int32_t)p[x] * k[x];
        orow[xx] = clip8(ss);
      }
    }
  }
}

// vertical pass: [in_h, w, c] -> [out_h, w, c]
void resample_v(const uint8_t* src, int64_t in_h, int64_t w, int64_t c,
                uint8_t* dst, int64_t out_h, const std::vector<int>& bounds,
                const std::vector<int32_t>& kk, int ksize) {
  const int32_t half = 1 << (kPrecisionBits - 1);
  const int64_t stride = w * c;
  std::vector<int32_t> acc((size_t)stride);
  for (int64_t yy = 0; yy < out_h; ++yy) {
    int ymin = bounds[yy * 2], ymax = bounds[yy * 2 + 1];
    const int32_t* k = kk.data() + yy * ksize;
    std::fill(acc.begin(), acc.end(), half);
    for (int y = 0; y < ymax; ++y) {
      const uint8_t* row = src + (int64_t)(ymin + y) * stride;
      int32_t kv = k[y];
      for (int64_t i = 0; i < stride; ++i) acc[i] += (int32_t)row[i] * kv;
    }
    uint8_t* orow = dst + yy * stride;
    for (int64_t i = 0; i < stride; ++i) orow[i] = clip8(acc[i]);
  }
}

}  // namespace

// PIL-exact Image.resize on [h, w, c] uint8 (c in {1, 3}).
// filter_id: 0 = bilinear, 1 = LANCZOS.  Horizontal pass first, then
// vertical, each quantizing to uint8 — exactly Pillow's two-pass
// ImagingResample flow, so results are bit-identical to PIL.
// Returns 0 on success.
int resample_u8(const uint8_t* src, int64_t in_h, int64_t in_w, int64_t c,
                uint8_t* dst, int64_t out_h, int64_t out_w, int filter_id) {
  if (c != 1 && c != 3) return -1;
  std::vector<int> bounds;
  std::vector<int32_t> kk;
  const uint8_t* cur = src;
  std::vector<uint8_t> tmp;
  int64_t cur_h = in_h, cur_w = in_w;
  if (out_w != in_w) {
    int ks = precompute_coeffs(in_w, out_w, filter_id, bounds, kk);
    tmp.resize((size_t)(in_h * out_w * c));
    resample_h(cur, in_h, in_w, c, tmp.data(), out_w, bounds, kk, ks);
    cur = tmp.data();
    cur_w = out_w;
  }
  if (out_h != in_h) {
    int ks = precompute_coeffs(in_h, out_h, filter_id, bounds, kk);
    resample_v(cur, cur_h, cur_w, c, dst, out_h, bounds, kk, ks);
  } else {
    std::memcpy(dst, cur, (size_t)(out_h * out_w * c));
  }
  return 0;
}

// ===========================================================================
// Heatmap LUT + integer average blend (one pass)
// ===========================================================================

// out[i] = (rgb[i] + lut[mask[px]]) >> 1 — bit-identical to the Python
// `(img.astype(uint16) + _JET_LUT[mask]) >> 1` path.  lut: [256, 3] u8.
void jet_blend(const uint8_t* rgb, const uint8_t* mask, const uint8_t* lut,
               uint8_t* out, int64_t npix) {
  for (int64_t i = 0; i < npix; ++i) {
    const uint8_t* l = lut + (int64_t)mask[i] * 3;
    const uint8_t* p = rgb + i * 3;
    uint8_t* o = out + i * 3;
    o[0] = (uint8_t)(((int)p[0] + l[0]) >> 1);
    o[1] = (uint8_t)(((int)p[1] + l[1]) >> 1);
    o[2] = (uint8_t)(((int)p[2] + l[2]) >> 1);
  }
}

// ===========================================================================
// Separable Gaussian blur, reflect-101 border (scipy 'mirror' twin)
// ===========================================================================

// img/out: [h, w, c] float32.  k: [klen] float32 (odd).  Two passes:
// axis 0 (rows) then axis 1 (cols), float32 accumulation — the same
// separable structure as the scipy.correlate1d fallback.
void blur_mirror_f32(const float* img, float* out, int64_t h, int64_t w,
                     int64_t c, const float* k, int klen) {
  const int rad = klen / 2;
  const int64_t stride = w * c;
  std::vector<float> tmp((size_t)(h * stride));
  // pass 1: along H.  out_row[r] = sum_t k[t] * src_row[mirror(r+t-rad)]
  for (int64_t r = 0; r < h; ++r) {
    float* dst = tmp.data() + r * stride;
    std::memset(dst, 0, sizeof(float) * stride);
    for (int t = 0; t < klen; ++t) {
      int64_t sr = r + t - rad;
      // reflect-101: -1 -> 1, h -> h-2 (repeat until in range)
      while (sr < 0 || sr >= h) {
        if (sr < 0) sr = -sr;
        if (sr >= h) sr = 2 * (h - 1) - sr;
      }
      const float* srow = img + sr * stride;
      float kv = k[t];
      for (int64_t i = 0; i < stride; ++i) dst[i] += kv * srow[i];
    }
  }
  // pass 2: along W.  For each tap the interior is one contiguous AXPY
  // (out[i] += k[t] * row[i + dx*c]); only the <= rad border pixels per
  // side pay the mirrored gather.
  std::vector<float> acc((size_t)stride);
  for (int64_t r = 0; r < h; ++r) {
    const float* srow = tmp.data() + r * stride;
    float* drow = out + r * stride;
    std::fill(acc.begin(), acc.end(), 0.0f);
    for (int t = 0; t < klen; ++t) {
      const int64_t dx = t - rad;
      const float kv = k[t];
      int64_t xlo = std::max<int64_t>(0, -dx);
      int64_t xhi = std::min<int64_t>(w, w - dx);
      if (xlo < xhi) {
        float* a = acc.data() + xlo * c;
        const float* s = srow + (xlo + dx) * c;
        const int64_t n = (xhi - xlo) * c;
        for (int64_t i = 0; i < n; ++i) a[i] += kv * s[i];
      }
      // mirrored borders (reflect-101)
      for (int64_t x = 0; x < xlo; ++x) {
        int64_t sx = x + dx;
        while (sx < 0 || sx >= w) {
          if (sx < 0) sx = -sx;
          if (sx >= w) sx = 2 * (w - 1) - sx;
        }
        for (int64_t ch = 0; ch < c; ++ch)
          acc[x * c + ch] += kv * srow[sx * c + ch];
      }
      for (int64_t x = std::max<int64_t>(xhi, 0); x < w; ++x) {
        int64_t sx = x + dx;
        while (sx < 0 || sx >= w) {
          if (sx < 0) sx = -sx;
          if (sx >= w) sx = 2 * (w - 1) - sx;
        }
        for (int64_t ch = 0; ch < c; ++ch)
          acc[x * c + ch] += kv * srow[sx * c + ch];
      }
    }
    for (int64_t i = 0; i < stride; ++i) {
      float v = acc[i];
      if (v < 0.0f) v = 0.0f;
      if (v > 255.0f) v = 255.0f;
      drow[i] = v;
    }
  }
}

// ===========================================================================
// Color-jitter ops (torchvision math) as fused float32 passes
// ===========================================================================

// img = clip(img * a + b, 0, 255) in place (brightness: b=0; contrast:
// b = mean_gray * (1 - f))
void affine_clip_f32(float* img, int64_t n, float a, float b) {
  for (int64_t i = 0; i < n; ++i) {
    float v = img[i] * a + b;
    if (v < 0.0f) v = 0.0f;
    if (v > 255.0f) v = 255.0f;
    img[i] = v;
  }
}

// saturation: each channel = clip(ch * f + gray * (1 - f)) with the
// ITU-R 601-2 luma of the CURRENT pixel
void saturate_clip_f32(float* img, int64_t npix, float f) {
  const float g = 1.0f - f;
  for (int64_t i = 0; i < npix; ++i) {
    float* p = img + i * 3;
    float gray = 0.299f * p[0] + 0.587f * p[1] + 0.114f * p[2];
    for (int k = 0; k < 3; ++k) {
      float v = p[k] * f + gray * g;
      if (v < 0.0f) v = 0.0f;
      if (v > 255.0f) v = 255.0f;
      p[k] = v;
    }
  }
}

// mean of the ITU-R 601-2 luma (contrast's reference point), double
// accumulation like numpy's pairwise-float64 mean to stay within 1 ulp
double gray_mean_f32(const float* img, int64_t npix) {
  double s = 0.0;
  for (int64_t i = 0; i < npix; ++i) {
    const float* p = img + i * 3;
    s += 0.299 * p[0] + 0.587 * p[1] + 0.114 * p[2];
  }
  return s / (double)npix;
}

// nearest-neighbor resize of a uint8 mask stack [m, h, w] -> [m, oh, ow]
// with the torch convention src = floor(dst * in/out) (the
// resize_mask_nearest twin — row gathers instead of NumPy fancy
// indexing)
void resize_nearest_u8(const uint8_t* src, int64_t m, int64_t h, int64_t w,
                       uint8_t* dst, int64_t oh, int64_t ow) {
  std::vector<int64_t> rows((size_t)oh), cols((size_t)ow);
  for (int64_t r = 0; r < oh; ++r)
    rows[r] = std::min<int64_t>((int64_t)(r * ((double)h / (double)oh)),
                                h - 1);
  for (int64_t x = 0; x < ow; ++x)
    cols[x] = std::min<int64_t>((int64_t)(x * ((double)w / (double)ow)),
                                w - 1);
  for (int64_t mi = 0; mi < m; ++mi) {
    const uint8_t* s = src + mi * h * w;
    uint8_t* d = dst + mi * oh * ow;
    for (int64_t r = 0; r < oh; ++r) {
      const uint8_t* srow = s + rows[r] * w;
      uint8_t* drow = d + r * ow;
      for (int64_t x = 0; x < ow; ++x) drow[x] = srow[cols[x]];
    }
  }
}

// per-channel mean of a float32 [npix, 3] image (the crop-fill color in
// geometric_augmentations), double accumulation
void channel_mean3_f32(const float* img, int64_t npix, double* out3) {
  double s0 = 0.0, s1 = 0.0, s2 = 0.0;
  for (int64_t i = 0; i < npix; ++i) {
    const float* p = img + i * 3;
    s0 += p[0];
    s1 += p[1];
    s2 += p[2];
  }
  out3[0] = s0 / (double)npix;
  out3[1] = s1 / (double)npix;
  out3[2] = s2 / (double)npix;
}

// uint8 quantization of the augmented image: round-half-to-even like
// np.round, clip, truncate — one pass instead of three NumPy ones
void quantize_u8(const float* in, uint8_t* out, int64_t n) {
  for (int64_t i = 0; i < n; ++i) {
    float v = std::nearbyintf(in[i]);   // round-half-even == np.round
    if (v < 0.0f) v = 0.0f;
    if (v > 255.0f) v = 255.0f;
    out[i] = (uint8_t)v;
  }
}

// random-grayscale op: img[..] = round(luma) on all three channels
// (np.round half-to-even semantics, matching augment.to_grayscale)
void grayscale3_f32(const float* in, float* out, int64_t npix) {
  for (int64_t i = 0; i < npix; ++i) {
    const float* p = in + i * 3;
    float g = 0.299f * p[0] + 0.587f * p[1] + 0.114f * p[2];
    g = std::nearbyintf(g);
    float* o = out + i * 3;
    o[0] = g;
    o[1] = g;
    o[2] = g;
  }
}

// ===========================================================================
// Hue shift via the uint8 HSV round-trip (PIL convert('HSV') semantics)
// ===========================================================================


namespace {

// hot-path lookup tables for hue_shift_u8 — every per-pixel divide in
// the rgb2hsv/hsv2rgb pair has at most 256x256 distinct inputs, so the
// exact quotients are precomputable.  Built once (~0.6 MB total);
// results stay bit-identical because the LUT stores the same rounded
// value the inline divide would produce.
struct HueLuts {
  float div255[256 * 256];     // [cr*256+d] = (float)d / (float)cr
                               // (cr-major: one pixel's three lookups
                               // share a row -> one cache line group)
  uint8_t s255[256 * 256];     // [cr*256+maxc] = 255*cr/maxc (int div)
  double f_lut[256];           // fractional sector position of h
  uint8_t i_lut[256];          // sector index of h
  double fs_lut[256];          // s / 255.0
  HueLuts() {
    for (int cr = 1; cr < 256; ++cr)
      for (int d = 0; d < 256; ++d)
        div255[cr * 256 + d] = (float)d / (float)cr;
    for (int cr = 0; cr < 256; ++cr)
      for (int maxc = 1; maxc < 256; ++maxc)
        s255[cr * 256 + maxc] =
            (uint8_t)std::min(255, (255 * cr) / maxc);
    for (int h = 0; h < 256; ++h) {
      double fh = ((double)h * 360.0 / 255.0) / 60.0;
      i_lut[h] = (uint8_t)((int)fh % 6);
      f_lut[h] = fh - (double)(int)fh;
    }
    for (int s = 0; s < 256; ++s) fs_lut[s] = ((double)s) / 255.0;
  }
};
const HueLuts kHue;

}  // namespace

// float32-in/float32-out wrapper around the hue rotation: the augment
// pipeline carries float32 images, and the separate astype(uint8) /
// astype(float32) NumPy passes around the u8 kernel cost more than the
// rotation itself.  The cast truncates toward zero like ndarray.astype
// (inputs are clipped to [0, 255] by the preceding jitter ops).
void hue_shift_f32(const float* in, float* out, int64_t npix, int delta);

// torchvision/PIL adjust_hue twin: rgb -> HSV (PIL convert semantics),
// H = (H + delta) % 256, HSV -> rgb.  in/out: [npix, 3] uint8.
// Bit-identical to the PIL round-trip over the full 256^3 RGB cube
// (tests/test_native_image.py validates exhaustively).
void hue_shift_u8(const uint8_t* in, uint8_t* out, int64_t npix,
                  int delta) {
  for (int64_t i = 0; i < npix; ++i) {
    const uint8_t* px = in + i * 3;
    uint8_t r = px[0], g = px[1], b = px[2];
    uint8_t* o = out + i * 3;
    uint8_t maxc = std::max(r, std::max(g, b));
    uint8_t minc = std::min(r, std::min(g, b));
    uint8_t v = maxc;
    uint8_t h8, s8;
    if (minc == maxc) {
      h8 = 0;
      s8 = 0;
    } else {
      int cr = (int)maxc - (int)minc;
      const float* dl = kHue.div255 + cr * 256;    // [cr*256 + d]
      float rc = dl[(int)maxc - (int)r];
      float gc = dl[(int)maxc - (int)g];
      float bc = dl[(int)maxc - (int)b];
      float hf;
      if (r == maxc)
        hf = (float)((double)bc - (double)gc);
      else if (g == maxc)
        hf = (float)(2.0 + (double)rc - (double)bc);
      else
        hf = (float)(4.0 + (double)gc - (double)rc);
      double q = (double)hf / 6.0 + 1.0;
      float hn = (float)(q < 1.0 ? q : q - 1.0);   // == fmod(q, 1.0)
      int hi = (int)((double)hn * 255.0);
      h8 = (uint8_t)std::min(std::max(hi, 0), 255);
      s8 = kHue.s255[cr * 256 + maxc];
    }
    h8 = (uint8_t)(((int)h8 + delta) & 0xff);
    if (s8 == 0) {
      o[0] = o[1] = o[2] = v;
      continue;
    }
    double f = kHue.f_lut[h8];
    double fs = kHue.fs_lut[s8];
    int p = (int)std::lround((double)v * (1.0 - fs));
    int q = (int)std::lround((double)v * (1.0 - fs * f));
    int t = (int)std::lround((double)v * (1.0 - fs * (1.0 - f)));
    uint8_t up = (uint8_t)std::min(std::max(p, 0), 255);
    uint8_t uq = (uint8_t)std::min(std::max(q, 0), 255);
    uint8_t ut = (uint8_t)std::min(std::max(t, 0), 255);
    switch (kHue.i_lut[h8]) {
      case 0: o[0] = v;  o[1] = ut; o[2] = up; break;
      case 1: o[0] = uq; o[1] = v;  o[2] = up; break;
      case 2: o[0] = up; o[1] = v;  o[2] = ut; break;
      case 3: o[0] = up; o[1] = uq; o[2] = v;  break;
      case 4: o[0] = ut; o[1] = up; o[2] = v;  break;
      default: o[0] = v; o[1] = up; o[2] = uq; break;
    }
  }
}

void hue_shift_f32(const float* in, float* out, int64_t npix,
                   int delta) {
  constexpr int64_t kChunk = 4096;
  uint8_t bi[kChunk * 3], bo[kChunk * 3];
  for (int64_t off = 0; off < npix; off += kChunk) {
    int64_t n = std::min(kChunk, npix - off);
    const float* ip = in + off * 3;
    for (int64_t i = 0; i < n * 3; ++i) bi[i] = (uint8_t)ip[i];
    hue_shift_u8(bi, bo, n, delta);
    float* op = out + off * 3;
    for (int64_t i = 0; i < n * 3; ++i) op[i] = (float)bo[i];
  }
}

}  // extern "C"
