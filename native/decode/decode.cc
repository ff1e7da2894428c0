// Native image-decode stage for the chest X-ray input pipeline.
//
// The reference decodes per sample with PIL inside Dataset.__getitem__
// (pyc L279 of the recovered ViT-Training source) — Python-object overhead
// per image on the hot path. This library decodes PNG/JPEG straight into
// caller-owned u8 buffers with zero Python allocation, and offers a
// std::thread batch API so a whole micro-batch decodes in parallel outside
// the GIL (ctypes releases the GIL for the duration of the call).
//
// Grayscale conversion matches PIL convert('L') exactly: fixed-point
// rounded ITU-R 601-2, (R*19595 + G*38470 + B*7471 + 0x8000) >> 16.
//
// Build: make -C native/decode    → libcxrdecode.so

#include <atomic>
#include <cmath>
#include <csetjmp>
#include <cstdint>
#include <cstring>
#include <thread>
#include <vector>

#include <jpeglib.h>
#include <png.h>

#if defined(__has_include)
#if __has_include(<libdeflate.h>)
#include <libdeflate.h>
#define CXR_HAVE_LIBDEFLATE 1
#endif
#endif

namespace {

constexpr unsigned char kPngSig[8] = {0x89, 'P', 'N', 'G', '\r', '\n',
                                      0x1a, '\n'};

inline unsigned char luma(unsigned r, unsigned g, unsigned b) {
  // PIL convert('L') fixed-point ITU-R 601-2: round(0.299R+0.587G+0.114B)
  return static_cast<unsigned char>(
      (r * 19595u + g * 38470u + b * 7471u + 0x8000u) >> 16);
}

// ---------------------------------------------------------------------------
// PNG
// ---------------------------------------------------------------------------

struct PngReadState {
  const unsigned char* data;
  size_t size;
  size_t offset;
};

void png_read_fn(png_structp png, png_bytep out, png_size_t n) {
  auto* st = static_cast<PngReadState*>(png_get_io_ptr(png));
  if (st->offset + n > st->size) {
    png_error(png, "read past end");
  }
  std::memcpy(out, st->data + st->offset, n);
  st->offset += n;
}

#ifdef CXR_HAVE_LIBDEFLATE

// Fast path for the NIH-native case: non-interlaced 8/16-bit grayscale PNG.
// libpng's row-at-a-time zlib inflate is the measured bottleneck (~10 ms for
// a 1024² X-ray on this host); libdeflate decompresses the concatenated IDAT
// stream in one call at ~2-3× zlib speed, and the PNG scanline unfilter
// (Sub/Up/Avg/Paeth, bpp 1 or 2) is a trivial pass. Anything fancier
// (palette, color, interlace, tRNS) returns 1 = "use the libpng path".
inline unsigned be32(const unsigned char* p) {
  return (unsigned(p[0]) << 24) | (unsigned(p[1]) << 16) |
         (unsigned(p[2]) << 8) | unsigned(p[3]);
}

int decode_png_gray_fast(const unsigned char* data, size_t size,
                         unsigned char* out, int buf_h, int buf_w,
                         int* out_h, int* out_w) {
  if (size < 8 + 25) return 1;
  size_t off = 8;
  // IHDR must be first
  if (be32(data + off) != 13 || std::memcmp(data + off + 4, "IHDR", 4) != 0)
    return 1;
  const unsigned char* ihdr = data + off + 8;
  const unsigned w = be32(ihdr), h = be32(ihdr + 4);
  const int depth = ihdr[8], color = ihdr[9];
  const int compression = ihdr[10], filter = ihdr[11], interlace = ihdr[12];
  if (color != 0 || (depth != 8 && depth != 16) || compression != 0 ||
      filter != 0 || interlace != 0)
    return 1;
  if (w == 0 || h == 0 || static_cast<int>(h) > buf_h ||
      static_cast<int>(w) > buf_w)
    return 1;  // includes too-small buffer: let libpng produce exact errors
  off += 8 + 13 + 4;

  // Concatenate IDAT payloads (CRCs skipped — integrity is the inflate's
  // adler32, which libdeflate checks).
  std::vector<unsigned char> idat;
  idat.reserve(size - off);
  bool seen_end = false;
  while (off + 8 <= size) {
    const unsigned len = be32(data + off);
    const unsigned char* type = data + off + 4;
    if (off + 8 + len + 4 > size) return 1;  // truncated chunk
    if (std::memcmp(type, "IDAT", 4) == 0) {
      idat.insert(idat.end(), data + off + 8, data + off + 8 + len);
    } else if (std::memcmp(type, "IEND", 4) == 0) {
      seen_end = true;
      break;
    }
    off += 8 + len + 4;
  }
  if (!seen_end || idat.empty()) return 1;

  const size_t bpp = depth / 8;                   // bytes per pixel (1 or 2)
  const size_t stride = static_cast<size_t>(w) * bpp;
  const size_t raw_size = (stride + 1) * h;       // +1 filter byte per row
  thread_local struct libdeflate_decompressor* dec =
      libdeflate_alloc_decompressor();
  if (!dec) return 1;
  std::vector<unsigned char> raw(raw_size);
  size_t actual = 0;
  if (libdeflate_zlib_decompress(dec, idat.data(), idat.size(), raw.data(),
                                 raw_size, &actual) != LIBDEFLATE_SUCCESS ||
      actual != raw_size)
    return 1;

  // Unfilter scanlines in place (prev = fully reconstructed previous row).
  std::vector<unsigned char> prev(stride, 0);
  std::vector<unsigned char> cur(stride);
  for (unsigned y = 0; y < h; ++y) {
    const unsigned char* src = raw.data() + static_cast<size_t>(y) *
                               (stride + 1);
    const int ft = src[0];
    const unsigned char* in = src + 1;
    switch (ft) {
      case 0:
        std::memcpy(cur.data(), in, stride);
        break;
      case 1:  // Sub
        for (size_t x = 0; x < bpp; ++x) cur[x] = in[x];
        for (size_t x = bpp; x < stride; ++x)
          cur[x] = static_cast<unsigned char>(in[x] + cur[x - bpp]);
        break;
      case 2:  // Up
        for (size_t x = 0; x < stride; ++x)
          cur[x] = static_cast<unsigned char>(in[x] + prev[x]);
        break;
      case 3:  // Average
        for (size_t x = 0; x < bpp; ++x)
          cur[x] = static_cast<unsigned char>(in[x] + prev[x] / 2);
        for (size_t x = bpp; x < stride; ++x)
          cur[x] = static_cast<unsigned char>(
              in[x] + ((cur[x - bpp] + prev[x]) >> 1));
        break;
      case 4:  // Paeth
        for (size_t x = 0; x < bpp; ++x)
          cur[x] = static_cast<unsigned char>(in[x] + prev[x]);
        for (size_t x = bpp; x < stride; ++x) {
          const int a = cur[x - bpp], b = prev[x], c = prev[x - bpp];
          const int p = a + b - c;
          const int pa = p > a ? p - a : a - p;
          const int pb = p > b ? p - b : b - p;
          const int pc = p > c ? p - c : c - p;
          const int pred = (pa <= pb && pa <= pc) ? a : (pb <= pc ? b : c);
          cur[x] = static_cast<unsigned char>(in[x] + pred);
        }
        break;
      default:
        return 1;  // invalid filter type: let libpng handle/reject it
    }
    unsigned char* dst = out + static_cast<size_t>(y) * buf_w;
    if (bpp == 1) {
      std::memcpy(dst, cur.data(), w);
    } else {  // 16-bit big-endian → high byte (libpng png_set_strip_16)
      for (unsigned x = 0; x < w; ++x) dst[x] = cur[2 * x];
    }
    cur.swap(prev);
  }
  *out_h = static_cast<int>(h);
  *out_w = static_cast<int>(w);
  return 0;
}

#endif  // CXR_HAVE_LIBDEFLATE

int decode_png_gray(const unsigned char* data, size_t size,
                    unsigned char* out, int buf_h, int buf_w,
                    int* out_h, int* out_w) {
#ifdef CXR_HAVE_LIBDEFLATE
  const int fast = decode_png_gray_fast(data, size, out, buf_h, buf_w,
                                        out_h, out_w);
  if (fast <= 0) return fast;   // 0 = decoded; negative = hard error
#endif
  png_structp png = png_create_read_struct(PNG_LIBPNG_VER_STRING, nullptr,
                                           nullptr, nullptr);
  if (!png) return -2;
  png_infop info = png_create_info_struct(png);
  if (!info) {
    png_destroy_read_struct(&png, nullptr, nullptr);
    return -2;
  }
  if (setjmp(png_jmpbuf(png))) {
    png_destroy_read_struct(&png, &info, nullptr);
    return -3;
  }
  PngReadState st{data, size, 0};
  png_set_read_fn(png, &st, png_read_fn);
  png_read_info(png, info);

  png_uint_32 w = png_get_image_width(png, info);
  png_uint_32 h = png_get_image_height(png, info);
  int color = png_get_color_type(png, info);
  int depth = png_get_bit_depth(png, info);

  if (static_cast<int>(h) > buf_h || static_cast<int>(w) > buf_w) {
    png_destroy_read_struct(&png, &info, nullptr);
    return -4;  // caller buffer too small
  }

  // Normalize to 8-bit RGB or gray.
  if (color == PNG_COLOR_TYPE_PALETTE) png_set_palette_to_rgb(png);
  if (color == PNG_COLOR_TYPE_GRAY && depth < 8)
    png_set_expand_gray_1_2_4_to_8(png);
  if (png_get_valid(png, info, PNG_INFO_tRNS)) png_set_tRNS_to_alpha(png);
  if (depth == 16) png_set_strip_16(png);
  png_set_strip_alpha(png);
  png_read_update_info(png, info);

  int channels = png_get_channels(png, info);
  std::vector<unsigned char> row(png_get_rowbytes(png, info));
  for (png_uint_32 y = 0; y < h; ++y) {
    png_read_row(png, row.data(), nullptr);
    unsigned char* dst = out + static_cast<size_t>(y) * buf_w;
    if (channels == 1) {
      std::memcpy(dst, row.data(), w);
    } else {  // RGB (alpha already stripped)
      for (png_uint_32 x = 0; x < w; ++x) {
        const unsigned char* p = row.data() + x * channels;
        dst[x] = luma(p[0], p[1], p[2]);
      }
    }
  }
  png_destroy_read_struct(&png, &info, nullptr);
  *out_h = static_cast<int>(h);
  *out_w = static_cast<int>(w);
  return 0;
}

// ---------------------------------------------------------------------------
// JPEG
// ---------------------------------------------------------------------------

struct JpegErr {
  jpeg_error_mgr mgr;
  jmp_buf jump;
};

void jpeg_error_exit(j_common_ptr cinfo) {
  auto* err = reinterpret_cast<JpegErr*>(cinfo->err);
  longjmp(err->jump, 1);
}

int decode_jpeg_gray(const unsigned char* data, size_t size,
                     unsigned char* out, int buf_h, int buf_w,
                     int* out_h, int* out_w) {
  jpeg_decompress_struct cinfo;
  JpegErr jerr;
  cinfo.err = jpeg_std_error(&jerr.mgr);
  jerr.mgr.error_exit = jpeg_error_exit;
  if (setjmp(jerr.jump)) {
    jpeg_destroy_decompress(&cinfo);
    return -3;
  }
  jpeg_create_decompress(&cinfo);
  jpeg_mem_src(&cinfo, const_cast<unsigned char*>(data), size);
  jpeg_read_header(&cinfo, TRUE);
  cinfo.out_color_space = JCS_GRAYSCALE;  // libjpeg's own 601 luma path
  jpeg_start_decompress(&cinfo);

  int w = static_cast<int>(cinfo.output_width);
  int h = static_cast<int>(cinfo.output_height);
  if (h > buf_h || w > buf_w) {
    jpeg_destroy_decompress(&cinfo);
    return -4;
  }
  while (cinfo.output_scanline < cinfo.output_height) {
    unsigned char* dst =
        out + static_cast<size_t>(cinfo.output_scanline) * buf_w;
    jpeg_read_scanlines(&cinfo, &dst, 1);
  }
  jpeg_finish_decompress(&cinfo);
  jpeg_destroy_decompress(&cinfo);
  *out_h = h;
  *out_w = w;
  return 0;
}

// ---------------------------------------------------------------------------
// Crop → centered pad-to-square → bilinear resize (PIL-exact)
// ---------------------------------------------------------------------------
//
// Reproduces PIL Image.resize(..., Image.BILINEAR) bit-exactly for 8-bit
// grayscale: separable triangle filter with antialias support scaling on
// downscale, coefficients rounded to 1<<22 fixed point, horizontal pass then
// vertical pass, accumulator initialized at half-ulp (Pillow Resample.c).
// The reference's host chain is crop → pad_to_square → Resize((384, 384))
// (pyc L289-L296); this runs that whole chain in one native call.

constexpr int kPrecisionBits = 32 - 8 - 2;  // Pillow PRECISION_BITS

inline unsigned char resample_clip8(int v) {
  v >>= kPrecisionBits;
  if (v < 0) return 0;
  if (v > 255) return 255;
  return static_cast<unsigned char>(v);
}

inline double triangle_filter(double x) {
  if (x < 0.0) x = -x;
  return x < 1.0 ? 1.0 - x : 0.0;
}

// Pillow ImagingPrecomputeCoeffs + normalize_coeffs_8bpc for one axis.
void precompute_coeffs(int in_size, int out_size, std::vector<int>* bounds,
                       std::vector<int>* kk, int* ksize_out) {
  const double scale = static_cast<double>(in_size) / out_size;
  const double filterscale = scale < 1.0 ? 1.0 : scale;
  const double support = 1.0 * filterscale;  // triangle support = 1.0
  const int ksize = static_cast<int>(std::ceil(support)) * 2 + 1;
  bounds->assign(static_cast<size_t>(out_size) * 2, 0);
  std::vector<double> pre(static_cast<size_t>(out_size) * ksize, 0.0);
  const double ss = 1.0 / filterscale;
  for (int xx = 0; xx < out_size; ++xx) {
    const double center = (xx + 0.5) * scale;
    int xmin = static_cast<int>(center - support + 0.5);
    if (xmin < 0) xmin = 0;
    int xmax = static_cast<int>(center + support + 0.5);
    if (xmax > in_size) xmax = in_size;
    xmax -= xmin;
    double* k = pre.data() + static_cast<size_t>(xx) * ksize;
    double ww = 0.0;
    for (int x = 0; x < xmax; ++x) {
      const double w = triangle_filter((x + xmin - center + 0.5) * ss);
      k[x] = w;
      ww += w;
    }
    if (ww != 0.0)
      for (int x = 0; x < xmax; ++x) k[x] /= ww;
    (*bounds)[xx * 2 + 0] = xmin;
    (*bounds)[xx * 2 + 1] = xmax;
  }
  kk->assign(pre.size(), 0);
  for (size_t i = 0; i < pre.size(); ++i)
    (*kk)[i] = static_cast<int>(pre[i] < 0
                                    ? -0.5 + pre[i] * (1 << kPrecisionBits)
                                    : 0.5 + pre[i] * (1 << kPrecisionBits));
  *ksize_out = ksize;
}

int crop_pad_resize_u8(const unsigned char* in, int in_h, int in_w,
                       size_t in_stride, int left, int top, int cw, int ch,
                       int stretch, int flip, unsigned char* out,
                       int out_size) {
  if (cw <= 0 || ch <= 0 || out_size <= 0) return -1;
  if (left < 0 || top < 0 || left + cw > in_w || top + ch > in_h) return -1;

  // Materialize the resample input: the crop itself (stretch) or the crop
  // centered on a zero square of side max(cw, ch) (pad_to_square,
  // pyc L184-L196 offsets: (side - dim) // 2).
  int src_h, src_w;
  thread_local std::vector<unsigned char> square;
  const unsigned char* src;
  size_t src_stride;
  if (stretch || cw == ch) {
    // stretch skips padding; an already-square crop pads to itself — both
    // resample straight out of the caller's buffer, no copy
    src = in + static_cast<size_t>(top) * in_stride + left;
    src_stride = in_stride;
    src_h = ch;
    src_w = cw;
  } else {
    const int side = cw > ch ? cw : ch;
    const int top_off = (side - ch) / 2;
    const int left_off = (side - cw) / 2;
    square.assign(static_cast<size_t>(side) * side, 0);
    for (int y = 0; y < ch; ++y)
      std::memcpy(square.data() + static_cast<size_t>(top_off + y) * side +
                      left_off,
                  in + static_cast<size_t>(top + y) * in_stride + left, cw);
    src = square.data();
    src_stride = side;
    src_h = side;
    src_w = side;
  }

  // Horizontal pass: [src_h, src_w] → [src_h, out_size].
  std::vector<int> hb, hk, vb, vk;
  int hks, vks;
  precompute_coeffs(src_w, out_size, &hb, &hk, &hks);
  precompute_coeffs(src_h, out_size, &vb, &vk, &vks);
  thread_local std::vector<unsigned char> tmp;
  tmp.resize(static_cast<size_t>(src_h) * out_size);
  for (int y = 0; y < src_h; ++y) {
    const unsigned char* row = src + static_cast<size_t>(y) * src_stride;
    unsigned char* dst = tmp.data() + static_cast<size_t>(y) * out_size;
    for (int xx = 0; xx < out_size; ++xx) {
      const int xmin = hb[xx * 2], xmax = hb[xx * 2 + 1];
      const int* k = hk.data() + static_cast<size_t>(xx) * hks;
      int acc = 1 << (kPrecisionBits - 1);
      for (int x = 0; x < xmax; ++x) acc += row[xmin + x] * k[x];
      dst[xx] = resample_clip8(acc);
    }
  }

  // Vertical pass: [src_h, out_size] → [out_size, out_size]. Row-contiguous
  // accumulation (tap-outer, column-inner) keeps the tmp reads sequential
  // and lets the compiler vectorize the multiply-accumulate across columns.
  std::vector<int> acc(out_size);
  for (int yy = 0; yy < out_size; ++yy) {
    const int ymin = vb[yy * 2], ymax = vb[yy * 2 + 1];
    const int* k = vk.data() + static_cast<size_t>(yy) * vks;
    std::fill(acc.begin(), acc.end(), 1 << (kPrecisionBits - 1));
    for (int y = 0; y < ymax; ++y) {
      const unsigned char* row =
          tmp.data() + static_cast<size_t>(ymin + y) * out_size;
      const int ky = k[y];
      for (int xx = 0; xx < out_size; ++xx) acc[xx] += row[xx] * ky;
    }
    unsigned char* dst = out + static_cast<size_t>(yy) * out_size;
    if (flip) {
      for (int xx = 0; xx < out_size; ++xx)
        dst[out_size - 1 - xx] = resample_clip8(acc[xx]);
    } else {
      for (int xx = 0; xx < out_size; ++xx) dst[xx] = resample_clip8(acc[xx]);
    }
  }
  return 0;
}

}  // namespace

extern "C" {

// Crop box (left, top, cw, ch) from a (in_h, in_w) u8 image with row stride
// in_stride, centered-pad to square unless stretch, PIL-BILINEAR-exact
// resize to (out_size, out_size), optional horizontal flip. Returns 0 on
// success, negative on bad arguments.
int cxr_crop_pad_resize(const unsigned char* in, int in_h, int in_w,
                        size_t in_stride, int left, int top, int cw, int ch,
                        int stretch, int flip, unsigned char* out,
                        int out_size) {
  return crop_pad_resize_u8(in, in_h, in_w, in_stride, left, top, cw, ch,
                            stretch, flip, out, out_size);
}

// Decode one PNG/JPEG into a (buf_h, buf_w) u8 buffer (row stride = buf_w).
// Returns 0 on success; negative on failure. The decoded extent is written
// to (*out_h, *out_w); pixels outside it are left untouched.
int cxr_decode_gray(const char* data, size_t size, unsigned char* out,
                    int buf_h, int buf_w, int* out_h, int* out_w) {
  if (size < 8 || data == nullptr) return -1;
  const auto* bytes = reinterpret_cast<const unsigned char*>(data);
  if (std::memcmp(bytes, kPngSig, 8) == 0) {
    return decode_png_gray(bytes, size, out, buf_h, buf_w, out_h, out_w);
  }
  if (bytes[0] == 0xFF && bytes[1] == 0xD8) {
    return decode_jpeg_gray(bytes, size, out, buf_h, buf_w, out_h, out_w);
  }
  return -1;  // unknown format
}

// Decode n images in parallel with `threads` workers. inputs[i]/sizes[i]
// describe blob i; outputs are written at out + i*buf_h*buf_w. Per-image
// return codes land in rcs[i]. Returns number of failures.
int cxr_decode_batch(const char** inputs, const size_t* sizes, int n,
                     unsigned char* out, int buf_h, int buf_w,
                     int* out_hs, int* out_ws, int* rcs, int threads) {
  if (threads < 1) threads = 1;
  std::vector<std::thread> pool;
  std::atomic<int> cursor(0);
  auto worker = [&]() {
    for (;;) {
      int i = cursor.fetch_add(1);
      if (i >= n) break;
      rcs[i] = cxr_decode_gray(
          inputs[i], sizes[i],
          out + static_cast<size_t>(i) * buf_h * buf_w, buf_h, buf_w,
          &out_hs[i], &out_ws[i]);
    }
  };
  int nt = threads < n ? threads : n;
  pool.reserve(nt);
  for (int t = 0; t < nt; ++t) pool.emplace_back(worker);
  for (auto& th : pool) th.join();
  int failures = 0;
  for (int i = 0; i < n; ++i)
    if (rcs[i] != 0) ++failures;
  return failures;
}

}  // extern "C"
