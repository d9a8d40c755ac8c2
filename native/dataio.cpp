// vit-ad-tpu native data loader.
//
// The reference's input pipeline is PIL + torchvision transforms on the host
// (reference src/data_loader/GeneralDataset.py:38-59); on a TPU VM the host
// CPU is the feeding bottleneck, so decode+resize moves to native code:
// libpng / libjpeg decoders, a minimal BMP reader (BTAD ships .bmp), a
// bilinear resizer, and a pthread-fanned batch entry point. Exposed as a
// plain C ABI consumed via ctypes (vit_ad_tpu/data/native.py).
//
// Build: g++ -O3 -shared -fPIC -o libvitad_dataio.so dataio.cpp \
//            -lpng -ljpeg -lz -lpthread

#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <cstdint>
#include <vector>
#include <string>
#include <thread>
#include <atomic>

#include <png.h>
#include <jpeglib.h>
#include <csetjmp>
#include <cmath>

namespace {

struct Image {
  int w = 0, h = 0, channels = 0;
  std::vector<uint8_t> data;  // row-major, interleaved
};

// ---------------- PNG ----------------

bool decode_png(FILE* fp, Image* out) {
  png_structp png =
      png_create_read_struct(PNG_LIBPNG_VER_STRING, nullptr, nullptr, nullptr);
  if (!png) return false;
  png_infop info = png_create_info_struct(png);
  if (!info) {
    png_destroy_read_struct(&png, nullptr, nullptr);
    return false;
  }
  if (setjmp(png_jmpbuf(png))) {
    png_destroy_read_struct(&png, &info, nullptr);
    return false;
  }
  png_init_io(png, fp);
  png_read_info(png, info);

  png_uint_32 w = png_get_image_width(png, info);
  png_uint_32 h = png_get_image_height(png, info);
  int color = png_get_color_type(png, info);
  int depth = png_get_bit_depth(png, info);

  // normalize to 8-bit RGB
  if (depth == 16) png_set_strip_16(png);
  if (color == PNG_COLOR_TYPE_PALETTE) png_set_palette_to_rgb(png);
  if (color == PNG_COLOR_TYPE_GRAY && depth < 8) png_set_expand_gray_1_2_4_to_8(png);
  if (png_get_valid(png, info, PNG_INFO_tRNS)) png_set_tRNS_to_alpha(png);
  if (color == PNG_COLOR_TYPE_GRAY || color == PNG_COLOR_TYPE_GRAY_ALPHA)
    png_set_gray_to_rgb(png);
  png_set_strip_alpha(png);
  png_read_update_info(png, info);

  out->w = (int)w;
  out->h = (int)h;
  out->channels = 3;
  out->data.resize((size_t)w * h * 3);
  std::vector<png_bytep> rows(h);
  for (png_uint_32 y = 0; y < h; ++y)
    rows[y] = out->data.data() + (size_t)y * w * 3;
  png_read_image(png, rows.data());
  png_destroy_read_struct(&png, &info, nullptr);
  return true;
}

// ---------------- JPEG ----------------

struct JpegErr {
  jpeg_error_mgr mgr;
  jmp_buf jump;
};

void jpeg_err_exit(j_common_ptr cinfo) {
  JpegErr* err = reinterpret_cast<JpegErr*>(cinfo->err);
  longjmp(err->jump, 1);
}

bool decode_jpeg(FILE* fp, Image* out) {
  jpeg_decompress_struct cinfo;
  JpegErr jerr;
  cinfo.err = jpeg_std_error(&jerr.mgr);
  jerr.mgr.error_exit = jpeg_err_exit;
  if (setjmp(jerr.jump)) {
    jpeg_destroy_decompress(&cinfo);
    return false;
  }
  jpeg_create_decompress(&cinfo);
  jpeg_stdio_src(&cinfo, fp);
  jpeg_read_header(&cinfo, TRUE);
  cinfo.out_color_space = JCS_RGB;
  jpeg_start_decompress(&cinfo);
  out->w = cinfo.output_width;
  out->h = cinfo.output_height;
  out->channels = 3;
  out->data.resize((size_t)out->w * out->h * 3);
  while (cinfo.output_scanline < cinfo.output_height) {
    JSAMPROW row = out->data.data() + (size_t)cinfo.output_scanline * out->w * 3;
    jpeg_read_scanlines(&cinfo, &row, 1);
  }
  jpeg_finish_decompress(&cinfo);
  jpeg_destroy_decompress(&cinfo);
  return true;
}

// ---------------- BMP (uncompressed 24/32-bit) ----------------

bool decode_bmp(FILE* fp, Image* out) {
  uint8_t header[54];
  if (fread(header, 1, 54, fp) != 54) return false;
  if (header[0] != 'B' || header[1] != 'M') return false;
  uint32_t data_offset;
  int32_t w, h;
  uint16_t bpp;
  uint32_t compression;
  uint32_t dib_size;
  memcpy(&data_offset, header + 10, 4);
  memcpy(&dib_size, header + 14, 4);
  memcpy(&w, header + 18, 4);
  memcpy(&h, header + 22, 4);
  memcpy(&bpp, header + 28, 2);
  memcpy(&compression, header + 30, 4);
  if (compression != 0 || (bpp != 24 && bpp != 32 && bpp != 8)) return false;
  bool bottom_up = h > 0;
  int64_t ah64 = bottom_up ? (int64_t)h : -(int64_t)h;
  // reject nonsense dimensions before any allocation
  if (w <= 0 || ah64 <= 0 || w > 1 << 16 || ah64 > 1 << 16) return false;
  int ah = (int)ah64;

  // 8-bit BMPs: the palette sits right after the DIB header (which may be
  // the 40-byte BITMAPINFOHEADER or a longer V4/V5 header)
  std::vector<uint8_t> palette;
  if (bpp == 8) {
    long pal_start = 14 + (long)dib_size;
    long pal_bytes = (long)data_offset - pal_start;
    if (pal_bytes < 4) return false;
    fseek(fp, pal_start, SEEK_SET);
    palette.resize(pal_bytes);
    if (fread(palette.data(), 1, pal_bytes, fp) != (size_t)pal_bytes) return false;
  } else {
    fseek(fp, data_offset, SEEK_SET);
  }

  int bytes_pp = bpp / 8;
  size_t row_size = ((size_t)w * bytes_pp + 3) & ~3u;  // 4-byte aligned rows
  std::vector<uint8_t> row(row_size);
  out->w = w;
  out->h = ah;
  out->channels = 3;
  out->data.resize((size_t)w * ah * 3);
  for (int y = 0; y < ah; ++y) {
    if (fread(row.data(), 1, row_size, fp) != row_size) return false;
    int dst_y = bottom_up ? (ah - 1 - y) : y;
    uint8_t* dst = out->data.data() + (size_t)dst_y * w * 3;
    for (int x = 0; x < w; ++x) {
      if (bpp == 8) {
        size_t idx = row[x];
        if (4 * idx + 3 >= palette.size()) idx = 0;
        const uint8_t* p = palette.data() + 4 * idx;  // BGRA palette entries
        dst[x * 3 + 0] = p[2];
        dst[x * 3 + 1] = p[1];
        dst[x * 3 + 2] = p[0];
      } else {
        const uint8_t* p = row.data() + (size_t)x * bytes_pp;  // BGR(A)
        dst[x * 3 + 0] = p[2];
        dst[x * 3 + 1] = p[1];
        dst[x * 3 + 2] = p[0];
      }
    }
  }
  return true;
}

// ---------------- dispatch + resize ----------------

bool decode_any(const char* path, Image* out) {
  FILE* fp = fopen(path, "rb");
  if (!fp) return false;
  uint8_t magic[4] = {0};
  size_t got = fread(magic, 1, 4, fp);
  fseek(fp, 0, SEEK_SET);
  bool ok = false;
  if (got >= 4 && magic[0] == 0x89 && magic[1] == 'P') {
    ok = decode_png(fp, out);
  } else if (got >= 2 && magic[0] == 0xFF && magic[1] == 0xD8) {
    ok = decode_jpeg(fp, out);
  } else if (got >= 2 && magic[0] == 'B' && magic[1] == 'M') {
    ok = decode_bmp(fp, out);
  }
  fclose(fp);
  return ok && out->w > 0 && out->h > 0;
}

// PIL-compatible BILINEAR resampling (Pillow Resample.c semantics): a
// separable triangle filter whose support widens with the downscale ratio
// (antialiasing) — what torchvision's Resize applies to PIL inputs, and what
// the reference's data pipeline therefore produced.
struct FilterPlan {
  std::vector<int> bounds_lo;     // first source index per output pixel
  std::vector<int> counts;        // taps per output pixel
  std::vector<float> weights;     // [out, max_taps], normalized
  int max_taps = 0;
};

FilterPlan plan_triangle(int in_size, int out_size) {
  FilterPlan p;
  const double scale = (double)in_size / out_size;
  const double filterscale = scale < 1.0 ? 1.0 : scale;
  const double support = 1.0 * filterscale;  // triangle filter support = 1
  int ksize = (int)ceil(support) * 2 + 1;
  p.max_taps = ksize;
  p.bounds_lo.resize(out_size);
  p.counts.resize(out_size);
  p.weights.assign((size_t)out_size * ksize, 0.0f);
  for (int i = 0; i < out_size; ++i) {
    double center = (i + 0.5) * scale;
    int lo = (int)(center - support + 0.5);
    if (lo < 0) lo = 0;
    int hi = (int)(center + support + 0.5);
    if (hi > in_size) hi = in_size;
    int n = hi - lo;
    double total = 0.0;
    std::vector<double> w(n);
    for (int j = 0; j < n; ++j) {
      double x = (lo + j - center + 0.5) / filterscale;
      double v = x < 0 ? -x : x;
      w[j] = v >= 1.0 ? 0.0 : 1.0 - v;  // triangle
      total += w[j];
    }
    if (total == 0.0) total = 1.0;
    p.bounds_lo[i] = lo;
    p.counts[i] = n;
    for (int j = 0; j < n; ++j)
      p.weights[(size_t)i * ksize + j] = (float)(w[j] / total);
  }
  return p;
}

void resize_bilinear(const Image& src, int out_h, int out_w, uint8_t* dst) {
  FilterPlan px = plan_triangle(src.w, out_w);
  FilterPlan py = plan_triangle(src.h, out_h);

  // horizontal pass: src [h, w, 3] → tmp [h, out_w, 3] (float)
  std::vector<float> tmp((size_t)src.h * out_w * 3);
  for (int y = 0; y < src.h; ++y) {
    const uint8_t* row = src.data.data() + (size_t)y * src.w * 3;
    float* trow = tmp.data() + (size_t)y * out_w * 3;
    for (int ox = 0; ox < out_w; ++ox) {
      const float* w = &px.weights[(size_t)ox * px.max_taps];
      int lo = px.bounds_lo[ox], n = px.counts[ox];
      float acc0 = 0, acc1 = 0, acc2 = 0;
      for (int j = 0; j < n; ++j) {
        const uint8_t* s = row + (size_t)(lo + j) * 3;
        acc0 += w[j] * s[0];
        acc1 += w[j] * s[1];
        acc2 += w[j] * s[2];
      }
      trow[ox * 3 + 0] = acc0;
      trow[ox * 3 + 1] = acc1;
      trow[ox * 3 + 2] = acc2;
    }
  }
  // vertical pass: tmp → dst [out_h, out_w, 3]
  for (int oy = 0; oy < out_h; ++oy) {
    const float* w = &py.weights[(size_t)oy * py.max_taps];
    int lo = py.bounds_lo[oy], n = py.counts[oy];
    uint8_t* drow = dst + (size_t)oy * out_w * 3;
    for (int ox = 0; ox < out_w; ++ox) {
      for (int c = 0; c < 3; ++c) {
        float acc = 0;
        for (int j = 0; j < n; ++j)
          acc += w[j] * tmp[((size_t)(lo + j) * out_w + ox) * 3 + c];
        int v = (int)(acc + 0.5f);
        drow[ox * 3 + c] = v < 0 ? 0 : (v > 255 ? 255 : (uint8_t)v);
      }
    }
  }
}

}  // namespace

extern "C" {

// Decode one image file, resize to [out_h, out_w], write RGB uint8 into
// `out` (caller-allocated, out_h*out_w*3 bytes). Returns 0 on success.
int vitad_load_image(const char* path, int out_h, int out_w, uint8_t* out) {
  Image img;
  if (!decode_any(path, &img)) return 1;
  if (img.w == out_w && img.h == out_h) {
    memcpy(out, img.data.data(), (size_t)out_h * out_w * 3);
  } else {
    resize_bilinear(img, out_h, out_w, out);
  }
  return 0;
}

// Batch decode with a thread fan-out. paths: n C strings; out: n*h*w*3
// bytes. Returns the number of failed images (0 == all good).
int vitad_load_batch(const char** paths, int n, int out_h, int out_w,
                     uint8_t* out, int n_threads) {
  if (n_threads < 1) n_threads = 1;
  std::atomic<int> next(0), failures(0);
  auto worker = [&]() {
    for (;;) {
      int i = next.fetch_add(1);
      if (i >= n) return;
      uint8_t* dst = out + (size_t)i * out_h * out_w * 3;
      if (vitad_load_image(paths[i], out_h, out_w, dst) != 0) {
        memset(dst, 0, (size_t)out_h * out_w * 3);
        failures.fetch_add(1);
      }
    }
  };
  std::vector<std::thread> threads;
  for (int t = 0; t < n_threads - 1; ++t) threads.emplace_back(worker);
  worker();
  for (auto& t : threads) t.join();
  return failures.load();
}

// Decode a ground-truth mask: grayscale/first channel, binarized !=0 → 1
// (reference GeneralDataset.py:102,112). out: out_h*out_w bytes.
int vitad_load_mask(const char* path, int out_h, int out_w, uint8_t* out) {
  Image img;
  if (!decode_any(path, &img)) return 1;
  std::vector<uint8_t> resized((size_t)out_h * out_w * 3);
  const uint8_t* src3;
  if (img.w == out_w && img.h == out_h) {
    src3 = img.data.data();
  } else {
    resize_bilinear(img, out_h, out_w, resized.data());
    src3 = resized.data();
  }
  for (int i = 0; i < out_h * out_w; ++i) out[i] = src3[i * 3] != 0 ? 1 : 0;
  return 0;
}

}  // extern "C"
