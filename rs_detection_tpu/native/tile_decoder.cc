// Native tile decoder: PNG/JPEG -> RGB8 HWC, with a threaded batch
// API.
//
// The reference feeds its GPU loop from Jittor Dataset worker
// PROCESSES doing PIL decode (SURVEY §2.2, python/jdet/data/custom.py
// workers); Python-side decode does not scale across threads under
// the GIL. This decoder releases the GIL for the whole batch (ctypes
// call) and fans the per-tile decodes across std::threads, so a real
// TPU host (hundreds of cores) can saturate the input pipeline from
// one process. Decode semantics match PIL.Image.convert("RGB"):
// palette/gray expanded, 16-bit reduced, alpha dropped.
//
// Built on first use by rs_detection_tpu.native.decoder (g++ -lpng
// -ljpeg); callers fall back to PIL when the toolchain or libs are
// missing.

#include <csetjmp>
#include <cstdio>
#include <cstring>
#include <thread>
#include <vector>

#include <jpeglib.h>
#include <png.h>

namespace {

constexpr int RC_OK = 0;
constexpr int RC_OPEN = 1;
constexpr int RC_FORMAT = 2;
constexpr int RC_DECODE = 3;
constexpr int RC_TOO_BIG = 4;

struct JpegErr {
  jpeg_error_mgr pub;
  jmp_buf jump;
};

void jpeg_err_exit(j_common_ptr cinfo) {
  JpegErr* e = reinterpret_cast<JpegErr*>(cinfo->err);
  longjmp(e->jump, 1);
}

int decode_jpeg(FILE* f, unsigned char* out, long cap, int* w, int* h) {
  jpeg_decompress_struct cinfo;
  JpegErr jerr;
  cinfo.err = jpeg_std_error(&jerr.pub);
  jerr.pub.error_exit = jpeg_err_exit;
  if (setjmp(jerr.jump)) {
    jpeg_destroy_decompress(&cinfo);
    return RC_DECODE;
  }
  jpeg_create_decompress(&cinfo);
  jpeg_stdio_src(&cinfo, f);
  jpeg_read_header(&cinfo, TRUE);
  cinfo.out_color_space = JCS_RGB;
  jpeg_start_decompress(&cinfo);
  const long width = cinfo.output_width;
  const long height = cinfo.output_height;
  if (width * height * 3 > cap) {
    jpeg_destroy_decompress(&cinfo);
    return RC_TOO_BIG;
  }
  while (cinfo.output_scanline < cinfo.output_height) {
    unsigned char* row = out + long(cinfo.output_scanline) * width * 3;
    jpeg_read_scanlines(&cinfo, &row, 1);
  }
  jpeg_finish_decompress(&cinfo);
  jpeg_destroy_decompress(&cinfo);
  *w = int(width);
  *h = int(height);
  return RC_OK;
}

int decode_png(FILE* f, unsigned char* out, long cap, int* w, int* h) {
  png_structp png = png_create_read_struct(PNG_LIBPNG_VER_STRING,
                                           nullptr, nullptr, nullptr);
  if (!png) return RC_DECODE;
  png_infop info = png_create_info_struct(png);
  if (!info) {
    png_destroy_read_struct(&png, nullptr, nullptr);
    return RC_DECODE;
  }
  if (setjmp(png_jmpbuf(png))) {
    png_destroy_read_struct(&png, &info, nullptr);
    return RC_DECODE;
  }
  png_init_io(png, f);
  png_read_info(png, info);

  // normalize to 8-bit RGB (PIL convert("RGB") semantics)
  png_byte color = png_get_color_type(png, info);
  png_byte depth = png_get_bit_depth(png, info);
  if (color == PNG_COLOR_TYPE_PALETTE) png_set_palette_to_rgb(png);
  if (color == PNG_COLOR_TYPE_GRAY && depth < 8)
    png_set_expand_gray_1_2_4_to_8(png);
  if (png_get_valid(png, info, PNG_INFO_tRNS))
    png_set_tRNS_to_alpha(png);
  if (depth == 16) png_set_strip_16(png);
  if (color == PNG_COLOR_TYPE_GRAY ||
      color == PNG_COLOR_TYPE_GRAY_ALPHA)
    png_set_gray_to_rgb(png);
  if (color & PNG_COLOR_MASK_ALPHA ||
      png_get_valid(png, info, PNG_INFO_tRNS))
    png_set_strip_alpha(png);
  png_read_update_info(png, info);

  const long width = png_get_image_width(png, info);
  const long height = png_get_image_height(png, info);
  const long rowbytes = long(png_get_rowbytes(png, info));
  if (rowbytes != width * 3 || width * height * 3 > cap) {
    png_destroy_read_struct(&png, &info, nullptr);
    return rowbytes != width * 3 ? RC_DECODE : RC_TOO_BIG;
  }
  std::vector<png_bytep> rows(height);
  for (long y = 0; y < height; ++y) rows[y] = out + y * rowbytes;
  png_read_image(png, rows.data());
  png_destroy_read_struct(&png, &info, nullptr);
  *w = int(width);
  *h = int(height);
  return RC_OK;
}

int decode_one(const char* path, unsigned char* out, long cap, int* w,
               int* h) {
  FILE* f = std::fopen(path, "rb");
  if (!f) return RC_OPEN;
  unsigned char magic[8] = {0};
  size_t nread = std::fread(magic, 1, 8, f);
  std::rewind(f);
  int rc;
  if (nread >= 8 && png_sig_cmp(magic, 0, 8) == 0) {
    rc = decode_png(f, out, cap, w, h);
  } else if (nread >= 2 && magic[0] == 0xFF && magic[1] == 0xD8) {
    rc = decode_jpeg(f, out, cap, w, h);
  } else {
    rc = RC_FORMAT;
  }
  std::fclose(f);
  return rc;
}

}  // namespace

extern "C" {

// Probe dimensions without a full decode (PNG: header only; JPEG:
// header only). Returns RC_*.
int rs_probe_dims(const char* path, int* w, int* h) {
  FILE* f = std::fopen(path, "rb");
  if (!f) return RC_OPEN;
  unsigned char magic[8] = {0};
  size_t nread = std::fread(magic, 1, 8, f);
  std::rewind(f);
  int rc = RC_FORMAT;
  if (nread >= 8 && png_sig_cmp(magic, 0, 8) == 0) {
    png_structp png = png_create_read_struct(PNG_LIBPNG_VER_STRING,
                                             nullptr, nullptr, nullptr);
    png_infop info = png ? png_create_info_struct(png) : nullptr;
    if (png && info && !setjmp(png_jmpbuf(png))) {
      png_init_io(png, f);
      png_read_info(png, info);
      *w = int(png_get_image_width(png, info));
      *h = int(png_get_image_height(png, info));
      rc = RC_OK;
    } else {
      rc = RC_DECODE;
    }
    if (png) png_destroy_read_struct(&png, info ? &info : nullptr,
                                     nullptr);
  } else if (nread >= 2 && magic[0] == 0xFF && magic[1] == 0xD8) {
    jpeg_decompress_struct cinfo;
    JpegErr jerr;
    cinfo.err = jpeg_std_error(&jerr.pub);
    jerr.pub.error_exit = jpeg_err_exit;
    if (!setjmp(jerr.jump)) {
      jpeg_create_decompress(&cinfo);
      jpeg_stdio_src(&cinfo, f);
      jpeg_read_header(&cinfo, TRUE);
      *w = int(cinfo.image_width);
      *h = int(cinfo.image_height);
      rc = RC_OK;
    } else {
      rc = RC_DECODE;
    }
    jpeg_destroy_decompress(&cinfo);
  }
  std::fclose(f);
  return rc;
}

// Decode one image to RGB8 HWC into out (cap bytes). Returns RC_*.
int rs_decode_rgb(const char* path, unsigned char* out, long cap,
                  int* w, int* h) {
  return decode_one(path, out, cap, w, h);
}

// Threaded batch decode into a [n, h, w, 3] buffer. Every image must
// decode to exactly (w, h); failed slots are zeroed and their status
// written to rcs[i]. Returns the number of failures.
int rs_decode_rgb_batch(const char** paths, int n, unsigned char* out,
                        int w, int h, int nthreads, int* rcs) {
  const long slot = long(w) * h * 3;
  if (nthreads < 1) nthreads = 1;
  if (nthreads > n) nthreads = n;
  std::vector<std::thread> workers;
  workers.reserve(nthreads);
  for (int t = 0; t < nthreads; ++t) {
    workers.emplace_back([=]() {
      for (int i = t; i < n; i += nthreads) {
        unsigned char* dst = out + long(i) * slot;
        int dw = 0, dh = 0;
        int rc = decode_one(paths[i], dst, slot, &dw, &dh);
        if (rc == RC_OK && (dw != w || dh != h)) rc = RC_DECODE;
        if (rc != RC_OK) std::memset(dst, 0, slot);
        rcs[i] = rc;
      }
    });
  }
  for (auto& th : workers) th.join();
  int fails = 0;
  for (int i = 0; i < n; ++i) fails += (rcs[i] != RC_OK);
  return fails;
}

}  // extern "C"
