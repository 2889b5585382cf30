// lseg_io — native data-loader core for lseg_tpu.
//
// The reference feeds its models through torch's C++ DataLoader workers
// (reference: modules/lsegmentation_module.py:177-196 — 16 workers doing
// JPEG decode + resize + normalize per sample). This library is the
// TPU-build equivalent: JPEG/PNG decode (libjpeg/libpng), bilinear /
// nearest resize, and fused uint8->normalized-fp32 conversion, all as
// plain C functions that release no Python state — the Python loader's
// worker threads call them through ctypes and scale across cores
// because the GIL is released during the call.
//
// Resize semantics: half-pixel-center bilinear (align_corners=False),
// channel-interleaved u8/f32; nearest for integer masks. (PIL's default
// is an antialiased triangle filter; training augmentation does not
// require bit-parity with it, and eval-protocol resizes happen on
// device with exact align_corners=True operators — see ops/resize.py.)
//
// Build: g++ -O3 -march=native -shared -fPIC lseg_io.cpp -ljpeg -lpng
//        (driven by lseg_tpu/data/native.py at first import)

#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <csetjmp>
#include <algorithm>

#include <jpeglib.h>
#include <png.h>

extern "C" {

// ---------------------------------------------------------------------
// memory
// ---------------------------------------------------------------------

void lseg_free(void* p) { free(p); }

// ---------------------------------------------------------------------
// JPEG decode (libjpeg, memory source)
// ---------------------------------------------------------------------

struct JpegErr {
    jpeg_error_mgr mgr;
    jmp_buf jb;
};

static void jpeg_err_exit(j_common_ptr cinfo) {
    JpegErr* e = reinterpret_cast<JpegErr*>(cinfo->err);
    longjmp(e->jb, 1);
}

// Decode a JPEG byte buffer to RGB u8 HWC. Returns 0 on success.
int lseg_decode_jpeg(const uint8_t* data, size_t len,
                     uint8_t** out, int* h, int* w) {
    jpeg_decompress_struct cinfo;
    JpegErr jerr;
    cinfo.err = jpeg_std_error(&jerr.mgr);
    jerr.mgr.error_exit = jpeg_err_exit;
    uint8_t* buf = nullptr;
    if (setjmp(jerr.jb)) {
        jpeg_destroy_decompress(&cinfo);
        free(buf);
        return -1;
    }
    jpeg_create_decompress(&cinfo);
    jpeg_mem_src(&cinfo, data, len);
    jpeg_read_header(&cinfo, TRUE);
    cinfo.out_color_space = JCS_RGB;
    jpeg_start_decompress(&cinfo);
    const int W = cinfo.output_width, H = cinfo.output_height;
    buf = static_cast<uint8_t*>(malloc(static_cast<size_t>(W) * H * 3));
    if (!buf) { jpeg_destroy_decompress(&cinfo); return -2; }
    while (cinfo.output_scanline < cinfo.output_height) {
        uint8_t* row = buf + static_cast<size_t>(cinfo.output_scanline) * W * 3;
        jpeg_read_scanlines(&cinfo, &row, 1);
    }
    jpeg_finish_decompress(&cinfo);
    jpeg_destroy_decompress(&cinfo);
    *out = buf; *h = H; *w = W;
    return 0;
}

// ---------------------------------------------------------------------
// PNG decode (libpng, memory source) — used for segmentation masks;
// palette/gray stay single-channel label values, RGB(A) -> RGB.
// ---------------------------------------------------------------------

struct PngReadState { const uint8_t* data; size_t len, pos; };

static void png_mem_read(png_structp png, png_bytep out, png_size_t n) {
    PngReadState* s = static_cast<PngReadState*>(png_get_io_ptr(png));
    if (s->pos + n > s->len) { png_error(png, "png: short read"); }
    memcpy(out, s->data + s->pos, n);
    s->pos += n;
}

// channels_out: 1 (label mask; palette index / gray) or 3 (RGB).
int lseg_decode_png(const uint8_t* data, size_t len, int channels_out,
                    uint8_t** out, int* h, int* w) {
    png_structp png = png_create_read_struct(PNG_LIBPNG_VER_STRING,
                                             nullptr, nullptr, nullptr);
    if (!png) return -1;
    png_infop info = png_create_info_struct(png);
    if (!info) { png_destroy_read_struct(&png, nullptr, nullptr); return -1; }
    uint8_t* buf = nullptr;
    png_bytep* rows = nullptr;
    if (setjmp(png_jmpbuf(png))) {
        png_destroy_read_struct(&png, &info, nullptr);
        free(buf); free(rows);
        return -2;
    }
    PngReadState st{data, len, 0};
    png_set_read_fn(png, &st, png_mem_read);
    png_read_info(png, info);
    png_uint_32 W, H;
    int bit_depth, color_type;
    png_get_IHDR(png, info, &W, &H, &bit_depth, &color_type,
                 nullptr, nullptr, nullptr);
    if (bit_depth == 16) png_set_strip_16(png);
    if (channels_out == 3) {
        if (color_type == PNG_COLOR_TYPE_PALETTE) png_set_palette_to_rgb(png);
        if (color_type == PNG_COLOR_TYPE_GRAY ||
            color_type == PNG_COLOR_TYPE_GRAY_ALPHA)
            png_set_gray_to_rgb(png);
        png_set_strip_alpha(png);
    } else {
        // label masks: keep palette indices / gray values verbatim
        if (bit_depth < 8) png_set_packing(png);
        if (color_type & PNG_COLOR_MASK_ALPHA) png_set_strip_alpha(png);
    }
    png_read_update_info(png, info);
    const int C = png_get_channels(png, info);
    buf = static_cast<uint8_t*>(malloc(static_cast<size_t>(W) * H * C));
    rows = static_cast<png_bytep*>(malloc(sizeof(png_bytep) * H));
    if (!buf || !rows) longjmp(png_jmpbuf(png), 1);
    for (png_uint_32 y = 0; y < H; ++y)
        rows[y] = buf + static_cast<size_t>(y) * W * C;
    png_read_image(png, rows);
    png_destroy_read_struct(&png, &info, nullptr);
    free(rows);
    if (channels_out == 1 && C != 1) {
        // e.g. RGB-coded masks: take the first channel
        uint8_t* m = static_cast<uint8_t*>(malloc(static_cast<size_t>(W) * H));
        for (size_t i = 0; i < static_cast<size_t>(W) * H; ++i)
            m[i] = buf[i * C];
        free(buf);
        buf = m;
    }
    *out = buf; *h = static_cast<int>(H); *w = static_cast<int>(W);
    return 0;
}

// ---------------------------------------------------------------------
// resize
// ---------------------------------------------------------------------

// Half-pixel-center bilinear, u8 HWC -> u8 HWC.
void lseg_resize_bilinear_u8(const uint8_t* src, int h, int w, int c,
                             uint8_t* dst, int oh, int ow) {
    for (int oy = 0; oy < oh; ++oy) {
        float sy = (oy + 0.5f) * h / oh - 0.5f;
        sy = std::min(std::max(sy, 0.0f), static_cast<float>(h - 1));
        int y0 = std::min(static_cast<int>(sy), h - 2 >= 0 ? h - 2 : 0);
        float fy = sy - y0;
        for (int ox = 0; ox < ow; ++ox) {
            float sx = (ox + 0.5f) * w / ow - 0.5f;
            sx = std::min(std::max(sx, 0.0f), static_cast<float>(w - 1));
            int x0 = std::min(static_cast<int>(sx), w - 2 >= 0 ? w - 2 : 0);
            float fx = sx - x0;
            const uint8_t* p00 = src + (static_cast<size_t>(y0) * w + x0) * c;
            const uint8_t* p01 = p00 + (w > 1 ? c : 0);
            const uint8_t* p10 = p00 + (h > 1 ? static_cast<size_t>(w) * c : 0);
            const uint8_t* p11 = p10 + (w > 1 ? c : 0);
            uint8_t* q = dst + (static_cast<size_t>(oy) * ow + ox) * c;
            for (int k = 0; k < c; ++k) {
                float v = (1 - fy) * ((1 - fx) * p00[k] + fx * p01[k])
                        + fy * ((1 - fx) * p10[k] + fx * p11[k]);
                q[k] = static_cast<uint8_t>(v + 0.5f);
            }
        }
    }
}

// Nearest (floor(dst*scale)) for integer masks — matches
// F.interpolate(mode='nearest') and data/fewshot.py::_resize_mask.
void lseg_resize_nearest_i32(const int32_t* src, int h, int w,
                             int32_t* dst, int oh, int ow) {
    for (int oy = 0; oy < oh; ++oy) {
        int sy = std::min(static_cast<int>(oy * (static_cast<double>(h) / oh)),
                          h - 1);
        for (int ox = 0; ox < ow; ++ox) {
            int sx = std::min(
                static_cast<int>(ox * (static_cast<double>(w) / ow)), w - 1);
            dst[static_cast<size_t>(oy) * ow + ox] =
                src[static_cast<size_t>(sy) * w + sx];
        }
    }
}

// Fused u8 -> fp32 normalize: (x/255 - mean) / std, HWC.
void lseg_normalize_f32(const uint8_t* src, float* dst, size_t npix,
                        const float* mean, const float* std3) {
    const float s0 = 1.0f / (255.0f * std3[0]);
    const float s1 = 1.0f / (255.0f * std3[1]);
    const float s2 = 1.0f / (255.0f * std3[2]);
    const float b0 = -mean[0] / std3[0];
    const float b1 = -mean[1] / std3[1];
    const float b2 = -mean[2] / std3[2];
    for (size_t i = 0; i < npix; ++i) {
        dst[i * 3 + 0] = src[i * 3 + 0] * s0 + b0;
        dst[i * 3 + 1] = src[i * 3 + 1] * s1 + b1;
        dst[i * 3 + 2] = src[i * 3 + 2] * s2 + b2;
    }
}

// One-call sample pipeline: decode(JPEG|PNG-RGB) -> bilinear resize to
// (oh, ow) -> normalize into caller-provided fp32 buffer.
int lseg_load_image_f32(const uint8_t* data, size_t len, int oh, int ow,
                        const float* mean, const float* std3, float* out) {
    uint8_t* raw = nullptr;
    int h = 0, w = 0;
    int rc;
    if (len >= 2 && data[0] == 0xFF && data[1] == 0xD8)
        rc = lseg_decode_jpeg(data, len, &raw, &h, &w);
    else
        rc = lseg_decode_png(data, len, 3, &raw, &h, &w);
    if (rc != 0) return rc;
    uint8_t* resized = raw;
    bool owned = false;
    if (h != oh || w != ow) {
        resized = static_cast<uint8_t*>(
            malloc(static_cast<size_t>(oh) * ow * 3));
        if (!resized) { free(raw); return -2; }
        lseg_resize_bilinear_u8(raw, h, w, 3, resized, oh, ow);
        owned = true;
    }
    lseg_normalize_f32(resized, out, static_cast<size_t>(oh) * ow,
                       mean, std3);
    if (owned) free(resized);
    free(raw);
    return 0;
}

}  // extern "C"
