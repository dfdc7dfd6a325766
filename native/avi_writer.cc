// Native AVI muxer: wraps rendered frames into a playable video file with
// no external codec or ffmpeg dependency.
//
// Two streams formats:
//   * eamm_write_avi_rgb  — classic uncompressed DIB (BI_RGB, 24-bit,
//     bottom-up BGR rows, 4-byte row alignment): plays everywhere.
//   * eamm_write_avi_i420 — fourcc 'I420' planar 4:2:0, 12 bpp: exactly
//     the byte planes the TPU pipeline's yuv420 delivery path produces
//     (eamm_tpu/ops/colorspace.py), so muxing is a straight copy.
//
// The reference demo writes its outputs with imageio/ffmpeg
// (ref:demo.py:480,507,514); this image has no mp4 backend, so the demo
// CLI falls back to this muxer (eamm_tpu/data/native.py::write_avi_*).
//
// AVI wire format: RIFF('AVI ') { LIST hdrl { avih, LIST strl { strh,
// strf } }, LIST movi { '00db' frame ... }, idx1 }.

#include <cstdint>
#include <cstdio>
#include <cstring>
#include <vector>

namespace {

struct Writer {
  FILE* f;
  bool ok = true;
  void bytes(const void* p, size_t n) {
    if (ok && fwrite(p, 1, n, f) != n) ok = false;
  }
  void u32(uint32_t v) { bytes(&v, 4); }
  void u16(uint16_t v) { bytes(&v, 2); }
  void fourcc(const char* c) { bytes(c, 4); }
};

constexpr uint32_t kAvihSize = 56;
constexpr uint32_t kStrhSize = 56;
constexpr uint32_t kStrfSize = 40;  // BITMAPINFOHEADER
// LIST hdrl payload: 'hdrl' + avih chunk + LIST strl
constexpr uint32_t kStrlSize = 4 + (8 + kStrhSize) + (8 + kStrfSize);
constexpr uint32_t kHdrlSize = 4 + (8 + kAvihSize) + (8 + kStrlSize);

int write_avi(const char* path, int n, int w, int h, int fps_num,
              int fps_den, uint32_t frame_size, uint32_t bit_count,
              uint32_t compression, const char* handler,
              void (*emit_frame)(Writer&, int, void*), void* ctx) {
  FILE* f = fopen(path, "wb");
  if (!f) return 1;
  Writer wr{f};

  const uint32_t movi_size = 4 + (uint32_t)n * (8 + frame_size);
  const uint32_t idx1_size = (uint32_t)n * 16;
  const uint32_t riff_size = 4 + (8 + kHdrlSize) + (8 + movi_size)
      + (8 + idx1_size);

  wr.fourcc("RIFF"); wr.u32(riff_size); wr.fourcc("AVI ");

  wr.fourcc("LIST"); wr.u32(kHdrlSize); wr.fourcc("hdrl");
  wr.fourcc("avih"); wr.u32(kAvihSize);
  const uint64_t usec = (uint64_t)1000000 * fps_den / (fps_num > 0 ? fps_num : 25);
  wr.u32((uint32_t)usec);                       // dwMicroSecPerFrame
  wr.u32((uint32_t)((uint64_t)frame_size * fps_num
                    / (fps_den > 0 ? fps_den : 1)));  // dwMaxBytesPerSec
  wr.u32(0);                                    // padding granularity
  wr.u32(0x10);                                 // AVIF_HASINDEX
  wr.u32((uint32_t)n);                          // total frames
  wr.u32(0);                                    // initial frames
  wr.u32(1);                                    // streams
  wr.u32(frame_size);                           // suggested buffer
  wr.u32((uint32_t)w); wr.u32((uint32_t)h);
  wr.u32(0); wr.u32(0); wr.u32(0); wr.u32(0);   // reserved

  wr.fourcc("LIST"); wr.u32(kStrlSize); wr.fourcc("strl");
  wr.fourcc("strh"); wr.u32(kStrhSize);
  wr.fourcc("vids"); wr.fourcc(handler);
  wr.u32(0); wr.u32(0); wr.u32(0);              // flags, prio+lang, initial
  wr.u32((uint32_t)fps_den);                    // scale
  wr.u32((uint32_t)fps_num);                    // rate
  wr.u32(0); wr.u32((uint32_t)n);               // start, length
  wr.u32(frame_size); wr.u32(0xFFFFFFFFu);      // bufsize, quality
  wr.u32(0);                                    // sample size
  wr.u16(0); wr.u16(0); wr.u16((uint16_t)w); wr.u16((uint16_t)h);

  wr.fourcc("strf"); wr.u32(kStrfSize);
  wr.u32(kStrfSize);                            // biSize
  wr.u32((uint32_t)w); wr.u32((uint32_t)h);
  wr.u16(1); wr.u16((uint16_t)bit_count);
  wr.u32(compression);
  wr.u32(frame_size);
  wr.u32(0); wr.u32(0); wr.u32(0); wr.u32(0);

  wr.fourcc("LIST"); wr.u32(movi_size); wr.fourcc("movi");
  for (int i = 0; i < n; i++) {
    wr.fourcc("00db"); wr.u32(frame_size);
    emit_frame(wr, i, ctx);
  }

  wr.fourcc("idx1"); wr.u32(idx1_size);
  uint32_t off = 4;
  for (int i = 0; i < n; i++) {
    wr.fourcc("00db"); wr.u32(0x10); wr.u32(off); wr.u32(frame_size);
    off += 8 + frame_size;
  }
  if (fclose(f) != 0) wr.ok = false;
  return wr.ok ? 0 : 2;
}

struct RgbCtx { const uint8_t* rgb; int w, h; uint32_t stride; };
struct YuvCtx { const uint8_t* y; const uint8_t* u; const uint8_t* v;
                int w, h; };

void emit_rgb(Writer& wr, int i, void* p) {
  auto* c = (RgbCtx*)p;
  const uint8_t* frame = c->rgb + (size_t)i * c->w * c->h * 3;
  std::vector<uint8_t> row(c->stride, 0);
  for (int y = c->h - 1; y >= 0; y--) {          // bottom-up
    const uint8_t* src = frame + (size_t)y * c->w * 3;
    for (int x = 0; x < c->w; x++) {             // RGB -> BGR
      row[x * 3 + 0] = src[x * 3 + 2];
      row[x * 3 + 1] = src[x * 3 + 1];
      row[x * 3 + 2] = src[x * 3 + 0];
    }
    wr.bytes(row.data(), c->stride);
  }
}

void emit_i420(Writer& wr, int i, void* p) {
  auto* c = (YuvCtx*)p;
  const size_t ys = (size_t)c->w * c->h, cs = ys / 4;
  wr.bytes(c->y + (size_t)i * ys, ys);
  wr.bytes(c->u + (size_t)i * cs, cs);
  wr.bytes(c->v + (size_t)i * cs, cs);
}

}  // namespace

extern "C" {

// frames: [n, h, w, 3] uint8 RGB (top-down).  Returns 0 on success.
int eamm_write_avi_rgb(const char* path, const uint8_t* rgb, int n, int w,
                       int h, int fps_num, int fps_den) {
  RgbCtx ctx{rgb, w, h, (uint32_t)((w * 3 + 3) & ~3)};
  return write_avi(path, n, w, h, fps_num, fps_den, ctx.stride * h, 24,
                   0 /*BI_RGB*/, "DIB ", emit_rgb, &ctx);
}

// y: [n, h, w], u/v: [n, h/2, w/2] uint8 (the pipeline's yuv420 planes).
int eamm_write_avi_i420(const char* path, const uint8_t* y, const uint8_t* u,
                        const uint8_t* v, int n, int w, int h, int fps_num,
                        int fps_den) {
  if (w % 2 || h % 2) return 3;
  YuvCtx ctx{y, u, v, w, h};
  uint32_t fourcc;
  memcpy(&fourcc, "I420", 4);
  return write_avi(path, n, w, h, fps_num, fps_den,
                   (uint32_t)(w * h * 3 / 2), 12, fourcc, "I420",
                   emit_i420, &ctx);
}

}  // extern "C"
