// Native AVI muxer: wraps rendered frames (and the driving audio) into a
// playable video file with no external codec or ffmpeg dependency.
//
// Stream formats:
//   * eamm_write_avi_rgb[_pcm]  — classic uncompressed DIB (BI_RGB, 24-bit,
//     bottom-up BGR rows, 4-byte row alignment): plays everywhere.
//   * eamm_write_avi_i420[_pcm] — fourcc 'I420' planar 4:2:0, 12 bpp:
//     exactly the byte planes the TPU pipeline's yuv420 delivery path
//     produces (eamm_tpu/ops/colorspace.py), so muxing is a straight copy.
//   * the _pcm variants add a second 'auds' stream of 16-bit PCM,
//     interleaved one '01wb' chunk per video frame — the reference remuxes
//     driving audio with ffmpeg (ref:demo.py:427-431); this delivers the
//     same "talking face with sound" product when ffmpeg is absent.
//
// AVI wire format: RIFF('AVI ') { LIST hdrl { avih, LIST strl { strh,
// strf } [, LIST strl { strh, strf }] }, LIST movi { '00db' | '01wb'
// chunks ... }, idx1 }.

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
constexpr uint32_t kVidStrfSize = 40;  // BITMAPINFOHEADER
constexpr uint32_t kAudStrfSize = 16;  // PCMWAVEFORMAT

struct Audio {
  const int16_t* pcm = nullptr;  // interleaved samples
  int64_t n_samples = 0;         // per channel
  int sample_rate = 0;
  int channels = 0;
  bool present() const { return pcm && n_samples > 0 && channels > 0; }
  uint32_t block_align() const { return (uint32_t)channels * 2; }
};

// Audio samples covered by video frame i (even split at the frame rate;
// any tail beyond the last video frame rides in the final chunk).
int64_t audio_cut(const Audio& a, int i, int n, int fps_num, int fps_den) {
  if (i >= n) return a.n_samples;
  int64_t cut = (int64_t)i * a.sample_rate * fps_den / (fps_num > 0 ? fps_num : 25);
  return cut < a.n_samples ? cut : a.n_samples;
}

int write_avi(const char* path, int n, int w, int h, int fps_num,
              int fps_den, uint32_t frame_size, uint32_t bit_count,
              uint32_t compression, const char* handler, const Audio& au,
              void (*emit_frame)(Writer&, int, void*), void* ctx) {
  FILE* f = fopen(path, "wb");
  if (!f) return 1;
  Writer wr{f};

  const int streams = au.present() ? 2 : 1;
  const uint32_t strl_vid = 4 + (8 + kStrhSize) + (8 + kVidStrfSize);
  const uint32_t strl_aud = 4 + (8 + kStrhSize) + (8 + kAudStrfSize);
  const uint32_t hdrl_size = 4 + (8 + kAvihSize) + (8 + strl_vid)
      + (streams == 2 ? (8 + strl_aud) : 0);

  // movi layout: per frame a '00db' chunk, plus (audio) a '01wb' chunk for
  // that frame's sample span; empty spans emit no chunk. 16-bit samples
  // keep every chunk size even, so no RIFF pad bytes are needed.
  std::vector<int64_t> cuts;
  uint32_t movi_size = 4 + (uint32_t)n * (8 + frame_size);
  uint32_t idx_entries = (uint32_t)n;
  uint32_t max_aud_chunk = 0;
  if (au.present()) {
    cuts.resize((size_t)n + 1);
    for (int i = 0; i <= n; i++)
      cuts[(size_t)i] = audio_cut(au, i, n, fps_num, fps_den);
    for (int i = 0; i < n; i++) {
      uint32_t bytes = (uint32_t)((cuts[(size_t)i + 1] - cuts[(size_t)i])
                                  * au.block_align());
      if (bytes) {
        movi_size += 8 + bytes;
        idx_entries++;
        if (bytes > max_aud_chunk) max_aud_chunk = bytes;
      }
    }
  }
  const uint32_t idx1_size = idx_entries * 16;
  const uint32_t riff_size = 4 + (8 + hdrl_size) + (8 + movi_size)
      + (8 + idx1_size);

  wr.fourcc("RIFF"); wr.u32(riff_size); wr.fourcc("AVI ");

  wr.fourcc("LIST"); wr.u32(hdrl_size); wr.fourcc("hdrl");
  wr.fourcc("avih"); wr.u32(kAvihSize);
  const uint64_t usec = (uint64_t)1000000 * fps_den / (fps_num > 0 ? fps_num : 25);
  wr.u32((uint32_t)usec);                       // dwMicroSecPerFrame
  wr.u32((uint32_t)((uint64_t)frame_size * fps_num
                    / (fps_den > 0 ? fps_den : 1)));  // dwMaxBytesPerSec
  wr.u32(0);                                    // padding granularity
  wr.u32(streams == 2 ? 0x110 : 0x10);          // HASINDEX [| ISINTERLEAVED]
  wr.u32((uint32_t)n);                          // total frames
  wr.u32(0);                                    // initial frames
  wr.u32((uint32_t)streams);
  wr.u32(frame_size);                           // suggested buffer
  wr.u32((uint32_t)w); wr.u32((uint32_t)h);
  wr.u32(0); wr.u32(0); wr.u32(0); wr.u32(0);   // reserved

  wr.fourcc("LIST"); wr.u32(strl_vid); wr.fourcc("strl");
  wr.fourcc("strh"); wr.u32(kStrhSize);
  wr.fourcc("vids"); wr.fourcc(handler);
  wr.u32(0); wr.u32(0); wr.u32(0);              // flags, prio+lang, initial
  wr.u32((uint32_t)fps_den);                    // scale
  wr.u32((uint32_t)fps_num);                    // rate
  wr.u32(0); wr.u32((uint32_t)n);               // start, length
  wr.u32(frame_size); wr.u32(0xFFFFFFFFu);      // bufsize, quality
  wr.u32(0);                                    // sample size
  wr.u16(0); wr.u16(0); wr.u16((uint16_t)w); wr.u16((uint16_t)h);

  wr.fourcc("strf"); wr.u32(kVidStrfSize);
  wr.u32(kVidStrfSize);                         // biSize
  wr.u32((uint32_t)w); wr.u32((uint32_t)h);
  wr.u16(1); wr.u16((uint16_t)bit_count);
  wr.u32(compression);
  wr.u32(frame_size);
  wr.u32(0); wr.u32(0); wr.u32(0); wr.u32(0);

  if (streams == 2) {
    const uint32_t ba = au.block_align();
    wr.fourcc("LIST"); wr.u32(strl_aud); wr.fourcc("strl");
    wr.fourcc("strh"); wr.u32(kStrhSize);
    wr.fourcc("auds"); wr.u32(0);               // handler: raw PCM
    wr.u32(0); wr.u32(0); wr.u32(0);            // flags, prio+lang, initial
    wr.u32(1);                                  // scale (1 sample)
    wr.u32((uint32_t)au.sample_rate);           // rate
    wr.u32(0); wr.u32((uint32_t)au.n_samples);  // start, length (samples)
    wr.u32(max_aud_chunk); wr.u32(0xFFFFFFFFu); // bufsize, quality
    wr.u32(ba);                                 // sample size (block align)
    wr.u16(0); wr.u16(0); wr.u16(0); wr.u16(0); // rcFrame

    wr.fourcc("strf"); wr.u32(kAudStrfSize);    // PCMWAVEFORMAT
    wr.u16(1);                                  // wFormatTag = PCM
    wr.u16((uint16_t)au.channels);
    wr.u32((uint32_t)au.sample_rate);
    wr.u32((uint32_t)au.sample_rate * ba);      // avg bytes/sec
    wr.u16((uint16_t)ba);
    wr.u16(16);                                 // bits per sample
  }

  wr.fourcc("LIST"); wr.u32(movi_size); wr.fourcc("movi");
  for (int i = 0; i < n; i++) {
    wr.fourcc("00db"); wr.u32(frame_size);
    emit_frame(wr, i, ctx);
    if (streams == 2) {
      uint32_t bytes = (uint32_t)((cuts[(size_t)i + 1] - cuts[(size_t)i])
                                  * au.block_align());
      if (bytes) {
        wr.fourcc("01wb"); wr.u32(bytes);
        wr.bytes(au.pcm + cuts[(size_t)i] * au.channels, bytes);
      }
    }
  }

  wr.fourcc("idx1"); wr.u32(idx1_size);
  uint32_t off = 4;
  for (int i = 0; i < n; i++) {
    wr.fourcc("00db"); wr.u32(0x10); wr.u32(off); wr.u32(frame_size);
    off += 8 + frame_size;
    if (streams == 2) {
      uint32_t bytes = (uint32_t)((cuts[(size_t)i + 1] - cuts[(size_t)i])
                                  * au.block_align());
      if (bytes) {
        wr.fourcc("01wb"); wr.u32(0x10); wr.u32(off); wr.u32(bytes);
        off += 8 + bytes;
      }
    }
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

// frames: [n, h, w, 3] uint8 RGB (top-down); pcm: interleaved int16,
// n_samples per channel (pass nullptr/0 for video-only). Returns 0 on
// success.
int eamm_write_avi_rgb_pcm(const char* path, const uint8_t* rgb, int n,
                           int w, int h, int fps_num, int fps_den,
                           const int16_t* pcm, int64_t n_samples,
                           int sample_rate, int channels) {
  RgbCtx ctx{rgb, w, h, (uint32_t)((w * 3 + 3) & ~3)};
  Audio au{pcm, n_samples, sample_rate, channels};
  return write_avi(path, n, w, h, fps_num, fps_den, ctx.stride * h, 24,
                   0 /*BI_RGB*/, "DIB ", au, emit_rgb, &ctx);
}

// y: [n, h, w], u/v: [n, h/2, w/2] uint8 (the pipeline's yuv420 planes).
int eamm_write_avi_i420_pcm(const char* path, const uint8_t* y,
                            const uint8_t* u, const uint8_t* v, int n,
                            int w, int h, int fps_num, int fps_den,
                            const int16_t* pcm, int64_t n_samples,
                            int sample_rate, int channels) {
  if (w % 2 || h % 2) return 3;
  YuvCtx ctx{y, u, v, w, h};
  uint32_t fourcc;
  memcpy(&fourcc, "I420", 4);
  Audio au{pcm, n_samples, sample_rate, channels};
  return write_avi(path, n, w, h, fps_num, fps_den,
                   (uint32_t)(w * h * 3 / 2), 12, fourcc, "I420", au,
                   emit_i420, &ctx);
}

int eamm_write_avi_rgb(const char* path, const uint8_t* rgb, int n, int w,
                       int h, int fps_num, int fps_den) {
  return eamm_write_avi_rgb_pcm(path, rgb, n, w, h, fps_num, fps_den,
                                nullptr, 0, 0, 0);
}

int eamm_write_avi_i420(const char* path, const uint8_t* y, const uint8_t* u,
                        const uint8_t* v, int n, int w, int h, int fps_num,
                        int fps_den) {
  return eamm_write_avi_i420_pcm(path, y, u, v, n, w, h, fps_num, fps_den,
                                 nullptr, 0, 0, 0);
}

}  // extern "C"
