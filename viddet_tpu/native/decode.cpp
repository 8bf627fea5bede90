// viddet_tpu native host-decode library.
//
// TPU-native equivalent of the reference substrate's OpenCV/FFMPEG decode
// path + DataLoader worker pool (SURVEY.md §3.2 N9/N11): the host side of
// the "fused host+device preprocessing path" in the BASELINE.json north
// star.  One pass per output pixel fuses JPEG decode -> (letterbox) resize
// -> ImageNet normalization straight into a caller-provided float32 NHWC
// staging buffer that Python hands to jax.device_put — no intermediate
// uint8 images, no Python per-pixel work, GIL released for the whole batch.
// Every entry point also has a uint8 output mode (vd_*_u8 / out_u8): frames
// stay raw RGB and the normalization runs IN-GRAPH on the device instead
// (4x smaller host->device transfers; cli.common.make_predictor).
//
// Exposed C ABI (ctypes-friendly):
//   vd_decode_jpeg_batch   — threaded batch: files -> normalized tensors
//   vd_video_open/close    — FFmpeg demux+decode handle with a decode-ahead
//   vd_video_read          — ring buffer of preprocessed frames
//
// Build: g++ -O3 -march=native -shared -fPIC decode.cpp -o libviddet_decode.so
//        -ljpeg -lavformat -lavcodec -lavutil -lswscale -pthread

#include <atomic>
#include <cmath>
#include <condition_variable>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <mutex>
#include <queue>
#include <thread>
#include <vector>

#include <jpeglib.h>
#include <setjmp.h>

extern "C" {
#include <libavcodec/avcodec.h>
#include <libavformat/avformat.h>
#include <libavutil/imgutils.h>
#include <libswscale/swscale.h>
}

namespace {

constexpr float kMean[3] = {0.485f, 0.456f, 0.406f};
constexpr float kStd[3] = {0.229f, 0.224f, 0.225f};

struct JpegErr {
  jpeg_error_mgr pub;
  jmp_buf jmp;
};

void jpeg_err_exit(j_common_ptr cinfo) {
  JpegErr* err = reinterpret_cast<JpegErr*>(cinfo->err);
  longjmp(err->jmp, 1);
}

// Bilinear sample of an interleaved RGB uint8 image into v[3] (raw 0..255).
inline void sample_bilinear(const uint8_t* rgb, int sw, int sh, float sx,
                            float sy, float* v) {
  sx = sx < 0.f ? 0.f : (sx > sw - 1.f ? sw - 1.f : sx);
  sy = sy < 0.f ? 0.f : (sy > sh - 1.f ? sh - 1.f : sy);
  int x0 = static_cast<int>(sx);
  int y0 = static_cast<int>(sy);
  int x1 = x0 + 1 < sw ? x0 + 1 : x0;
  int y1 = y0 + 1 < sh ? y0 + 1 : y0;
  float lx = sx - x0, ly = sy - y0;
  const uint8_t* p00 = rgb + (y0 * sw + x0) * 3;
  const uint8_t* p01 = rgb + (y0 * sw + x1) * 3;
  const uint8_t* p10 = rgb + (y1 * sw + x0) * 3;
  const uint8_t* p11 = rgb + (y1 * sw + x1) * 3;
  for (int c = 0; c < 3; ++c) {
    v[c] = (1 - ly) * ((1 - lx) * p00[c] + lx * p01[c]) +
           ly * ((1 - lx) * p10[c] + lx * p11[c]);
  }
}

// Resize (plain or letterbox) an RGB uint8 image into an HWC buffer of
// (oh, ow).  kNorm=true writes ImageNet-normalized float32 (the classic
// host-preprocess path); kNorm=false writes rounded uint8 — the
// device-normalize path, where frames cross PCIe at 1/4 the bytes and the
// identical (x/255 - mean)/std runs fused on-chip (cli.common
// make_predictor, dtype-keyed).  affine out: [sx, sy, dx, dy] (box mapping
// out = in * s + d).  pad_value is raw uint8 gray for letterbox borders.
template <typename OutT, bool kNorm>
void resize_impl(const uint8_t* rgb, int sw, int sh, OutT* out, int ow,
                 int oh, bool letterbox, int pad_value, float* affine) {
  float sx_scale, sy_scale;
  int dx = 0, dy = 0, rw = ow, rh = oh;
  OutT padv[3];
  for (int c = 0; c < 3; ++c) {
    if constexpr (kNorm) {
      padv[c] = (pad_value / 255.f - kMean[c]) / kStd[c];
    } else {
      padv[c] = static_cast<OutT>(pad_value);
    }
  }
  if (letterbox) {
    float s = std::fmin(static_cast<float>(ow) / sw, static_cast<float>(oh) / sh);
    rw = static_cast<int>(std::lround(sw * s));
    rh = static_cast<int>(std::lround(sh * s));
    dx = (ow - rw) / 2;
    dy = (oh - rh) / 2;
    sx_scale = sy_scale = s;
    for (int y = 0; y < oh; ++y) {
      bool border_row = y < dy || y >= dy + rh;
      OutT* row = out + static_cast<size_t>(y) * ow * 3;
      if (border_row) {
        for (int x = 0; x < ow; ++x)
          for (int c = 0; c < 3; ++c) row[x * 3 + c] = padv[c];
      } else {
        for (int x = 0; x < dx; ++x)
          for (int c = 0; c < 3; ++c) row[x * 3 + c] = padv[c];
        for (int x = dx + rw; x < ow; ++x)
          for (int c = 0; c < 3; ++c) row[x * 3 + c] = padv[c];
      }
    }
  } else {
    sx_scale = static_cast<float>(ow) / sw;
    sy_scale = static_cast<float>(oh) / sh;
  }
  // cv2-compatible half-pixel mapping: src = (dst + 0.5) / scale - 0.5
  for (int y = dy; y < dy + rh; ++y) {
    float sy = (y - dy + 0.5f) / sy_scale - 0.5f;
    OutT* row = out + static_cast<size_t>(y) * ow * 3;
    for (int x = dx; x < dx + rw; ++x) {
      float sx = (x - dx + 0.5f) / sx_scale - 0.5f;
      float v[3];
      sample_bilinear(rgb, sw, sh, sx, sy, v);
      for (int c = 0; c < 3; ++c) {
        if constexpr (kNorm) {
          row[x * 3 + c] = (v[c] / 255.f - kMean[c]) / kStd[c];
        } else {
          // round-to-nearest like cv2's uint8 INTER_LINEAR output;
          // +0.5f-truncate == round-half-up for the non-negative clamped
          // range (std::lround is a per-pixel libm call — measured 10%
          // slower than the whole f32-normalize path)
          float r = v[c] < 0.f ? 0.f : (v[c] > 255.f ? 255.f : v[c]);
          row[x * 3 + c] = static_cast<OutT>(r + 0.5f);
        }
      }
    }
  }
  affine[0] = sx_scale;
  affine[1] = sy_scale;
  affine[2] = static_cast<float>(dx);
  affine[3] = static_cast<float>(dy);
}

void resize_normalize(const uint8_t* rgb, int sw, int sh, float* out, int ow,
                      int oh, bool letterbox, int pad_value, float* affine) {
  resize_impl<float, true>(rgb, sw, sh, out, ow, oh, letterbox, pad_value,
                           affine);
}

void resize_u8(const uint8_t* rgb, int sw, int sh, uint8_t* out, int ow,
               int oh, bool letterbox, int pad_value, float* affine) {
  resize_impl<uint8_t, false>(rgb, sw, sh, out, ow, oh, letterbox, pad_value,
                              affine);
}

// Decode one JPEG file to RGB (with DCT-domain prescale toward the target).
// (*ow0, *oh0) receive the ORIGINAL (pre-prescale) dimensions.
bool decode_jpeg_file(const char* path, int target_w, int target_h,
                      std::vector<uint8_t>* rgb, int* w, int* h, int* ow0,
                      int* oh0) {
  FILE* f = std::fopen(path, "rb");
  if (!f) return false;
  jpeg_decompress_struct cinfo;
  JpegErr jerr;
  cinfo.err = jpeg_std_error(&jerr.pub);
  jerr.pub.error_exit = jpeg_err_exit;
  if (setjmp(jerr.jmp)) {
    jpeg_destroy_decompress(&cinfo);
    std::fclose(f);
    return false;
  }
  jpeg_create_decompress(&cinfo);
  jpeg_stdio_src(&cinfo, f);
  jpeg_read_header(&cinfo, TRUE);
  cinfo.out_color_space = JCS_RGB;
  *ow0 = cinfo.image_width;
  *oh0 = cinfo.image_height;
  // DCT prescale: pick the smallest 1/1..1/8 scale that stays >= target.
  if (target_w > 0 && target_h > 0) {
    for (int denom = 8; denom >= 1; --denom) {
      if (static_cast<int>(cinfo.image_width) / denom >= target_w &&
          static_cast<int>(cinfo.image_height) / denom >= target_h) {
        cinfo.scale_num = 1;
        cinfo.scale_denom = denom;
        break;
      }
    }
  }
  jpeg_start_decompress(&cinfo);
  *w = cinfo.output_width;
  *h = cinfo.output_height;
  rgb->resize(static_cast<size_t>(*w) * *h * 3);
  while (cinfo.output_scanline < cinfo.output_height) {
    uint8_t* row = rgb->data() + static_cast<size_t>(cinfo.output_scanline) * *w * 3;
    jpeg_read_scanlines(&cinfo, &row, 1);
  }
  jpeg_finish_decompress(&cinfo);
  jpeg_destroy_decompress(&cinfo);
  std::fclose(f);
  return true;
}

// Threaded batch decode shared by the f32-normalized and uint8 ABI entry
// points below.
template <typename OutT, bool kNorm>
int decode_jpeg_batch_impl(const char** paths, int n, OutT* out, int ow,
                           int oh, int letterbox, int pad_value,
                           float* affines, int* orig_sizes, int num_threads) {
  std::atomic<int> next{0}, ok{0};
  if (num_threads <= 0) num_threads = std::thread::hardware_concurrency();
  if (num_threads <= 0) num_threads = 1;
  if (num_threads > n) num_threads = n;
  auto worker = [&]() {
    std::vector<uint8_t> rgb;
    int w, h, w0, h0;
    while (true) {
      int i = next.fetch_add(1);
      if (i >= n) return;
      OutT* dst = out + static_cast<size_t>(i) * ow * oh * 3;
      if (decode_jpeg_file(paths[i], ow, oh, &rgb, &w, &h, &w0, &h0)) {
        resize_impl<OutT, kNorm>(rgb.data(), w, h, dst, ow, oh,
                                 letterbox != 0, pad_value, affines + i * 4);
        // fold the DCT prescale (decoded/original) into the affine so it
        // maps from the file's TRUE coordinate system
        affines[i * 4] *= static_cast<float>(w) / w0;
        affines[i * 4 + 1] *= static_cast<float>(h) / h0;
        orig_sizes[i * 2] = h0;
        orig_sizes[i * 2 + 1] = w0;
        ok.fetch_add(1);
      } else {
        std::memset(dst, 0, sizeof(OutT) * ow * oh * 3);
        affines[i * 4] = 1.f;
        affines[i * 4 + 1] = 1.f;
        affines[i * 4 + 2] = 0.f;
        affines[i * 4 + 3] = 0.f;
        orig_sizes[i * 2] = 0;
        orig_sizes[i * 2 + 1] = 0;
      }
    }
  };
  std::vector<std::thread> threads;
  for (int t = 0; t < num_threads; ++t) threads.emplace_back(worker);
  for (auto& t : threads) t.join();
  return ok.load();
}

}  // namespace

extern "C" {

// Decode `n` JPEG files into out (n, oh, ow, 3) float32, normalized.
// affines: (n, 4).  orig_sizes: (n, 2) [h, w] of source images. Returns the
// number of successfully decoded images; failed slots are zero-filled.
int vd_decode_jpeg_batch(const char** paths, int n, float* out, int ow, int oh,
                         int letterbox, int pad_value, float* affines,
                         int* orig_sizes, int num_threads) {
  return decode_jpeg_batch_impl<float, true>(
      paths, n, out, ow, oh, letterbox, pad_value, affines, orig_sizes,
      num_threads);
}

// uint8 variant: frames stay raw RGB for device-side normalization
// (1/4 the transfer bytes; see resize_impl).
int vd_decode_jpeg_batch_u8(const char** paths, int n, uint8_t* out, int ow,
                            int oh, int letterbox, int pad_value,
                            float* affines, int* orig_sizes,
                            int num_threads) {
  return decode_jpeg_batch_impl<uint8_t, false>(
      paths, n, out, ow, oh, letterbox, pad_value, affines, orig_sizes,
      num_threads);
}

// ---------------------------------------------------------------------------
// Video streaming: FFmpeg demux/decode thread -> preprocessed frame ring.
// ---------------------------------------------------------------------------

struct VideoFrame {
  std::vector<uint8_t> buf;  // (oh, ow, 3): f32 normalized or raw uint8
  float affine[4];
  int64_t index;
};

struct VideoHandle {
  AVFormatContext* fmt = nullptr;
  AVCodecContext* codec = nullptr;
  SwsContext* sws = nullptr;
  int stream_index = -1;
  int ow, oh, letterbox, pad_value, every;
  int out_u8 = 0;  // uint8 frames for device-side normalization
  int src_w = 0, src_h = 0;
  double fps = 0.0;

  std::thread decoder;
  std::mutex mu;
  std::condition_variable cv_push, cv_pop;
  std::queue<VideoFrame> ring;
  size_t ring_cap = 32;
  bool done = false, stop = false;

  ~VideoHandle() {
    {
      std::lock_guard<std::mutex> lk(mu);
      stop = true;
    }
    cv_push.notify_all();
    cv_pop.notify_all();
    if (decoder.joinable()) decoder.join();
    if (sws) sws_freeContext(sws);
    if (codec) avcodec_free_context(&codec);
    if (fmt) avformat_close_input(&fmt);
  }
};

static void video_decode_loop(VideoHandle* vh) {
  AVPacket* pkt = av_packet_alloc();
  AVFrame* frame = av_frame_alloc();
  AVFrame* rgb = av_frame_alloc();
  rgb->format = AV_PIX_FMT_RGB24;
  rgb->width = vh->src_w;
  rgb->height = vh->src_h;
  av_frame_get_buffer(rgb, 32);
  int64_t idx = 0;

  auto emit = [&](AVFrame* fr) {
    if (!vh->sws) {
      vh->sws = sws_getContext(vh->src_w, vh->src_h,
                               static_cast<AVPixelFormat>(fr->format), vh->src_w,
                               vh->src_h, AV_PIX_FMT_RGB24, SWS_BILINEAR,
                               nullptr, nullptr, nullptr);
    }
    sws_scale(vh->sws, fr->data, fr->linesize, 0, vh->src_h, rgb->data,
              rgb->linesize);
    // tightly pack (linesize may exceed width*3)
    std::vector<uint8_t> packed(static_cast<size_t>(vh->src_w) * vh->src_h * 3);
    for (int y = 0; y < vh->src_h; ++y)
      std::memcpy(packed.data() + static_cast<size_t>(y) * vh->src_w * 3,
                  rgb->data[0] + static_cast<size_t>(y) * rgb->linesize[0],
                  static_cast<size_t>(vh->src_w) * 3);
    VideoFrame vf;
    size_t count = static_cast<size_t>(vh->ow) * vh->oh * 3;
    vf.buf.resize(count * (vh->out_u8 ? 1 : sizeof(float)));
    if (vh->out_u8) {
      resize_u8(packed.data(), vh->src_w, vh->src_h, vf.buf.data(), vh->ow,
                vh->oh, vh->letterbox != 0, vh->pad_value, vf.affine);
    } else {
      resize_normalize(packed.data(), vh->src_w, vh->src_h,
                       reinterpret_cast<float*>(vf.buf.data()), vh->ow,
                       vh->oh, vh->letterbox != 0, vh->pad_value, vf.affine);
    }
    vf.index = idx;
    std::unique_lock<std::mutex> lk(vh->mu);
    vh->cv_push.wait(lk, [&] { return vh->ring.size() < vh->ring_cap || vh->stop; });
    if (vh->stop) return;
    vh->ring.push(std::move(vf));
    vh->cv_pop.notify_one();
  };

  bool stopped = false;
  while (!stopped && av_read_frame(vh->fmt, pkt) >= 0) {
    if (pkt->stream_index == vh->stream_index) {
      if (avcodec_send_packet(vh->codec, pkt) == 0) {
        while (avcodec_receive_frame(vh->codec, frame) == 0) {
          if (idx % vh->every == 0) emit(frame);
          ++idx;
          {
            std::lock_guard<std::mutex> lk(vh->mu);
            if (vh->stop) stopped = true;
          }
          if (stopped) break;
        }
      }
    }
    av_packet_unref(pkt);
  }
  // flush
  if (!stopped && avcodec_send_packet(vh->codec, nullptr) == 0) {
    while (avcodec_receive_frame(vh->codec, frame) == 0) {
      if (idx % vh->every == 0) emit(frame);
      ++idx;
    }
  }
  {
    std::lock_guard<std::mutex> lk(vh->mu);
    vh->done = true;
  }
  vh->cv_pop.notify_all();
  av_frame_free(&rgb);
  av_frame_free(&frame);
  av_packet_free(&pkt);
}

// Open a video for streaming preprocessed frames. Returns handle or null.
// out_u8 != 0 -> frames are raw uint8 RGB (device-side normalization).
void* vd_video_open2(const char* path, int ow, int oh, int letterbox,
                     int pad_value, int every, int ring_capacity,
                     int out_u8) {
  auto* vh = new VideoHandle();
  vh->out_u8 = out_u8;
  vh->ow = ow;
  vh->oh = oh;
  vh->letterbox = letterbox;
  vh->pad_value = pad_value;
  vh->every = every > 0 ? every : 1;
  if (ring_capacity > 0) vh->ring_cap = ring_capacity;
  if (avformat_open_input(&vh->fmt, path, nullptr, nullptr) < 0) {
    delete vh;
    return nullptr;
  }
  if (avformat_find_stream_info(vh->fmt, nullptr) < 0) {
    delete vh;
    return nullptr;
  }
  const AVCodec* dec = nullptr;
  vh->stream_index =
      av_find_best_stream(vh->fmt, AVMEDIA_TYPE_VIDEO, -1, -1, &dec, 0);
  if (vh->stream_index < 0 || !dec) {
    delete vh;
    return nullptr;
  }
  AVStream* st = vh->fmt->streams[vh->stream_index];
  vh->codec = avcodec_alloc_context3(dec);
  avcodec_parameters_to_context(vh->codec, st->codecpar);
  if (avcodec_open2(vh->codec, dec, nullptr) < 0) {
    delete vh;
    return nullptr;
  }
  vh->src_w = vh->codec->width;
  vh->src_h = vh->codec->height;
  vh->fps = av_q2d(st->avg_frame_rate.num ? st->avg_frame_rate : st->r_frame_rate);
  vh->decoder = std::thread(video_decode_loop, vh);
  return vh;
}

void* vd_video_open(const char* path, int ow, int oh, int letterbox,
                    int pad_value, int every, int ring_capacity) {
  return vd_video_open2(path, ow, oh, letterbox, pad_value, every,
                        ring_capacity, /*out_u8=*/0);
}

// Pop one preprocessed frame. Returns frame index (>=0), or -1 on EOF.
// `out` must match the handle's output mode: float32 for vd_video_open /
// out_u8=0, uint8 for out_u8=1 (vd_video_read_u8 below is the typed alias).
static int64_t video_read_raw(void* handle, void* out, float* affine) {
  auto* vh = static_cast<VideoHandle*>(handle);
  std::unique_lock<std::mutex> lk(vh->mu);
  vh->cv_pop.wait(lk, [&] { return !vh->ring.empty() || vh->done || vh->stop; });
  if (vh->ring.empty()) return -1;
  VideoFrame vf = std::move(vh->ring.front());
  vh->ring.pop();
  vh->cv_push.notify_one();
  lk.unlock();
  std::memcpy(out, vf.buf.data(), vf.buf.size());
  std::memcpy(affine, vf.affine, 4 * sizeof(float));
  return vf.index;
}

int64_t vd_video_read(void* handle, float* out, float* affine) {
  return video_read_raw(handle, out, affine);
}

int64_t vd_video_read_u8(void* handle, uint8_t* out, float* affine) {
  return video_read_raw(handle, out, affine);
}

void vd_video_info(void* handle, int* w, int* h, double* fps) {
  auto* vh = static_cast<VideoHandle*>(handle);
  *w = vh->src_w;
  *h = vh->src_h;
  *fps = vh->fps;
}

void vd_video_close(void* handle) { delete static_cast<VideoHandle*>(handle); }

}  // extern "C"
