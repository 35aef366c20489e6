// Native media decode for the raw-media pipeline.
//
// Replaces the reference's ffmpeg-CLI wav extraction
// (reference: preprocess/extract_wav.py:7-44 shells `ffmpeg -map 0:a`) with
// an in-process demux+decode+resample on the system libav* libraries, and
// provides a video frame decoder equivalent to the cv2 path used by
// pipeline/e2e.py (reference video read: torchvision.io.read_video at
// video_feature/aligned_video/extract_video_features.py:53-77).
//
// Plain C ABI, loaded via ctypes (runtime/host_media.py). No pybind/torch.
//
// Design notes:
//  - audio: first audio stream -> decode (AAC-LC in the challenge data) ->
//    swresample to mono float32 at the caller's rate (16 kHz downstream).
//    libavcodec applies AV_PKT_DATA_SKIP_SAMPLES (AAC priming) itself, so
//    sample counts match the metadata's `audio_frames`.
//  - video: first video stream -> decode -> swscale to RGB24 at an optional
//    target size (bilinear, matching cv2.INTER_LINEAR used by the host
//    resize infeed). Frames are written into one contiguous buffer.
//  - all outputs are malloc'd here and released with avdd_media_free();
//    ctypes callers copy into numpy and free immediately.

extern "C" {
#include <libavcodec/avcodec.h>
#include <libavformat/avformat.h>
#include <libavutil/imgutils.h>
#include <libavutil/opt.h>
#include <libswresample/swresample.h>
#include <libswscale/swscale.h>
}

#include <cstdint>
#include <cstdlib>
#include <cstring>
#include <vector>

namespace {

struct Demux {
  AVFormatContext* fmt = nullptr;
  AVCodecContext* ctx = nullptr;
  int stream = -1;

  ~Demux() {
    if (ctx) avcodec_free_context(&ctx);
    if (fmt) avformat_close_input(&fmt);
  }

  // Open `path` and set up a decoder for the first stream of `type`.
  int open(const char* path, AVMediaType type) {
    if (avformat_open_input(&fmt, path, nullptr, nullptr) < 0) return -1;
    if (avformat_find_stream_info(fmt, nullptr) < 0) return -2;
    const AVCodec* dec = nullptr;
    stream = av_find_best_stream(fmt, type, -1, -1, &dec, 0);
    if (stream < 0 || !dec) return -3;
    ctx = avcodec_alloc_context3(dec);
    if (!ctx) return -4;
    if (avcodec_parameters_to_context(ctx, fmt->streams[stream]->codecpar) < 0)
      return -5;
    // multi-threaded decode: the e2e pipeline feeds >100 Mpx/s of h264
    ctx->thread_count = 0;  // auto
    if (avcodec_open2(ctx, dec, nullptr) < 0) return -6;
    return 0;
  }
};

}  // namespace

extern "C" {

void avdd_media_free(void* p) { free(p); }

// mp4 (or any container) -> mono float32 PCM at `target_rate`.
// On success returns 0 and sets *out (malloc'd) / *out_len (samples).
// Negative return = stage that failed (for error messages host-side).
int avdd_decode_audio(const char* path, int target_rate, float** out,
                      int64_t* out_len) {
  *out = nullptr;
  *out_len = 0;
  Demux d;
  int rc = d.open(path, AVMEDIA_TYPE_AUDIO);
  if (rc != 0) return rc;

  SwrContext* swr = nullptr;
  std::vector<float> pcm;
  AVPacket* pkt = av_packet_alloc();
  AVFrame* frm = av_frame_alloc();
  std::vector<float> tmp;
  int err = 0;

  auto drain_frame = [&](AVFrame* f) -> int {
    if (!swr) {
      AVChannelLayout mono = AV_CHANNEL_LAYOUT_MONO;
      // MUST be zero-initialized: av_channel_layout_copy() first uninits the
      // destination, and a garbage order==AV_CHANNEL_ORDER_CUSTOM would make
      // it free() an indeterminate pointer
      AVChannelLayout in_layout = {};
      if (f->ch_layout.nb_channels > 0)
        av_channel_layout_copy(&in_layout, &f->ch_layout);
      else
        av_channel_layout_default(&in_layout, 1);
      if (swr_alloc_set_opts2(&swr, &mono, AV_SAMPLE_FMT_FLT, target_rate,
                              &in_layout, (AVSampleFormat)f->format,
                              f->sample_rate, 0, nullptr) < 0)
        return -7;
      av_channel_layout_uninit(&in_layout);
      if (swr_init(swr) < 0) return -8;
    }
    int max_out = swr_get_out_samples(swr, f->nb_samples);
    if (max_out < 0) return -9;
    tmp.resize((size_t)max_out + 64);
    uint8_t* outp = (uint8_t*)tmp.data();
    int got = swr_convert(swr, &outp, (int)tmp.size(),
                          (const uint8_t**)f->extended_data, f->nb_samples);
    if (got < 0) return -9;
    pcm.insert(pcm.end(), tmp.data(), tmp.data() + got);
    return 0;
  };

  // decode loop + decoder flush
  bool eof = false;
  while (!eof && err == 0) {
    int r = av_read_frame(d.fmt, pkt);
    if (r == AVERROR_EOF) {
      avcodec_send_packet(d.ctx, nullptr);
      eof = true;
    } else if (r < 0) {
      // mid-file demux/read error: report it instead of returning silently
      // truncated media as success
      err = -13;
      break;
    } else if (pkt->stream_index != d.stream) {
      av_packet_unref(pkt);
      continue;
    } else {
      avcodec_send_packet(d.ctx, pkt);
      av_packet_unref(pkt);
    }
    while (err == 0) {
      int rr = avcodec_receive_frame(d.ctx, frm);
      if (rr == AVERROR(EAGAIN) || rr == AVERROR_EOF) break;
      if (rr < 0) { err = -10; break; }
      err = drain_frame(frm);
      av_frame_unref(frm);
    }
  }
  // flush the resampler's tail
  if (err == 0 && swr) {
    tmp.resize(8192);
    int got;
    uint8_t* outp;
    do {
      outp = (uint8_t*)tmp.data();
      got = swr_convert(swr, &outp, (int)tmp.size(), nullptr, 0);
      if (got > 0) pcm.insert(pcm.end(), tmp.data(), tmp.data() + got);
    } while (got > 0);
  }

  av_frame_free(&frm);
  av_packet_free(&pkt);
  if (swr) swr_free(&swr);
  if (err != 0) return err;
  if (pcm.empty()) return -11;

  *out = (float*)malloc(pcm.size() * sizeof(float));
  if (!*out) return -12;
  memcpy(*out, pcm.data(), pcm.size() * sizeof(float));
  *out_len = (int64_t)pcm.size();
  return 0;
}

// Decode frames of the first video stream as packed RGB24.
// out_w/out_h <= 0 keeps the native size; max_frames <= 0 decodes all. On
// success: *frames is one malloc'd (n, h, w, 3) uint8 buffer; *n / *w / *h
// are set; *fps gets the stream's average frame rate.
int avdd_decode_video(const char* path, int out_w, int out_h,
                      int64_t max_frames, uint8_t** frames, int64_t* n,
                      int* w, int* h, double* fps) {
  *frames = nullptr;
  *n = 0;
  Demux d;
  int rc = d.open(path, AVMEDIA_TYPE_VIDEO);
  if (rc != 0) return rc;

  AVRational r = d.fmt->streams[d.stream]->avg_frame_rate;
  *fps = (r.den > 0) ? av_q2d(r) : 0.0;

  int W = 0, H = 0;
  SwsContext* sws = nullptr;
  std::vector<uint8_t> buf;  // grows frame by frame
  size_t frame_bytes = 0;
  int64_t count = 0;
  AVPacket* pkt = av_packet_alloc();
  AVFrame* frm = av_frame_alloc();
  int err = 0;

  auto drain_frame = [&](AVFrame* f) -> int {
    if (!sws) {
      W = out_w > 0 ? out_w : f->width;
      H = out_h > 0 ? out_h : f->height;
      sws = sws_getContext(f->width, f->height, (AVPixelFormat)f->format, W, H,
                           AV_PIX_FMT_RGB24,
                           (W == f->width && H == f->height) ? SWS_POINT
                                                             : SWS_BILINEAR,
                           nullptr, nullptr, nullptr);
      if (!sws) return -7;
      frame_bytes = (size_t)W * H * 3;
      // one allocation instead of O(n) regrows: the container usually knows
      // its frame count; cap the hint by max_frames when set
      int64_t hint = d.fmt->streams[d.stream]->nb_frames;
      if (max_frames > 0 && (hint <= 0 || hint > max_frames)) hint = max_frames;
      if (hint > 0) buf.reserve((size_t)hint * frame_bytes);
    }
    buf.resize(buf.size() + frame_bytes);
    uint8_t* dst = buf.data() + (size_t)count * frame_bytes;
    uint8_t* dst_planes[4] = {dst, nullptr, nullptr, nullptr};
    int dst_stride[4] = {W * 3, 0, 0, 0};
    sws_scale(sws, f->data, f->linesize, 0, f->height, dst_planes, dst_stride);
    ++count;
    return 0;
  };

  bool eof = false;
  bool full = false;
  while (!eof && !full && err == 0) {
    int rd = av_read_frame(d.fmt, pkt);
    if (rd == AVERROR_EOF) {
      avcodec_send_packet(d.ctx, nullptr);
      eof = true;
    } else if (rd < 0) {
      err = -13;  // mid-file demux/read error: fail, don't truncate silently
      break;
    } else if (pkt->stream_index != d.stream) {
      av_packet_unref(pkt);
      continue;
    } else {
      avcodec_send_packet(d.ctx, pkt);
      av_packet_unref(pkt);
    }
    while (err == 0 && !full) {
      int rr = avcodec_receive_frame(d.ctx, frm);
      if (rr == AVERROR(EAGAIN) || rr == AVERROR_EOF) break;
      if (rr < 0) { err = -10; break; }
      err = drain_frame(frm);
      av_frame_unref(frm);
      if (max_frames > 0 && count >= max_frames) full = true;
    }
  }

  av_frame_free(&frm);
  av_packet_free(&pkt);
  if (sws) sws_freeContext(sws);
  if (err != 0) return err;
  if (count == 0) return -11;

  *frames = (uint8_t*)malloc(buf.size());
  if (!*frames) return -12;
  memcpy(*frames, buf.data(), buf.size());
  *n = count;
  *w = W;
  *h = H;
  return 0;
}

// Container-level info without decoding: duration (s), audio sample rate,
// video frame count estimate and fps. Any stream absent -> zeros.
int avdd_media_info(const char* path, double* duration, int* audio_rate,
                    int64_t* video_frames, double* fps) {
  *duration = 0;
  *audio_rate = 0;
  *video_frames = 0;
  *fps = 0;
  AVFormatContext* fmt = nullptr;
  if (avformat_open_input(&fmt, path, nullptr, nullptr) < 0) return -1;
  if (avformat_find_stream_info(fmt, nullptr) < 0) {
    avformat_close_input(&fmt);
    return -2;
  }
  if (fmt->duration > 0) *duration = (double)fmt->duration / AV_TIME_BASE;
  for (unsigned i = 0; i < fmt->nb_streams; ++i) {
    AVStream* s = fmt->streams[i];
    if (s->codecpar->codec_type == AVMEDIA_TYPE_AUDIO && *audio_rate == 0)
      *audio_rate = s->codecpar->sample_rate;
    if (s->codecpar->codec_type == AVMEDIA_TYPE_VIDEO && *fps == 0) {
      AVRational r = s->avg_frame_rate;
      if (r.den > 0) *fps = av_q2d(r);
      *video_frames = s->nb_frames;
    }
  }
  avformat_close_input(&fmt);
  return 0;
}

}  // extern "C"
