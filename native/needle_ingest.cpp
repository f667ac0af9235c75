// needle-tpu native ingest: FFmpeg-based probe/decode/resample host layer.
//
// Replaces the reference's ffmpeg-next usage (needle/src/audio/analyzer.rs,
// needle/src/util.rs, needle/src/audio/util.rs) with a thin C ABI consumed
// from Python via ctypes. The decode loop reproduces the reference's exact
// packet semantics so fingerprints match:
//   * best audio stream via av_find_best_stream        (audio/util.rs:43-50)
//   * skip packets with pts <= 0                        (analyzer.rs:221-226)
//   * stop once pts >= end timestamp (in stream tb)     (analyzer.rs:196-216)
//   * resample every decoded frame to S16 interleaved stereo at the target
//     rate with swresample, rebuilding the resampler on input change
//     (analyzer.rs:231-255)
//   * mid-stream flush only when swr delay >= 1 second  (ffmpeg-next's
//     Context::delay() uses swr_get_delay(ctx, 1); analyzer.rs:277-282)
//   * no decoder drain / no resampler flush at EOF (the reference never
//     sends EOF to the codec nor flushes swr)
//   * seek via avformat_seek_file(ctx, -1, min, ts, max, 0) with AV_TIME_BASE
//     timestamps and the reference's +-1 s window (audio/util.rs:18-41); a
//     keyframe-less window falls back to a backward seek + packet trimming
//
// Build: see native/Makefile (links avformat/avcodec/avutil/swresample).

#include <cstdint>
#include <cstdio>
#include <algorithm>
#include <cstring>
#include <string>
#include <thread>
#include <vector>

extern "C" {
#include <libavcodec/avcodec.h>
#include <libavformat/avformat.h>
#include <libavutil/avutil.h>
#include <libavutil/channel_layout.h>
#include <libavutil/opt.h>
#include <libswresample/swresample.h>
}

namespace {

void set_err(char *err, int errcap, const std::string &msg) {
    if (err && errcap > 0) {
        std::snprintf(err, errcap, "%s", msg.c_str());
    }
}

std::string av_err_str(int code) {
    char buf[AV_ERROR_MAX_STRING_SIZE] = {0};
    av_strerror(code, buf, sizeof(buf));
    return std::string(buf);
}

struct Output {
    std::vector<int16_t> samples;  // interleaved stereo
};

// Append the data of a converted S16 stereo frame.
void append_frame(Output &out, const AVFrame *frame) {
    const int16_t *data = reinterpret_cast<const int16_t *>(frame->data[0]);
    int n = frame->nb_samples * 2;
    out.samples.insert(out.samples.end(), data, data + n);
}

struct Resampler {
    SwrContext *swr = nullptr;
    int out_rate = 0;

    ~Resampler() {
        if (swr) swr_free(&swr);
    }

    int init_from(const AVChannelLayout *in_layout, AVSampleFormat in_fmt, int in_rate) {
        if (swr) swr_free(&swr);
        AVChannelLayout out_layout = AV_CHANNEL_LAYOUT_STEREO;
        // Normalize UNSPEC-order layouts (PCM-in-Matroska decoders emit
        // them) to the native default: swr_init itself normalizes its
        // stored input layout, so configuring with UNSPEC would make every
        // subsequent swr_convert_frame report INPUT_CHANGED forever. The
        // reference's ffmpeg-next 7 uses u64 channel-mask layouts, which
        // are always native-order — this matches its semantics.
        AVChannelLayout in_norm;
        if (in_layout->order == AV_CHANNEL_ORDER_UNSPEC) {
            av_channel_layout_default(&in_norm, in_layout->nb_channels);
        } else {
            av_channel_layout_copy(&in_norm, in_layout);
        }
        int ret = swr_alloc_set_opts2(&swr, &out_layout, AV_SAMPLE_FMT_S16, out_rate,
                                      &in_norm, in_fmt, in_rate, 0, nullptr);
        av_channel_layout_uninit(&in_norm);
        if (ret < 0) return ret;
        return swr_init(swr);
    }

    // Mirror of ffmpeg-next Context::run + the reference's flush loop.
    // Returns 0 on success.
    int convert_and_append(AVFrame *in, AVFrame *scratch, Output &out) {
        // Match init_from's UNSPEC normalization on the frame itself, or
        // swr_convert_frame's config comparison flags INPUT_CHANGED on
        // every frame of an UNSPEC-layout stream.
        if (in && in->ch_layout.order == AV_CHANNEL_ORDER_UNSPEC) {
            AVChannelLayout norm;
            av_channel_layout_default(&norm, in->ch_layout.nb_channels);
            av_channel_layout_uninit(&in->ch_layout);
            av_channel_layout_copy(&in->ch_layout, &norm);
            av_channel_layout_uninit(&norm);
        }
        av_frame_unref(scratch);
        scratch->ch_layout = AV_CHANNEL_LAYOUT_STEREO;
        scratch->format = AV_SAMPLE_FMT_S16;
        scratch->sample_rate = out_rate;
        int ret = swr_convert_frame(swr, scratch, in);
        if (ret == AVERROR_INPUT_CHANGED || ret == AVERROR_OUTPUT_CHANGED) {
            // analyzer.rs:235-252: rebuild a resampler from the frame itself.
            ret = init_from(&in->ch_layout, (AVSampleFormat)in->format, in->sample_rate);
            if (ret < 0) return ret;
            av_frame_unref(scratch);
            scratch->ch_layout = AV_CHANNEL_LAYOUT_STEREO;
            scratch->format = AV_SAMPLE_FMT_S16;
            scratch->sample_rate = out_rate;
            ret = swr_convert_frame(swr, scratch, in);
        }
        if (ret < 0) return ret;
        append_frame(out, scratch);
        // ffmpeg-next Delay: swr_get_delay(ctx, 1) (seconds!) -> almost
        // always 0; flush only in the >=1s-buffered edge case.
        while (swr_get_delay(swr, 1) != 0) {
            av_frame_unref(scratch);
            scratch->ch_layout = AV_CHANNEL_LAYOUT_STEREO;
            scratch->format = AV_SAMPLE_FMT_S16;
            scratch->sample_rate = out_rate;
            ret = swr_convert_frame(swr, scratch, nullptr);
            if (ret < 0) return ret;
            if (scratch->nb_samples <= 0) break;
            append_frame(out, scratch);
        }
        return 0;
    }
};

}  // namespace

extern "C" {

unsigned ni_avutil_version(void) { return avutil_version(); }
unsigned ni_avformat_version(void) { return avformat_version(); }
unsigned ni_avcodec_version(void) { return avcodec_version(); }

void ni_free(void *p) { free(p); }

// Probe a container: count video and audio streams (util.rs:40-52).
int ni_probe(const char *path, int *n_video, int *n_audio, char *err, int errcap) {
    AVFormatContext *ctx = nullptr;
    int ret = avformat_open_input(&ctx, path, nullptr, nullptr);
    if (ret < 0) {
        set_err(err, errcap, "open failed: " + av_err_str(ret));
        return -1;
    }
    ret = avformat_find_stream_info(ctx, nullptr);
    if (ret < 0) {
        avformat_close_input(&ctx);
        set_err(err, errcap, "find_stream_info failed: " + av_err_str(ret));
        return -1;
    }
    int nv = 0, na = 0;
    for (unsigned i = 0; i < ctx->nb_streams; i++) {
        AVMediaType t = ctx->streams[i]->codecpar->codec_type;
        if (t == AVMEDIA_TYPE_VIDEO) nv++;
        if (t == AVMEDIA_TYPE_AUDIO) na++;
    }
    *n_video = nv;
    *n_audio = na;
    avformat_close_input(&ctx);
    return 0;
}

// Decode the best audio stream to S16 interleaved stereo at out_rate,
// reproducing the reference's analyze packet loop. seek_to_secs < 0 means no
// seek; duration_limit_secs < 0 means decode to EOF.
//
// Returns 0 on success. *out_samples is malloc'd (interleaved i16, stereo;
// *out_n_samples = total i16 count); caller frees with ni_free.
// *out_stream_duration_secs prefers the stream duration (stream tb units),
// falling back to the format-context duration (AV_TIME_BASE units);
// analyzer.rs:362-374.
int ni_decode_audio(const char *path, double seek_to_secs, double duration_limit_secs,
                    int out_rate, int threaded,
                    int16_t **out_samples, int64_t *out_n_samples,
                    double *out_stream_duration_secs,
                    char *err, int errcap) {
    AVFormatContext *ctx = nullptr;
    int ret = avformat_open_input(&ctx, path, nullptr, nullptr);
    if (ret < 0) {
        set_err(err, errcap, "open failed: " + av_err_str(ret));
        return -1;
    }
    ret = avformat_find_stream_info(ctx, nullptr);
    if (ret < 0) {
        avformat_close_input(&ctx);
        set_err(err, errcap, "find_stream_info failed: " + av_err_str(ret));
        return -1;
    }

    int stream_idx = av_find_best_stream(ctx, AVMEDIA_TYPE_AUDIO, -1, -1, nullptr, 0);
    if (stream_idx < 0) {
        avformat_close_input(&ctx);
        set_err(err, errcap, "unable to find an audio stream");
        return -1;
    }
    AVStream *stream = ctx->streams[stream_idx];
    double time_base = av_q2d(stream->time_base);

    // Reference duration logic (analyzer.rs:362-374): prefer the stream's
    // duration (stream time_base units); fall back to the format context's
    // (AV_TIME_BASE = microsecond units).
    double stream_duration;
    if (stream->duration > 0) {
        stream_duration = (double)stream->duration * time_base;
    } else if (ctx->duration > 0) {
        // Intentional divergence: the reference scales the format-context
        // duration by the STREAM time base here, which is only correct for
        // 1/1000 time bases (Matroska); we report the physically correct
        // value (AV_TIME_BASE units), which changes window sizing only for
        // containers lacking per-stream durations with non-ms time bases.
        stream_duration = (double)ctx->duration / 1000000.0;
    } else {
        avformat_close_input(&ctx);
        set_err(err, errcap, "no duration found in stream or format context");
        return -1;
    }
    if (out_stream_duration_secs) *out_stream_duration_secs = stream_duration;

    // Decoder setup (analyzer.rs:18-52).
    const AVCodec *codec = avcodec_find_decoder(stream->codecpar->codec_id);
    if (!codec) {
        avformat_close_input(&ctx);
        set_err(err, errcap, "no decoder for codec");
        return -1;
    }
    AVCodecContext *dec = avcodec_alloc_context3(codec);
    avcodec_parameters_to_context(dec, stream->codecpar);
    if (threaded) {
        dec->thread_count = (int)std::thread::hardware_concurrency();
        dec->thread_type = FF_THREAD_FRAME;
    }
    ret = avcodec_open2(dec, codec, nullptr);
    if (ret < 0) {
        avcodec_free_context(&dec);
        avformat_close_input(&ctx);
        set_err(err, errcap, "decoder open failed: " + av_err_str(ret));
        return -1;
    }

    // Resampler from decoder params (analyzer.rs:179-187).
    Resampler resampler;
    resampler.out_rate = out_rate;
    ret = resampler.init_from(&dec->ch_layout, dec->sample_fmt, dec->sample_rate);
    if (ret < 0) {
        avcodec_free_context(&dec);
        avformat_close_input(&ctx);
        set_err(err, errcap, "swr init failed: " + av_err_str(ret));
        return -1;
    }

    // Optional seek (audio/util.rs:18-41).
    int64_t seek_skip_ts = 0;  // stream-tb pts below which packets are dropped
    if (seek_to_secs >= 0) {
        double timestamp_ms = seek_to_secs * 1000.0;
        double min_ms = timestamp_ms - 1000.0;
        double max_ms = timestamp_ms + 1000.0;
        // NEEDLE_TPU_SEEK_COMPAT=ref replicates the reference's seek
        // arithmetic bug-for-bug (audio/util.rs:18-41): duration and seek
        // targets computed as ms / stream-time_base, which is correct only
        // for 1/1000 time bases (Matroska) and lands at the wrong media
        // time otherwise (e.g. MP4 at 1/44100). Use it when ending-window
        // hashes must byte-match .needle.dat files produced by the
        // reference binary on such containers (README interop caveats).
        const char *compat_env = getenv("NEEDLE_TPU_SEEK_COMPAT");
        const bool ref_compat =
            compat_env && (strcmp(compat_env, "ref") == 0 ||
                           strcmp(compat_env, "1") == 0);
        if (ref_compat) {
            // duration = from_millis((ctx.duration * stream_tb) as u64)
            double ref_duration_ms = std::floor((double)ctx->duration * time_base);
            if (!(max_ms < ref_duration_ms)) {
                // The reference asserts; we return a distinct error.
                avcodec_free_context(&dec);
                avformat_close_input(&ctx);
                set_err(err, errcap,
                        "timestamp must be less than the stream duration");
                return -2;
            }
            // targets = ms / stream_tb (NOT AV_TIME_BASE); no keyframe
            // fallback — the reference surfaces the raw seek error.
            int64_t ts = (int64_t)(timestamp_ms / time_base);
            int64_t min_ts = (int64_t)(min_ms / time_base);
            if (min_ts < 0) min_ts = 0;  // (reference panics for <1s seeks)
            int64_t max_ts = (int64_t)(max_ms / time_base);
            ret = avformat_seek_file(ctx, -1, min_ts, ts, max_ts, 0);
            if (ret < 0) {
                avcodec_free_context(&dec);
                avformat_close_input(&ctx);
                set_err(err, errcap, "seek failed: " + av_err_str(ret));
                return -1;
            }
            goto seek_done;
        }
        {
        // AVFormatContext.duration is in AV_TIME_BASE (microsecond) units,
        // NOT the stream time_base.
        double format_duration_ms = (double)ctx->duration / 1000.0;
        if (!(max_ms < format_duration_ms)) {
            // The reference asserts; we return a distinct error.
            avcodec_free_context(&dec);
            avformat_close_input(&ctx);
            set_err(err, errcap, "timestamp must be less than the stream duration");
            return -2;
        }
        // stream_index = -1 (like the reference's seek wrapper) means the
        // timestamps are in AV_TIME_BASE (microsecond) units.
        // Intentional divergence (mirrors the duration one above): the
        // reference computes seek targets as ms / stream-time_base
        // (audio/util.rs:18-27), which equals microseconds only for 1/1000
        // time bases (Matroska). We seek to the physically correct
        // AV_TIME_BASE position; for non-ms time bases (e.g. MP4 at
        // 1/44100) the reference lands at the wrong media time, so ending-
        // window hashes can differ from reference output there. This fixes
        // a reference bug at the cost of bug-for-bug output compatibility
        // for such containers (opt back in: NEEDLE_TPU_SEEK_COMPAT above).
        int64_t ts = (int64_t)(timestamp_ms * 1000.0);
        int64_t min_ts = (int64_t)(min_ms * 1000.0);
        if (min_ts < 0) min_ts = 0;
        int64_t max_ts = (int64_t)(max_ms * 1000.0);
        ret = avformat_seek_file(ctx, -1, min_ts, ts, max_ts, 0);
        if (ret < 0) {
            // Containers whose default stream has no keyframe inside the
            // +-1 s window (common for short MP4s) reject the bounded
            // seek; retry seeking backward to the nearest earlier
            // keyframe — extra leading audio is trimmed by pts filtering.
            ret = avformat_seek_file(ctx, -1, INT64_MIN, ts, ts, 0);
            if (ret >= 0) {
                // min window matches the strict seek's earliest acceptable pts
                seek_skip_ts = (int64_t)((min_ms / 1000.0) / time_base);
            }
        }
        if (ret < 0) {
            avcodec_free_context(&dec);
            avformat_close_input(&ctx);
            set_err(err, errcap, "seek failed: " + av_err_str(ret));
            return -1;
        }
        }
    seek_done:;
    }

    // End timestamp in stream tb units (analyzer.rs:196-199).
    bool has_end = duration_limit_secs >= 0;
    int64_t end_timestamp = 0;
    if (has_end) {
        double d = (seek_to_secs >= 0 ? seek_to_secs : 0.0) + duration_limit_secs;
        end_timestamp = (int64_t)(d / time_base);
    }

    Output out;
    out.samples.reserve(1 << 20);
    AVPacket *pkt = av_packet_alloc();
    AVFrame *frame = av_frame_alloc();
    AVFrame *scratch = av_frame_alloc();
    int rc = 0;
    std::string err_msg;

    while (av_read_frame(ctx, pkt) >= 0) {
        if (pkt->stream_index != stream_idx) {
            av_packet_unref(pkt);
            continue;
        }
        if (pkt->pts == AV_NOPTS_VALUE) {
            // The reference unwraps pts and would panic; treat as error.
            av_packet_unref(pkt);
            rc = -1;
            err_msg = "packet without pts";
            break;
        }
        if (has_end && pkt->pts >= end_timestamp) {
            av_packet_unref(pkt);
            break;  // take_while(pts < end)
        }
        if (pkt->pts <= 0) {
            av_packet_unref(pkt);
            continue;  // analyzer.rs:221-226
        }
        if (seek_skip_ts > 0 && pkt->pts + pkt->duration <= seek_skip_ts) {
            // The keyframe-fallback seek can land before the requested
            // timestamp; drop packets that end before it so hash
            // timestamps stay anchored to the seek target.
            av_packet_unref(pkt);
            continue;
        }
        ret = avcodec_send_packet(dec, pkt);
        av_packet_unref(pkt);
        if (ret < 0) {
            rc = -1;
            err_msg = "send_packet failed: " + av_err_str(ret);
            break;
        }
        while (avcodec_receive_frame(dec, frame) >= 0) {
            ret = resampler.convert_and_append(frame, scratch, out);
            av_frame_unref(frame);
            if (ret < 0) {
                rc = -1;
                err_msg = "resample failed: " + av_err_str(ret);
                break;
            }
        }
        if (rc != 0) break;
    }
    // NOTE: intentionally no avcodec EOF drain and no swr flush (reference
    // behavior: remaining buffered audio is dropped; chromaprint_finish only
    // flushes the fingerprinter's own FFT buffer).

    av_packet_free(&pkt);
    av_frame_free(&frame);
    av_frame_free(&scratch);
    avcodec_free_context(&dec);
    avformat_close_input(&ctx);

    if (rc != 0) {
        set_err(err, errcap, err_msg);
        return rc;
    }

    int64_t n = (int64_t)out.samples.size();
    int16_t *buf = (int16_t *)malloc(n ? n * sizeof(int16_t) : 2);
    if (!buf) {
        set_err(err, errcap, "out of memory");
        return -1;
    }
    if (n) std::memcpy(buf, out.samples.data(), n * sizeof(int16_t));
    *out_samples = buf;
    *out_n_samples = n;
    return 0;
}

// Resample arbitrary interleaved PCM to S16 interleaved stereo at out_rate.
// in_fmt: 0 = s16, 1 = f32. Used for pre-decoded PCM inputs (e.g. 16 kHz
// mono) so that the resample chain matches the reference's swresample path.
int ni_resample_pcm(const void *in, int64_t n_in_frames, int in_rate, int in_channels,
                    int in_fmt, int out_rate,
                    int16_t **out_samples, int64_t *out_n_samples,
                    char *err, int errcap) {
    AVSampleFormat fmt = in_fmt == 0 ? AV_SAMPLE_FMT_S16 : AV_SAMPLE_FMT_FLT;
    AVChannelLayout in_layout;
    av_channel_layout_default(&in_layout, in_channels);
    AVChannelLayout out_layout = AV_CHANNEL_LAYOUT_STEREO;

    SwrContext *swr = nullptr;
    int ret = swr_alloc_set_opts2(&swr, &out_layout, AV_SAMPLE_FMT_S16, out_rate,
                                  &in_layout, fmt, in_rate, 0, nullptr);
    av_channel_layout_uninit(&in_layout);
    if (ret < 0 || (ret = swr_init(swr)) < 0) {
        set_err(err, errcap, "swr init failed: " + av_err_str(ret));
        if (swr) swr_free(&swr);
        return -1;
    }

    int64_t max_out = av_rescale_rnd(n_in_frames + 4096, out_rate, in_rate, AV_ROUND_UP) + 4096;
    int16_t *buf = (int16_t *)malloc(max_out * 2 * sizeof(int16_t));
    if (!buf) {
        swr_free(&swr);
        set_err(err, errcap, "out of memory");
        return -1;
    }
    const uint8_t *in_planes[1] = {(const uint8_t *)in};
    uint8_t *out_planes[1] = {(uint8_t *)buf};
    int n1 = swr_convert(swr, out_planes, (int)max_out, in_planes, (int)n_in_frames);
    if (n1 < 0) {
        free(buf);
        swr_free(&swr);
        set_err(err, errcap, "swr_convert failed: " + av_err_str(n1));
        return -1;
    }
    uint8_t *out_planes2[1] = {(uint8_t *)(buf + (int64_t)n1 * 2)};
    int n2 = swr_convert(swr, out_planes2, (int)(max_out - n1), nullptr, 0);  // flush
    if (n2 < 0) n2 = 0;
    swr_free(&swr);
    *out_samples = buf;
    *out_n_samples = ((int64_t)n1 + n2) * 2;
    return 0;
}

// ---------------------------------------------------------------------------
// Fixed-point FIR decimator: i16 interleaved -> i16 interleaved at
// rate/factor, with Q14 integer taps and int32 accumulation. Exists so
// band-limited pre-upload decimation is CHEAP on the 1-core host (the
// scipy float FIR cost ~0.6 s per 15 min of audio; this runs ~20x faster
// via auto-vectorized integer MACs) and DETERMINISTIC (integer arithmetic
// is identical on every build/platform/thread schedule, so the same file
// always produces the same hashes — float FIRs vary in the last ulp with
// vectorization width). Taps come from the caller (one source of truth in
// fingerprint/decimate.py); output sample k is centered at input k*factor
// (linear-phase group delay pre-trimmed by the caller's tap layout), with
// zeros assumed outside the input, matching scipy.signal.upfirdn padding.
// ---------------------------------------------------------------------------
// Accumulator-typed worker: int32 MACs auto-vectorize best on the 1-core
// host and are exact while |acc| stays in range (max |acc| = L1(taps) *
// 32768); caller-supplied taps with a larger Q14 L1 norm route to the
// int64 instantiation so no tap set can silently overflow.
}  // pause extern "C": templates cannot have C linkage
template <typename ACC>
static void decimate_i16_acc(const int16_t *in, int64_t frames, int channels,
                             int factor, const int32_t *taps, int n_taps,
                             int H, int64_t out_frames, int16_t *out) {
    // interior region: all taps in bounds, no per-sample branch
    const int64_t k_lo = std::min<int64_t>((H + factor - 1) / factor, out_frames);
    const int64_t k_hi = std::max<int64_t>(
        k_lo, std::min<int64_t>(out_frames, (frames - 1 - H) / factor + 1));
    for (int c = 0; c < channels; c++) {
        for (int64_t k = 0; k < k_lo; k++) {
            const int64_t center = k * factor;
            ACC acc = 0;
            for (int j = 0; j < n_taps; j++) {
                const int64_t idx = center - H + j;
                if (idx >= 0 && idx < frames)
                    acc += (ACC)taps[j] * (ACC)in[idx * channels + c];
            }
            int32_t v = (int32_t)((acc + 8192) >> 14);
            out[k * channels + c] =
                (int16_t)std::min(32767, std::max(-32768, v));
        }
        for (int64_t k = k_lo; k < k_hi; k++) {
            const int16_t *base = in + (k * factor - H) * channels + c;
            ACC acc = 0;
            for (int j = 0; j < n_taps; j++)
                acc += (ACC)taps[j] * (ACC)base[(int64_t)j * channels];
            int32_t v = (int32_t)((acc + 8192) >> 14);
            out[k * channels + c] =
                (int16_t)std::min(32767, std::max(-32768, v));
        }
        for (int64_t k = k_hi; k < out_frames; k++) {
            const int64_t center = k * factor;
            ACC acc = 0;
            for (int j = 0; j < n_taps; j++) {
                const int64_t idx = center - H + j;
                if (idx >= 0 && idx < frames)
                    acc += (ACC)taps[j] * (ACC)in[idx * channels + c];
            }
            int32_t v = (int32_t)((acc + 8192) >> 14);
            out[k * channels + c] =
                (int16_t)std::min(32767, std::max(-32768, v));
        }
    }
}

extern "C" {
int ni_decimate_i16(const int16_t *in, int64_t n_samples, int channels,
                    int factor, const int32_t *taps, int n_taps,
                    int16_t **out_samples, int64_t *out_n,
                    char *err, int errcap) {
    if (channels < 1 || factor < 1 || n_taps < 1 || (n_taps & 1) == 0) {
        set_err(err, errcap, "bad decimator params");
        return -1;
    }
    const int64_t frames = n_samples / channels;
    const int64_t out_frames = frames / factor;
    const int H = (n_taps - 1) / 2;
    int16_t *out = (int16_t *)malloc(
        (size_t)std::max<int64_t>(out_frames * channels, 1) * sizeof(int16_t));
    if (!out) {
        set_err(err, errcap, "out of memory");
        return -1;
    }
    int64_t l1 = 0;
    for (int j = 0; j < n_taps; j++) l1 += std::abs((int64_t)taps[j]);
    const bool fits_i32 = l1 * 32768 + 8192 <= (int64_t)INT32_MAX;
    if (fits_i32)
        decimate_i16_acc<int32_t>(in, frames, channels, factor, taps, n_taps,
                                  H, out_frames, out);
    else
        decimate_i16_acc<int64_t>(in, frames, channels, factor, taps, n_taps,
                                  H, out_frames, out);
    *out_samples = out;
    *out_n = out_frames * channels;
    return 0;
}

// Specialized factor-2 half-band decimator: a half-band FIR has every even
// tap zero except the center, and the odd taps are symmetric, so
//   y[k] = c0*x[2k] + sum_m odd[m] * (x[2k-(2m+1)] + x[2k+(2m+1)])
// needs n_odd+1 multiplies instead of 4*n_odd+1 — the generic kernel can't
// exploit either structure. Factor-4 decimation cascades two of these.
int ni_decimate2_hb(const int16_t *in, int64_t n_samples, int channels,
                    const int32_t *odd_taps, int n_odd, int32_t center_q14,
                    int16_t **out_samples, int64_t *out_n,
                    char *err, int errcap) {
    if (channels < 1 || n_odd < 1) {
        set_err(err, errcap, "bad halfband params");
        return -1;
    }
    const int64_t frames = n_samples / channels;
    const int64_t out_frames = frames / 2;
    const int H = 2 * n_odd - 1;  // largest reach from the center
    int16_t *out = (int16_t *)malloc(
        (size_t)std::max<int64_t>(out_frames * channels, 1) * sizeof(int16_t));
    if (!out) {
        set_err(err, errcap, "out of memory");
        return -1;
    }
    const int64_t k_lo = std::min<int64_t>((H + 1) / 2, out_frames);
    const int64_t k_hi = std::max<int64_t>(
        k_lo, std::min<int64_t>(out_frames, (frames - 1 - H) / 2 + 1));
    auto edge = [&](int64_t k, int c) {
        const int64_t center = 2 * k;
        int64_t acc = (int64_t)center_q14 * in[center * channels + c];
        for (int m = 0; m < n_odd; m++) {
            const int64_t d = 2 * m + 1;
            int32_t a = (center - d >= 0) ? in[(center - d) * channels + c] : 0;
            int32_t b = (center + d < frames) ? in[(center + d) * channels + c] : 0;
            acc += (int64_t)odd_taps[m] * (a + b);
        }
        int32_t v = (int32_t)((acc + 8192) >> 14);
        out[k * channels + c] = (int16_t)std::min(32767, std::max(-32768, v));
    };
    // Interior fast path: deinterleave the ODD samples per channel so the
    // 28-times-read tap accesses are unit-stride. The natural stride-2
    // form defeats auto-vectorization (gathers), and this FIR was measured
    // as the analyze bottleneck on the 1-core host (~11 s CPU per
    // 28-episode season at r3, dominating a 14 s analyze wall). In the
    // deinterleaved view y[k] = c0*even[k] + sum_m q[m]*(odd[k-m-1] +
    // odd[k+m]) — every inner loop below is a unit-stride int32 MAC the
    // compiler vectorizes. The EVEN samples are read exactly once (the
    // acc-init pass), so for mono input they are read strided in place
    // instead of copied: dropping that copy pass measured +31%
    // (314 -> 410 Msamp/s interleaved A/B, g++ 12 -march=native AVX-512).
    // Index bounds: k-m-1 >= k_lo - n_odd = 0 and k+m <= k_hi-1+n_odd-1
    // < frames/2, so no branches are needed in the interior.
    const int64_t half = frames / 2;
    const bool mono = channels == 1;
    int16_t *deint = nullptr;
    if (k_hi > k_lo)
        deint = (int16_t *)malloc(
            (size_t)std::max<int64_t>(half, 1) * (mono ? 1 : 2) *
            sizeof(int16_t));
    for (int c = 0; c < channels; c++) {
        for (int64_t k = 0; k < k_lo; k++) edge(k, c);
        if (k_hi > k_lo && deint) {
            int16_t *ev = mono ? nullptr : deint;
            int16_t *od = mono ? deint : deint + half;
            if (mono) {
                for (int64_t t = 0; t < half; t++) od[t] = in[2 * t + 1];
            } else {
                for (int64_t t = 0; t < half; t++) {
                    ev[t] = in[(2 * t) * channels + c];
                    od[t] = in[(2 * t + 1) * channels + c];
                }
            }
            constexpr int64_t BLK = 8192;
            int32_t acc[BLK];
            for (int64_t k0 = k_lo; k0 < k_hi; k0 += BLK) {
                const int64_t n = std::min<int64_t>(BLK, k_hi - k0);
                if (mono) {
                    const int16_t *e0 = in + 2 * k0;
                    for (int64_t i = 0; i < n; i++)
                        acc[i] = center_q14 * (int32_t)e0[2 * i];
                } else {
                    const int16_t *e0 = ev + k0;
                    for (int64_t i = 0; i < n; i++)
                        acc[i] = center_q14 * (int32_t)e0[i];
                }
                for (int m = 0; m < n_odd; m++) {
                    const int32_t q = odd_taps[m];
                    const int16_t *pa = od + k0 - m - 1;
                    const int16_t *pb = od + k0 + m;
                    for (int64_t i = 0; i < n; i++)
                        acc[i] += q * ((int32_t)pa[i] + (int32_t)pb[i]);
                }
                if (channels == 1) {
                    int16_t *op = out + k0;
                    for (int64_t i = 0; i < n; i++) {
                        int32_t v = (acc[i] + 8192) >> 14;
                        op[i] = (int16_t)std::min(32767, std::max(-32768, v));
                    }
                } else {
                    for (int64_t i = 0; i < n; i++) {
                        int32_t v = (acc[i] + 8192) >> 14;
                        out[(k0 + i) * channels + c] =
                            (int16_t)std::min(32767, std::max(-32768, v));
                    }
                }
            }
        } else {
            for (int64_t k = k_lo; k < k_hi; k++) {
                const int16_t *ctr = in + 2 * k * channels + c;
                int32_t acc1 = center_q14 * (int32_t)ctr[0];
                for (int m = 0; m < n_odd; m++) {
                    const int64_t d = (int64_t)(2 * m + 1) * channels;
                    acc1 += odd_taps[m] * ((int32_t)ctr[-d] + (int32_t)ctr[d]);
                }
                int32_t v = (acc1 + 8192) >> 14;
                out[k * channels + c] =
                    (int16_t)std::min(32767, std::max(-32768, v));
            }
        }
        for (int64_t k = k_hi; k < out_frames; k++) edge(k, c);
    }
    free(deint);
    *out_samples = out;
    *out_n = out_frames * channels;
    return 0;
}

// ---------------------------------------------------------------------------
// Test-fixture muxer: encode interleaved i16 PCM into a real container
// (format inferred from the path extension, codec by name: "pcm_s16le",
// "aac", "mp2", ...). Exists so the test suite can synthesize mkv/mp4/mp2
// fixtures for the decode/seek/InputChanged paths without an ffmpeg CLI
// binary (there is none in this environment). Not part of the needle API
// surface (the reference ships prebuilt mp4 resources instead).
// ---------------------------------------------------------------------------
int ni_write_media(const char *path, const char *codec_name,
                   const int16_t *pcm, int64_t n_in_frames, int rate,
                   int channels, int with_video, char *err, int errcap) {
    AVFormatContext *oc = nullptr;
    int ret = avformat_alloc_output_context2(&oc, nullptr, nullptr, path);
    if (ret < 0 || !oc) {
        set_err(err, errcap, "no muxer for path: " + av_err_str(ret));
        return -1;
    }
    const AVCodec *codec = avcodec_find_encoder_by_name(codec_name);
    if (!codec) {
        avformat_free_context(oc);
        set_err(err, errcap, std::string("no encoder: ") + codec_name);
        return -1;
    }
    AVCodecContext *enc = avcodec_alloc_context3(codec);
    enc->sample_rate = rate;
    av_channel_layout_default(&enc->ch_layout, channels);
    enc->sample_fmt = codec->sample_fmts ? codec->sample_fmts[0] : AV_SAMPLE_FMT_S16;
    enc->time_base = AVRational{1, rate};
    enc->bit_rate = 128000 * channels;
    if (oc->oformat->flags & AVFMT_GLOBALHEADER)
        enc->flags |= AV_CODEC_FLAG_GLOBAL_HEADER;
    if ((ret = avcodec_open2(enc, codec, nullptr)) < 0) {
        avcodec_free_context(&enc);
        avformat_free_context(oc);
        set_err(err, errcap, "encoder open failed: " + av_err_str(ret));
        return -1;
    }
    AVStream *st = avformat_new_stream(oc, nullptr);
    st->time_base = enc->time_base;
    avcodec_parameters_from_context(st->codecpar, enc);

    // Optional 16x16 mjpeg video track (1 fps): real episode containers
    // have a video stream, and the reference's validity check requires one
    // (util.rs:40-52), so fixtures exercising the CLI path need it too.
    AVCodecContext *venc = nullptr;
    AVStream *vst = nullptr;
    if (with_video) {
        const AVCodec *vcodec = avcodec_find_encoder_by_name("mjpeg");
        if (vcodec) {
            venc = avcodec_alloc_context3(vcodec);
            venc->width = 16;
            venc->height = 16;
            venc->pix_fmt = AV_PIX_FMT_YUVJ420P;
            venc->time_base = AVRational{1, 1};
            venc->framerate = AVRational{1, 1};
            if (oc->oformat->flags & AVFMT_GLOBALHEADER)
                venc->flags |= AV_CODEC_FLAG_GLOBAL_HEADER;
            if (avcodec_open2(venc, vcodec, nullptr) < 0) {
                avcodec_free_context(&venc);
            } else {
                vst = avformat_new_stream(oc, nullptr);
                vst->time_base = venc->time_base;
                avcodec_parameters_from_context(vst->codecpar, venc);
            }
        }
    }

    // i16 interleaved -> whatever the encoder wants (e.g. fltp for aac)
    AVChannelLayout in_layout;
    av_channel_layout_default(&in_layout, channels);
    SwrContext *swr = nullptr;
    ret = swr_alloc_set_opts2(&swr, &enc->ch_layout, enc->sample_fmt, rate,
                              &in_layout, AV_SAMPLE_FMT_S16, rate, 0, nullptr);
    av_channel_layout_uninit(&in_layout);
    if (ret < 0 || (ret = swr_init(swr)) < 0) {
        if (swr) swr_free(&swr);
        avcodec_free_context(&enc);
        avformat_free_context(oc);
        set_err(err, errcap, "fixture swr init failed: " + av_err_str(ret));
        return -1;
    }

    bool io_open = false;
    AVFrame *frame = av_frame_alloc();
    AVPacket *pkt = av_packet_alloc();
    int frame_size = enc->frame_size > 0 ? enc->frame_size : 4096;
    int64_t pos = 0, pts = 0;
    std::string fail;

    auto drain = [&](bool flush) -> int {
        int r = avcodec_send_frame(enc, flush ? nullptr : frame);
        if (r < 0) return r;
        while ((r = avcodec_receive_packet(enc, pkt)) >= 0) {
            av_packet_rescale_ts(pkt, enc->time_base, st->time_base);
            pkt->stream_index = st->index;
            r = av_interleaved_write_frame(oc, pkt);
            av_packet_unref(pkt);
            if (r < 0) return r;
        }
        return (r == AVERROR(EAGAIN) || r == AVERROR_EOF) ? 0 : r;
    };

    do {
        if (!(oc->oformat->flags & AVFMT_NOFILE)) {
            if ((ret = avio_open(&oc->pb, path, AVIO_FLAG_WRITE)) < 0) {
                fail = "avio_open failed: " + av_err_str(ret);
                break;
            }
            io_open = true;
        }
        if ((ret = avformat_write_header(oc, nullptr)) < 0) {
            fail = "write_header failed: " + av_err_str(ret);
            break;
        }
        AVFrame *vf = nullptr;
        int v_next = 0;  // next video pts (seconds) to emit
        if (venc && vst) {
            vf = av_frame_alloc();
            vf->width = 16;
            vf->height = 16;
            vf->format = AV_PIX_FMT_YUVJ420P;
            av_frame_get_buffer(vf, 0);
            for (int y = 0; y < 16; y++)
                memset(vf->data[0] + y * vf->linesize[0], 128, 16);
            for (int y = 0; y < 8; y++) {
                memset(vf->data[1] + y * vf->linesize[1], 128, 8);
                memset(vf->data[2] + y * vf->linesize[2], 128, 8);
            }
        }
        // Emit 1 fps video frames interleaved with the audio timeline (a
        // burst of all-video-first overflows the muxer's interleave window
        // and produces files whose clusters pair late video with early
        // audio, breaking time-based seeks).
        auto emit_video_until = [&](double t_secs) -> int {
            if (!vf) return 0;
            while (v_next <= (int)t_secs) {
                vf->pts = v_next++;
                int r = avcodec_send_frame(venc, vf);
                while (r >= 0 && (r = avcodec_receive_packet(venc, pkt)) >= 0) {
                    av_packet_rescale_ts(pkt, venc->time_base, vst->time_base);
                    pkt->stream_index = vst->index;
                    r = av_interleaved_write_frame(oc, pkt);
                    av_packet_unref(pkt);
                }
                if (r < 0 && r != AVERROR(EAGAIN) && r != AVERROR_EOF)
                    return r;
            }
            return 0;
        };
        while (pos < n_in_frames) {
            if ((ret = emit_video_until((double)pos / rate)) < 0) {
                fail = "video encode failed: " + av_err_str(ret);
                break;
            }
            int n = (int)std::min<int64_t>(frame_size, n_in_frames - pos);
            av_frame_unref(frame);
            frame->nb_samples = n;
            frame->format = enc->sample_fmt;
            frame->sample_rate = rate;
            av_channel_layout_copy(&frame->ch_layout, &enc->ch_layout);
            if ((ret = av_frame_get_buffer(frame, 0)) < 0) {
                fail = "frame alloc failed: " + av_err_str(ret);
                break;
            }
            const uint8_t *in_planes[1] = {
                (const uint8_t *)(pcm + pos * channels)};
            ret = swr_convert(swr, frame->data, n, in_planes, n);
            if (ret < 0) {
                fail = "fixture swr_convert failed: " + av_err_str(ret);
                break;
            }
            frame->nb_samples = ret;
            frame->pts = pts;
            pts += ret;
            pos += n;
            if ((ret = drain(false)) < 0) {
                fail = "encode failed: " + av_err_str(ret);
                break;
            }
        }
        if (fail.empty()) {
            if ((ret = emit_video_until((double)n_in_frames / rate)) < 0)
                fail = "video encode failed: " + av_err_str(ret);
            else if ((ret = drain(true)) < 0)
                fail = "encoder flush failed: " + av_err_str(ret);
            else if ((ret = av_write_trailer(oc)) < 0)
                fail = "write_trailer failed: " + av_err_str(ret);
        }
        if (vf) av_frame_free(&vf);
    } while (false);

    av_packet_free(&pkt);
    av_frame_free(&frame);
    swr_free(&swr);
    avcodec_free_context(&enc);
    if (venc) avcodec_free_context(&venc);
    if (io_open) avio_closep(&oc->pb);
    avformat_free_context(oc);
    if (!fail.empty()) {
        set_err(err, errcap, fail);
        return -1;
    }
    return 0;
}

}  // extern "C"
