// MPEG audio (mp3) decoding for the audio ingest path.
//
// The reference pipeline decodes mp3 performances through madmom -> ffmpeg
// (reference:audio_sheet_retrieval/audio_sheet_server.py loads audio via
// madmom's SignalProcessor, which shells out to ffmpeg). This image ships no
// ffmpeg binary, but the system provides libmpg123 — the canonical, heavily
// optimized MPEG decoder. We bind it lazily via dlopen so libasraudio.so
// itself has no hard link-time dependency: on systems without libmpg123 the
// entry point reports "unavailable" (rc=1) and callers fall back to wav/flac.
//
// Output contract matches asr_flac_decode: interleaved int16 PCM, caller
// frees with asr_free().

#include <cstdint>
#include <cstdlib>
#include <cstring>
#include <vector>

#include <dlfcn.h>

namespace {

typedef void mpg123_handle;

struct Mpg123 {
  void* lib = nullptr;
  int (*init)(void) = nullptr;
  mpg123_handle* (*make)(const char*, int*) = nullptr;
  void (*destroy)(mpg123_handle*) = nullptr;
  int (*open_feed)(mpg123_handle*) = nullptr;
  int (*feed)(mpg123_handle*, const unsigned char*, size_t) = nullptr;
  int (*read)(mpg123_handle*, unsigned char*, size_t, size_t*) = nullptr;
  int (*getformat)(mpg123_handle*, long*, int*, int*) = nullptr;
  int (*format_none)(mpg123_handle*) = nullptr;
  int (*format)(mpg123_handle*, long, int, int) = nullptr;
  int (*close)(mpg123_handle*) = nullptr;
  bool ok = false;
};

// mpg123.h constants (stable public ABI)
constexpr int MPG123_OK = 0;
constexpr int MPG123_NEED_MORE = -10;
constexpr int MPG123_NEW_FORMAT = -11;
constexpr int MPG123_DONE = -12;
constexpr int MPG123_ENC_SIGNED_16 = 0xD0;
constexpr int MPG123_MONO = 1;
constexpr int MPG123_STEREO = 2;

Mpg123& load_mpg123() {
  static Mpg123 m = [] {
    Mpg123 r;
    r.lib = dlopen("libmpg123.so.0", RTLD_NOW | RTLD_LOCAL);
    if (!r.lib) r.lib = dlopen("libmpg123.so", RTLD_NOW | RTLD_LOCAL);
    if (!r.lib) return r;
    auto sym = [&](const char* name) { return dlsym(r.lib, name); };
    r.init = reinterpret_cast<int (*)(void)>(sym("mpg123_init"));
    r.make = reinterpret_cast<mpg123_handle* (*)(const char*, int*)>(
        sym("mpg123_new"));
    r.destroy =
        reinterpret_cast<void (*)(mpg123_handle*)>(sym("mpg123_delete"));
    r.open_feed =
        reinterpret_cast<int (*)(mpg123_handle*)>(sym("mpg123_open_feed"));
    r.feed = reinterpret_cast<int (*)(mpg123_handle*, const unsigned char*,
                                      size_t)>(sym("mpg123_feed"));
    r.read = reinterpret_cast<int (*)(mpg123_handle*, unsigned char*, size_t,
                                      size_t*)>(sym("mpg123_read"));
    r.getformat = reinterpret_cast<int (*)(mpg123_handle*, long*, int*, int*)>(
        sym("mpg123_getformat"));
    r.format_none =
        reinterpret_cast<int (*)(mpg123_handle*)>(sym("mpg123_format_none"));
    r.format = reinterpret_cast<int (*)(mpg123_handle*, long, int, int)>(
        sym("mpg123_format"));
    r.close = reinterpret_cast<int (*)(mpg123_handle*)>(sym("mpg123_close"));
    r.ok = r.init && r.make && r.destroy && r.open_feed && r.feed && r.read &&
           r.getformat && r.format_none && r.format && r.close;
    if (r.ok && r.init() != MPG123_OK) r.ok = false;
    return r;
  }();
  return m;
}

}  // namespace

extern "C" {

void asr_free(void* p);  // defined in flac_decoder.cpp (same .so)

// Decode an MPEG audio stream (Layer I/II/III, any MPEG-1/2/2.5 variant
// libmpg123 supports). Returns 0 on success, 1 if libmpg123 is unavailable,
// 2 on decode failure.
int asr_mp3_decode(const uint8_t* data, size_t size, int16_t** out_samples,
                   int64_t* out_frames, int* out_channels, int* out_rate) {
  *out_samples = nullptr;
  *out_frames = 0;
  *out_channels = 0;
  *out_rate = 0;
  Mpg123& m = load_mpg123();
  if (!m.ok) return 1;

  int err = 0;
  mpg123_handle* h = m.make(nullptr, &err);
  if (!h) return 2;

  // Constrain output to interleaved signed 16-bit at the stream's native
  // rate/channel count (no resampling here; utils/audio.resample handles
  // rate conversion on device, like the reference's madmom path).
  m.format_none(h);
  static const long kRates[] = {8000,  11025, 12000, 16000, 22050,
                                24000, 32000, 44100, 48000};
  for (long rate : kRates)
    m.format(h, rate, MPG123_MONO | MPG123_STEREO, MPG123_ENC_SIGNED_16);

  if (m.open_feed(h) != MPG123_OK || m.feed(h, data, size) != MPG123_OK) {
    m.close(h);
    m.destroy(h);
    return 2;
  }

  std::vector<int16_t> pcm;
  long rate = 0;
  int channels = 0;
  bool got_format = false;
  std::vector<unsigned char> buf(1 << 18);
  for (;;) {
    size_t done = 0;
    int rc = m.read(h, buf.data(), buf.size(), &done);
    if (done) {
      size_t n = done / sizeof(int16_t);
      const int16_t* s = reinterpret_cast<const int16_t*>(buf.data());
      pcm.insert(pcm.end(), s, s + n);
    }
    if (rc == MPG123_NEW_FORMAT) {
      int enc = 0;
      if (m.getformat(h, &rate, &channels, &enc) != MPG123_OK ||
          enc != MPG123_ENC_SIGNED_16 || (got_format && !pcm.empty())) {
        // mid-stream format switches would corrupt the interleaving
        m.close(h);
        m.destroy(h);
        return 2;
      }
      got_format = true;
    } else if (rc == MPG123_NEED_MORE || rc == MPG123_DONE) {
      break;  // all input was fed up front: NEED_MORE == end of stream
    } else if (rc != MPG123_OK) {
      m.close(h);
      m.destroy(h);
      return 2;
    }
  }
  m.close(h);
  m.destroy(h);
  if (!got_format || pcm.empty() || channels <= 0) return 2;

  int16_t* out =
      static_cast<int16_t*>(std::malloc(pcm.size() * sizeof(int16_t)));
  if (!out) return 2;
  std::memcpy(out, pcm.data(), pcm.size() * sizeof(int16_t));
  *out_samples = out;
  *out_frames = static_cast<int64_t>(pcm.size() / channels);
  *out_channels = channels;
  *out_rate = static_cast<int>(rate);
  return 0;
}

}  // extern "C"
