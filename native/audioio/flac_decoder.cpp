// Native FLAC decoder for audio_sheet_retrieval_tpu.
//
// The reference stack decodes MSMD's .flac performances through
// madmom -> ffmpeg (reference:audio_sheet_server.py:632); neither exists in
// this environment, so the framework ships its own decoder. Scope: FLAC
// subset used by encoded PCM music — CONSTANT / VERBATIM / FIXED / LPC
// subframes, RICE and RICE2 residual coding, independent / left-side /
// right-side / mid-side stereo decorrelation, 8/12/16/20/24-bit samples.
// CRCs are parsed but not enforced (garbage input still fails via structure
// checks). Output is int16 interleaved PCM (higher bit depths are shifted
// down, lower shifted up).
//
// Build: python native/audioio/build.py  (g++ -O2 -shared -fPIC)
// Python binding: ctypes (audio_sheet_retrieval_tpu/utils/flac_native.py).

#include <cstdint>
#include <cstdlib>
#include <cstring>
#include <vector>

namespace {

struct BitReader {
  const uint8_t* data;
  size_t size;
  size_t byte_pos = 0;
  int bit_pos = 0;  // 0..7, MSB first
  bool error = false;

  BitReader(const uint8_t* d, size_t n) : data(d), size(n) {}

  bool eof() const { return byte_pos >= size; }

  uint64_t read_bits(int n) {
    uint64_t v = 0;
    while (n > 0) {
      if (byte_pos >= size) {
        error = true;
        return 0;
      }
      int avail = 8 - bit_pos;
      int take = n < avail ? n : avail;
      uint8_t chunk = (data[byte_pos] >> (avail - take)) & ((1u << take) - 1);
      v = (v << take) | chunk;
      bit_pos += take;
      n -= take;
      if (bit_pos == 8) {
        bit_pos = 0;
        byte_pos++;
      }
    }
    return v;
  }

  int64_t read_signed(int n) {
    uint64_t v = read_bits(n);
    // sign-extend
    if (n > 0 && (v >> (n - 1)) & 1u) v |= ~((1ull << n) - 1);
    return (int64_t)v;
  }

  // unary: count zero bits until a one bit
  uint32_t read_unary() {
    uint32_t q = 0;
    while (true) {
      if (byte_pos >= size) {
        error = true;
        return 0;
      }
      if (read_bits(1)) return q;
      if (++q > 1u << 24) {  // corrupt stream guard
        error = true;
        return 0;
      }
    }
  }

  void align_to_byte() {
    if (bit_pos != 0) {
      bit_pos = 0;
      byte_pos++;
    }
  }
};

// extended UTF-8 coded number (frame header sample/frame number)
bool skip_utf8_number(BitReader& br) {
  uint32_t b0 = (uint32_t)br.read_bits(8);
  if (br.error) return false;
  int extra = 0;
  if (b0 < 0x80) {
    extra = 0;
  } else {
    uint8_t mask = 0x40;
    while (b0 & mask) {
      extra++;
      mask >>= 1;
    }
    if (extra < 1 || extra > 6) return false;
  }
  for (int i = 0; i < extra; i++) {
    uint32_t b = (uint32_t)br.read_bits(8);
    if (br.error || (b & 0xC0) != 0x80) return false;
  }
  return true;
}

bool decode_residual(BitReader& br, int block_size, int pred_order,
                     std::vector<int64_t>& out /* block_size entries */) {
  int method = (int)br.read_bits(2);
  if (method > 1 || br.error) return false;
  int param_bits = method == 0 ? 4 : 5;
  int escape = method == 0 ? 0xF : 0x1F;
  int part_order = (int)br.read_bits(4);
  int n_parts = 1 << part_order;
  if (block_size % n_parts != 0) return false;
  int part_len = block_size >> part_order;
  int idx = pred_order;
  for (int p = 0; p < n_parts; p++) {
    int count = part_len - (p == 0 ? pred_order : 0);
    if (count < 0) return false;
    int param = (int)br.read_bits(param_bits);
    if (br.error) return false;
    if (param == escape) {
      int raw_bits = (int)br.read_bits(5);
      for (int i = 0; i < count; i++)
        out[idx++] = raw_bits ? br.read_signed(raw_bits) : 0;
    } else {
      for (int i = 0; i < count; i++) {
        uint32_t q = br.read_unary();
        uint64_t r = param ? br.read_bits(param) : 0;
        uint64_t u = ((uint64_t)q << param) | r;
        // zigzag decode
        out[idx++] = (int64_t)(u >> 1) ^ -(int64_t)(u & 1);
      }
    }
    if (br.error) return false;
  }
  return true;
}

const int kFixedCoeffs[5][4] = {
    {}, {1}, {2, -1}, {3, -3, 1}, {4, -6, 4, -1}};

bool decode_subframe(BitReader& br, int block_size, int bps,
                     std::vector<int64_t>& samples) {
  if (br.read_bits(1) != 0) return false;  // zero padding bit
  int type = (int)br.read_bits(6);
  int wasted = 0;
  if (br.read_bits(1)) wasted = 1 + (int)br.read_unary();
  if (br.error) return false;
  bps -= wasted;
  samples.assign(block_size, 0);

  if (type == 0) {  // CONSTANT
    int64_t v = br.read_signed(bps);
    for (int i = 0; i < block_size; i++) samples[i] = v;
  } else if (type == 1) {  // VERBATIM
    for (int i = 0; i < block_size; i++) samples[i] = br.read_signed(bps);
  } else if (type >= 8 && type <= 12) {  // FIXED, order 0-4
    int order = type - 8;
    for (int i = 0; i < order; i++) samples[i] = br.read_signed(bps);
    if (!decode_residual(br, block_size, order, samples)) return false;
    for (int i = order; i < block_size; i++) {
      int64_t pred = 0;
      for (int j = 0; j < order; j++)
        pred += (int64_t)kFixedCoeffs[order][j] * samples[i - 1 - j];
      samples[i] += pred;
    }
  } else if (type >= 32) {  // LPC, order 1-32
    int order = (type & 31) + 1;
    for (int i = 0; i < order; i++) samples[i] = br.read_signed(bps);
    int precision = (int)br.read_bits(4) + 1;
    if (precision == 16) return false;  // invalid code 0b1111
    int shift = (int)br.read_signed(5);
    if (shift < 0) return false;
    std::vector<int64_t> coeffs(order);
    for (int i = 0; i < order; i++) coeffs[i] = br.read_signed(precision);
    if (!decode_residual(br, block_size, order, samples)) return false;
    for (int i = order; i < block_size; i++) {
      int64_t pred = 0;
      for (int j = 0; j < order; j++) pred += coeffs[j] * samples[i - 1 - j];
      samples[i] += pred >> shift;
    }
  } else {
    return false;  // reserved type
  }
  if (br.error) return false;
  if (wasted)
    for (int i = 0; i < block_size; i++) samples[i] <<= wasted;
  return true;
}

}  // namespace

extern "C" {

// Decode an in-memory FLAC stream to interleaved int16 PCM.
// Returns 0 on success. *out_samples is malloc'd (n_frames * channels);
// free with asr_free.
int asr_flac_decode(const uint8_t* data, size_t size, int16_t** out_samples,
                    int64_t* out_frames, int* out_channels,
                    int* out_sample_rate) {
  if (size < 42 || memcmp(data, "fLaC", 4) != 0) return -1;
  size_t pos = 4;

  int channels = 0, bps = 0, sample_rate = 0;
  uint64_t total_samples = 0;
  bool have_streaminfo = false;

  // metadata blocks
  while (pos + 4 <= size) {
    uint8_t hdr = data[pos];
    bool last = hdr & 0x80;
    int type = hdr & 0x7F;
    uint32_t len =
        (data[pos + 1] << 16) | (data[pos + 2] << 8) | data[pos + 3];
    pos += 4;
    if (pos + len > size) return -2;
    if (type == 0 && len >= 34) {  // STREAMINFO
      const uint8_t* s = data + pos;
      sample_rate = (s[10] << 12) | (s[11] << 4) | (s[12] >> 4);
      channels = ((s[12] >> 1) & 0x7) + 1;
      bps = (((s[12] & 1) << 4) | (s[13] >> 4)) + 1;
      total_samples = ((uint64_t)(s[13] & 0xF) << 32) | ((uint64_t)s[14] << 24) |
                      (s[15] << 16) | (s[16] << 8) | s[17];
      have_streaminfo = true;
    }
    pos += len;
    if (last) break;
  }
  if (!have_streaminfo || channels < 1 || channels > 8 || sample_rate <= 0)
    return -3;

  std::vector<int16_t> pcm;
  if (total_samples) pcm.reserve((size_t)total_samples * channels);

  BitReader br(data + pos, size - pos);
  std::vector<std::vector<int64_t>> chan(channels);

  while (!br.eof()) {
    // tolerate trailing padding bytes
    size_t frame_start = br.byte_pos;
    uint32_t sync = (uint32_t)br.read_bits(14);
    if (br.error) break;
    if (sync != 0x3FFE) {
      if (frame_start + 2 >= br.size) break;  // trailing garbage at EOF
      return -4;
    }
    br.read_bits(1);  // reserved
    br.read_bits(1);  // blocking strategy
    int bs_code = (int)br.read_bits(4);
    int sr_code = (int)br.read_bits(4);
    int ch_asgn = (int)br.read_bits(4);
    int ss_code = (int)br.read_bits(3);
    br.read_bits(1);  // reserved
    if (!skip_utf8_number(br)) return -5;

    int block_size;
    switch (bs_code) {
      case 1: block_size = 192; break;
      case 2: case 3: case 4: case 5:
        block_size = 576 << (bs_code - 2); break;
      case 6: block_size = (int)br.read_bits(8) + 1; break;
      case 7: block_size = (int)br.read_bits(16) + 1; break;
      default:
        if (bs_code >= 8) block_size = 256 << (bs_code - 8);
        else return -6;  // 0 is reserved
    }
    if (sr_code == 12) br.read_bits(8);
    else if (sr_code == 13 || sr_code == 14) br.read_bits(16);

    int frame_bps;
    switch (ss_code) {
      case 0: frame_bps = bps; break;
      case 1: frame_bps = 8; break;
      case 2: frame_bps = 12; break;
      case 4: frame_bps = 16; break;
      case 5: frame_bps = 20; break;
      case 6: frame_bps = 24; break;
      default: return -7;
    }
    br.read_bits(8);  // header CRC-8 (not enforced)
    if (br.error) return -8;

    int n_ch = channels;
    if (ch_asgn >= 8 && ch_asgn <= 10) {
      if (channels != 2) return -9;
      n_ch = 2;
    } else if (ch_asgn != channels - 1) {
      return -9;
    }

    for (int c = 0; c < n_ch; c++) {
      int sub_bps = frame_bps;
      // side channels carry one extra bit
      if ((ch_asgn == 8 && c == 1) || (ch_asgn == 9 && c == 0) ||
          (ch_asgn == 10 && c == 1))
        sub_bps += 1;
      if (!decode_subframe(br, block_size, sub_bps, chan[c])) return -10;
    }
    br.align_to_byte();
    br.read_bits(16);  // frame CRC-16 (not enforced)
    if (br.error) return -11;

    // stereo decorrelation
    if (ch_asgn == 8) {  // left/side
      for (int i = 0; i < block_size; i++) chan[1][i] = chan[0][i] - chan[1][i];
    } else if (ch_asgn == 9) {  // right/side: left = right + side
      for (int i = 0; i < block_size; i++) {
        int64_t side = chan[0][i], right = chan[1][i];
        chan[0][i] = right + side;
      }
    } else if (ch_asgn == 10) {  // mid/side
      for (int i = 0; i < block_size; i++) {
        int64_t mid = chan[0][i], side = chan[1][i];
        mid = (mid << 1) | (side & 1);
        chan[0][i] = (mid + side) >> 1;
        chan[1][i] = (mid - side) >> 1;
      }
    }

    int shift = frame_bps - 16;  // convert to int16
    for (int i = 0; i < block_size; i++) {
      for (int c = 0; c < channels; c++) {
        int64_t v = chan[c][i];
        v = shift >= 0 ? (v >> shift) : (v << -shift);
        if (v > 32767) v = 32767;
        if (v < -32768) v = -32768;
        pcm.push_back((int16_t)v);
      }
    }
    if (total_samples && pcm.size() >= total_samples * channels) break;
  }

  if (total_samples && pcm.size() > total_samples * channels)
    pcm.resize((size_t)(total_samples * channels));

  int64_t n_frames = (int64_t)(pcm.size() / channels);
  int16_t* out = (int16_t*)malloc(pcm.size() * sizeof(int16_t));
  if (!out) return -12;
  memcpy(out, pcm.data(), pcm.size() * sizeof(int16_t));
  *out_samples = out;
  *out_frames = n_frames;
  *out_channels = channels;
  *out_sample_rate = sample_rate;
  return 0;
}

void asr_free(void* p) { free(p); }

const char* asr_audioio_version() { return "asr-audioio-1.0"; }

}  // extern "C"
