// Batch interleaved-stream rANS encoder (wire format of ops/rans.py).
//
// The host-side encode is the client-encode hot loop of the serving wire
// (bench.py's emb_per_s_incl_client_encode figure): numpy runs the
// K = ceil(n/S) encode steps as ~15 vector ops each, which at the
// wire-optimal small lane counts (S = 128-256, see rans.auto_streams) is
// per-op-overhead bound (~0.25 ms/step). This scalar C++ loop encodes at
// a few ns/symbol — the whole 24-piece bench corpus in ~10 ms vs ~0.5 s.
//
// MUST stay bit-identical to rans._rans_encode_batch_numpy: same
// renormalization condition (x >= f << 20, i.e. one u16 word per lane per
// step), same word order (step-ascending, lane-ascending — the decoder's
// consumption order), same state init/layout. Equality is pinned by
// tests/test_rans.py::test_native_encoder_matches_numpy.
//
// Layout of the emitted words: the encoder walks steps t = K-1 .. 0
// (symbols in reverse), but the decoder consumes words step-ASCENDING.
// Words are first written into a scratch row in encode order with
// per-step counts recorded, then assembled in reverse step order.

#include <cstdint>
#include <cstring>
#include <vector>

namespace {
constexpr uint32_t kProbBits = 12;
constexpr uint32_t kRansL = 1u << 16;  // state lower bound
}  // namespace

extern "C" {

// data   [P, n]    uint8 payloads (row-major)
// freqs  [P, 256]  quantized frequencies summing to 1 << kProbBits
// states out [P, S]
// words  out [P, wcap]; wcap >= n + S guarantees no overflow (each of the
//        K*S < n + S lane-steps emits at most one word). Rows are
//        zero-filled before the real words are written.
// n_words out [P]  real word count per row
// Returns 0 on success, -1 if wcap is too small.
int64_t asr_rans_encode_batch(const uint8_t* data, const uint16_t* freqs,
                              int64_t P, int64_t n, int64_t S,
                              uint32_t* states, uint16_t* words,
                              int64_t wcap, int64_t* n_words) {
  const int64_t K = (n + S - 1) / S;
  std::vector<uint32_t> cum(256), x(S);
  std::vector<uint16_t> scratch;
  std::vector<int64_t> step_count(K);

  for (int64_t p = 0; p < P; ++p) {
    const uint16_t* f = freqs + p * 256;
    uint32_t c = 0;
    for (int i = 0; i < 256; ++i) {
      cum[i] = c;
      c += f[i];
    }
    int pad_sym = 0;
    for (int i = 1; i < 256; ++i)
      if (f[i] > f[pad_sym]) pad_sym = i;  // first max, like np.argmax

    const uint8_t* d = data + p * n;
    for (int64_t s = 0; s < S; ++s) x[s] = kRansL;
    scratch.clear();
    scratch.reserve(n + S);
    for (int64_t t = K - 1; t >= 0; --t) {
      const int64_t base = t * S;
      const size_t before = scratch.size();
      for (int64_t s = 0; s < S; ++s) {
        const int64_t i = base + s;
        const uint32_t sym = i < n ? d[i] : (uint32_t)pad_sym;
        const uint32_t fs = f[sym];
        uint32_t xs = x[s];
        if ((uint64_t)xs >= ((uint64_t)fs << 20)) {
          scratch.push_back((uint16_t)(xs & 0xFFFF));
          xs >>= 16;
        }
        x[s] = (xs / fs << kProbBits) + cum[sym] + xs % fs;
      }
      step_count[t] = (int64_t)(scratch.size() - before);
    }
    const int64_t total = (int64_t)scratch.size();
    if (total > wcap) return -1;
    n_words[p] = total;
    uint16_t* out = words + p * wcap;
    std::memset(out, 0, (size_t)wcap * sizeof(uint16_t));
    // scratch holds steps K-1, K-2, ..., 0 back to back; the decoder wants
    // step-ascending order. Encode order was t = K-1 .. 0, so step t's
    // chunk starts at sum(step_count[t+1:]) — a prefix sum over the
    // encode order, inverted in one pass.
    std::vector<int64_t> chunk_off(K);
    int64_t acc = 0;
    for (int64_t t = K - 1; t >= 0; --t) {
      chunk_off[t] = acc;
      acc += step_count[t];
    }
    int64_t dst = 0;
    for (int64_t t = 0; t < K; ++t) {
      std::memcpy(out + dst, scratch.data() + chunk_off[t],
                  (size_t)step_count[t] * sizeof(uint16_t));
      dst += step_count[t];
    }
    std::memcpy(states + p * S, x.data(), (size_t)S * sizeof(uint32_t));
  }
  return 0;
}

// Scalar decoder (round 5) — the host side of the map-DOWNLOAD wire
// (device encodes in-graph, ops/rans.rans_encode_device; the host decode
// of a ~1 Mpx page costs ~49 ms in numpy vs ~3 ms here). MUST stay
// bit-identical to rans.rans_decode_host: same slot->symbol table, same
// (step-ascending, lane-ascending) word consumption, same out-of-words
// clamping (a truncated payload re-reads the last word, never OOB).
// Pinned by tests/test_rans.py::test_native_decoder_matches_numpy.
//
// freqs  [256]   quantized frequencies summing to 1 << kProbBits
// states [S]     final encoder states
// words  [n_words]
// out    [n]     decoded bytes
int64_t asr_rans_decode(const uint16_t* freqs, const uint32_t* states,
                        const uint16_t* words, int64_t n_words, int64_t S,
                        int64_t n, uint8_t* out) {
  constexpr uint32_t kProbScale = 1u << kProbBits;
  uint32_t cum[256];
  uint8_t sym_of[kProbScale];
  uint32_t c = 0;
  for (int i = 0; i < 256; ++i) {
    cum[i] = c;
    const uint32_t e = c + freqs[i];
    for (uint32_t slot = c; slot < e; ++slot) sym_of[slot] = (uint8_t)i;
    c = e;
  }
  const int64_t K = (n + S - 1) / S;
  std::vector<uint32_t> x(states, states + S);
  int64_t idx = 0;
  const uint16_t zero = 0;
  for (int64_t t = 0; t < K; ++t) {
    const int64_t base = t * S;
    for (int64_t s = 0; s < S; ++s) {
      uint32_t xs = x[s];
      const uint32_t slot = xs & (kProbScale - 1);
      const uint32_t sym = sym_of[slot];
      const int64_t i = base + s;
      if (i < n) out[i] = (uint8_t)sym;
      xs = freqs[sym] * (xs >> kProbBits) + slot - cum[sym];
      if (xs < kRansL) {
        const uint16_t w = n_words > 0
            ? words[idx < n_words ? idx : n_words - 1] : zero;
        ++idx;
        xs = (xs << 16) | w;
      }
      x[s] = xs;
    }
  }
  return 0;
}
}  // extern "C"
