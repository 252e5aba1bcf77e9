// Scalar radix-2 complex FFT benchmark: is a -O2 C++ client encoder
// competitive with scipy pocketfft for the 2048-point rfft workload?
#include <cmath>
#include <complex>
#include <cstdio>
#include <vector>
#include <chrono>

using cf = std::complex<float>;

// iterative radix-2 Cooley-Tukey, precomputed twiddles, bit-reversal
struct FFT {
  int n, log2n;
  std::vector<cf> tw;
  std::vector<int> rev;
  FFT(int n_) : n(n_) {
    log2n = 0; while ((1 << log2n) < n) ++log2n;
    tw.resize(n / 2);
    for (int i = 0; i < n / 2; ++i)
      tw[i] = std::polar(1.0f, float(-2.0 * M_PI * i / n));
    rev.resize(n);
    for (int i = 0; i < n; ++i) {
      int r = 0;
      for (int b = 0; b < log2n; ++b) r |= ((i >> b) & 1) << (log2n - 1 - b);
      rev[i] = r;
    }
  }
  void run(cf* a) const {
    for (int i = 0; i < n; ++i)
      if (rev[i] > i) std::swap(a[i], a[rev[i]]);
    for (int len = 2; len <= n; len <<= 1) {
      int step = n / len;
      for (int i = 0; i < n; i += len)
        for (int j = 0; j < len / 2; ++j) {
          cf u = a[i + j], v = a[i + j + len / 2] * tw[j * step];
          a[i + j] = u + v;
          a[i + j + len / 2] = u - v;
        }
    }
  }
};

int main() {
  const int FS = 2048, NF = 1200;
  // real-input rfft via N/2 complex FFT (even/odd packing)
  FFT fft(FS / 2);
  std::vector<float> sig(FS * NF);
  for (int i = 0; i < FS * NF; ++i) sig[i] = std::sin(i * 0.01f);
  std::vector<cf> buf(FS / 2);
  std::vector<float> mag(FS / 2);
  std::vector<cf> post(FS / 2 + 1);
  // rfft post-twiddles
  std::vector<cf> ptw(FS / 2);
  for (int i = 0; i < FS / 2; ++i)
    ptw[i] = std::polar(1.0f, float(-2.0 * M_PI * i / FS));
  volatile float sink = 0;
  auto t0 = std::chrono::steady_clock::now();
  for (int f = 0; f < NF; ++f) {
    const float* x = sig.data() + f * FS;
    for (int i = 0; i < FS / 2; ++i) buf[i] = cf(x[2 * i], x[2 * i + 1]);
    fft.run(buf.data());
    // unpack to magnitudes of bins [0, FS/2)
    for (int k = 0; k < FS / 2; ++k) {
      cf zk = buf[k], znk = std::conj(buf[(FS / 2 - k) & (FS / 2 - 1)]);
      cf fe = 0.5f * (zk + znk), fo = cf(0, -0.5f) * (zk - znk);
      mag[k] = std::abs(fe + ptw[k] * fo);
    }
    sink += mag[0] + mag[FS / 4];
  }
  auto dt = std::chrono::duration<double>(
      std::chrono::steady_clock::now() - t0).count();
  printf("scalar C++ rfft+mag, %d frames of %d: %.1f ms (sink %.1f)\n",
         NF, FS, dt * 1000, (double)sink);
  return 0;
}
