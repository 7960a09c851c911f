// Native corruption kernels for the host-side data pipeline.
//
// The training input pipeline is CPU-bound (SURVEY §3.1: the corruption
// loop is the host hot path). These kernels replace the pure-python hot
// spots of the ImageNet-C implementation — the diamond-square plasma
// fractal (fog) and the glass-blur local pixel shuffle — with C++,
// exposed via a plain C ABI for ctypes (no pybind11 dependency).
//
// Build: make -C native   (produces libcorruption_kernels.so)

#include <cstdint>
#include <cstring>
#include <algorithm>
#include <random>
#include <vector>

extern "C" {

// Diamond-square heightmap in [0, 1]; out is mapsize*mapsize doubles.
// Mirrors the numpy implementation in imagenet_c._plasma_fractal (same
// recursion structure; its own RNG stream).
void plasma_fractal(double* out, int mapsize, double wibbledecay,
                    uint64_t seed) {
  std::mt19937_64 rng(seed);
  std::uniform_real_distribution<double> uni(-1.0, 1.0);
  const int n = mapsize;
  std::vector<double>& map_ = *new std::vector<double>(n * n, 0.0);
  double wibble = 100.0;
  int step = n;

  auto at = [&](int y, int x) -> double& {
    return map_[((y % n + n) % n) * n + ((x % n + n) % n)];
  };

  while (step >= 2) {
    int half = step / 2;
    // diamond
    for (int y = half; y < n; y += step)
      for (int x = half; x < n; x += step) {
        double acc = at(y - half, x - half) + at(y - half, x + half) +
                     at(y + half, x - half) + at(y + half, x + half);
        at(y, x) = acc / 4.0 + wibble * uni(rng);
      }
    // square
    for (int y = 0; y < n; y += step)
      for (int x = half; x < n; x += step) {
        double acc = at(y, x - half) + at(y, x + half) +
                     at(y - half, x) + at(y + half, x);
        at(y, x) = acc / 4.0 + wibble * uni(rng);
      }
    for (int y = half; y < n; y += step)
      for (int x = 0; x < n; x += step) {
        double acc = at(y, x - half) + at(y, x + half) +
                     at(y - half, x) + at(y + half, x);
        at(y, x) = acc / 4.0 + wibble * uni(rng);
      }
    step /= 2;
    wibble /= wibbledecay;
  }

  double mn = map_[0], mx = map_[0];
  for (double v : map_) { mn = std::min(mn, v); mx = std::max(mx, v); }
  double scale = (mx > mn) ? 1.0 / (mx - mn) : 0.0;
  for (int i = 0; i < n * n; ++i) out[i] = (map_[i] - mn) * scale;
  delete &map_;
}

// Glass-blur local shuffle: iters rounds of random per-pixel swaps within
// [-max_delta, max_delta]. img is HWC float32, modified in place.
void glass_shuffle(float* img, int h, int w, int c, int max_delta,
                   int iters, uint64_t seed) {
  std::mt19937_64 rng(seed);
  std::uniform_int_distribution<int> d(-max_delta, max_delta);
  std::vector<float> tmp(static_cast<size_t>(h) * w * c);
  for (int it = 0; it < iters; ++it) {
    std::memcpy(tmp.data(), img, tmp.size() * sizeof(float));
    for (int y = 0; y < h; ++y)
      for (int x = 0; x < w; ++x) {
        int sy = std::clamp(y + d(rng), 0, h - 1);
        int sx = std::clamp(x + d(rng), 0, w - 1);
        const float* src = tmp.data() + (static_cast<size_t>(sy) * w + sx) * c;
        float* dst = img + (static_cast<size_t>(y) * w + x) * c;
        for (int k = 0; k < c; ++k) dst[k] = src[k];
      }
  }
}

// Salt-and-pepper impulse noise in place (amount in [0, 1]).
void impulse_noise(float* img, int64_t numel, float amount, uint64_t seed) {
  std::mt19937_64 rng(seed);
  std::uniform_real_distribution<float> uni(0.0f, 1.0f);
  const float lo = amount * 0.5f, hi = 1.0f - amount * 0.5f;
  for (int64_t i = 0; i < numel; ++i) {
    float r = uni(rng);
    if (r < lo) img[i] = 0.0f;
    else if (r > hi) img[i] = 1.0f;
  }
}

}  // extern "C"
