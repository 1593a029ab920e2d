// rgb2spec: RGB -> reflectance-spectrum coefficient table optimizer.
//
// Native counterpart of the reference's akari_cpp_ext rgb2spec optimizer
// (a Jakob & Hanika 2019 style sigmoid-polynomial fit, generated lazily at
// first spectral use). Own implementation: CIE curves via the public
// multi-Gaussian analytic fits (Wyman et al. 2013), D65 via a coarse public
// 10nm table, Gauss-Newton over the 3 polynomial coefficients.
//
// CLI-style entry (mirrors `rgb2spec_opt(argc, argv)`):
//   akr_rgb2spec_opt(res, out_path, gamut) -> 0 on success
// Table format (little endian): u32 res, f32 scale[res],
//   f32 coeffs[3][res][res][res][3]  (max-channel-major like the original).
#include <algorithm>
#include <cmath>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <vector>

namespace {

constexpr int kLambdaMin = 360, kLambdaMax = 830, kSteps = 95;  // 5nm

// Wyman, Sloan, Shirley: "Simple Analytic Approximations to the CIE XYZ
// Color Matching Functions" (JCGT 2013) — public closed forms.
inline float gauss(float x, float alpha, float mu, float s1, float s2) {
  float t = (x - mu) * (x < mu ? 1.0f / s1 : 1.0f / s2);
  return alpha * std::exp(-0.5f * t * t);
}
inline float cie_x(float l) {
  return gauss(l, 1.056f, 599.8f, 37.9f, 31.0f) +
         gauss(l, 0.362f, 442.0f, 16.0f, 26.7f) +
         gauss(l, -0.065f, 501.1f, 20.4f, 26.2f);
}
inline float cie_y(float l) {
  return gauss(l, 0.821f, 568.8f, 46.9f, 40.5f) +
         gauss(l, 0.286f, 530.9f, 16.3f, 31.1f);
}
inline float cie_z(float l) {
  return gauss(l, 1.217f, 437.0f, 11.8f, 36.0f) +
         gauss(l, 0.681f, 459.0f, 26.0f, 13.8f);
}

// CIE standard illuminant D65, 360-830nm at 5nm (public CIE 15:2004 data,
// normalized to 100 at 560nm) — must match core/spectral.py's _D65 so the
// Python-side sensor model agrees with the fit's.
const float kD65[95] = {
    46.64f, 49.36f, 52.09f, 51.03f, 49.98f, 52.31f, 54.65f, 68.70f, 82.75f,
    87.12f, 91.49f, 92.46f, 93.43f, 90.06f, 86.68f, 95.77f, 104.86f, 110.94f,
    117.01f, 117.41f, 117.81f, 116.34f, 114.86f, 115.39f, 115.92f, 112.37f,
    108.81f, 109.08f, 109.35f, 108.58f, 107.80f, 106.30f, 104.79f, 106.24f,
    107.69f, 106.05f, 104.41f, 104.23f, 104.05f, 102.02f, 100.00f, 98.17f,
    96.33f, 96.06f, 95.79f, 92.24f, 88.69f, 89.35f, 90.01f, 89.80f, 89.60f,
    88.65f, 87.70f, 85.49f, 83.29f, 83.49f, 83.70f, 81.86f, 80.03f, 80.12f,
    80.21f, 81.25f, 82.28f, 80.28f, 78.28f, 74.00f, 69.72f, 70.67f, 71.61f,
    72.98f, 74.35f, 67.98f, 61.60f, 65.74f, 69.89f, 72.49f, 75.09f, 69.34f,
    63.59f, 55.01f, 46.42f, 56.61f, 66.81f, 65.09f, 63.38f, 63.84f, 64.30f,
    61.88f, 59.45f, 55.71f, 51.96f, 54.70f, 57.44f, 58.88f, 60.31f};

inline float d65(float l) {
  float f = (l - 360.0f) / 5.0f;
  int i = std::clamp((int)f, 0, 93);
  float t = std::clamp(f - i, 0.0f, 1.0f);
  return kD65[i] * (1 - t) + kD65[i + 1] * t;
}

struct Mat3 {
  float m[3][3];
};

// XYZ -> linear sRGB (Rec.709/D65) — public constants
const Mat3 kXyzToSrgb = {{{3.2404542f, -1.5371385f, -0.4985314f},
                          {-0.9692660f, 1.8760108f, 0.0415560f},
                          {0.0556434f, -0.2040259f, 1.0572252f}}};

inline float sigmoid(float x) { return 0.5f * x / std::sqrt(1.0f + x * x) + 0.5f; }

struct Tables {
  float lambda[kSteps], xw[kSteps], yw[kSteps], zw[kSteps];
  void init() {
    float ynorm = 0;
    for (int i = 0; i < kSteps; i++) {
      float l = kLambdaMin + (kLambdaMax - kLambdaMin) * (i + 0.5f) / kSteps;
      lambda[i] = l;
      float w = d65(l);
      xw[i] = cie_x(l) * w;
      yw[i] = cie_y(l) * w;
      zw[i] = cie_z(l) * w;
      ynorm += yw[i];
    }
    for (int i = 0; i < kSteps; i++) {
      xw[i] /= ynorm;
      yw[i] /= ynorm;
      zw[i] /= ynorm;
    }
  }
  // coefficients -> linear sRGB under D65
  void eval_rgb(const double c[3], float rgb[3]) const {
    double X = 0, Y = 0, Z = 0;
    for (int i = 0; i < kSteps; i++) {
      float ln = (lambda[i] - kLambdaMin) / (kLambdaMax - kLambdaMin);
      float r = sigmoid((float)((c[0] * ln + c[1]) * ln + c[2]));
      X += r * xw[i];
      Y += r * yw[i];
      Z += r * zw[i];
    }
    for (int k = 0; k < 3; k++)
      rgb[k] = (float)(kXyzToSrgb.m[k][0] * X + kXyzToSrgb.m[k][1] * Y +
                       kXyzToSrgb.m[k][2] * Z);
  }
};

// Gauss-Newton fit of 3 coefficients to hit a target RGB.
void fit(const Tables &T, const float target[3], double c[3]) {
  for (int it = 0; it < 24; it++) {
    float rgb[3];
    T.eval_rgb(c, rgb);
    double resid[3] = {rgb[0] - target[0], rgb[1] - target[1], rgb[2] - target[2]};
    double err = resid[0] * resid[0] + resid[1] * resid[1] + resid[2] * resid[2];
    if (err < 1e-10) break;
    // numeric Jacobian
    double J[3][3];
    for (int j = 0; j < 3; j++) {
      double eps = 1e-3;
      double cp[3] = {c[0], c[1], c[2]};
      cp[j] += eps;
      float rp[3];
      T.eval_rgb(cp, rp);
      for (int k = 0; k < 3; k++) J[k][j] = (rp[k] - rgb[k]) / eps;
    }
    // solve J dx = resid (3x3 with damping)
    double A[3][3], b[3];
    for (int i = 0; i < 3; i++) {
      b[i] = 0;
      for (int j = 0; j < 3; j++) {
        A[i][j] = 0;
        for (int k = 0; k < 3; k++) A[i][j] += J[k][i] * J[k][j];
      }
      A[i][i] += 1e-6;
      for (int k = 0; k < 3; k++) b[i] += J[k][i] * resid[k];
    }
    // Cramer 3x3
    auto det3 = [](double M[3][3]) {
      return M[0][0] * (M[1][1] * M[2][2] - M[1][2] * M[2][1]) -
             M[0][1] * (M[1][0] * M[2][2] - M[1][2] * M[2][0]) +
             M[0][2] * (M[1][0] * M[2][1] - M[1][1] * M[2][0]);
    };
    double det = det3(A);
    if (std::abs(det) < 1e-15) break;
    double dx[3];
    for (int j = 0; j < 3; j++) {
      double Aj[3][3];
      std::memcpy(Aj, A, sizeof(Aj));
      for (int i = 0; i < 3; i++) Aj[i][j] = b[i];
      dx[j] = det3(Aj) / det;
    }
    for (int j = 0; j < 3; j++) c[j] -= dx[j];
  }
}

}  // namespace

extern "C" {

int akr_rgb2spec_opt(int res, const char *out_path, const char *gamut) {
  (void)gamut;  // srgb only for now (reference supports 4 gamuts)
  Tables T;
  T.init();
  std::vector<float> scale(res);
  for (int i = 0; i < res; i++) {
    float t = (float)i / (res - 1);
    scale[i] = t * t * (3 - 2 * t);  // smoothstep spacing like the original
  }
  // table layout: [max_channel l][scale z][b][a][3 coeffs]
  std::vector<float> out((size_t)3 * res * res * res * 3);
  for (int l = 0; l < 3; l++) {
    for (int z = 0; z < res; z++) {
      double c[3] = {0, 0, 0};  // warm-started along the scale axis
      for (int b = 0; b < res; b++) {
        for (int a = 0; a < res; a++) {
          float A = (float)a / (res - 1), B = (float)b / (res - 1);
          float rgb[3];
          rgb[l] = std::max(scale[z], 1e-4f);
          rgb[(l + 1) % 3] = A * rgb[l];
          rgb[(l + 2) % 3] = B * rgb[l];
          fit(T, rgb, c);
          size_t idx = ((((size_t)l * res + z) * res + b) * res + a) * 3;
          for (int k = 0; k < 3; k++) out[idx + k] = (float)c[k];
        }
      }
    }
  }
  FILE *f = std::fopen(out_path, "wb");
  if (!f) return 1;
  uint32_t r = res;
  std::fwrite(&r, 4, 1, f);
  std::fwrite(scale.data(), 4, res, f);
  std::fwrite(out.data(), 4, out.size(), f);
  std::fclose(f);
  return 0;
}

}  // extern "C"
