// Correspondence-based RANSAC rigid registration (native module).
//
// Replaces the reference's Open3D C++ call
// (reference caspr/utils/evaluations.py:370-375):
//   registration_ransac_based_on_correspondence(
//       source, target, identity-corrs, max_corr_dist=0.015,
//       TransformationEstimationPointToPoint(false), ransac_n=4,
//       RANSACConvergenceCriteria(max_iteration=50000, max_validation=5000))
//
// Semantics: sample ransac_n correspondences per iteration, estimate the
// rigid transform with Kabsch/Umeyama (no scaling), validate candidates
// against all correspondences (inlier = distance < max_corr_dist), keep the
// transform with the best (fitness, -rmse); at most max_validation full
// validations are performed.
//
// Built as a shared library; called through ctypes (no pybind11 in image).

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <random>

namespace {

// --- tiny 3x3 linear algebra -------------------------------------------

struct Mat3 {
  double m[3][3];
};

Mat3 matmul(const Mat3 &a, const Mat3 &b) {
  Mat3 r{};
  for (int i = 0; i < 3; ++i)
    for (int j = 0; j < 3; ++j) {
      double s = 0;
      for (int k = 0; k < 3; ++k) s += a.m[i][k] * b.m[k][j];
      r.m[i][j] = s;
    }
  return r;
}

Mat3 transpose(const Mat3 &a) {
  Mat3 r{};
  for (int i = 0; i < 3; ++i)
    for (int j = 0; j < 3; ++j) r.m[i][j] = a.m[j][i];
  return r;
}

double det3(const Mat3 &a) {
  return a.m[0][0] * (a.m[1][1] * a.m[2][2] - a.m[1][2] * a.m[2][1]) -
         a.m[0][1] * (a.m[1][0] * a.m[2][2] - a.m[1][2] * a.m[2][0]) +
         a.m[0][2] * (a.m[1][0] * a.m[2][1] - a.m[1][1] * a.m[2][0]);
}

// Jacobi eigendecomposition of a symmetric 3x3: A = V diag(w) V^T.
void jacobi_eig3(const Mat3 &a_in, double w[3], Mat3 &v) {
  Mat3 a = a_in;
  for (int i = 0; i < 3; ++i)
    for (int j = 0; j < 3; ++j) v.m[i][j] = (i == j) ? 1.0 : 0.0;
  for (int sweep = 0; sweep < 50; ++sweep) {
    double off = std::abs(a.m[0][1]) + std::abs(a.m[0][2]) + std::abs(a.m[1][2]);
    if (off < 1e-15) break;
    for (int p = 0; p < 2; ++p)
      for (int q = p + 1; q < 3; ++q) {
        if (std::abs(a.m[p][q]) < 1e-18) continue;
        double theta = (a.m[q][q] - a.m[p][p]) / (2.0 * a.m[p][q]);
        double t = (theta >= 0 ? 1.0 : -1.0) /
                   (std::abs(theta) + std::sqrt(theta * theta + 1.0));
        double c = 1.0 / std::sqrt(t * t + 1.0);
        double s = t * c;
        // A <- J^T A J applied to rows/cols p,q
        for (int k = 0; k < 3; ++k) {
          double akp = a.m[k][p], akq = a.m[k][q];
          a.m[k][p] = c * akp - s * akq;
          a.m[k][q] = s * akp + c * akq;
        }
        for (int k = 0; k < 3; ++k) {
          double apk = a.m[p][k], aqk = a.m[q][k];
          a.m[p][k] = c * apk - s * aqk;
          a.m[q][k] = s * apk + c * aqk;
        }
        for (int k = 0; k < 3; ++k) {
          double vkp = v.m[k][p], vkq = v.m[k][q];
          v.m[k][p] = c * vkp - s * vkq;
          v.m[k][q] = s * vkp + c * vkq;
        }
      }
  }
  for (int i = 0; i < 3; ++i) w[i] = a.m[i][i];
}

// SVD of a general 3x3 via eig of A^T A: A = U diag(s) V^T.
void svd3(const Mat3 &a, Mat3 &u, double s[3], Mat3 &v) {
  Mat3 ata = matmul(transpose(a), a);
  double w[3];
  jacobi_eig3(ata, w, v);
  // sort descending
  int idx[3] = {0, 1, 2};
  std::sort(idx, idx + 3, [&](int x, int y) { return w[x] > w[y]; });
  Mat3 vs{};
  double ws[3];
  for (int j = 0; j < 3; ++j) {
    ws[j] = std::max(w[idx[j]], 0.0);
    for (int i = 0; i < 3; ++i) vs.m[i][j] = v.m[i][idx[j]];
  }
  v = vs;
  for (int j = 0; j < 3; ++j) s[j] = std::sqrt(ws[j]);
  // u_j = A v_j / s_j  (orthogonalize against prior columns for tiny s)
  for (int j = 0; j < 3; ++j) {
    double col[3] = {0, 0, 0};
    for (int i = 0; i < 3; ++i)
      for (int k = 0; k < 3; ++k) col[i] += a.m[i][k] * v.m[k][j];
    double norm = std::sqrt(col[0] * col[0] + col[1] * col[1] + col[2] * col[2]);
    if (norm < 1e-12) {
      // degenerate direction: fill with a vector orthogonal to earlier cols
      double cand[3][3] = {{1, 0, 0}, {0, 1, 0}, {0, 0, 1}};
      for (int c = 0; c < 3; ++c) {
        double vtmp[3] = {cand[c][0], cand[c][1], cand[c][2]};
        for (int jj = 0; jj < j; ++jj) {
          double d = vtmp[0] * u.m[0][jj] + vtmp[1] * u.m[1][jj] +
                     vtmp[2] * u.m[2][jj];
          for (int i = 0; i < 3; ++i) vtmp[i] -= d * u.m[i][jj];
        }
        double nn = std::sqrt(vtmp[0] * vtmp[0] + vtmp[1] * vtmp[1] +
                              vtmp[2] * vtmp[2]);
        if (nn > 1e-6) {
          for (int i = 0; i < 3; ++i) col[i] = vtmp[i] / nn;
          break;
        }
      }
    } else {
      for (int i = 0; i < 3; ++i) col[i] /= norm;
    }
    for (int i = 0; i < 3; ++i) u.m[i][j] = col[i];
  }
}

// Kabsch: rigid (R, t) minimizing ||R*src + t - dst||^2 over the given
// correspondence subset.
void kabsch(const double *src, const double *dst, const int *sel, int k,
            Mat3 &r_out, double t_out[3]) {
  double cs[3] = {0, 0, 0}, cd[3] = {0, 0, 0};
  for (int i = 0; i < k; ++i)
    for (int d = 0; d < 3; ++d) {
      cs[d] += src[3 * sel[i] + d];
      cd[d] += dst[3 * sel[i] + d];
    }
  for (int d = 0; d < 3; ++d) {
    cs[d] /= k;
    cd[d] /= k;
  }
  Mat3 h{};
  for (int i = 0; i < k; ++i)
    for (int a = 0; a < 3; ++a)
      for (int b = 0; b < 3; ++b)
        h.m[a][b] += (src[3 * sel[i] + a] - cs[a]) * (dst[3 * sel[i] + b] - cd[b]);
  Mat3 u, v;
  double s[3];
  svd3(h, u, s, v);
  // R = V * diag(1,1,det(V U^T)) * U^T
  Mat3 vut = matmul(v, transpose(u));
  double d = det3(vut);
  Mat3 dmat{};
  dmat.m[0][0] = 1;
  dmat.m[1][1] = 1;
  dmat.m[2][2] = (d < 0) ? -1.0 : 1.0;
  r_out = matmul(matmul(v, dmat), transpose(u));
  for (int i = 0; i < 3; ++i) {
    t_out[i] = cd[i];
    for (int j = 0; j < 3; ++j) t_out[i] -= r_out.m[i][j] * cs[j];
  }
}

}  // namespace

extern "C" {

// src, dst: n x 3 doubles (correspondence i <-> i). out_T: 4x4 row-major.
// Returns number of inliers of the best model (-1 on error).
int ransac_registration(const double *src, const double *dst, int n,
                        double max_corr_dist, int ransac_n, int max_iteration,
                        int max_validation, uint64_t seed, double *out_T) {
  if (n < ransac_n || ransac_n < 3) return -1;
  std::mt19937_64 rng(seed);
  std::uniform_int_distribution<int> pick(0, n - 1);

  double best_fitness = -1.0;
  double best_rmse = 1e30;
  Mat3 best_r{};
  best_r.m[0][0] = best_r.m[1][1] = best_r.m[2][2] = 1.0;
  double best_t[3] = {0, 0, 0};
  int best_inliers = 0;

  const double thresh2 = max_corr_dist * max_corr_dist;
  int validations = 0;
  int sel[16];

  for (int it = 0; it < max_iteration && validations < max_validation; ++it) {
    for (int i = 0; i < ransac_n; ++i) sel[i] = pick(rng);
    Mat3 r;
    double t[3];
    kabsch(src, dst, sel, ransac_n, r, t);

    // full validation against every correspondence
    ++validations;
    int inliers = 0;
    double err2_sum = 0.0;
    for (int i = 0; i < n; ++i) {
      double p[3];
      for (int a = 0; a < 3; ++a)
        p[a] = r.m[a][0] * src[3 * i] + r.m[a][1] * src[3 * i + 1] +
               r.m[a][2] * src[3 * i + 2] + t[a];
      double dx = p[0] - dst[3 * i], dy = p[1] - dst[3 * i + 1],
             dz = p[2] - dst[3 * i + 2];
      double d2 = dx * dx + dy * dy + dz * dz;
      if (d2 < thresh2) {
        ++inliers;
        err2_sum += d2;
      }
    }
    double fitness = static_cast<double>(inliers) / n;
    double rmse = inliers > 0 ? std::sqrt(err2_sum / inliers) : 1e30;
    if (fitness > best_fitness ||
        (fitness == best_fitness && rmse < best_rmse)) {
      best_fitness = fitness;
      best_rmse = rmse;
      best_r = r;
      std::memcpy(best_t, t, sizeof(best_t));
      best_inliers = inliers;
    }
  }

  std::memset(out_T, 0, 16 * sizeof(double));
  for (int i = 0; i < 3; ++i) {
    for (int j = 0; j < 3; ++j) out_T[4 * i + j] = best_r.m[i][j];
    out_T[4 * i + 3] = best_t[i];
  }
  out_T[15] = 1.0;
  return best_inliers;
}

// Batched entry point: m independent problems of n correspondences each.
int ransac_registration_batch(const double *src, const double *dst, int m,
                              int n, double max_corr_dist, int ransac_n,
                              int max_iteration, int max_validation,
                              uint64_t seed, double *out_T) {
  for (int i = 0; i < m; ++i) {
    int rc = ransac_registration(src + 3 * n * i, dst + 3 * n * i, n,
                                 max_corr_dist, ransac_n, max_iteration,
                                 max_validation, seed + i, out_T + 16 * i);
    if (rc < 0) return rc;
  }
  return 0;
}

}  // extern "C"
