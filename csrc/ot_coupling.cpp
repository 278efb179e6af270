// Native OT prior coupling: Hungarian assignment + Kabsch rigid alignment.
//
// The reference runs this per molecule inside DataLoader workers with
// scipy.optimize.linear_sum_assignment + torch.svd
// (/root/reference/flowmol/data_processing/priors.py:109-169, called from
// dataset.py:168-183) — the hot host-side loop of the training input
// pipeline (SURVEY.md §3.1).  This is the C++ equivalent with a thread pool
// over molecules, exposed through a plain C ABI for ctypes.
//
// Build: g++ -O3 -march=native -shared -fPIC -std=c++17 -pthread
//        -o _ot_native.so ot_coupling.cpp

#include <algorithm>
#include <atomic>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <thread>
#include <vector>

namespace {

constexpr double kInf = 1e18;

// O(n^3) Hungarian algorithm (potentials / Jonker-Volgenant style).
// cost is row-major (n x n); writes col assignment per row into `assign`.
void hungarian(const double* cost, int n, int* assign) {
  std::vector<double> u(n + 1, 0.0), v(n + 1, 0.0);
  std::vector<int> p(n + 1, 0), way(n + 1, 0);
  for (int i = 1; i <= n; ++i) {
    p[0] = i;
    int j0 = 0;
    std::vector<double> minv(n + 1, kInf);
    std::vector<char> used(n + 1, 0);
    do {
      used[j0] = 1;
      int i0 = p[j0], j1 = 0;
      double delta = kInf;
      for (int j = 1; j <= n; ++j) {
        if (used[j]) continue;
        double cur = cost[(i0 - 1) * n + (j - 1)] - u[i0] - v[j];
        if (cur < minv[j]) {
          minv[j] = cur;
          way[j] = j0;
        }
        if (minv[j] < delta) {
          delta = minv[j];
          j1 = j;
        }
      }
      for (int j = 0; j <= n; ++j) {
        if (used[j]) {
          u[p[j]] += delta;
          v[j] -= delta;
        } else {
          minv[j] -= delta;
        }
      }
      j0 = j1;
    } while (p[j0] != 0);
    do {
      int j1 = way[j0];
      p[j0] = p[j1];
      j0 = j1;
    } while (j0);
  }
  for (int j = 1; j <= n; ++j)
    if (p[j] > 0) assign[p[j] - 1] = j - 1;
}

// Jacobi eigendecomposition of a symmetric 3x3 matrix a; returns eigenvalues
// in w (descending) and eigenvectors as columns of v.
void sym_eig3(const double a_in[9], double w[3], double v[9]) {
  double a[9];
  std::memcpy(a, a_in, sizeof(a));
  double q[9] = {1, 0, 0, 0, 1, 0, 0, 0, 1};
  for (int sweep = 0; sweep < 50; ++sweep) {
    double off = std::fabs(a[1]) + std::fabs(a[2]) + std::fabs(a[5]);
    if (off < 1e-15) break;
    static const int pairs[3][2] = {{0, 1}, {0, 2}, {1, 2}};
    for (auto& pr : pairs) {
      int pi = pr[0], qi = pr[1];
      double apq = a[pi * 3 + qi];
      if (std::fabs(apq) < 1e-18) continue;
      double app = a[pi * 3 + pi], aqq = a[qi * 3 + qi];
      double theta = 0.5 * (aqq - app) / apq;
      double t = (theta >= 0 ? 1.0 : -1.0) /
                 (std::fabs(theta) + std::sqrt(theta * theta + 1.0));
      double c = 1.0 / std::sqrt(t * t + 1.0);
      double s = t * c;
      for (int k = 0; k < 3; ++k) {
        double akp = a[k * 3 + pi], akq = a[k * 3 + qi];
        a[k * 3 + pi] = c * akp - s * akq;
        a[k * 3 + qi] = s * akp + c * akq;
      }
      for (int k = 0; k < 3; ++k) {
        double apk = a[pi * 3 + k], aqk = a[qi * 3 + k];
        a[pi * 3 + k] = c * apk - s * aqk;
        a[qi * 3 + k] = s * apk + c * aqk;
        double qkp = q[k * 3 + pi], qkq = q[k * 3 + qi];
        q[k * 3 + pi] = c * qkp - s * qkq;
        q[k * 3 + qi] = s * qkp + c * qkq;
      }
    }
  }
  int order[3] = {0, 1, 2};
  double ev[3] = {a[0], a[4], a[8]};
  std::sort(order, order + 3, [&](int x, int y) { return ev[x] > ev[y]; });
  for (int k = 0; k < 3; ++k) {
    w[k] = ev[order[k]];
    for (int r = 0; r < 3; ++r) v[r * 3 + k] = q[r * 3 + order[k]];
  }
}

// SVD of a general 3x3 matrix h = U S V^T via eigendecomposition of h^T h.
void svd3(const double h[9], double u[9], double s[3], double v[9]) {
  double hth[9];
  for (int i = 0; i < 3; ++i)
    for (int j = 0; j < 3; ++j) {
      double acc = 0;
      for (int k = 0; k < 3; ++k) acc += h[k * 3 + i] * h[k * 3 + j];
      hth[i * 3 + j] = acc;
    }
  double w[3];
  sym_eig3(hth, w, v);
  for (int k = 0; k < 3; ++k) s[k] = std::sqrt(std::max(w[k], 0.0));
  // u_k = h v_k / s_k (orthogonalize against previous for tiny s)
  for (int k = 0; k < 3; ++k) {
    double col[3] = {0, 0, 0};
    for (int r = 0; r < 3; ++r)
      for (int c = 0; c < 3; ++c) col[r] += h[r * 3 + c] * v[c * 3 + k];
    double nrm = std::sqrt(col[0] * col[0] + col[1] * col[1] + col[2] * col[2]);
    if (nrm > 1e-12) {
      for (int r = 0; r < 3; ++r) u[r * 3 + k] = col[r] / nrm;
    } else {
      // degenerate direction: cross product of the other two u columns
      int k1 = (k + 1) % 3, k2 = (k + 2) % 3;
      u[0 * 3 + k] = u[1 * 3 + k1] * u[2 * 3 + k2] - u[2 * 3 + k1] * u[1 * 3 + k2];
      u[1 * 3 + k] = u[2 * 3 + k1] * u[0 * 3 + k2] - u[0 * 3 + k1] * u[2 * 3 + k2];
      u[2 * 3 + k] = u[0 * 3 + k1] * u[1 * 3 + k2] - u[1 * 3 + k1] * u[0 * 3 + k2];
    }
  }
}

// Kabsch without det correction (reference parity, priors.py:128-169):
// rotate+translate x0 (n x 3) onto x1; writes aligned x0 in place.
void kabsch(double* x0, const double* x1, int n) {
  double mu0[3] = {0, 0, 0}, mu1[3] = {0, 0, 0};
  for (int i = 0; i < n; ++i)
    for (int d = 0; d < 3; ++d) {
      mu0[d] += x0[i * 3 + d];
      mu1[d] += x1[i * 3 + d];
    }
  for (int d = 0; d < 3; ++d) {
    mu0[d] /= n;
    mu1[d] /= n;
  }
  double h[9] = {0};
  for (int i = 0; i < n; ++i)
    for (int r = 0; r < 3; ++r)
      for (int c = 0; c < 3; ++c)
        h[r * 3 + c] += (x0[i * 3 + r] - mu0[r]) * (x1[i * 3 + c] - mu1[c]);
  double u[9], s[3], v[9];
  svd3(h, u, s, v);
  // R = V U^T
  double rot[9];
  for (int r = 0; r < 3; ++r)
    for (int c = 0; c < 3; ++c) {
      double acc = 0;
      for (int k = 0; k < 3; ++k) acc += v[r * 3 + k] * u[c * 3 + k];
      rot[r * 3 + c] = acc;
    }
  for (int i = 0; i < n; ++i) {
    double p[3];
    for (int r = 0; r < 3; ++r) {
      double acc = 0;
      for (int c = 0; c < 3; ++c)
        acc += rot[r * 3 + c] * (x0[i * 3 + c] - mu0[c]);
      p[r] = acc + mu1[r];
    }
    for (int r = 0; r < 3; ++r) x0[i * 3 + r] = p[r];
  }
}

// One molecule's OT coupling: permute prior rows by Hungarian assignment on
// pairwise L2 cost vs dst, then (optionally) Kabsch-align.
void couple_one(double* prior, const double* dst, int n, int dim,
                int rigid_body, double* cost_buf, int* assign_buf,
                double* perm_buf) {
  for (int i = 0; i < n; ++i)
    for (int j = 0; j < n; ++j) {
      double acc = 0;
      for (int d = 0; d < dim; ++d) {
        double diff = dst[i * dim + d] - prior[j * dim + d];
        acc += diff * diff;
      }
      cost_buf[i * n + j] = std::sqrt(acc);
    }
  hungarian(cost_buf, n, assign_buf);
  for (int i = 0; i < n; ++i)
    std::memcpy(perm_buf + i * dim, prior + assign_buf[i] * dim,
                dim * sizeof(double));
  std::memcpy(prior, perm_buf, n * dim * sizeof(double));
  if (rigid_body && dim == 3) kabsch(prior, dst, n);
}

}  // namespace

extern "C" {

void fm_hungarian(const double* cost, int n, int* assign) {
  hungarian(cost, n, assign);
}

void fm_kabsch(double* x0, const double* x1, int n) { kabsch(x0, x1, n); }

// Batched OT coupling over a padded slab of molecules, threaded.
// priors/dsts: (n_mols, max_n, dim) row-major doubles; ns: per-molecule
// sizes.  priors is modified in place.
void fm_couple_batch(double* priors, const double* dsts, const int32_t* ns,
                     int n_mols, int max_n, int dim, int rigid_body,
                     int n_threads) {
  if (n_threads <= 0)
    n_threads = std::max(1u, std::thread::hardware_concurrency());
  n_threads = std::min(n_threads, n_mols);
  std::atomic<int> next(0);
  auto worker = [&]() {
    std::vector<double> cost(max_n * max_n);
    std::vector<int> assign(max_n);
    std::vector<double> perm(max_n * dim);
    while (true) {
      int m = next.fetch_add(1);
      if (m >= n_mols) break;
      int n = ns[m];
      if (n <= 1) continue;
      couple_one(priors + (size_t)m * max_n * dim,
                 dsts + (size_t)m * max_n * dim, n, dim, rigid_body,
                 cost.data(), assign.data(), perm.data());
    }
  };
  std::vector<std::thread> threads;
  for (int t = 0; t < n_threads; ++t) threads.emplace_back(worker);
  for (auto& t : threads) t.join();
}

}  // extern "C"
