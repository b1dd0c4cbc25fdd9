// Native CILQR reference solver (parity oracle + CPU baseline).
//
// A standalone, dependency-free C++17 implementation of the CILQR solve
// with the exact semantics of the reference planner's IlqrOptimizer
// (/root/reference/algorithm/ilqr/ilqr_optimizer.cc) — barrier-CILQR with
// relaxed-log barriers, midpoint-discretized kinematic bicycle, analytic
// Jacobians (including the reference's v-vs-v_mid quirk,
// vehicle_model.cc:59,82), 11-alpha sequential line search and the
// Levenberg lambda schedule (ilqr_optimizer.cc:154-320). Written fresh
// against SURVEY.md's semantic spec (no Eigen, no code reuse): 6x6/6x2
// linear algebra is hand-rolled.
//
// Exposed via a C ABI for ctypes (see bindings.py). Inputs take
// pre-shrunk+normalized constraints so the oracle isolates solver
// semantics; preparation parity is tested separately in numpy.

#include <cmath>
#include <cstdint>
#include <cstring>
#include <algorithm>
#include <limits>
#include <vector>

namespace {

constexpr int NX = 6;
constexpr int NU = 2;

struct Params {
  double dt;
  double wheel_base;
  double max_velocity;
  double min_acceleration, max_acceleration;
  double jerk_min, jerk_max;
  double delta_min, delta_max;
  double delta_rate_min, delta_rate_max;
  double w_x, w_y, w_theta, w_v, w_a, w_delta;  // state weights
  double w_jerk, w_delta_rate;                  // control weights
  double barrier_t, barrier_eps;
  int num_of_disc;
  double veh_length;      // front_hang + wheel_base + rear_hang
  double rear_hang;
  int max_iter;
  double abs_cost_tol, rel_cost_tol;
};

struct Status {
  enum Code { kRunning = 0, kSuccessGnorm = 1, kSuccessAbs = 2,
              kSuccessRel = 3, kFailLambdaMax = 4, kMaxIter = 5 };
};

double NormalizeAngle(double a) {
  double x = std::fmod(a + M_PI, 2.0 * M_PI);
  if (x < 0.0) x += 2.0 * M_PI;
  return x - M_PI;
}

// ---- small dense linear algebra (row-major fixed arrays) -----------------
using Mat66 = double[NX][NX];
using Mat62 = double[NX][NU];
using Mat26 = double[NU][NX];
using Mat22 = double[NU][NU];
using Vec6 = double[NX];
using Vec2 = double[NU];

void MatVec66(const Mat66 A, const Vec6 x, Vec6 y) {
  for (int i = 0; i < NX; ++i) {
    double s = 0;
    for (int j = 0; j < NX; ++j) s += A[i][j] * x[j];
    y[i] = s;
  }
}

// ---- model ---------------------------------------------------------------
struct Model {
  const Params& p;
  explicit Model(const Params& pp) : p(pp) {}

  void Continuous(const Vec6 x, const Vec2 u, Vec6 dx) const {
    double theta = NormalizeAngle(x[2]);
    double delta = NormalizeAngle(x[5]);
    dx[0] = x[3] * std::cos(theta);
    dx[1] = x[3] * std::sin(theta);
    dx[2] = x[3] * std::tan(delta) / p.wheel_base;
    dx[3] = x[4];
    dx[4] = u[0];
    dx[5] = u[1];
  }

  // Midpoint step with angle wrap on theta/delta (vehicle_model.cc:107-121).
  void Step(const Vec6 x, const Vec2 u, Vec6 xn) const {
    Vec6 k1, mid, k2;
    Continuous(x, u, k1);
    for (int i = 0; i < NX; ++i) mid[i] = x[i] + 0.5 * p.dt * k1[i];
    Continuous(mid, u, k2);
    for (int i = 0; i < NX; ++i) xn[i] = x[i] + p.dt * k2[i];
    xn[2] = NormalizeAngle(xn[2]);
    xn[5] = NormalizeAngle(xn[5]);
  }

  // Analytic midpoint Jacobians (vehicle_model.cc:44-86, quirks included).
  void Jacobian(const Vec6 x, const Vec2 u, Mat66 A, Mat62 B) const {
    const double L = p.wheel_base;
    const double dt = p.dt;
    const double v = x[3];
    const double theta = NormalizeAngle(x[2]);
    const double delta = NormalizeAngle(x[5]);
    const double a = x[4];
    const double delta_rate = u[1];

    const double theta_mid = theta + 0.5 * dt * v * std::tan(delta) / L;
    const double td = std::tan(delta);
    const double tdr = std::tan(delta + 0.5 * dt * delta_rate);
    const double ctm = std::cos(theta_mid);
    const double stm = std::sin(theta_mid);
    const double vm = 0.5 * a * dt + v;

    std::memset(A, 0, sizeof(Mat66));
    std::memset(B, 0, sizeof(Mat62));
    A[0][0] = 1; A[0][2] = -dt * vm * stm;
    A[0][3] = dt * ctm - 0.5 * dt * dt * vm * stm * td / L;
    A[0][4] = 0.5 * dt * dt * ctm;
    A[0][5] = -0.5 * dt * dt * v * vm * (td * td + 1) * stm / L;
    A[1][1] = 1; A[1][2] = dt * vm * ctm;
    A[1][3] = dt * stm + 0.5 * dt * dt * vm * ctm * td / L;
    A[1][4] = 0.5 * dt * dt * stm;
    A[1][5] = 0.5 * dt * dt * v * vm * (td * td + 1) * ctm / L;
    A[2][2] = 1; A[2][3] = dt * tdr / L;
    A[2][4] = 0.5 * dt * dt * tdr / L;
    A[2][5] = dt * v * (tdr * tdr + 1) / L;  // reference uses v, not v_mid
    A[3][3] = 1; A[3][4] = dt;
    A[4][4] = 1;
    A[5][5] = 1;
    B[2][1] = 0.5 * dt * dt * v * (tdr * tdr + 1) / L;  // v, not v_mid
    B[3][0] = 0.5 * dt * dt;
    B[4][0] = dt;
    B[5][1] = dt;
  }
};

// ---- barrier (RelaxBarrierFunction, barrier_function.h:82-147) -----------
struct Barrier {
  double t, eps;
  double value(double x) const {
    double rt = 1.0 / t;
    if (x < -eps) return -rt * std::log(-x);
    double q = (-x - 2.0 * eps) / eps;
    return 0.5 * rt * (q * q - 1.0) - rt * std::log(eps);
  }
  double grad(double x) const {
    double rt = 1.0 / t;
    if (x < -eps) return -rt / x;
    return rt * (x + 2.0 * eps) / (eps * eps);
  }
  // dxdx coefficient and ddx coefficient (see barriers.py for the quirk)
  void hess(double x, double* dxdx, double* ddx) const {
    double rt = 1.0 / t;
    if (x < -eps) {
      *dxdx = rt / (x * x);
      *ddx = -rt / x;
    } else {
      *dxdx = rt * (x + 2.0 * eps) / (eps * eps);
      *ddx = 0.0;
    }
  }
};

// ---- problem data --------------------------------------------------------
struct Problem {
  int N;
  const double* goals;          // [N][6]
  const double* corr_planes;    // [N][KC][3]
  const uint8_t* corr_mask;     // [N][KC]
  int KC;
  const double* lane_planes[2];  // left/right [S][3]
  const double* lane_segs[2];    // left/right [S][2][2]
  const uint8_t* lane_mask[2];
  int S[2];
};

struct Solver {
  const Params& p;
  const Problem& pr;
  Model model;
  Barrier bar;
  int N;

  std::vector<double> xs, us;                 // [N][6], [N-1][2]
  std::vector<double> As, Bs;                 // [N-1][6][6], [N-1][6][2]
  std::vector<double> Jx, Ju, Hx, Hu;         // derivative stacks
  std::vector<double> Ks, ks;                 // [N-1][2][6], [N-1][2]
  double deltaV[2];

  Solver(const Params& pp, const Problem& prr)
      : p(pp), pr(prr), model(pp), bar{pp.barrier_t, pp.barrier_eps},
        N(prr.N) {
    xs.resize(N * NX); us.resize((N - 1) * NU);
    As.resize((N - 1) * NX * NX); Bs.resize((N - 1) * NX * NU);
    Jx.resize(N * NX); Ju.resize((N - 1) * NU);
    Hx.resize(N * NX * NX); Hu.resize((N - 1) * NU * NU);
    Ks.resize((N - 1) * NU * NX); ks.resize((N - 1) * NU);
  }

  double* X(int i) { return &xs[i * NX]; }
  double* U(int i) { return &us[i * NU]; }

  // disc center position j for state x (ilqr_optimizer.cc:556-565)
  void DiscPos(const double* x, int j, double* cx, double* cy,
               double* lc, double* ls) const {
    double L = p.veh_length / p.num_of_disc;
    double off = L * (j - 0.5) - p.rear_hang;
    *lc = off * std::cos(x[2]);
    *ls = off * std::sin(x[2]);
    *cx = x[0] + *lc;
    *cy = x[1] + *ls;
  }

  double PointSegDist(double px, double py, const double* seg) const {
    double ax = seg[0], ay = seg[1], bx = seg[2], by = seg[3];
    double abx = bx - ax, aby = by - ay;
    double ab2 = abx * abx + aby * aby;
    double t = 0.0;
    if (ab2 > 0) t = ((px - ax) * abx + (py - ay) * aby) / ab2;
    t = std::min(1.0, std::max(0.0, t));
    double cx = ax + t * abx, cy = ay + t * aby;
    return std::hypot(px - cx, py - cy);
  }

  const double* NearestLane(int side, double px, double py) const {
    double best = std::numeric_limits<double>::max();
    int bi = 0;
    for (int i = 0; i < pr.S[side]; ++i) {
      if (!pr.lane_mask[side][i]) continue;
      double d = PointSegDist(px, py, &pr.lane_segs[side][i * 4]);
      if (d < best) { best = d; bi = i; }
    }
    return &pr.lane_planes[side][bi * 3];
  }

  double TotalCost(const std::vector<double>& x, const std::vector<double>& u,
                   double comp[5]) const {
    double j_cost = 0, dyn = 0, corr = 0, lane = 0;
    for (int i = 0; i < N; ++i) {
      const double* xi = &x[i * NX];
      const double* g = &pr.goals[i * NX];
      j_cost += p.w_x * (xi[0] - g[0]) * (xi[0] - g[0]) +
                p.w_y * (xi[1] - g[1]) * (xi[1] - g[1]) +
                p.w_theta * (xi[2] - g[2]) * (xi[2] - g[2]);
      dyn += bar.value(-xi[3]) + bar.value(xi[3] - p.max_velocity) +
             bar.value(xi[4] - p.max_acceleration) +
             bar.value(p.min_acceleration - xi[4]) +
             bar.value(xi[5] - p.delta_max) + bar.value(p.delta_min - xi[5]);
      for (int j = 0; j < p.num_of_disc; ++j) {
        double cx, cy, lc, ls;
        DiscPos(xi, j, &cx, &cy, &lc, &ls);
        for (int k = 0; k < pr.KC; ++k) {
          if (!pr.corr_mask[i * pr.KC + k]) continue;
          const double* c = &pr.corr_planes[(i * pr.KC + k) * 3];
          corr += bar.value(c[0] * cx + c[1] * cy - c[2]);
        }
        for (int side = 0; side < 2; ++side) {
          const double* c = NearestLane(side, cx, cy);
          lane += bar.value(c[0] * cx + c[1] * cy - c[2]);
        }
      }
    }
    for (int i = 0; i < N - 1; ++i) {
      const double* ui = &u[i * NU];
      j_cost += p.w_jerk * ui[0] * ui[0] + p.w_delta_rate * ui[1] * ui[1];
      dyn += bar.value(ui[0] - p.jerk_max) + bar.value(p.jerk_min - ui[0]) +
             bar.value(ui[1] - p.delta_rate_max) +
             bar.value(p.delta_rate_min - ui[1]);
    }
    if (comp) {
      comp[0] = j_cost + dyn + corr + lane;
      comp[1] = j_cost; comp[2] = dyn; comp[3] = corr; comp[4] = lane;
    }
    return j_cost + dyn + corr + lane;
  }

  // Cost derivatives at knot i (CostJacbian/CostHessian,
  // ilqr_optimizer.cc:620-769); terminal knot uses u = 0 and writes no
  // Ju/Hu.
  void Derivatives(int i) {
    const double* xi = X(i);
    double u0[2] = {0, 0};
    const double* ui = (i < N - 1) ? U(i) : u0;
    const double* g = &pr.goals[i * NX];
    double* jx = &Jx[i * NX];
    double(*hx)[NX] = reinterpret_cast<double(*)[NX]>(&Hx[i * NX * NX]);
    std::memset(jx, 0, sizeof(Vec6));
    std::memset(hx, 0, sizeof(Mat66));

    jx[0] = 2 * p.w_x * (xi[0] - g[0]);
    jx[1] = 2 * p.w_y * (xi[1] - g[1]);
    jx[2] = 2 * p.w_theta * (xi[2] - g[2]);
    hx[0][0] = 2 * p.w_x; hx[1][1] = 2 * p.w_y; hx[2][2] = 2 * p.w_theta;
    hx[3][3] = 2 * p.w_v; hx[4][4] = 2 * p.w_a; hx[5][5] = 2 * p.w_delta;

    // state limit barriers: pairs (g, index, sign)
    const double gs[6] = {-xi[3], xi[3] - p.max_velocity,
                          p.min_acceleration - xi[4],
                          xi[4] - p.max_acceleration,
                          p.delta_min - xi[5], xi[5] - p.delta_max};
    const int gi[6] = {3, 3, 4, 4, 5, 5};
    const double sg[6] = {-1, 1, -1, 1, -1, 1};
    for (int k = 0; k < 6; ++k) {
      jx[gi[k]] += bar.grad(gs[k]) * sg[k];
      double dd, dx2;
      bar.hess(gs[k], &dx2, &dd);
      hx[gi[k]][gi[k]] += dx2;  // sign^2 == 1, linear g => no ddx term
    }

    // corridor barriers
    for (int j = 0; j < p.num_of_disc; ++j) {
      double cx, cy, lc, ls;
      DiscPos(xi, j, &cx, &cy, &lc, &ls);
      for (int k = 0; k < pr.KC; ++k) {
        if (!pr.corr_mask[i * pr.KC + k]) continue;
        const double* c = &pr.corr_planes[(i * pr.KC + k) * 3];
        double gv = c[0] * cx + c[1] * cy - c[2];
        double d[3] = {c[0], c[1], -c[0] * ls + c[1] * lc};
        double gf = bar.grad(gv);
        double dx2, dd;
        bar.hess(gv, &dx2, &dd);
        double ddx22 = -c[0] * lc - c[1] * ls;
        for (int a = 0; a < 3; ++a) jx[a] += gf * d[a];
        for (int a = 0; a < 3; ++a)
          for (int b = 0; b < 3; ++b) hx[a][b] += dx2 * d[a] * d[b];
        hx[2][2] += dd * ddx22;
      }
      for (int side = 0; side < 2; ++side) {
        const double* c = NearestLane(side, cx, cy);
        double gv = c[0] * cx + c[1] * cy - c[2];
        double d[3] = {c[0], c[1], -c[0] * ls + c[1] * lc};
        double gf = bar.grad(gv);
        double dx2, dd;
        bar.hess(gv, &dx2, &dd);
        double ddx22 = -c[0] * lc - c[1] * ls;
        for (int a = 0; a < 3; ++a) jx[a] += gf * d[a];
        for (int a = 0; a < 3; ++a)
          for (int b = 0; b < 3; ++b) hx[a][b] += dx2 * d[a] * d[b];
        hx[2][2] += dd * ddx22;
      }
    }

    if (i < N - 1) {
      double* ju = &Ju[i * NU];
      double(*hu)[NU] = reinterpret_cast<double(*)[NU]>(&Hu[i * NU * NU]);
      ju[0] = 2 * p.w_jerk * ui[0];
      ju[1] = 2 * p.w_delta_rate * ui[1];
      hu[0][0] = 2 * p.w_jerk; hu[0][1] = 0;
      hu[1][0] = 0; hu[1][1] = 2 * p.w_delta_rate;
      const double gu[4] = {p.jerk_min - ui[0], ui[0] - p.jerk_max,
                            p.delta_rate_min - ui[1],
                            ui[1] - p.delta_rate_max};
      const int gui[4] = {0, 0, 1, 1};
      const double gsg[4] = {-1, 1, -1, 1};
      for (int k = 0; k < 4; ++k) {
        ju[gui[k]] += bar.grad(gu[k]) * gsg[k];
        double dx2, dd;
        bar.hess(gu[k], &dx2, &dd);
        hu[gui[k]][gui[k]] += dx2;
      }
    }
  }

  // LQR init guess (IlqrOptimizer::iqr, ilqr_optimizer.cc:793-842).
  void InitGuess() {
    double Q[NX] = {0.001, 0.001, 0.001, 0.001, 0.01, 0.005};
    double R[NU] = {0.2, 0.05};
    std::vector<double> Kstack((N - 1) * NU * NX);
    Mat66 P;
    std::memset(P, 0, sizeof(P));
    for (int i = 0; i < NX; ++i) P[i][i] = Q[i];

    Mat66 A; Mat62 B;
    Vec2 u0 = {0, 0};
    for (int i = N - 2; i >= 0; --i) {
      model.Jacobian(&pr.goals[i * NX], u0, A, B);
      // M = R + B^T P B (2x2); G = B^T P A (2x6)
      double PB[NX][NU];
      for (int r = 0; r < NX; ++r)
        for (int c = 0; c < NU; ++c) {
          double s = 0;
          for (int k = 0; k < NX; ++k) s += P[r][k] * B[k][c];
          PB[r][c] = s;
        }
      double M[NU][NU];
      for (int r = 0; r < NU; ++r)
        for (int c = 0; c < NU; ++c) {
          double s = (r == c) ? R[r] : 0.0;
          for (int k = 0; k < NX; ++k) s += B[k][r] * PB[k][c];
          M[r][c] = s;
        }
      double G[NU][NX];
      for (int r = 0; r < NU; ++r)
        for (int c = 0; c < NX; ++c) {
          double s = 0;
          for (int k = 0; k < NX; ++k) {
            double pa = 0;
            for (int m = 0; m < NX; ++m) pa += P[k][m] * A[m][c];
            s += B[k][r] * pa;
          }
          G[r][c] = s;
        }
      double det = M[0][0] * M[1][1] - M[0][1] * M[1][0];
      double Mi[NU][NU] = {{M[1][1] / det, -M[0][1] / det},
                           {-M[1][0] / det, M[0][0] / det}};
      double* K = &Kstack[i * NU * NX];
      for (int r = 0; r < NU; ++r)
        for (int c = 0; c < NX; ++c)
          K[r * NX + c] = Mi[r][0] * G[0][c] + Mi[r][1] * G[1][c];
      // P = Q + A^T P (A - B K)
      Mat66 ABK;
      for (int r = 0; r < NX; ++r)
        for (int c = 0; c < NX; ++c) {
          double s = A[r][c];
          for (int k = 0; k < NU; ++k) s -= B[r][k] * K[k * NX + c];
          ABK[r][c] = s;
        }
      Mat66 Pn;
      for (int r = 0; r < NX; ++r)
        for (int c = 0; c < NX; ++c) {
          double s = (r == c) ? Q[r] : 0.0;
          for (int k = 0; k < NX; ++k) {
            double pa = 0;
            for (int m = 0; m < NX; ++m) pa += P[k][m] * ABK[m][c];
            s += A[k][r] * pa;
          }
          Pn[r][c] = s;
        }
      std::memcpy(P, Pn, sizeof(P));
    }

    // clamped closed-loop rollout from goals[0]
    std::memcpy(X(0), &pr.goals[0], sizeof(Vec6));
    for (int i = 0; i < N - 1; ++i) {
      const double* K = &Kstack[i * NU * NX];
      double* u = U(i);
      for (int r = 0; r < NU; ++r) {
        double s = 0;
        for (int c = 0; c < NX; ++c)
          s += K[r * NX + c] * (X(i)[c] - pr.goals[i * NX + c]);
        u[r] = -s;
      }
      u[0] = std::min(p.jerk_max, std::max(p.jerk_min, u[0]));
      u[1] = std::min(p.delta_rate_max, std::max(p.delta_rate_min, u[1]));
      model.Step(X(i), u, X(i + 1));
    }
  }

  bool Backward(double lambda) {
    // Riccati sweep (ilqr_optimizer.cc:334-390); never diverges.
    deltaV[0] = deltaV[1] = 0.0;
    Vec6 Vx;
    Mat66 Vxx;
    std::memcpy(Vx, &Jx[(N - 1) * NX], sizeof(Vec6));
    std::memcpy(Vxx, &Hx[(N - 1) * NX * NX], sizeof(Mat66));
    for (int i = N - 2; i >= 0; --i) {
      double(*A)[NX] = reinterpret_cast<double(*)[NX]>(&As[i * NX * NX]);
      double(*B)[NU] = reinterpret_cast<double(*)[NU]>(&Bs[i * NX * NU]);
      Vec6 Qx;
      Vec2 Qu;
      Mat66 Qxx;
      Mat22 Quu;
      Mat26 Qux;
      // Qx = Jx + A^T Vx ; Qu = Ju + B^T Vx
      for (int r = 0; r < NX; ++r) {
        double s = Jx[i * NX + r];
        for (int k = 0; k < NX; ++k) s += A[k][r] * Vx[k];
        Qx[r] = s;
      }
      for (int r = 0; r < NU; ++r) {
        double s = Ju[i * NU + r];
        for (int k = 0; k < NX; ++k) s += B[k][r] * Vx[k];
        Qu[r] = s;
      }
      // VA = Vxx A ; VB = Vxx B
      Mat66 VA;
      double VB[NX][NU];
      for (int r = 0; r < NX; ++r) {
        for (int c = 0; c < NX; ++c) {
          double s = 0;
          for (int k = 0; k < NX; ++k) s += Vxx[r][k] * A[k][c];
          VA[r][c] = s;
        }
        for (int c = 0; c < NU; ++c) {
          double s = 0;
          for (int k = 0; k < NX; ++k) s += Vxx[r][k] * B[k][c];
          VB[r][c] = s;
        }
      }
      double(*hx)[NX] = reinterpret_cast<double(*)[NX]>(&Hx[i * NX * NX]);
      double(*hu)[NU] = reinterpret_cast<double(*)[NU]>(&Hu[i * NU * NU]);
      for (int r = 0; r < NX; ++r)
        for (int c = 0; c < NX; ++c) {
          double s = hx[r][c];
          for (int k = 0; k < NX; ++k) s += A[k][r] * VA[k][c];
          Qxx[r][c] = s;
        }
      for (int r = 0; r < NU; ++r)
        for (int c = 0; c < NU; ++c) {
          double s = hu[r][c];
          for (int k = 0; k < NX; ++k) s += B[k][r] * VB[k][c];
          Quu[r][c] = s;
        }
      for (int r = 0; r < NU; ++r)
        for (int c = 0; c < NX; ++c) {
          double s = 0;
          for (int k = 0; k < NX; ++k) s += B[k][r] * VA[k][c];
          Qux[r][c] = s;
        }
      double M00 = Quu[0][0] + lambda, M11 = Quu[1][1] + lambda;
      double det = M00 * M11 - Quu[0][1] * Quu[1][0];
      double Mi[2][2] = {{M11 / det, -Quu[0][1] / det},
                         {-Quu[1][0] / det, M00 / det}};
      double* K = &Ks[i * NU * NX];
      double* kk = &ks[i * NU];
      for (int r = 0; r < NU; ++r) {
        for (int c = 0; c < NX; ++c)
          K[r * NX + c] = -(Mi[r][0] * Qux[0][c] + Mi[r][1] * Qux[1][c]);
        kk[r] = -(Mi[r][0] * Qu[0] + Mi[r][1] * Qu[1]);
      }
      // Vx = Qx + K^T Quu k + K^T Qu + Qux^T k
      Vec2 Quuk = {Quu[0][0] * kk[0] + Quu[0][1] * kk[1],
                   Quu[1][0] * kk[0] + Quu[1][1] * kk[1]};
      for (int r = 0; r < NX; ++r) {
        double s = Qx[r];
        for (int k = 0; k < NU; ++k)
          s += K[k * NX + r] * (Quuk[k] + Qu[k]) + Qux[k][r] * kk[k];
        Vx[r] = s;
      }
      // Vxx = Qxx + K^T Quu K + K^T Qux + Qux^T K (then symmetrize)
      Mat66 Vn;
      for (int r = 0; r < NX; ++r)
        for (int c = 0; c < NX; ++c) {
          double s = Qxx[r][c];
          for (int a = 0; a < NU; ++a) {
            double QuuK = Quu[a][0] * K[0 * NX + c] + Quu[a][1] * K[1 * NX + c];
            s += K[a * NX + r] * QuuK + K[a * NX + r] * Qux[a][c] +
                 Qux[a][r] * K[a * NX + c];
          }
          Vn[r][c] = s;
        }
      for (int r = 0; r < NX; ++r)
        for (int c = 0; c < NX; ++c) Vxx[r][c] = 0.5 * (Vn[r][c] + Vn[c][r]);
      deltaV[0] += kk[0] * Qu[0] + kk[1] * Qu[1];
      deltaV[1] += 0.5 * (kk[0] * Quuk[0] + kk[1] * Quuk[1]);
    }
    return false;
  }

  void Forward(double alpha, std::vector<double>& nx,
               std::vector<double>& nu) {
    nx = xs;
    nu = us;
    Vec6 x;
    std::memcpy(x, &pr.goals[0], sizeof(Vec6));
    std::memcpy(&nx[0], x, sizeof(Vec6));
    for (int i = 0; i < N - 1; ++i) {
      const double* K = &Ks[i * NU * NX];
      double* u = &nu[i * NU];
      for (int r = 0; r < NU; ++r) {
        double s = u[r] + alpha * ks[i * NU + r];
        for (int c = 0; c < NX; ++c)
          s += K[r * NX + c] * (x[c] - xs[i * NX + c]);
        u[r] = s;
      }
      u[1] = NormalizeAngle(u[1]);  // reference quirk (ilqr_optimizer.cc:408)
      Vec6 xn;
      model.Step(x, u, xn);
      std::memcpy(&nx[(i + 1) * NX], xn, sizeof(Vec6));
      std::memcpy(x, xn, sizeof(Vec6));
    }
  }

  double GradientNorm() const {
    double acc = 0;
    for (int i = 0; i < N - 1; ++i) {
      double m = 0;
      for (int r = 0; r < NU; ++r) {
        double v = std::fabs(ks[i * NU + r]) /
                   (std::fabs(us[i * NU + r]) + 1.0);
        m = std::max(m, v);
      }
      acc += m;
    }
    return acc / (N - 1);
  }

  int Solve(double* out_xs, double* out_us, int* out_iters,
            double* out_cost, double* init_xs, double* init_us) {
    InitGuess();
    if (init_xs) std::memcpy(init_xs, xs.data(), xs.size() * sizeof(double));
    if (init_us) std::memcpy(init_us, us.data(), us.size() * sizeof(double));
    double comp[5];
    double cost_old = TotalCost(xs, us, comp);

    double lambda = 1.0, dlambda = 1.0;
    const double reg_ratio = 1.6, reg_min = 1e-8, reg_max = 1e11;
    const double gnorm_min = 1e-6, beta_min = 1e-4, beta_max = 10.0;
    static const double alphas[11] = {1.0000, 0.5012, 0.2512, 0.1259, 0.0631,
                                      0.0316, 0.0158, 0.0079, 0.0040, 0.0020,
                                      0.0010};
    int status = Status::kRunning;
    bool relinearize = true;
    int iter = 0;
    std::vector<double> nx, nu;
    double cost_new = 0;
    for (; iter < p.max_iter; ++iter) {
      if (relinearize) {
        for (int i = 0; i < N - 1; ++i) {
          model.Jacobian(X(i), U(i),
                         *reinterpret_cast<Mat66*>(&As[i * NX * NX]),
                         *reinterpret_cast<Mat62*>(&Bs[i * NX * NU]));
          Derivatives(i);
        }
        Derivatives(N - 1);
        relinearize = false;
      }
      Backward(lambda);  // never diverges (LLT check disabled in reference)

      double g = GradientNorm();
      if (g < gnorm_min && lambda < 1e-5) { status = Status::kSuccessGnorm; break; }

      bool accepted = false;
      double dcost = 0;
      for (int ai = 0; ai < 11; ++ai) {
        double alpha = alphas[ai];
        Forward(alpha, nx, nu);
        cost_new = TotalCost(nx, nu, comp);
        dcost = cost_old - cost_new;
        double expected = -alpha * (deltaV[0] + alpha * deltaV[1]);
        double z = dcost / expected;
        if (z > beta_min && z < beta_max && dcost > 0.0) {
          accepted = true;
          break;
        }
      }

      if (accepted) {
        xs.swap(nx);
        us.swap(nu);
        dlambda = std::fmin(dlambda / reg_ratio, 1.0 / reg_ratio);
        lambda = lambda * dlambda * (lambda > reg_min ? 1.0 : 0.0);
        relinearize = true;
        if (dcost < p.abs_cost_tol) { cost_old = cost_new; ++iter; status = Status::kSuccessAbs; break; }
        if (dcost / cost_old < p.rel_cost_tol) { cost_old = cost_new; ++iter; status = Status::kSuccessRel; break; }
        cost_old = cost_new;
      } else {
        dlambda = std::fmax(dlambda * reg_ratio, reg_ratio);
        lambda = std::fmax(lambda * dlambda, reg_min);
        if (lambda > reg_max) { ++iter; status = Status::kFailLambdaMax; break; }
      }
    }
    if (status == Status::kRunning) status = Status::kMaxIter;

    TotalCost(xs, us, comp);
    std::memcpy(out_xs, xs.data(), xs.size() * sizeof(double));
    std::memcpy(out_us, us.data(), us.size() * sizeof(double));
    *out_iters = iter;
    std::memcpy(out_cost, comp, sizeof(comp));
    return status;
  }
};

}  // namespace

extern "C" {

int cilqr_ref_solve(const double* goals, int N,
                    const double* corr_planes, const uint8_t* corr_mask,
                    int KC,
                    const double* left_planes, const double* left_segs,
                    const uint8_t* left_mask, int SL,
                    const double* right_planes, const double* right_segs,
                    const uint8_t* right_mask, int SR,
                    const Params* params,
                    double* out_xs, double* out_us, int* out_iters,
                    double* out_cost, double* init_xs, double* init_us) {
  Problem pr;
  pr.N = N;
  pr.goals = goals;
  pr.corr_planes = corr_planes;
  pr.corr_mask = corr_mask;
  pr.KC = KC;
  pr.lane_planes[0] = left_planes;
  pr.lane_segs[0] = left_segs;
  pr.lane_mask[0] = left_mask;
  pr.S[0] = SL;
  pr.lane_planes[1] = right_planes;
  pr.lane_segs[1] = right_segs;
  pr.lane_mask[1] = right_mask;
  pr.S[1] = SR;
  Solver s(*params, pr);
  return s.Solve(out_xs, out_us, out_iters, out_cost, init_xs, init_us);
}

// RK2 step exposed for unit parity checks.
void cilqr_ref_step(const double* x, const double* u, const Params* params,
                    double* xn) {
  Model m(*params);
  m.Step(x, u, xn);
}

void cilqr_ref_jacobian(const double* x, const double* u,
                        const Params* params, double* A, double* B) {
  Model m(*params);
  m.Jacobian(x, u, *reinterpret_cast<Mat66*>(A),
             *reinterpret_cast<Mat62*>(B));
}

}  // extern "C"
