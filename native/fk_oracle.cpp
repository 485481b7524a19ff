// fk_oracle: host-side double-precision kinematics oracle + classical IK baseline.
//
// Role in the framework (see SURVEY.md §2.4): the reference delegates its
// ground-truth FK path and classical-IK baseline to Klampt (C++); this is the
// first-party equivalent. It is NOT on the TPU hot path — it exists to
// (a) independently verify the XLA FK rollout in float64,
// (b) provide the classical damped-LM IK baseline for benchmark_runtime-style
//     comparisons (reference: /root/reference/scripts/benchmark_runtime.py),
// (c) serve as a CPU fallback when no accelerator is present.
//
// The chain spec is passed in from Python (ikflow_tpu/robots/chain.py is the
// single source of truth); nothing robot-specific is compiled in.
//
// C ABI only; loaded via ctypes. Batch loops are OpenMP-parallel.

#include <cmath>
#include <cstdlib>
#include <cstring>
#include <vector>

extern "C" {

enum JointType { JT_REVOLUTE = 0, JT_PRISMATIC = 1, JT_FIXED = 2 };

// Stack-buffer bound for per-rollout scratch (rollout_one runs twice per LM
// iteration per pose inside OpenMP loops; heap allocation there causes
// allocator contention across threads). All supported arms have ndof <= 10.
#define FK_MAX_NDOF 32

struct FkModel {
  int n_joints;
  int ndof;
  std::vector<double> origin_R;  // n_joints * 9, row-major
  std::vector<double> origin_t;  // n_joints * 3
  std::vector<double> axis;      // n_joints * 3
  std::vector<int> type;         // n_joints
};

FkModel* fk_model_create(int n_joints, const double* origin_R, const double* origin_t,
                         const double* axis, const int* type) {
  FkModel* m = new FkModel();
  m->n_joints = n_joints;
  m->origin_R.assign(origin_R, origin_R + 9 * n_joints);
  m->origin_t.assign(origin_t, origin_t + 3 * n_joints);
  m->axis.assign(axis, axis + 3 * n_joints);
  m->type.assign(type, type + n_joints);
  m->ndof = 0;
  for (int i = 0; i < n_joints; i++)
    if (type[i] != JT_FIXED) m->ndof++;
  if (m->ndof > FK_MAX_NDOF) { delete m; return nullptr; }
  return m;
}

void fk_model_destroy(FkModel* m) { delete m; }

int fk_model_ndof(const FkModel* m) { return m->ndof; }

namespace {

inline void mat_mul33(const double* A, const double* B, double* C) {
  for (int i = 0; i < 3; i++)
    for (int j = 0; j < 3; j++)
      C[3 * i + j] = A[3 * i] * B[j] + A[3 * i + 1] * B[3 + j] + A[3 * i + 2] * B[6 + j];
}

inline void mat_vec33(const double* A, const double* v, double* out) {
  for (int i = 0; i < 3; i++)
    out[i] = A[3 * i] * v[0] + A[3 * i + 1] * v[1] + A[3 * i + 2] * v[2];
}

inline void axis_angle_R(const double* axis, double th, double* R) {
  const double x = axis[0], y = axis[1], z = axis[2];
  const double c = std::cos(th), s = std::sin(th), C = 1.0 - c;
  R[0] = c + x * x * C;     R[1] = x * y * C - z * s; R[2] = x * z * C + y * s;
  R[3] = y * x * C + z * s; R[4] = c + y * y * C;     R[5] = y * z * C - x * s;
  R[6] = z * x * C - y * s; R[7] = z * y * C + x * s; R[8] = c + z * z * C;
}

// Rotation matrix -> quaternion wxyz, w >= 0 (Shepperd).
inline void R_to_quat(const double* R, double* q) {
  const double tr = R[0] + R[4] + R[8];
  double w, x, y, z;
  if (tr > 0) {
    double s = std::sqrt(tr + 1.0) * 2;
    w = 0.25 * s; x = (R[7] - R[5]) / s; y = (R[2] - R[6]) / s; z = (R[3] - R[1]) / s;
  } else if (R[0] > R[4] && R[0] > R[8]) {
    double s = std::sqrt(1.0 + R[0] - R[4] - R[8]) * 2;
    w = (R[7] - R[5]) / s; x = 0.25 * s; y = (R[1] + R[3]) / s; z = (R[2] + R[6]) / s;
  } else if (R[4] > R[8]) {
    double s = std::sqrt(1.0 + R[4] - R[0] - R[8]) * 2;
    w = (R[2] - R[6]) / s; x = (R[1] + R[3]) / s; y = 0.25 * s; z = (R[5] + R[7]) / s;
  } else {
    double s = std::sqrt(1.0 + R[8] - R[0] - R[4]) * 2;
    w = (R[3] - R[1]) / s; x = (R[2] + R[6]) / s; y = (R[5] + R[7]) / s; z = 0.25 * s;
  }
  if (w < 0) { w = -w; x = -x; y = -y; z = -z; }
  q[0] = w; q[1] = x; q[2] = y; q[3] = z;
}

// Single-config rollout. out_R/out_p: end-effector frame. If jac != nullptr,
// fills the 6 x ndof geometric Jacobian [J_pos; J_rot].
void rollout_one(const FkModel* m, const double* q, double* out_R, double* out_p, double* jac) {
  double R[9] = {1, 0, 0, 0, 1, 0, 0, 0, 1};
  double p[3] = {0, 0, 0};
  double world_axes[3 * FK_MAX_NDOF];
  double world_origins[3 * FK_MAX_NDOF];
  int joint_kind[FK_MAX_NDOF];
  int qi = 0;
  double tmpR[9], tv[3];
  for (int j = 0; j < m->n_joints; j++) {
    mat_vec33(R, &m->origin_t[3 * j], tv);
    p[0] += tv[0]; p[1] += tv[1]; p[2] += tv[2];
    mat_mul33(R, &m->origin_R[9 * j], tmpR);
    std::memcpy(R, tmpR, sizeof(tmpR));
    if (m->type[j] == JT_REVOLUTE) {
      double wa[3];
      mat_vec33(R, &m->axis[3 * j], wa);
      std::memcpy(&world_axes[3 * qi], wa, sizeof(wa));
      std::memcpy(&world_origins[3 * qi], p, sizeof(p));
      joint_kind[qi] = JT_REVOLUTE;
      double Rj[9];
      axis_angle_R(&m->axis[3 * j], q[qi], Rj);
      mat_mul33(R, Rj, tmpR);
      std::memcpy(R, tmpR, sizeof(tmpR));
      qi++;
    } else if (m->type[j] == JT_PRISMATIC) {
      double wa[3];
      mat_vec33(R, &m->axis[3 * j], wa);
      std::memcpy(&world_axes[3 * qi], wa, sizeof(wa));
      std::memcpy(&world_origins[3 * qi], p, sizeof(p));
      joint_kind[qi] = JT_PRISMATIC;
      p[0] += q[qi] * wa[0]; p[1] += q[qi] * wa[1]; p[2] += q[qi] * wa[2];
      qi++;
    }
  }
  std::memcpy(out_R, R, sizeof(double) * 9);
  std::memcpy(out_p, p, sizeof(double) * 3);
  if (jac) {
    const int nd = m->ndof;
    for (int i = 0; i < nd; i++) {
      const double* z = &world_axes[3 * i];
      const double* o = &world_origins[3 * i];
      if (joint_kind[i] == JT_REVOLUTE) {
        const double d[3] = {p[0] - o[0], p[1] - o[1], p[2] - o[2]};
        jac[0 * nd + i] = z[1] * d[2] - z[2] * d[1];
        jac[1 * nd + i] = z[2] * d[0] - z[0] * d[2];
        jac[2 * nd + i] = z[0] * d[1] - z[1] * d[0];
        jac[3 * nd + i] = z[0]; jac[4 * nd + i] = z[1]; jac[5 * nd + i] = z[2];
      } else {
        jac[0 * nd + i] = z[0]; jac[1 * nd + i] = z[1]; jac[2 * nd + i] = z[2];
        jac[3 * nd + i] = 0; jac[4 * nd + i] = 0; jac[5 * nd + i] = 0;
      }
    }
  }
}

}  // namespace

// Batched FK: q (n x ndof) -> out_pose (n x 7) [x,y,z,qw,qx,qy,qz].
void fk_forward(const FkModel* m, const double* q, int n, double* out_pose) {
#pragma omp parallel for schedule(static)
  for (int i = 0; i < n; i++) {
    double R[9], p[3];
    rollout_one(m, q + (size_t)i * m->ndof, R, p, nullptr);
    double* o = out_pose + (size_t)i * 7;
    o[0] = p[0]; o[1] = p[1]; o[2] = p[2];
    R_to_quat(R, o + 3);
  }
}

// Batched FK + geometric Jacobian.
void fk_jacobian(const FkModel* m, const double* q, int n, double* out_pose, double* out_jac) {
#pragma omp parallel for schedule(static)
  for (int i = 0; i < n; i++) {
    double R[9], p[3];
    rollout_one(m, q + (size_t)i * m->ndof, R, p, out_jac + (size_t)i * 6 * m->ndof);
    double* o = out_pose + (size_t)i * 7;
    o[0] = p[0]; o[1] = p[1]; o[2] = p[2];
    R_to_quat(R, o + 3);
  }
}

namespace {

// Solve (A + lambda I) x = b for small SPD A (d x d) via Cholesky, in place.
bool chol_solve(int d, double* A, double* b, double lambda) {
  for (int i = 0; i < d; i++) A[i * d + i] += lambda;
  // Cholesky A = L L^T.
  for (int i = 0; i < d; i++) {
    for (int j = 0; j <= i; j++) {
      double s = A[i * d + j];
      for (int k = 0; k < j; k++) s -= A[i * d + k] * A[j * d + k];
      if (i == j) {
        if (s <= 0) return false;
        A[i * d + i] = std::sqrt(s);
      } else {
        A[i * d + j] = s / A[j * d + j];
      }
    }
  }
  // Forward/back substitution.
  for (int i = 0; i < d; i++) {
    double s = b[i];
    for (int k = 0; k < i; k++) s -= A[i * d + k] * b[k];
    b[i] = s / A[i * d + i];
  }
  for (int i = d - 1; i >= 0; i--) {
    double s = b[i];
    for (int k = i + 1; k < d; k++) s -= A[k * d + i] * b[k];
    b[i] = s / A[i * d + i];
  }
  return true;
}

// Rotation-vector log of R_err = R_target * R^T.
inline void rotation_log_err(const double* Rt_quat, const double* R, double* omega) {
  // Build R_target from quaternion.
  const double w = Rt_quat[0], x = Rt_quat[1], y = Rt_quat[2], z = Rt_quat[3];
  double Rt[9] = {
      1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y),
      2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x),
      2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y)};
  // E = Rt * R^T
  double E[9];
  for (int i = 0; i < 3; i++)
    for (int j = 0; j < 3; j++)
      E[3 * i + j] = Rt[3 * i] * R[3 * j] + Rt[3 * i + 1] * R[3 * j + 1] + Rt[3 * i + 2] * R[3 * j + 2];
  double qe[4];
  R_to_quat(E, qe);
  const double nv = std::sqrt(qe[1] * qe[1] + qe[2] * qe[2] + qe[3] * qe[3]);
  const double ang = 2.0 * std::atan2(nv, qe[0]);
  const double scale = nv > 1e-12 ? ang / nv : 2.0;
  omega[0] = qe[1] * scale; omega[1] = qe[2] * scale; omega[2] = qe[3] * scale;
}

}  // namespace

// Classical damped-LM IK baseline (the Klampt-IK role in benchmark_runtime).
// targets: n x 7 poses; q: n x ndof seeds, refined in place.
// limits_low/high: ndof each (clamped every step). Returns per-pose validity
// (pos < pos_tol && rot < rot_tol) in out_valid.
void ik_lm_solve(const FkModel* m, const double* targets, double* q, int n, int max_iters,
                 double lambda0, double pos_tol, double rot_tol,
                 const double* limits_low, const double* limits_high, unsigned char* out_valid) {
  const int nd = m->ndof;
#pragma omp parallel for schedule(dynamic, 16)
  for (int i = 0; i < n; i++) {
    double* qi = q + (size_t)i * nd;
    const double* tgt = targets + (size_t)i * 7;
    double lambda = lambda0;
    unsigned char valid = 0;
    std::vector<double> J(6 * nd), JtJ(nd * nd), Jtr(nd), q_try(nd);
    for (int it = 0; it < max_iters && !valid; it++) {
      double R[9], p[3];
      rollout_one(m, qi, R, p, J.data());
      double r[6] = {tgt[0] - p[0], tgt[1] - p[1], tgt[2] - p[2], 0, 0, 0};
      rotation_log_err(tgt + 3, R, r + 3);
      const double pos_err = std::sqrt(r[0] * r[0] + r[1] * r[1] + r[2] * r[2]);
      const double rot_err = std::sqrt(r[3] * r[3] + r[4] * r[4] + r[5] * r[5]);
      if (pos_err < pos_tol && rot_err < rot_tol) { valid = 1; break; }
      double err = 0;
      for (int k = 0; k < 6; k++) err += r[k] * r[k];
      for (int a = 0; a < nd; a++) {
        Jtr[a] = 0;
        for (int k = 0; k < 6; k++) Jtr[a] += J[k * nd + a] * r[k];
        for (int b = 0; b <= a; b++) {
          double s = 0;
          for (int k = 0; k < 6; k++) s += J[k * nd + a] * J[k * nd + b];
          JtJ[a * nd + b] = s; JtJ[b * nd + a] = s;
        }
      }
      std::vector<double> A(JtJ), rhs(Jtr);
      if (!chol_solve(nd, A.data(), rhs.data(), lambda)) { lambda *= 10; continue; }
      for (int a = 0; a < nd; a++) {
        double v = qi[a] + rhs[a];
        if (limits_low) v = std::max(limits_low[a], std::min(limits_high[a], v));
        q_try[a] = v;
      }
      // Evaluate trial error.
      double R2[9], p2[3];
      rollout_one(m, q_try.data(), R2, p2, nullptr);
      double r2[6] = {tgt[0] - p2[0], tgt[1] - p2[1], tgt[2] - p2[2], 0, 0, 0};
      rotation_log_err(tgt + 3, R2, r2 + 3);
      double err2 = 0;
      for (int k = 0; k < 6; k++) err2 += r2[k] * r2[k];
      if (err2 < err) {
        std::memcpy(qi, q_try.data(), sizeof(double) * nd);
        lambda = std::max(lambda * 0.333, 1e-10);
      } else {
        lambda = std::min(lambda * 5.0, 1e8);
      }
    }
    if (!valid) {
      // Final check (tolerance may be met after the last accepted step).
      double R[9], p[3];
      rollout_one(m, qi, R, p, nullptr);
      double r[6] = {tgt[0] - p[0], tgt[1] - p[1], tgt[2] - p[2], 0, 0, 0};
      rotation_log_err(tgt + 3, R, r + 3);
      const double pos_err = std::sqrt(r[0] * r[0] + r[1] * r[1] + r[2] * r[2]);
      const double rot_err = std::sqrt(r[3] * r[3] + r[4] * r[4] + r[5] * r[5]);
      valid = (pos_err < pos_tol && rot_err < rot_tol) ? 1 : 0;
    }
    out_valid[i] = valid;
  }
}

}  // extern "C"
