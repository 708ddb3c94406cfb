// Minimal LAPACK++ 2.5.4 API subset backed by system BLAS/LAPACK,
// sufficient to compile and run the reference aku library offline
// (the real lapackpp is fetched from sourceforge by the reference's
// ExternalProject, which a zero-egress build host cannot do).
//
// Semantics notes (chosen to match the call patterns in aku/*.cc):
//  - operator()(LaIndex, LaIndex) returns a VIEW sharing storage;
//    C++17 guaranteed copy elision means `Matrix A = W(I, J)` and
//    `A(I, J).inject(B)` both write through to the parent.
//  - the copy constructor from an LVALUE makes a deep copy (safe for
//    aku's `Matrix t2(A)` followed by BLAS calls reading A).
//  - operator=(const Matrix&) is a deep copy (resizes owners,
//    injects into views); operator=(double) fills the view extent.
//  - Blas_Mat_*_Mult defends against aliased outputs (aku calls
//    e.g. Blas_Mat_Mat_Mult(A, B, A)) by staging through a copy.
#ifndef AKU_STUB_LAPACKPP_H
#define AKU_STUB_LAPACKPP_H

#include <algorithm>
#include <cassert>
#include <cmath>
#include <cstdio>
#include <cstring>
#include <memory>
#include <sstream>
#include <stdexcept>
#include <vector>

extern "C" {
void dgemm_(const char*, const char*, const int*, const int*,
            const int*, const double*, const double*, const int*,
            const double*, const int*, const double*, double*,
            const int*);
void dgemv_(const char*, const int*, const int*, const double*,
            const double*, const int*, const double*, const int*,
            const double*, double*, const int*);
void dgetrf_(const int*, const int*, double*, const int*, int*, int*);
void dgetri_(const int*, double*, const int*, const int*, double*,
             const int*, int*);
void dsyev_(const char*, const char*, const int*, double*, const int*,
            double*, double*, const int*, int*);
void dgeev_(const char*, const char*, const int*, double*, const int*,
            double*, double*, double*, const int*, double*, const int*,
            double*, const int*, int*);
void zgeev_(const char*, const char*, const int*, double*, const int*,
            double*, double*, const int*, double*, const int*, double*,
            const int*, double*, int*);
void dgesvd_(const char*, const char*, const int*, const int*, double*,
             const int*, double*, double*, const int*, double*,
             const int*, double*, const int*, int*);
}

struct LaComplex {
  double r, i;
  LaComplex(double rr = 0.0, double ii = 0.0) : r(rr), i(ii) {}
};
typedef LaComplex COMPLEX;

class LaException : public std::runtime_error {
public:
  explicit LaException(const char* m = "lapack error")
      : std::runtime_error(m) {}
  LaException(const char* w, const char* m) : std::runtime_error(m) {
    (void)w;
  }
};

class LaIndex {
public:
  LaIndex() : s_(0), e_(-1), all_(true) {}
  LaIndex(int s, int e) : s_(s), e_(e), all_(false) {}
  int start() const { return s_; }
  int end() const { return e_; }
  bool all() const { return all_; }

private:
  int s_, e_;
  bool all_;
};

class LaGenMatDouble {
public:
  LaGenMatDouble() : d_(nullptr), m_(0), n_(0), lda_(0) {}
  LaGenMatDouble(int m, int n) { alloc(m, n); }
  LaGenMatDouble(const LaGenMatDouble& s) {  // deep (lvalue) copy
    alloc(s.m_, s.n_);
    for (int j = 0; j < n_; ++j)
      for (int i = 0; i < m_; ++i) (*this)(i, j) = s(i, j);
  }
  // construct over external storage (column-major), used by vectors
  double& operator()(int i, int j) { return d_[j * lda_ + i]; }
  const double& operator()(int i, int j) const { return d_[j * lda_ + i]; }

  int rows() const { return m_; }
  int cols() const { return n_; }
  int size(int d) const { return d == 0 ? m_ : n_; }
  int inc() const { return 1; }
  int gdim(int d) const { return d == 0 ? lda_ : n_; }
  double* addr() { return d_; }
  const double* addr() const { return d_; }
  bool is_view() const {
    return store_ && (d_ != store_->data() || m_ != lda_ ||
                      (long)store_->size() != (long)lda_ * n_);
  }

  LaGenMatDouble operator()(const LaIndex& I, const LaIndex& J) {
    int i0 = I.all() ? 0 : I.start();
    int i1 = I.all() ? m_ - 1 : I.end();
    int j0 = J.all() ? 0 : J.start();
    int j1 = J.all() ? n_ - 1 : J.end();
    LaGenMatDouble v;
    v.store_ = store_;
    v.d_ = d_ + (long)j0 * lda_ + i0;
    v.m_ = i1 - i0 + 1;
    v.n_ = j1 - j0 + 1;
    v.lda_ = lda_;
    return v;
  }
  LaGenMatDouble operator()(const LaIndex& I, const LaIndex& J) const {
    return const_cast<LaGenMatDouble*>(this)->operator()(I, J);
  }
  LaGenMatDouble col(int j) const {
    return (*this)(LaIndex(0, m_ - 1), LaIndex(j, j));
  }
  LaGenMatDouble row(int i) const {
    return (*this)(LaIndex(i, i), LaIndex(0, n_ - 1));
  }
  LaGenMatDouble copy() const {  // explicit deep copy of a view
    LaGenMatDouble out(m_, n_);
    for (int j = 0; j < n_; ++j)
      for (int i = 0; i < m_; ++i) out(i, j) = (*this)(i, j);
    return out;
  }

  LaGenMatDouble& resize(int m, int n) {
    if (m == m_ && n == n_ && !is_view()) return *this;
    alloc(m, n);
    return *this;
  }
  LaGenMatDouble& resize(const LaGenMatDouble& s) {
    return resize(s.m_, s.n_);
  }

  LaGenMatDouble& operator=(double v) {
    for (int j = 0; j < n_; ++j)
      for (int i = 0; i < m_; ++i) (*this)(i, j) = v;
    return *this;
  }
  LaGenMatDouble& copy(const LaGenMatDouble& s) {
    if (&s == this) return *this;
    if (m_ != s.m_ || n_ != s.n_) {
      assert(!is_view());
      alloc(s.m_, s.n_);
    }
    for (int j = 0; j < n_; ++j)
      for (int i = 0; i < m_; ++i) (*this)(i, j) = s(i, j);
    return *this;
  }
  LaGenMatDouble& operator=(const LaGenMatDouble& s) { return copy(s); }
  LaGenMatDouble& inject(const LaGenMatDouble& s) {
    assert(m_ == s.m_ && n_ == s.n_);
    for (int j = 0; j < n_; ++j)
      for (int i = 0; i < m_; ++i) (*this)(i, j) = s(i, j);
    return *this;
  }
  LaGenMatDouble& ref(const LaGenMatDouble& s) {
    store_ = s.store_;
    d_ = s.d_;
    m_ = s.m_;
    n_ = s.n_;
    lda_ = s.lda_;
    return *this;
  }

  double trace() const {
    double t = 0;
    for (int i = 0; i < std::min(m_, n_); ++i) t += (*this)(i, i);
    return t;
  }

  static LaGenMatDouble zeros(int m, int n = -1) {
    LaGenMatDouble a(m, n < 0 ? m : n);
    a = 0.0;
    return a;
  }
  static LaGenMatDouble eye(int m, int n = -1) {
    LaGenMatDouble a = zeros(m, n);
    for (int i = 0; i < std::min(a.m_, a.n_); ++i) a(i, i) = 1.0;
    return a;
  }
  // lapackpp 2.5.4: square matrix with v on the diagonal (lda.cc:440)
  static LaGenMatDouble from_diag(const LaGenMatDouble &v) {
    int n = v.m_ * v.n_;
    LaGenMatDouble a = zeros(n, n);
    for (int i = 0; i < n; ++i) a(i, i) = v.rows() == 1
        ? const_cast<LaGenMatDouble&>(v)(0, i)
        : const_cast<LaGenMatDouble&>(v)(i % v.m_, i / v.m_);
    return a;
  }

  // contiguous column-major copy helper for LAPACK calls
  std::vector<double> packed() const {
    std::vector<double> p((size_t)m_ * n_);
    for (int j = 0; j < n_; ++j)
      for (int i = 0; i < m_; ++i) p[(size_t)j * m_ + i] = (*this)(i, j);
    return p;
  }
  void unpack(const std::vector<double>& p) {
    for (int j = 0; j < n_; ++j)
      for (int i = 0; i < m_; ++i) (*this)(i, j) = p[(size_t)j * m_ + i];
  }

protected:
  void alloc(int m, int n) {
    store_ = std::make_shared<std::vector<double>>((size_t)m * n, 0.0);
    d_ = store_->data();
    m_ = m;
    n_ = n;
    lda_ = m;
  }
  std::shared_ptr<std::vector<double>> store_;
  double* d_;
  int m_, n_, lda_;
};

// column vector = m x 1 matrix; (i) indexes elements
class LaVectorDouble : public LaGenMatDouble {
public:
  LaVectorDouble() {}
  explicit LaVectorDouble(int n) : LaGenMatDouble(n, 1) {}
  LaVectorDouble(int m, int n) : LaGenMatDouble(m * n, 1) {}
  LaVectorDouble(const LaGenMatDouble& s) {  // flatten views/cols
    assert(s.rows() == 1 || s.cols() == 1);
    alloc(s.rows() * s.cols(), 1);
    int k = 0;
    for (int j = 0; j < s.cols(); ++j)
      for (int i = 0; i < s.rows(); ++i) (*this)(k++) = s(i, j);
  }
  int size() const { return m_ * n_; }
  using LaGenMatDouble::operator();
  double& operator()(int i) { return d_[(long)i]; }
  const double& operator()(int i) const { return d_[(long)i]; }
  LaVectorDouble& resize(int m, int n = 1) {
    LaGenMatDouble::resize(m * n, 1);
    return *this;
  }
  LaVectorDouble& operator=(double v) {
    LaGenMatDouble::operator=(v);
    return *this;
  }
  LaVectorDouble& operator=(const LaGenMatDouble& s) {
    if (s.rows() == 1 || s.cols() == 1) {
      if (size() != s.rows() * s.cols()) {
        assert(!is_view());
        alloc(s.rows() * s.cols(), 1);
      }
      int k = 0;
      for (int j = 0; j < s.cols(); ++j)
        for (int i = 0; i < s.rows(); ++i) (*this)(k++) = s(i, j);
      return *this;
    }
    LaGenMatDouble::copy(s);
    return *this;
  }
  LaVectorDouble& ref(const LaGenMatDouble& s) {
    LaGenMatDouble::ref(s);
    // views of a column are contiguous; rows would need inc != 1
    assert(s.cols() == 1 || s.rows() == 1);
    if (s.rows() == 1 && s.cols() > 1) {
      // a row view is strided: materialize (aku only refs columns)
      assert(false && "row ref not supported");
    }
    m_ = s.rows() * s.cols();
    n_ = 1;
    return *this;
  }
};

class LaVectorLongInt {
public:
  LaVectorLongInt() {}
  explicit LaVectorLongInt(int n) : v_(n, 0) {}
  LaVectorLongInt(int m, int n) : v_((size_t)m * n, 0) {}
  int size() const { return (int)v_.size(); }
  void resize(int m, int n = 1) { v_.assign((size_t)m * n, 0); }
  int& operator()(int i) { return v_[i]; }
  const int& operator()(int i) const { return v_[i]; }
  int* addr() { return v_.data(); }

private:
  std::vector<int> v_;
};

class LaGenMatComplex {
public:
  LaGenMatComplex() : m_(0), n_(0) {}
  LaGenMatComplex(int m, int n) : m_(m), n_(n), d_((size_t)m * n) {}
  explicit LaGenMatComplex(const LaGenMatDouble& s)
      : m_(s.rows()), n_(s.cols()), d_((size_t)s.rows() * s.cols()) {
    for (int j = 0; j < n_; ++j)
      for (int i = 0; i < m_; ++i) (*this)(i, j) = LaComplex(s(i, j));
  }
  int rows() const { return m_; }
  int cols() const { return n_; }
  void resize(int m, int n) {
    m_ = m;
    n_ = n;
    d_.assign((size_t)m * n, LaComplex());
  }
  LaComplex& operator()(int i, int j) { return d_[(size_t)j * m_ + i]; }
  const LaComplex& operator()(int i, int j) const {
    return d_[(size_t)j * m_ + i];
  }
  double* raw() { return reinterpret_cast<double*>(d_.data()); }

private:
  int m_, n_;
  std::vector<LaComplex> d_;
};

class LaVectorComplex {
public:
  LaVectorComplex() {}
  explicit LaVectorComplex(int n) : d_(n) {}
  int size() const { return (int)d_.size(); }
  void resize(int m, int n = 1) { d_.assign((size_t)m * n, LaComplex()); }
  LaComplex& operator()(int i) { return d_[i]; }
  const LaComplex& operator()(int i) const { return d_[i]; }
  double* raw() { return reinterpret_cast<double*>(d_.data()); }

private:
  std::vector<LaComplex> d_;
};

typedef LaGenMatDouble LaSymmMatDouble;

// ---------------------------------------------------------------- BLAS 1
inline void Blas_Scale(double a, LaGenMatDouble& A) {
  for (int j = 0; j < A.cols(); ++j)
    for (int i = 0; i < A.rows(); ++i) A(i, j) *= a;
}
inline void Blas_Add_Mult(LaGenMatDouble& Y, double a,
                          const LaGenMatDouble& X) {
  assert(Y.rows() * Y.cols() == X.rows() * X.cols());
  // vectors may differ in orientation; walk element order
  if (Y.cols() == X.cols() && Y.rows() == X.rows()) {
    for (int j = 0; j < Y.cols(); ++j)
      for (int i = 0; i < Y.rows(); ++i) Y(i, j) += a * X(i, j);
  } else {
    LaVectorDouble xf(X);
    int k = 0;
    for (int j = 0; j < Y.cols(); ++j)
      for (int i = 0; i < Y.rows(); ++i) Y(i, j) += a * xf(k++);
  }
}
inline void Blas_Add_Mat_Mult(LaGenMatDouble& A, double alpha,
                              const LaGenMatDouble& B) {
  assert(A.rows() == B.rows() && A.cols() == B.cols());
  for (int j = 0; j < A.cols(); ++j)
    for (int i = 0; i < A.rows(); ++i) A(i, j) += alpha * B(i, j);
}
inline double Blas_Dot_Prod(const LaGenMatDouble& X,
                            const LaGenMatDouble& Y) {
  assert(X.rows() * X.cols() == Y.rows() * Y.cols());
  LaVectorDouble xf(X), yf(Y);
  double s = 0;
  for (int i = 0; i < xf.size(); ++i) s += xf(i) * yf(i);
  return s;
}
inline double Blas_Norm2(const LaGenMatDouble& X) {
  return std::sqrt(Blas_Dot_Prod(X, X));
}
inline double Blas_Norm1(const LaGenMatDouble& X) {
  double s = 0;
  for (int j = 0; j < X.cols(); ++j)
    for (int i = 0; i < X.rows(); ++i) s += std::fabs(X(i, j));
  return s;
}

// ---------------------------------------------------------------- BLAS 2/3
inline void Blas_R1_Update(LaGenMatDouble& A, const LaGenMatDouble& x,
                           const LaGenMatDouble& y, double alpha = 1.0) {
  LaVectorDouble xf(x), yf(y);
  assert(A.rows() == xf.size() && A.cols() == yf.size());
  for (int j = 0; j < A.cols(); ++j)
    for (int i = 0; i < A.rows(); ++i) A(i, j) += alpha * xf(i) * yf(j);
}

// symmetric rank-1 update (blas3pp.h form):
// A = beta * A + alpha * x x^T
inline void Blas_R1_Update(LaGenMatDouble& A, const LaGenMatDouble& x,
                           double alpha, double beta, bool) {
  LaVectorDouble xf(x);
  assert(A.rows() == xf.size() && A.cols() == xf.size());
  for (int j = 0; j < A.cols(); ++j)
    for (int i = 0; i < A.rows(); ++i)
      A(i, j) = beta * A(i, j) + alpha * xf(i) * xf(j);
}

inline LaGenMatDouble operator+(const LaGenMatDouble& A,
                                const LaGenMatDouble& B) {
  LaGenMatDouble C(A);
  Blas_Add_Mat_Mult(C, 1.0, B);
  return C;
}
inline LaGenMatDouble operator-(const LaGenMatDouble& A,
                                const LaGenMatDouble& B) {
  LaGenMatDouble C(A);
  Blas_Add_Mat_Mult(C, -1.0, B);
  return C;
}

inline void _stub_gemm(bool ta, bool tb, const LaGenMatDouble& A,
                       const LaGenMatDouble& B, LaGenMatDouble& C,
                       double alpha, double beta) {
  int m = ta ? A.cols() : A.rows();
  int k = ta ? A.rows() : A.cols();
  int n = tb ? B.rows() : B.cols();
  assert((tb ? B.cols() : B.rows()) == k);
  if (C.rows() != m || C.cols() != n) {
    assert(beta == 0.0);
    C.resize(m, n);
  }
  // defend against aliased inputs/outputs (aku does C = A*B with
  // C aliasing A): stage through packed copies
  std::vector<double> a = A.packed(), b = B.packed(), c = C.packed();
  int lda = A.rows(), ldb = B.rows(), ldc = m;
  const char* TA = ta ? "T" : "N";
  const char* TB = tb ? "T" : "N";
  dgemm_(TA, TB, &m, &n, &k, &alpha, a.data(), &lda, b.data(), &ldb,
         &beta, c.data(), &ldc);
  C.unpack(c);
}

inline void Blas_Mat_Mat_Mult(const LaGenMatDouble& A,
                              const LaGenMatDouble& B, LaGenMatDouble& C,
                              double alpha = 1.0, double beta = 0.0) {
  _stub_gemm(false, false, A, B, C, alpha, beta);
}
inline void Blas_Mat_Mat_Mult(const LaGenMatDouble& A,
                              const LaGenMatDouble& B, LaGenMatDouble& C,
                              bool ta, bool tb, double alpha,
                              double beta) {
  _stub_gemm(ta, tb, A, B, C, alpha, beta);
}
inline void Blas_Mat_Mat_Trans_Mult(const LaGenMatDouble& A,
                                    const LaGenMatDouble& B,
                                    LaGenMatDouble& C,
                                    double alpha = 1.0,
                                    double beta = 0.0) {
  _stub_gemm(false, true, A, B, C, alpha, beta);
}
inline void Blas_Mat_Trans_Mat_Mult(const LaGenMatDouble& A,
                                    const LaGenMatDouble& B,
                                    LaGenMatDouble& C,
                                    double alpha = 1.0,
                                    double beta = 0.0) {
  _stub_gemm(true, false, A, B, C, alpha, beta);
}

inline void _stub_gemv(bool ta, const LaGenMatDouble& A,
                       const LaGenMatDouble& x, LaGenMatDouble& y,
                       double alpha, double beta) {
  LaVectorDouble xf(x);
  int m = ta ? A.cols() : A.rows();
  int k = ta ? A.rows() : A.cols();
  assert(xf.size() == k);
  std::vector<double> yv((size_t)m, 0.0);
  if (beta != 0.0) {
    LaVectorDouble yf(y);
    assert(yf.size() == m);
    for (int i = 0; i < m; ++i) yv[i] = yf(i);
  }
  for (int i = 0; i < m; ++i) {
    double s = 0;
    for (int j = 0; j < k; ++j)
      s += (ta ? A(j, i) : A(i, j)) * xf(j);
    yv[i] = alpha * s + beta * yv[i];
  }
  if (y.rows() * y.cols() != m) y.resize(m, 1);
  int idx = 0;
  for (int j = 0; j < y.cols(); ++j)
    for (int i = 0; i < y.rows(); ++i) y(i, j) = yv[idx++];
}
inline void Blas_Mat_Vec_Mult(const LaGenMatDouble& A,
                              const LaGenMatDouble& x, LaGenMatDouble& y,
                              double alpha = 1.0, double beta = 0.0) {
  _stub_gemv(false, A, x, y, alpha, beta);
}
inline void Blas_Mat_Trans_Vec_Mult(const LaGenMatDouble& A,
                                    const LaGenMatDouble& x,
                                    LaGenMatDouble& y,
                                    double alpha = 1.0,
                                    double beta = 0.0) {
  _stub_gemv(true, A, x, y, alpha, beta);
}

// ---------------------------------------------------------------- LAPACK
inline void LUFactorizeIP(LaGenMatDouble& A, LaVectorLongInt& piv) {
  int m = A.rows(), n = A.cols(), info = 0;
  if (piv.size() < std::min(m, n)) piv.resize(std::min(m, n));
  std::vector<double> a = A.packed();
  dgetrf_(&m, &n, a.data(), &m, piv.addr(), &info);
  A.unpack(a);
  if (info < 0) throw LaException("dgetrf: bad argument");
}

inline void LaLUInverseIP(LaGenMatDouble& A, LaVectorLongInt& piv) {
  int n = A.rows(), info = 0;
  std::vector<double> a = A.packed();
  int lwork = std::max(1, 64 * n);
  std::vector<double> work(lwork);
  dgetri_(&n, a.data(), &n, piv.addr(), work.data(), &lwork, &info);
  A.unpack(a);
  if (info != 0) throw LaException("dgetri: singular matrix");
}
inline void LaLUInverseIP(LaGenMatDouble& A, LaVectorLongInt& piv,
                          LaVectorDouble&) {
  LaLUInverseIP(A, piv);
}

// symmetric eigen: A overwritten with eigenvectors (columns),
// ascending eigenvalues in w (dsyev semantics = lapackpp's)
inline void LaEigSolveSymmetricVecIP(LaGenMatDouble& A,
                                     LaVectorDouble& w) {
  int n = A.rows(), info = 0;
  if (w.size() != n) w.resize(n, 1);
  std::vector<double> a = A.packed();
  int lwork = std::max(1, 34 * n);
  std::vector<double> work(lwork), wv(n);
  dsyev_("V", "U", &n, a.data(), &n, wv.data(), work.data(), &lwork,
         &info);
  if (info != 0) throw LaException("dsyev failed");
  A.unpack(a);
  for (int i = 0; i < n; ++i) w(i) = wv[i];
}

inline void LaEigSolve(const LaGenMatDouble& A, LaVectorDouble& w,
                       LaGenMatDouble& V) {
  // symmetric convenience form
  V.copy(A);
  LaEigSolveSymmetricVecIP(V, w);
}

inline void LaEigSolve(const LaGenMatDouble& A, LaVectorDouble& wr,
                       LaVectorDouble& wi, LaGenMatDouble& V) {
  int n = A.rows(), info = 0;
  if (wr.size() != n) wr.resize(n, 1);
  if (wi.size() != n) wi.resize(n, 1);
  if (V.rows() != n || V.cols() != n) V.resize(n, n);
  std::vector<double> a = A.packed(), vr((size_t)n * n);
  std::vector<double> wrv(n), wiv(n);
  int lwork = std::max(1, 8 * n);
  std::vector<double> work(lwork);
  int one = 1;
  dgeev_("N", "V", &n, a.data(), &n, wrv.data(), wiv.data(), nullptr,
         &one, vr.data(), &n, work.data(), &lwork, &info);
  if (info != 0) throw LaException("dgeev failed");
  // lapackpp returned eigenpairs sorted by descending |lambda|
  // (aku/lda.cc:420 asserts this); raw dgeev order is arbitrary.
  std::vector<int> ord(n);
  for (int i = 0; i < n; ++i) ord[i] = i;
  std::stable_sort(ord.begin(), ord.end(), [&](int i, int j) {
    return std::fabs(wrv[i]) > std::fabs(wrv[j]);
  });
  for (int i = 0; i < n; ++i) {
    wr(i) = wrv[ord[i]];
    wi(i) = wiv[ord[i]];
    for (int r = 0; r < n; ++r) V(r, i) = vr[(size_t)ord[i] * n + r];
  }
}

inline void LaEigSolve(const LaGenMatComplex& A, LaVectorComplex& w,
                       LaGenMatComplex& V) {
  int n = A.rows(), info = 0;
  if (w.size() != n) w.resize(n, 1);
  if (V.rows() != n || V.cols() != n) V.resize(n, n);
  std::vector<LaComplex> a(A.rows() * A.cols());
  for (int j = 0; j < n; ++j)
    for (int i = 0; i < n; ++i) a[(size_t)j * n + i] = A(i, j);
  int lwork = std::max(1, 4 * n);
  std::vector<LaComplex> work(lwork);
  std::vector<double> rwork(2 * n);
  int one = 1;
  zgeev_("N", "V", &n, reinterpret_cast<double*>(a.data()), &n,
         w.raw(), nullptr, &one, V.raw(), &n,
         reinterpret_cast<double*>(work.data()), &lwork, rwork.data(),
         &info);
  if (info != 0) throw LaException("zgeev failed");
}

inline void LaSVD_IP(LaGenMatDouble& A, LaVectorDouble& sigma,
                     LaGenMatDouble& U, LaGenMatDouble& VT) {
  int m = A.rows(), n = A.cols(), info = 0;
  int mn = std::min(m, n);
  if (sigma.size() != mn) sigma.resize(mn, 1);
  if (U.rows() != m || U.cols() != m) U.resize(m, m);
  if (VT.rows() != n || VT.cols() != n) VT.resize(n, n);
  std::vector<double> a = A.packed(), u((size_t)m * m),
      vt((size_t)n * n), s(mn);
  int lwork = std::max(1, 8 * std::max(m, n));
  std::vector<double> work(lwork);
  dgesvd_("A", "A", &m, &n, a.data(), &m, s.data(), u.data(), &m,
          vt.data(), &n, work.data(), &lwork, &info);
  if (info != 0) throw LaException("dgesvd failed");
  for (int i = 0; i < mn; ++i) sigma(i) = s[i];
  U.unpack(u);
  VT.unpack(vt);
  A.unpack(a);
}

#endif  // AKU_STUB_LAPACKPP_H
