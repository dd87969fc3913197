// Native host kernels for honeybadgermpc_tpu.
//
// TPU-native replacement for the runtime role of the reference's C++/NTL
// layer (honeybadgermpc/ntl/) on the HOST side: the device compute path is
// JAX/Pallas, but the control plane (erasure-coded broadcast striping,
// host polynomial algebra for consensus payloads) needs fast exact GF(p)
// arithmetic too. 4x64-bit limb Montgomery arithmetic over the BLS12-381
// scalar field with __int128 partial products; exposed through the raw
// CPython C API (no pybind11 in this image).
//
// Exposed functions (all little-endian 32-byte elements packed in bytes):
//   mulmod_vec(a, b)            elementwise modular multiply
//   addmod_vec(a, b), submod_vec(a, b)
//   powmod_vec(a, e_bytes)      elementwise a^e for one shared exponent
//   inv_vec(a)                  elementwise inverse (Fermat)
//   poly_eval_batch(coeffs, k, xs)   Horner eval of ngroups polys at m ints
//   rs_encode(k, n, elems)      erasure stripes (groups of k -> n points)
//   lagrange_interpolate(xs, ys, k)  coefficients through k points

#define PY_SSIZE_T_CLEAN
#include <Python.h>
#include <cstdint>
#include <cstring>
#include <vector>

typedef uint64_t u64;
typedef unsigned __int128 u128;

static const u64 P_[4] = {0xffffffff00000001ULL, 0x53bda402fffe5bfeULL,
                          0x3339d80809a1d805ULL, 0x73eda753299d7d48ULL};
static const u64 INV = 0xfffffffeffffffffULL;       // -p^{-1} mod 2^64
static const u64 R1_[4] = {0x00000001fffffffeULL, 0x5884b7fa00034802ULL,
                           0x998c4fefecbc4ff5ULL, 0x1824b159acc5056fULL};
static const u64 R2_[4] = {0xc999e990f3f29c6dULL, 0x2b6cedcb87925c23ULL,
                           0x05d314967254398fULL, 0x0748d9d99f59ff11ULL};

struct Fr { u64 v[4]; };

static inline bool geq_p(const u64 a[4]) {
    for (int i = 3; i >= 0; --i) {
        if (a[i] > P_[i]) return true;
        if (a[i] < P_[i]) return false;
    }
    return true;
}

static inline void sub_p(u64 a[4]) {
    u128 borrow = 0;
    for (int i = 0; i < 4; ++i) {
        u128 d = (u128)a[i] - P_[i] - borrow;
        a[i] = (u64)d;
        borrow = (d >> 64) ? 1 : 0;
    }
}

static inline void add_(const u64 a[4], const u64 b[4], u64 o[4]) {
    u128 c = 0;
    for (int i = 0; i < 4; ++i) {
        u128 s = (u128)a[i] + b[i] + c;
        o[i] = (u64)s;
        c = s >> 64;
    }
    if (c || geq_p(o)) sub_p(o);
}

static inline void sub_(const u64 a[4], const u64 b[4], u64 o[4]) {
    u128 borrow = 0;
    for (int i = 0; i < 4; ++i) {
        u128 d = (u128)a[i] - b[i] - borrow;
        o[i] = (u64)d;
        borrow = (d >> 64) ? 1 : 0;
    }
    if (borrow) {                    // add p back
        u128 c = 0;
        for (int i = 0; i < 4; ++i) {
            u128 s = (u128)o[i] + P_[i] + c;
            o[i] = (u64)s;
            c = s >> 64;
        }
    }
}

// Montgomery CIOS multiply: o = a*b*R^{-1} mod p
static void mont_mul(const u64 a[4], const u64 b[4], u64 o[4]) {
    u64 t[6] = {0, 0, 0, 0, 0, 0};
    for (int i = 0; i < 4; ++i) {
        u128 c = 0;
        for (int j = 0; j < 4; ++j) {
            u128 s = (u128)t[j] + (u128)a[i] * b[j] + c;
            t[j] = (u64)s;
            c = s >> 64;
        }
        u128 s = (u128)t[4] + c;
        t[4] = (u64)s;
        t[5] = (u64)(s >> 64);

        u64 m = t[0] * INV;
        c = ((u128)t[0] + (u128)m * P_[0]) >> 64;
        for (int j = 1; j < 4; ++j) {
            u128 s2 = (u128)t[j] + (u128)m * P_[j] + c;
            t[j - 1] = (u64)s2;
            c = s2 >> 64;
        }
        s = (u128)t[4] + c;
        t[3] = (u64)s;
        t[4] = t[5] + (u64)(s >> 64);
        t[5] = 0;
    }
    memcpy(o, t, 32);
    if (t[4] || geq_p(o)) sub_p(o);
}

static void to_mont(const u64 a[4], u64 o[4]) { mont_mul(a, R2_, o); }
static void from_mont(const u64 a[4], u64 o[4]) {
    static const u64 one[4] = {1, 0, 0, 0};
    mont_mul(a, one, o);
}

static void mont_pow(const u64 base[4], const u64 e[4], int ebits, u64 o[4]) {
    u64 acc[4]; memcpy(acc, R1_, 32);           // 1 in Montgomery form
    u64 b[4]; memcpy(b, base, 32);
    for (int bit = 0; bit < ebits; ++bit) {
        if ((e[bit / 64] >> (bit % 64)) & 1) {
            u64 tmp[4]; mont_mul(acc, b, tmp); memcpy(acc, tmp, 32);
        }
        u64 sq[4]; mont_mul(b, b, sq); memcpy(b, sq, 32);
    }
    memcpy(o, acc, 32);
}

static const u64 P_MINUS_2[4] = {0xfffffffeffffffffULL, 0x53bda402fffe5bfeULL,
                                 0x3339d80809a1d805ULL, 0x73eda753299d7d48ULL};

static void mont_inv(const u64 a[4], u64 o[4]) {
    mont_pow(a, P_MINUS_2, 255, o);
}

// ---------------------------------------------------------------------------

static bool get_elems(PyObject* obj, std::vector<Fr>& out) {
    Py_buffer view;
    if (PyObject_GetBuffer(obj, &view, PyBUF_SIMPLE) != 0) return false;
    if (view.len % 32) {
        PyBuffer_Release(&view);
        PyErr_SetString(PyExc_ValueError, "length must be a multiple of 32");
        return false;
    }
    size_t n = view.len / 32;
    out.resize(n);
    memcpy(out.data(), view.buf, view.len);
    PyBuffer_Release(&view);
    return true;
}

static PyObject* pack(const std::vector<Fr>& v) {
    return PyBytes_FromStringAndSize(
        reinterpret_cast<const char*>(v.data()), v.size() * 32);
}

typedef void (*binop_fn)(const u64*, const u64*, u64*);

static void op_mul(const u64* a, const u64* b, u64* o) {
    u64 am[4], bm[4], om[4];
    to_mont(a, am); to_mont(b, bm);
    mont_mul(am, bm, om); from_mont(om, o);
}
static void op_add(const u64* a, const u64* b, u64* o) { add_(a, b, o); }
static void op_sub(const u64* a, const u64* b, u64* o) { sub_(a, b, o); }

static PyObject* binop(PyObject* args, binop_fn fn) {
    PyObject *ao, *bo;
    if (!PyArg_ParseTuple(args, "OO", &ao, &bo)) return nullptr;
    std::vector<Fr> a, b;
    if (!get_elems(ao, a) || !get_elems(bo, b)) return nullptr;
    if (a.size() != b.size()) {
        PyErr_SetString(PyExc_ValueError, "size mismatch");
        return nullptr;
    }
    std::vector<Fr> o(a.size());
    for (size_t i = 0; i < a.size(); ++i) fn(a[i].v, b[i].v, o[i].v);
    return pack(o);
}

static PyObject* py_mulmod(PyObject*, PyObject* args) { return binop(args, op_mul); }
static PyObject* py_addmod(PyObject*, PyObject* args) { return binop(args, op_add); }
static PyObject* py_submod(PyObject*, PyObject* args) { return binop(args, op_sub); }

static PyObject* py_powmod(PyObject*, PyObject* args) {
    PyObject *ao, *eo;
    if (!PyArg_ParseTuple(args, "OO", &ao, &eo)) return nullptr;
    std::vector<Fr> a, e;
    if (!get_elems(ao, a) || !get_elems(eo, e)) return nullptr;
    if (e.size() != 1) {
        PyErr_SetString(PyExc_ValueError, "one exponent"); return nullptr;
    }
    std::vector<Fr> o(a.size());
    for (size_t i = 0; i < a.size(); ++i) {
        u64 am[4], om[4];
        to_mont(a[i].v, am);
        mont_pow(am, e[0].v, 255, om);
        from_mont(om, o[i].v);
    }
    return pack(o);
}

static PyObject* py_inv(PyObject*, PyObject* args) {
    PyObject* ao;
    if (!PyArg_ParseTuple(args, "O", &ao)) return nullptr;
    std::vector<Fr> a;
    if (!get_elems(ao, a)) return nullptr;
    std::vector<Fr> o(a.size());
    for (size_t i = 0; i < a.size(); ++i) {
        u64 am[4], om[4];
        to_mont(a[i].v, am);
        mont_inv(am, om);
        from_mont(om, o[i].v);
    }
    return pack(o);
}

// rs_encode(k, n, elems): elems = ngroups*k coefficients (plain domain);
// returns n stripes, each ngroups elements: stripe j = poly evals at x=j+1.
static PyObject* py_rs_encode(PyObject*, PyObject* args) {
    int k, n;
    PyObject* eo;
    if (!PyArg_ParseTuple(args, "iiO", &k, &n, &eo)) return nullptr;
    std::vector<Fr> elems;
    if (!get_elems(eo, elems)) return nullptr;
    if (elems.size() % k) {
        PyErr_SetString(PyExc_ValueError, "elems % k != 0"); return nullptr;
    }
    size_t ngroups = elems.size() / k;
    // Montgomery-convert coefficients once
    std::vector<Fr> cm(elems.size());
    for (size_t i = 0; i < elems.size(); ++i) to_mont(elems[i].v, cm[i].v);
    std::vector<Fr> out((size_t)n * ngroups);
    for (int j = 0; j < n; ++j) {
        // x = j+1 in Montgomery form
        u64 xp[4] = {(u64)(j + 1), 0, 0, 0};
        u64 xm[4]; to_mont(xp, xm);
        for (size_t g = 0; g < ngroups; ++g) {
            u64 acc[4] = {0, 0, 0, 0};
            for (int c = k - 1; c >= 0; --c) {
                u64 t1[4];
                mont_mul(acc, xm, t1);
                add_(t1, cm[g * k + c].v, acc);
            }
            from_mont(acc, out[(size_t)j * ngroups + g].v);
        }
    }
    return pack(out);
}

// poly_eval_batch(coeffs, k, xs): ngroups polys (k coeffs each), eval at
// each 32-byte x in xs -> [nx * ngroups] values (x-major).
static PyObject* py_poly_eval(PyObject*, PyObject* args) {
    PyObject *co, *xo;
    int k;
    if (!PyArg_ParseTuple(args, "OiO", &co, &k, &xo)) return nullptr;
    std::vector<Fr> coeffs, xs;
    if (!get_elems(co, coeffs) || !get_elems(xo, xs)) return nullptr;
    size_t ngroups = coeffs.size() / k;
    std::vector<Fr> cm(coeffs.size());
    for (size_t i = 0; i < coeffs.size(); ++i) to_mont(coeffs[i].v, cm[i].v);
    std::vector<Fr> out(xs.size() * ngroups);
    for (size_t xi = 0; xi < xs.size(); ++xi) {
        u64 xm[4]; to_mont(xs[xi].v, xm);
        for (size_t g = 0; g < ngroups; ++g) {
            u64 acc[4] = {0, 0, 0, 0};
            for (int c = k - 1; c >= 0; --c) {
                u64 t1[4];
                mont_mul(acc, xm, t1);
                add_(t1, cm[g * k + c].v, acc);
            }
            from_mont(acc, out[xi * ngroups + g].v);
        }
    }
    return pack(out);
}

// lagrange_interpolate(xs, ys, k): k points -> k coefficients, per group
// (ys = ngroups blocks laid out point-major: ys[point][group]).
static PyObject* py_interpolate(PyObject*, PyObject* args) {
    PyObject *xo, *yo;
    int k;
    if (!PyArg_ParseTuple(args, "OOi", &xo, &yo, &k)) return nullptr;
    std::vector<Fr> xs, ys;
    if (!get_elems(xo, xs) || !get_elems(yo, ys)) return nullptr;
    if ((int)xs.size() != k || ys.size() % k) {
        PyErr_SetString(PyExc_ValueError, "bad sizes"); return nullptr;
    }
    size_t ngroups = ys.size() / k;
    std::vector<Fr> xm(k), ym(ys.size());
    for (int i = 0; i < k; ++i) to_mont(xs[i].v, xm[i].v);
    for (size_t i = 0; i < ys.size(); ++i) to_mont(ys[i].v, ym[i].v);

    // master poly A(X) = prod (X - x_i), coefficients in Montgomery form
    std::vector<Fr> A(k + 1);
    memset(A.data(), 0, (k + 1) * 32);
    memcpy(A[0].v, R1_, 32);
    int deg = 0;
    for (int i = 0; i < k; ++i) {
        // A *= (X - x_i)
        for (int d = deg + 1; d >= 0; --d) {
            u64 shifted[4] = {0, 0, 0, 0};
            if (d > 0) memcpy(shifted, A[d - 1].v, 32);
            u64 t1[4];
            mont_mul(A[d].v, xm[i].v, t1);
            sub_(shifted, t1, A[d].v);
        }
        ++deg;
    }
    std::vector<Fr> out(ngroups * k);
    memset(out.data(), 0, out.size() * 32);
    std::vector<Fr> basis(k);
    for (int j = 0; j < k; ++j) {
        // N_j = A / (X - x_j) via synthetic division; denom prod
        std::vector<Fr> nj(k);
        u64 carry[4]; memcpy(carry, A[k].v, 32);
        for (int d = k - 1; d >= 0; --d) {
            memcpy(nj[d].v, carry, 32);
            u64 t1[4];
            mont_mul(carry, xm[j].v, t1);
            add_(A[d].v, t1, carry);
        }
        u64 den[4]; memcpy(den, R1_, 32);
        for (int m2 = 0; m2 < k; ++m2) {
            if (m2 == j) continue;
            u64 diff[4], t1[4];
            sub_(xm[j].v, xm[m2].v, diff);
            mont_mul(den, diff, t1);
            memcpy(den, t1, 32);
        }
        u64 dinv[4]; mont_inv(den, dinv);
        for (size_t g = 0; g < ngroups; ++g) {
            u64 w[4], t1[4];
            mont_mul(ym[j * ngroups + g].v, dinv, w);
            for (int d = 0; d < k; ++d) {
                mont_mul(w, nj[d].v, t1);
                u64 t2[4];
                add_(out[g * k + d].v, t1, t2);
                memcpy(out[g * k + d].v, t2, 32);
            }
        }
    }
    std::vector<Fr> plain(out.size());
    for (size_t i = 0; i < out.size(); ++i) from_mont(out[i].v, plain[i].v);
    return pack(plain);
}

// ---------------------------------------------------------------------------
// GF(p) polynomial root finding (the reference's FLINT-based power-mixing
// solver, apps/asynchromix/solver/solver.cpp: Newton identities are done by
// the caller; this is the root-finding back half). Cantor-Zassenhaus
// equal-degree splitting specialized to products of DISTINCT LINEAR factors
// (power-mix messages are distinct random field elements). All polynomial
// coefficients kept in Montgomery form, ascending degree order.

typedef std::vector<Fr> Poly;      // ascending, Montgomery form

static int pdeg(const Poly& a) {
    static const u64 Z[4] = {0, 0, 0, 0};
    for (int d = (int)a.size() - 1; d >= 0; --d)
        if (memcmp(a[d].v, Z, 32) != 0) return d;
    return -1;
}

static void ptrim(Poly& a) {
    int d = pdeg(a);
    a.resize(d + 1 < 1 ? 1 : d + 1);
    if (d < 0) memset(a[0].v, 0, 32);
}

// a mod m (m monic-ized internally); in place on a copy
static Poly pmod_(Poly a, const Poly& m) {
    int dm = pdeg(m);
    u64 lead_inv[4];
    mont_inv(m[dm].v, lead_inv);
    ptrim(a);
    while (pdeg(a) >= dm && dm >= 0) {
        int da = pdeg(a);
        u64 c[4];
        mont_mul(a[da].v, lead_inv, c);
        int off = da - dm;
        for (int i = 0; i <= dm; ++i) {
            u64 t1[4], t2[4];
            mont_mul(c, m[i].v, t1);
            sub_(a[off + i].v, t1, t2);
            memcpy(a[off + i].v, t2, 32);
        }
        ptrim(a);
    }
    return a;
}

static Poly pmulmod_(const Poly& a, const Poly& b, const Poly& m) {
    Poly out(a.size() + b.size() - 1);
    memset(out.data(), 0, out.size() * 32);
    for (size_t i = 0; i < a.size(); ++i)
        for (size_t j = 0; j < b.size(); ++j) {
            u64 t1[4], t2[4];
            mont_mul(a[i].v, b[j].v, t1);
            add_(out[i + j].v, t1, t2);
            memcpy(out[i + j].v, t2, 32);
        }
    return pmod_(out, m);
}

// base^e mod m, e a 4x64 little-endian integer
static Poly ppowmod_(Poly base, const u64 e[4], const Poly& m) {
    Poly result(1);
    memcpy(result[0].v, R1_, 32);
    base = pmod_(base, m);
    int ebits = 256;
    while (ebits > 0 &&
           !((e[(ebits - 1) / 64] >> ((ebits - 1) % 64)) & 1)) --ebits;
    for (int bit = 0; bit < ebits; ++bit) {
        if ((e[bit / 64] >> (bit % 64)) & 1)
            result = pmulmod_(result, base, m);
        if (bit + 1 < ebits) base = pmulmod_(base, base, m);
    }
    return result;
}

static Poly pgcd_(Poly a, Poly b) {
    ptrim(a); ptrim(b);
    while (pdeg(b) >= 0) {
        a = pmod_(a, b);
        std::swap(a, b);
    }
    int d = pdeg(a);
    if (d >= 0) {                    // monic-ize
        u64 inv[4];
        mont_inv(a[d].v, inv);
        for (int i = 0; i <= d; ++i) {
            u64 t[4];
            mont_mul(a[i].v, inv, t);
            memcpy(a[i].v, t, 32);
        }
    }
    return a;
}

static Poly pdiv_(Poly num, const Poly& den) {
    int dd = pdeg(den);
    u64 inv[4];
    mont_inv(den[dd].v, inv);
    ptrim(num);
    Poly out(pdeg(num) - dd + 1);
    memset(out.data(), 0, out.size() * 32);
    while (pdeg(num) >= dd) {
        int dn = pdeg(num);
        u64 c[4];
        mont_mul(num[dn].v, inv, c);
        int off = dn - dd;
        memcpy(out[off].v, c, 32);
        for (int i = 0; i <= dd; ++i) {
            u64 t1[4], t2[4];
            mont_mul(c, den[i].v, t1);
            sub_(num[off + i].v, t1, t2);
            memcpy(num[off + i].v, t2, 32);
        }
        ptrim(num);
    }
    return out;
}

static u64 cz_rng_state;
static u64 cz_next() {              // xorshift64* — deterministic splitting
    u64 x = cz_rng_state;
    x ^= x >> 12; x ^= x << 25; x ^= x >> 27;
    cz_rng_state = x;
    return x * 0x2545F4914F6CDD1DULL;
}

static const u64 P_HALF[4] = {       // (p-1)/2
    0x7fffffff80000000ULL, 0xa9ded2017fff2dffULL,
    0x199cec0404d0ec02ULL, 0x39f6d3a994cebea4ULL};

// g = monic product of distinct linear factors; append roots (Montgomery)
static void cz_split(const Poly& g, std::vector<Fr>& roots) {
    int d = pdeg(g);
    if (d <= 0) return;
    if (d == 1) {                    // x + g0 -> root = -g0
        Fr r;
        u64 zero[4] = {0, 0, 0, 0};
        sub_(zero, g[0].v, r.v);
        roots.push_back(r);
        return;
    }
    for (;;) {
        // h = (x + r)^((p-1)/2) - 1 mod g
        Poly xr(2);
        u64 rp[4] = {cz_next(), cz_next() & 0x3fffffffffffffffULL, 0, 0};
        to_mont(rp, xr[0].v);
        memcpy(xr[1].v, R1_, 32);
        Poly h = ppowmod_(xr, P_HALF, g);
        if ((int)h.size() < 1) h.resize(1);
        u64 t[4];
        sub_(h[0].v, R1_, t);
        memcpy(h[0].v, t, 32);
        Poly d1 = pgcd_(g, h);
        int dd1 = pdeg(d1);
        if (dd1 > 0 && dd1 < d) {
            Poly d2 = pdiv_(g, d1);
            cz_split(d1, roots);
            cz_split(d2, roots);
            return;
        }
    }
}

// find_roots(coeffs): ascending plain-domain coefficients of a squarefree
// polynomial whose roots all lie in GF(p); returns the roots as bytes.
static PyObject* py_find_roots(PyObject*, PyObject* args) {
    PyObject* co;
    unsigned long long seed = 0xC0FFEEULL;
    if (!PyArg_ParseTuple(args, "O|K", &co, &seed)) return nullptr;
    std::vector<Fr> coeffs;
    if (!get_elems(co, coeffs)) return nullptr;
    if (coeffs.size() < 2) {
        PyErr_SetString(PyExc_ValueError, "degree must be >= 1");
        return nullptr;
    }
    Poly f(coeffs.size());
    for (size_t i = 0; i < coeffs.size(); ++i) to_mont(coeffs[i].v, f[i].v);
    ptrim(f);

    std::vector<Fr> roots;
    Py_BEGIN_ALLOW_THREADS
    cz_rng_state = seed | 1;
    // restrict to the split part: gcd(f, x^p - x)
    Poly x(2);
    memset(x[0].v, 0, 32);
    memcpy(x[1].v, R1_, 32);
    Poly xp = ppowmod_(x, P_, f);           // x^p mod f
    if (xp.size() < 2) { xp.resize(2); memset(xp[1].v, 0, 32); }
    u64 t[4];
    sub_(xp[1].v, R1_, t);                  // x^p - x
    memcpy(xp[1].v, t, 32);
    Poly g = pgcd_(f, xp);
    cz_split(g, roots);
    Py_END_ALLOW_THREADS

    std::vector<Fr> plain(roots.size());
    for (size_t i = 0; i < roots.size(); ++i) from_mont(roots[i].v, plain[i].v);
    return pack(plain);
}

// ---------------------------------------------------------------------------
// Measured single-core CPU baseline of the batch-open pipeline
// (BASELINE.md target "≥10x NTL single-core"; replaces bench.py's analytic
// NTL estimate with a measurement of the same machine). This is ONE party's
// steady-state work per opened batch — the reference's own pipeline shape
// (encode + two optimistic FNT decodes + re-encode validation,
// reed_solomon.py:305-332, rsdecode_impl.h:125-265) — implemented the way
// NTL would run it fastest at n=64: radix-2 NTT for encode/validate (n is a
// power of two, FFT eval domain) and a PRECOMPUTED k x k interpolation
// matrix for the k-point decode (the logical limit of fnt_decode_step1's
// per-x-set amortization; at k=22 a 484-mult matvec beats the two
// O(n log n) FFTs of fnt_decode_step2). Montgomery form throughout, exactly
// like ZZ_p. Single thread, no allocation inside the timed region.

static void bitrev_permute(Fr* a, int m) {
    for (int i = 1, j = 0; i < m; ++i) {
        int bit = m >> 1;
        for (; j & bit; bit >>= 1) j ^= bit;
        j ^= bit;
        if (i < j) { Fr t = a[i]; a[i] = a[j]; a[j] = t; }
    }
}

// tw[half + j] = w_len^j for len = 2,4,...,m (half = len/2), Montgomery.
static void fr_ntt(Fr* a, int m, const Fr* tw) {
    bitrev_permute(a, m);
    for (int len = 2; len <= m; len <<= 1) {
        int half = len >> 1;
        for (int i = 0; i < m; i += len) {
            for (int j = 0; j < half; ++j) {
                u64 t[4], u[4];
                mont_mul(a[i + half + j].v, tw[half + j].v, t);
                memcpy(u, a[i + j].v, 32);
                add_(u, t, a[i + j].v);
                sub_(u, t, a[i + half + j].v);
            }
        }
    }
}

static u64 bl_rng;
static void bl_rand_fr(Fr& o) {
    for (int i = 0; i < 4; ++i) {
        u64 x = bl_rng;
        x ^= x >> 12; x ^= x << 25; x ^= x >> 27;
        bl_rng = x;
        o.v[i] = x * 0x2545F4914F6CDD1DULL;
    }
    o.v[3] &= 0x3fffffffffffffffULL;          // < 2^254 < p
}

// --- shared setup for the single-core pipeline baselines -------------------

// omega of order n: g^((p-1)/n) with g = 7 (Fr* generator)
static void build_omega(int n, u64 omega_m[4]) {
    u64 e[4] = {P_[0], P_[1], P_[2], P_[3]};
    e[0] -= 1;                                 // p - 1 (low limb has no borrow)
    int sh = 0;
    while ((1 << sh) < n) ++sh;                // e >>= log2(n)
    for (int i = 0; i < 4; ++i) {
        e[i] >>= sh;
        if (i < 3) e[i] |= e[i + 1] << (64 - sh);
    }
    u64 g_plain[4] = {7, 0, 0, 0}, g_m[4];
    to_mont(g_plain, g_m);
    mont_pow(g_m, e, 255, omega_m);
}

// twiddle table tw[half + j] = (omega^(n/len))^j
static void build_twiddles(int n, const u64 omega_m[4], std::vector<Fr>& tw) {
    tw.resize(n);
    for (int len = 2; len <= n; len <<= 1) {
        int half = len >> 1;
        u64 wl[4];
        u64 e2[4] = {(u64)(n / len), 0, 0, 0};
        mont_pow(omega_m, e2, 32, wl);
        memcpy(tw[half].v, R1_, 32);
        for (int j = 1; j < half; ++j) mont_mul(tw[half + j - 1].v, wl, tw[half + j].v);
    }
}

// k points x_j = omega^j; interpolation matrix Ik[c*k + j]
static void build_interp(int k, const u64 omega_m[4], std::vector<Fr>& Ik) {
    std::vector<Fr> xs(k);
    memcpy(xs[0].v, R1_, 32);
    for (int j = 1; j < k; ++j) mont_mul(xs[j - 1].v, omega_m, xs[j].v);
    std::vector<Fr> A(k + 1);                  // prod (X - x_j)
    memset(A.data(), 0, (k + 1) * 32);
    memcpy(A[0].v, R1_, 32);
    for (int i = 0, deg = 0; i < k; ++i, ++deg) {
        for (int d = deg + 1; d >= 0; --d) {
            u64 shifted[4] = {0, 0, 0, 0};
            if (d > 0) memcpy(shifted, A[d - 1].v, 32);
            u64 t1[4];
            mont_mul(A[d].v, xs[i].v, t1);
            sub_(shifted, t1, A[d].v);
        }
    }
    Ik.resize((size_t)k * k);
    for (int j = 0; j < k; ++j) {
        std::vector<Fr> nj(k);
        u64 carry[4]; memcpy(carry, A[k].v, 32);
        for (int d = k - 1; d >= 0; --d) {     // A / (X - x_j)
            memcpy(nj[d].v, carry, 32);
            u64 t1[4];
            mont_mul(carry, xs[j].v, t1);
            add_(A[d].v, t1, carry);
        }
        u64 den[4]; memcpy(den, R1_, 32);
        for (int m2 = 0; m2 < k; ++m2) {
            if (m2 == j) continue;
            u64 diff[4], t1[4];
            sub_(xs[j].v, xs[m2].v, diff);
            mont_mul(den, diff, t1);
            memcpy(den, t1, 32);
        }
        u64 dinv[4]; mont_inv(den, dinv);
        for (int c = 0; c < k; ++c)
            mont_mul(nj[c].v, dinv, Ik[(size_t)c * k + j].v);
    }
}

// bench_open_pipeline(n, t, C, iters) -> (seconds, checksum)
static PyObject* py_bench_open(PyObject*, PyObject* args) {
    int n, t, C, iters;
    if (!PyArg_ParseTuple(args, "iiii", &n, &t, &C, &iters)) return nullptr;
    if (n & (n - 1)) {
        PyErr_SetString(PyExc_ValueError, "n must be a power of two");
        return nullptr;
    }
    int k = t + 1;
    double secs = 0.0;
    u64 checksum = 0;

    Py_BEGIN_ALLOW_THREADS
    u64 omega_m[4];
    build_omega(n, omega_m);
    std::vector<Fr> tw;
    build_twiddles(n, omega_m, tw);
    std::vector<Fr> Ik;
    build_interp(k, omega_m, Ik);

    // random message coefficients (Montgomery residues; domain irrelevant)
    bl_rng = 0x9E3779B97F4A7C15ULL;
    std::vector<Fr> coeffs((size_t)C * k);
    for (auto& f : coeffs) bl_rand_fr(f);
    std::vector<Fr> shares((size_t)C * n);     // "received" columns
    std::vector<Fr> tmp(n), dec(k);

    struct timespec t0, t1;
    clock_gettime(CLOCK_MONOTONIC, &t0);
    for (int it = 0; it < iters; ++it) {
        // encode: C polys of k coeffs -> n share points (NTT)
        for (int gi = 0; gi < C; ++gi) {
            memcpy(tmp.data(), &coeffs[(size_t)gi * k], (size_t)k * 32);
            memset(&tmp[k], 0, (size_t)(n - k) * 32);
            fr_ntt(tmp.data(), n, tw.data());
            memcpy(&shares[(size_t)gi * n], tmp.data(), (size_t)n * 32);
        }
        // two decode rounds (R1, R2): k-point matvec interpolation +
        // re-encode validation against all n received points
        for (int round = 0; round < 2; ++round) {
            for (int gi = 0; gi < C; ++gi) {
                const Fr* y = &shares[(size_t)gi * n];
                for (int c = 0; c < k; ++c) {
                    u64 acc[4] = {0, 0, 0, 0};
                    const Fr* row = &Ik[(size_t)c * k];
                    for (int j = 0; j < k; ++j) {
                        u64 t1[4];
                        mont_mul(row[j].v, y[j].v, t1);
                        u64 t2[4];
                        add_(acc, t1, t2);
                        memcpy(acc, t2, 32);
                    }
                    memcpy(dec[c].v, acc, 32);
                }
                memcpy(tmp.data(), dec.data(), (size_t)k * 32);
                memset(&tmp[k], 0, (size_t)(n - k) * 32);
                fr_ntt(tmp.data(), n, tw.data());
                for (int j = 0; j < n; ++j)    // validate
                    checksum += (u64)(memcmp(tmp[j].v, y[j].v, 32) != 0);
            }
        }
    }
    clock_gettime(CLOCK_MONOTONIC, &t1);
    secs = (t1.tv_sec - t0.tv_sec) + (t1.tv_nsec - t0.tv_nsec) * 1e-9;
    Py_END_ALLOW_THREADS

    return Py_BuildValue("dK", secs, (unsigned long long)checksum);
}

// bench_triple_pipeline(n, t, k, iters) -> (seconds, triples_per_iter, chk)
//
// Single-core model of ONE party's steady-state work in randousha-based
// Beaver triple generation (reference offline_randousha.py:34-191):
//   per slot (3k slots per batch of k*(n-2t) triples):
//     deal:        NTT-encode the degree-t and degree-2t polynomials
//     extraction:  NTT re-encode the n received values (hyperinvertible
//                  matmul), both degrees
//   triple finish: local a*b+r products, then the degree-2t batch open
//   (encode C2 chunks + two rounds of k2-point matvec interpolation with
//   NTT re-encode validation — the bench_open_pipeline structure).
// CPU-favorably EXCLUDES the H2/H3 verification decodes (the TPU number
// includes its aggregated check), so the reported baseline is an upper
// bound on the reference-shaped single-core rate.
static PyObject* py_bench_triples(PyObject*, PyObject* args) {
    int n, t, k, iters;
    if (!PyArg_ParseTuple(args, "iiii", &n, &t, &k, &iters)) return nullptr;
    if (n & (n - 1)) {
        PyErr_SetString(PyExc_ValueError, "n must be a power of two");
        return nullptr;
    }
    int k1 = t + 1, k2 = 2 * t + 1;
    int nout = n - 2 * t;
    long ntriples = (long)k * nout;
    int C2 = (int)((ntriples + k2 - 1) / k2);
    double secs = 0.0;
    u64 checksum = 0;                              // decode mismatch count
    u64 sink = 0;                                  // DCE guard, not a check

    Py_BEGIN_ALLOW_THREADS
    u64 omega_m[4];
    build_omega(n, omega_m);
    std::vector<Fr> tw;
    build_twiddles(n, omega_m, tw);
    std::vector<Fr> Ik2;
    build_interp(k2, omega_m, Ik2);

    bl_rng = 0x9E3779B97F4A7C15ULL;
    int slots = 3 * k;
    std::vector<Fr> coeffs((size_t)slots * k2);    // dealer poly coeffs
    for (auto& f : coeffs) bl_rand_fr(f);
    std::vector<Fr> a(ntriples), b(ntriples), r(ntriples);
    for (auto& f : a) bl_rand_fr(f);
    for (auto& f : b) bl_rand_fr(f);
    for (auto& f : r) bl_rand_fr(f);
    std::vector<Fr> tmp(n), dec(k2), recv(n);
    std::vector<Fr> zc((size_t)C2 * k2);           // finish-open chunk coeffs
    std::vector<Fr> zsh((size_t)C2 * n);           // its share columns
    memset(zc.data(), 0, zc.size() * 32);

    struct timespec t0, t1;
    clock_gettime(CLOCK_MONOTONIC, &t0);
    for (int it = 0; it < iters; ++it) {
        // RanDouSha: 4 n-point NTTs per slot (deal t, deal 2t, extract x2)
        for (int s = 0; s < slots; ++s) {
            const Fr* c = &coeffs[(size_t)s * k2];
            memcpy(tmp.data(), c, (size_t)k1 * 32);
            memset(&tmp[k1], 0, (size_t)(n - k1) * 32);
            fr_ntt(tmp.data(), n, tw.data());
            memcpy(recv.data(), tmp.data(), (size_t)n * 32);   // stand-in
            memcpy(tmp.data(), c, (size_t)k2 * 32);
            memset(&tmp[k2], 0, (size_t)(n - k2) * 32);
            fr_ntt(tmp.data(), n, tw.data());
            for (int d = 0; d < 2; ++d) {          // hyperinvertible encode
                memcpy(tmp.data(), recv.data(), (size_t)n * 32);
                fr_ntt(tmp.data(), n, tw.data());
                sink ^= tmp[0].v[0];               // keep the NTTs live
            }
        }
        // triple finish: z = a*b + r locally, open z at degree 2t
        for (long i = 0; i < ntriples; ++i) {
            u64 t1_[4];
            mont_mul(a[i].v, b[i].v, t1_);
            add_(t1_, r[i].v, zc[i].v);
        }
        for (int gi = 0; gi < C2; ++gi) {          // encode
            memcpy(tmp.data(), &zc[(size_t)gi * k2], (size_t)k2 * 32);
            memset(&tmp[k2], 0, (size_t)(n - k2) * 32);
            fr_ntt(tmp.data(), n, tw.data());
            memcpy(&zsh[(size_t)gi * n], tmp.data(), (size_t)n * 32);
        }
        for (int round = 0; round < 2; ++round) {  // R1/R2 decode+validate
            for (int gi = 0; gi < C2; ++gi) {
                const Fr* y = &zsh[(size_t)gi * n];
                for (int c = 0; c < k2; ++c) {
                    u64 acc[4] = {0, 0, 0, 0};
                    const Fr* row = &Ik2[(size_t)c * k2];
                    for (int j = 0; j < k2; ++j) {
                        u64 t1_[4], t2_[4];
                        mont_mul(row[j].v, y[j].v, t1_);
                        add_(acc, t1_, t2_);
                        memcpy(acc, t2_, 32);
                    }
                    memcpy(dec[c].v, acc, 32);
                }
                memcpy(tmp.data(), dec.data(), (size_t)k2 * 32);
                memset(&tmp[k2], 0, (size_t)(n - k2) * 32);
                fr_ntt(tmp.data(), n, tw.data());
                for (int j = 0; j < n; ++j)
                    checksum += (u64)(memcmp(tmp[j].v, y[j].v, 32) != 0);
            }
        }
    }
    clock_gettime(CLOCK_MONOTONIC, &t1);
    secs = (t1.tv_sec - t0.tv_sec) + (t1.tv_nsec - t0.tv_nsec) * 1e-9;
    if (sink == 0x6a09e667f3bcc908ULL) checksum += 1;   // never in practice
    Py_END_ALLOW_THREADS

    return Py_BuildValue("dlK", secs, ntriples, (unsigned long long)checksum);
}

static PyMethodDef Methods[] = {
    {"bench_open_pipeline", py_bench_open, METH_VARARGS,
     "single-core batch-open pipeline baseline: (n,t,C,iters)->(secs,chk)"},
    {"bench_triple_pipeline", py_bench_triples, METH_VARARGS,
     "single-core randousha-triple baseline: (n,t,k,iters)->(secs,kt,chk)"},
    {"mulmod_vec", py_mulmod, METH_VARARGS, "elementwise a*b mod p"},
    {"addmod_vec", py_addmod, METH_VARARGS, "elementwise a+b mod p"},
    {"submod_vec", py_submod, METH_VARARGS, "elementwise a-b mod p"},
    {"powmod_vec", py_powmod, METH_VARARGS, "elementwise a^e mod p"},
    {"inv_vec", py_inv, METH_VARARGS, "elementwise a^-1 mod p"},
    {"rs_encode", py_rs_encode, METH_VARARGS, "erasure-stripe encode"},
    {"poly_eval_batch", py_poly_eval, METH_VARARGS, "batch Horner eval"},
    {"lagrange_interpolate", py_interpolate, METH_VARARGS,
     "batch Lagrange interpolation"},
    {"find_roots", py_find_roots, METH_VARARGS,
     "roots of a squarefree fully-split polynomial over GF(p)"},
    {nullptr, nullptr, 0, nullptr}};

static struct PyModuleDef moduledef = {
    PyModuleDef_HEAD_INIT, "_hbmpc_native",
    "Native GF(p) host kernels for honeybadgermpc_tpu", -1, Methods};

PyMODINIT_FUNC PyInit__hbmpc_native(void) {
    return PyModule_Create(&moduledef);
}
