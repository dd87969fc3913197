// BLS12-381 native core: Fq/Fq2/Fq12 tower, G1/G2 Jacobian arithmetic,
// ate pairing. C++ port of the pure-Python reference implementation in
// honeybadgermpc_tpu/crypto/pairing.py (which is the bit-exactness oracle
// in tests), itself replacing the reference's Rust pypairing extension
// (pairing/src/lib.rs). Exposed through a C ABI consumed via ctypes
// (honeybadgermpc_tpu/crypto/pairing_native.py).
//
// Conventions: Fq = 6x64 little-endian limbs, Montgomery form internally,
// plain LE bytes at the ABI. Points cross the ABI affine as
// (x, y, infinity_flag). Scalars are 32-byte LE (reduced mod r by caller
// or here). Fq12 uses the same flattened sextic basis as the Python:
// c[0..5] over Fq2 with t^6 = xi = u + 1.

#include <array>
#include <cstdint>
#include <cstring>
#include <vector>

#include "bls_constants.h"

typedef unsigned __int128 u128;

// ---------------------------------------------------------------------------
// Fq: 6x64 Montgomery
// ---------------------------------------------------------------------------

struct Fq {
    uint64_t l[6];
};

static inline bool fq_is_zero(const Fq &a) {
    uint64_t o = 0;
    for (int i = 0; i < 6; i++) o |= a.l[i];
    return o == 0;
}

static inline bool fq_eq(const Fq &a, const Fq &b) {
    uint64_t o = 0;
    for (int i = 0; i < 6; i++) o |= a.l[i] ^ b.l[i];
    return o == 0;
}

static inline int fq_cmp_q(const Fq &a) {            // a >= Q ?
    for (int i = 5; i >= 0; i--) {
        if (a.l[i] < BLS_Q[i]) return -1;
        if (a.l[i] > BLS_Q[i]) return 1;
    }
    return 0;
}

static inline void fq_sub_q(Fq &a) {
    u128 borrow = 0;
    for (int i = 0; i < 6; i++) {
        u128 d = (u128)a.l[i] - BLS_Q[i] - borrow;
        a.l[i] = (uint64_t)d;
        borrow = (d >> 64) & 1;
    }
}

static inline void fq_add(Fq &o, const Fq &a, const Fq &b) {
    u128 carry = 0;
    for (int i = 0; i < 6; i++) {
        u128 s = (u128)a.l[i] + b.l[i] + carry;
        o.l[i] = (uint64_t)s;
        carry = s >> 64;
    }
    if (carry || fq_cmp_q(o) >= 0) fq_sub_q(o);
}

static inline void fq_sub(Fq &o, const Fq &a, const Fq &b) {
    u128 borrow = 0;
    for (int i = 0; i < 6; i++) {
        u128 d = (u128)a.l[i] - b.l[i] - borrow;
        o.l[i] = (uint64_t)d;
        borrow = (d >> 64) & 1;
    }
    if (borrow) {  // += Q
        u128 carry = 0;
        for (int i = 0; i < 6; i++) {
            u128 s = (u128)o.l[i] + BLS_Q[i] + carry;
            o.l[i] = (uint64_t)s;
            carry = s >> 64;
        }
    }
}

static inline void fq_neg(Fq &o, const Fq &a) {
    if (fq_is_zero(a)) { o = a; return; }
    u128 borrow = 0;
    for (int i = 0; i < 6; i++) {
        u128 d = (u128)BLS_Q[i] - a.l[i] - borrow;
        o.l[i] = (uint64_t)d;
        borrow = (d >> 64) & 1;
    }
}

// CIOS Montgomery multiply
static void fq_mul(Fq &out, const Fq &a, const Fq &b) {
    uint64_t t[8] = {0};
    for (int i = 0; i < 6; i++) {
        u128 carry = 0;
        uint64_t ai = a.l[i];
        for (int j = 0; j < 6; j++) {
            u128 s = (u128)ai * b.l[j] + t[j] + carry;
            t[j] = (uint64_t)s;
            carry = s >> 64;
        }
        u128 s = (u128)t[6] + carry;
        t[6] = (uint64_t)s;
        t[7] = (uint64_t)(s >> 64);

        uint64_t m = t[0] * BLS_QINV;
        carry = ((u128)m * BLS_Q[0] + t[0]) >> 64;
        for (int j = 1; j < 6; j++) {
            u128 s2 = (u128)m * BLS_Q[j] + t[j] + carry;
            t[j - 1] = (uint64_t)s2;
            carry = s2 >> 64;
        }
        s = (u128)t[6] + carry;
        t[5] = (uint64_t)s;
        t[6] = t[7] + (uint64_t)(s >> 64);
        t[7] = 0;
    }
    for (int i = 0; i < 6; i++) out.l[i] = t[i];
    if (t[6] || fq_cmp_q(out) >= 0) fq_sub_q(out);
}

static inline void fq_sqr(Fq &o, const Fq &a) { fq_mul(o, a, a); }

static const Fq FQ_ZERO = {{0, 0, 0, 0, 0, 0}};

static Fq fq_one() {
    Fq o;
    memcpy(o.l, BLS_ONE_MONT, sizeof o.l);
    return o;
}

static void fq_to_mont(Fq &o, const Fq &plain) {
    Fq r2;
    memcpy(r2.l, BLS_R2, sizeof r2.l);
    fq_mul(o, plain, r2);
}

static void fq_from_mont(Fq &o, const Fq &m) {
    Fq one = {{1, 0, 0, 0, 0, 0}};
    fq_mul(o, m, one);
}

// a^e for big-endian-free little-endian limb exponent
static void fq_pow(Fq &o, const Fq &a, const uint64_t *e, int nl) {
    Fq result = fq_one(), base = a;
    for (int i = 0; i < nl; i++) {
        uint64_t w = e[i];
        for (int b = 0; b < 64; b++) {
            if (w & 1) fq_mul(result, result, base);
            fq_sqr(base, base);
            w >>= 1;
        }
    }
    o = result;
}

static void fq_inv_fermat(Fq &o, const Fq &a) {
    // Fermat: a^(q-2) (kept as a reference / fallback)
    uint64_t e[6];
    memcpy(e, BLS_Q, sizeof e);
    u128 borrow = 2;
    for (int i = 0; i < 6 && borrow; i++) {
        u128 d = (u128)e[i] - borrow;
        e[i] = (uint64_t)d;
        borrow = (d >> 64) & 1;
    }
    fq_pow(o, a, e, 6);
}

// 384-bit helpers for the binary xgcd
static inline bool w_is_zero(const uint64_t *a) {
    uint64_t o = 0;
    for (int i = 0; i < 6; i++) o |= a[i];
    return o == 0;
}

static inline bool w_is_one(const uint64_t *a) {
    uint64_t o = a[0] ^ 1;
    for (int i = 1; i < 6; i++) o |= a[i];
    return o == 0;
}

static inline int w_cmp(const uint64_t *a, const uint64_t *b) {
    for (int i = 5; i >= 0; i--) {
        if (a[i] < b[i]) return -1;
        if (a[i] > b[i]) return 1;
    }
    return 0;
}

static inline void w_sub(uint64_t *o, const uint64_t *a, const uint64_t *b) {
    u128 borrow = 0;
    for (int i = 0; i < 6; i++) {
        u128 d = (u128)a[i] - b[i] - borrow;
        o[i] = (uint64_t)d;
        borrow = (d >> 64) & 1;
    }
}

static inline uint64_t w_add(uint64_t *o, const uint64_t *a,
                             const uint64_t *b) {
    u128 carry = 0;
    for (int i = 0; i < 6; i++) {
        u128 sum = (u128)a[i] + b[i] + carry;
        o[i] = (uint64_t)sum;
        carry = sum >> 64;
    }
    return (uint64_t)carry;
}

static inline void w_rshift1(uint64_t *a, uint64_t top) {
    for (int i = 0; i < 5; i++)
        a[i] = (a[i] >> 1) | (a[i + 1] << 63);
    a[5] = (a[5] >> 1) | (top << 63);
}

static void fq_inv(Fq &o, const Fq &a) {
    // binary extended gcd (HAC 14.61) on the Montgomery representative
    // v = a*R: yields v^-1; two REDC-multiplies by R^2 re-center the
    // result in Montgomery form. ~20x faster than the Fermat ladder.
    if (fq_is_zero(a)) { o = a; return; }
    uint64_t u[6], v[6], x1[6] = {1, 0, 0, 0, 0, 0}, x2[6] = {0};
    memcpy(u, a.l, 48);
    memcpy(v, BLS_Q, 48);
    while (!w_is_one(u) && !w_is_one(v)) {
        while (!(u[0] & 1)) {
            uint64_t top = 0;
            if (x1[0] & 1) top = w_add(x1, x1, BLS_Q);
            w_rshift1(u, 0);
            w_rshift1(x1, top);
        }
        while (!(v[0] & 1)) {
            uint64_t top = 0;
            if (x2[0] & 1) top = w_add(x2, x2, BLS_Q);
            w_rshift1(v, 0);
            w_rshift1(x2, top);
        }
        if (w_cmp(u, v) >= 0) {
            w_sub(u, u, v);
            if (w_cmp(x1, x2) < 0) w_add(x1, x1, BLS_Q);
            w_sub(x1, x1, x2);
        } else {
            w_sub(v, v, u);
            if (w_cmp(x2, x1) < 0) w_add(x2, x2, BLS_Q);
            w_sub(x2, x2, x1);
        }
    }
    Fq r;
    memcpy(r.l, w_is_one(u) ? x1 : x2, 48);
    if (fq_cmp_q(r) >= 0) fq_sub_q(r);
    Fq r2;
    memcpy(r2.l, BLS_R2, 48);
    fq_mul(r, r, r2);      // v^-1 * R
    fq_mul(o, r, r2);      // v^-1 * R^2 * R^-1 = a^-1 * R (Montgomery)
}

// ---------------------------------------------------------------------------
// Fq2 = Fq[u]/(u^2+1)
// ---------------------------------------------------------------------------

struct Fq2 {
    Fq a, b;
};

static inline void fq2_add(Fq2 &o, const Fq2 &x, const Fq2 &y) {
    fq_add(o.a, x.a, y.a);
    fq_add(o.b, x.b, y.b);
}

static inline void fq2_sub(Fq2 &o, const Fq2 &x, const Fq2 &y) {
    fq_sub(o.a, x.a, y.a);
    fq_sub(o.b, x.b, y.b);
}

static inline void fq2_neg(Fq2 &o, const Fq2 &x) {
    fq_neg(o.a, x.a);
    fq_neg(o.b, x.b);
}

static void fq2_mul(Fq2 &o, const Fq2 &x, const Fq2 &y) {
    Fq ac, bd, sx, sy, cross;
    fq_mul(ac, x.a, y.a);
    fq_mul(bd, x.b, y.b);
    fq_add(sx, x.a, x.b);
    fq_add(sy, y.a, y.b);
    fq_mul(cross, sx, sy);
    Fq t;
    fq_sub(t, cross, ac);
    fq_sub(o.b, t, bd);
    fq_sub(o.a, ac, bd);
}

static inline void fq2_sqr(Fq2 &o, const Fq2 &x) { fq2_mul(o, x, x); }

static void fq2_inv(Fq2 &o, const Fq2 &x) {
    Fq a2, b2, n, ninv;
    fq_sqr(a2, x.a);
    fq_sqr(b2, x.b);
    fq_add(n, a2, b2);
    fq_inv(ninv, n);
    fq_mul(o.a, x.a, ninv);
    Fq t;
    fq_mul(t, x.b, ninv);
    fq_neg(o.b, t);
}

static inline void fq2_conj(Fq2 &o, const Fq2 &x) {
    o.a = x.a;
    fq_neg(o.b, x.b);
}

static inline bool fq2_is_zero(const Fq2 &x) {
    return fq_is_zero(x.a) && fq_is_zero(x.b);
}

static inline bool fq2_eq(const Fq2 &x, const Fq2 &y) {
    return fq_eq(x.a, y.a) && fq_eq(x.b, y.b);
}

static Fq2 fq2_zero() { return Fq2{FQ_ZERO, FQ_ZERO}; }
static Fq2 fq2_one() { return Fq2{fq_one(), FQ_ZERO}; }
static Fq2 fq2_xi() { return Fq2{fq_one(), fq_one()}; }  // u + 1

// ---------------------------------------------------------------------------
// Fq12 = Fq2[t]/(t^6 - xi), flattened sextic basis (matches pairing.py)
// ---------------------------------------------------------------------------

struct Fq12 {
    Fq2 c[6];
};

static Fq12 fq12_zero() {
    Fq12 o;
    for (int i = 0; i < 6; i++) o.c[i] = fq2_zero();
    return o;
}

static Fq12 fq12_one() {
    Fq12 o = fq12_zero();
    o.c[0] = fq2_one();
    return o;
}

static void fq12_add(Fq12 &o, const Fq12 &x, const Fq12 &y) {
    for (int i = 0; i < 6; i++) fq2_add(o.c[i], x.c[i], y.c[i]);
}

static void fq12_sub(Fq12 &o, const Fq12 &x, const Fq12 &y) {
    for (int i = 0; i < 6; i++) fq2_sub(o.c[i], x.c[i], y.c[i]);
}

static void fq12_mul_dense(Fq12 &o, const Fq12 &x, const Fq12 &y) {
    Fq2 prod[11];
    for (int i = 0; i < 11; i++) prod[i] = fq2_zero();
    for (int i = 0; i < 6; i++) {
        if (fq2_is_zero(x.c[i])) continue;
        for (int j = 0; j < 6; j++) {
            if (fq2_is_zero(y.c[j])) continue;
            Fq2 t;
            fq2_mul(t, x.c[i], y.c[j]);
            fq2_add(prod[i + j], prod[i + j], t);
        }
    }
    Fq2 xi = fq2_xi();
    for (int k = 6; k < 11; k++) {
        Fq2 t;
        fq2_mul(t, prod[k], xi);
        fq2_add(prod[k - 6], prod[k - 6], t);
    }
    for (int i = 0; i < 6; i++) o.c[i] = prod[i];
}

static void fq12_mul(Fq12 &o, const Fq12 &x, const Fq12 &y);
static void fq12_sqr(Fq12 &o, const Fq12 &x);

static bool fq12_eq(const Fq12 &x, const Fq12 &y) {
    for (int i = 0; i < 6; i++)
        if (!fq2_eq(x.c[i], y.c[i])) return false;
    return true;
}

// Fq6 = Fq2[s]/(s^3 - xi) helper for inversion: x = A(s) + t*B(s), t^2 = s
struct Fq6 {
    Fq2 c[3];
};

static void fq6_mul(Fq6 &o, const Fq6 &x, const Fq6 &y) {
    Fq2 prod[5];
    for (int i = 0; i < 5; i++) prod[i] = fq2_zero();
    for (int i = 0; i < 3; i++)
        for (int j = 0; j < 3; j++) {
            Fq2 t;
            fq2_mul(t, x.c[i], y.c[j]);
            fq2_add(prod[i + j], prod[i + j], t);
        }
    Fq2 xi = fq2_xi();
    for (int k = 3; k < 5; k++) {
        Fq2 t;
        fq2_mul(t, prod[k], xi);
        fq2_add(prod[k - 3], prod[k - 3], t);
    }
    for (int i = 0; i < 3; i++) o.c[i] = prod[i];
}

static void fq6_inv(Fq6 &o, const Fq6 &x) {
    // standard cubic formula: for x = a + b s + c s^2 over Fq2, s^3 = xi
    const Fq2 &a = x.c[0], &b = x.c[1], &c = x.c[2];
    Fq2 xi = fq2_xi();
    Fq2 a2, b2, c2, ab, ac, bc, t;
    fq2_sqr(a2, a);
    fq2_sqr(b2, b);
    fq2_sqr(c2, c);
    fq2_mul(ab, a, b);
    fq2_mul(ac, a, c);
    fq2_mul(bc, b, c);
    Fq2 A, B, C;
    fq2_mul(t, bc, xi);
    fq2_sub(A, a2, t);              // a^2 - xi*b*c
    fq2_mul(t, c2, xi);
    fq2_sub(B, t, ab);              // xi*c^2 - a*b
    fq2_sub(C, b2, ac);             // b^2 - a*c
    // norm = a*A + xi*(b*C + c*B)
    Fq2 n1, n2, n3, norm;
    fq2_mul(n1, a, A);
    fq2_mul(n2, b, C);
    fq2_mul(n3, c, B);
    fq2_add(t, n2, n3);
    fq2_mul(t, t, xi);
    fq2_add(norm, n1, t);
    Fq2 ni;
    fq2_inv(ni, norm);
    fq2_mul(o.c[0], A, ni);
    fq2_mul(o.c[1], B, ni);
    fq2_mul(o.c[2], C, ni);
}

static void fq6_add(Fq6 &o, const Fq6 &x, const Fq6 &y) {
    for (int i = 0; i < 3; i++) fq2_add(o.c[i], x.c[i], y.c[i]);
}

static void fq6_sub(Fq6 &o, const Fq6 &x, const Fq6 &y) {
    for (int i = 0; i < 3; i++) fq2_sub(o.c[i], x.c[i], y.c[i]);
}

static void fq6_mul_s(Fq6 &o, const Fq6 &x) {
    // multiply by s (s^3 = xi): (b0,b1,b2) -> (xi*b2, b0, b1)
    Fq2 xi = fq2_xi(), t;
    fq2_mul(t, x.c[2], xi);
    o.c[2] = x.c[1];
    o.c[1] = x.c[0];
    o.c[0] = t;
}

static inline void fq12_split(Fq6 &A, Fq6 &B, const Fq12 &x) {
    A.c[0] = x.c[0]; A.c[1] = x.c[2]; A.c[2] = x.c[4];
    B.c[0] = x.c[1]; B.c[1] = x.c[3]; B.c[2] = x.c[5];
}

static inline void fq12_join(Fq12 &o, const Fq6 &A, const Fq6 &B) {
    o.c[0] = A.c[0]; o.c[2] = A.c[1]; o.c[4] = A.c[2];
    o.c[1] = B.c[0]; o.c[3] = B.c[1]; o.c[5] = B.c[2];
}

// Karatsuba over the quadratic split x = A + tB, t^2 = s:
// (A+tB)(C+tD) = AC + s BD + t((A+B)(C+D) - AC - BD)  — 3 Fq6 muls
static void fq12_mul(Fq12 &o, const Fq12 &x, const Fq12 &y) {
    Fq6 A, B, C, D, AC, BD, S1, S2, M, T;
    fq12_split(A, B, x);
    fq12_split(C, D, y);
    fq6_mul(AC, A, C);
    fq6_mul(BD, B, D);
    fq6_add(S1, A, B);
    fq6_add(S2, C, D);
    fq6_mul(M, S1, S2);
    fq6_sub(M, M, AC);
    fq6_sub(M, M, BD);
    fq6_mul_s(T, BD);
    fq6_add(T, AC, T);
    fq12_join(o, T, M);
}

// complex squaring: (A+tB)^2 = (A+B)(A+sB) - AB - sAB + t 2AB — 2 Fq6 muls
static void fq12_sqr(Fq12 &o, const Fq12 &x) {
    Fq6 A, B, AB, sB, T1, T2, sAB, C0, C1;
    fq12_split(A, B, x);
    fq6_mul(AB, A, B);
    fq6_mul_s(sB, B);
    fq6_add(T1, A, B);
    fq6_add(T2, A, sB);
    fq6_mul(C0, T1, T2);
    fq6_mul_s(sAB, AB);
    fq6_sub(C0, C0, AB);
    fq6_sub(C0, C0, sAB);
    fq6_add(C1, AB, AB);
    fq12_join(o, C0, C1);
}

static void fq12_inv(Fq12 &o, const Fq12 &x) {
    // x = A + t B with A = (c0, c2, c4), B = (c1, c3, c5) over Fq6 (s = t^2)
    Fq6 A = {{x.c[0], x.c[2], x.c[4]}};
    Fq6 B = {{x.c[1], x.c[3], x.c[5]}};
    // (A + tB)^-1 = (A - tB) / (A^2 - s B^2)
    Fq6 A2, B2, sB2, D;
    fq6_mul(A2, A, A);
    fq6_mul(B2, B, B);
    // s * B2: multiply by s: (b0, b1, b2) -> (xi*b2, b0, b1)
    Fq2 xi = fq2_xi();
    fq2_mul(sB2.c[0], B2.c[2], xi);
    sB2.c[1] = B2.c[0];
    sB2.c[2] = B2.c[1];
    for (int i = 0; i < 3; i++) fq2_sub(D.c[i], A2.c[i], sB2.c[i]);
    Fq6 Di;
    fq6_inv(Di, D);
    Fq6 oa, ob;
    fq6_mul(oa, A, Di);
    fq6_mul(ob, B, Di);
    o.c[0] = oa.c[0];
    o.c[2] = oa.c[1];
    o.c[4] = oa.c[2];
    fq2_neg(o.c[1], ob.c[0]);
    fq2_neg(o.c[3], ob.c[1]);
    fq2_neg(o.c[5], ob.c[2]);
}

// frobenius: x^(q^k), k = 1..6 (gamma table generated from the oracle)
static void fq12_frob(Fq12 &o, const Fq12 &x, int k) {
    const uint64_t *g = FROB_GAMMA + (size_t)(k - 1) * 6 * 12;
    for (int i = 0; i < 6; i++) {
        Fq2 cc;
        if (k % 2) fq2_conj(cc, x.c[i]); else cc = x.c[i];
        Fq2 gi;
        memcpy(gi.a.l, g + i * 12, 48);
        memcpy(gi.b.l, g + i * 12 + 6, 48);
        fq2_mul(o.c[i], cc, gi);
    }
}

static void fq12_pow(Fq12 &o, const Fq12 &x, const uint64_t *e, int nl) {
    Fq12 result = fq12_one(), base = x;
    // top-down would need bit length; bottom-up square-and-multiply:
    for (int i = 0; i < nl; i++) {
        uint64_t w = e[i];
        for (int b = 0; b < 64; b++) {
            if (w & 1) fq12_mul(result, result, base);
            fq12_sqr(base, base);
            w >>= 1;
        }
    }
    o = result;
}

// ---------------------------------------------------------------------------
// Curve points (templated over field)
// ---------------------------------------------------------------------------

template <class F>
struct FieldOps;  // add/sub/mul/neg/inv/sqr/zero/one/is_zero/eq

template <>
struct FieldOps<Fq> {
    static void add(Fq &o, const Fq &a, const Fq &b) { fq_add(o, a, b); }
    static void sub(Fq &o, const Fq &a, const Fq &b) { fq_sub(o, a, b); }
    static void mul(Fq &o, const Fq &a, const Fq &b) { fq_mul(o, a, b); }
    static void sqr(Fq &o, const Fq &a) { fq_sqr(o, a); }
    static void neg(Fq &o, const Fq &a) { fq_neg(o, a); }
    static void inv(Fq &o, const Fq &a) { fq_inv(o, a); }
    static Fq zero() { return FQ_ZERO; }
    static Fq one() { return fq_one(); }
    static bool is_zero(const Fq &a) { return fq_is_zero(a); }
    static bool eq(const Fq &a, const Fq &b) { return fq_eq(a, b); }
};

template <>
struct FieldOps<Fq2> {
    static void add(Fq2 &o, const Fq2 &a, const Fq2 &b) { fq2_add(o, a, b); }
    static void sub(Fq2 &o, const Fq2 &a, const Fq2 &b) { fq2_sub(o, a, b); }
    static void mul(Fq2 &o, const Fq2 &a, const Fq2 &b) { fq2_mul(o, a, b); }
    static void sqr(Fq2 &o, const Fq2 &a) { fq2_sqr(o, a); }
    static void neg(Fq2 &o, const Fq2 &a) { fq2_neg(o, a); }
    static void inv(Fq2 &o, const Fq2 &a) { fq2_inv(o, a); }
    static Fq2 zero() { return fq2_zero(); }
    static Fq2 one() { return fq2_one(); }
    static bool is_zero(const Fq2 &a) { return fq2_is_zero(a); }
    static bool eq(const Fq2 &a, const Fq2 &b) { return fq2_eq(a, b); }
};

template <class F>
struct Point {
    F x, y, z;   // Jacobian
};

template <class F>
static bool pt_is_inf(const Point<F> &p) {
    return FieldOps<F>::is_zero(p.z);
}

template <class F>
static Point<F> pt_inf() {
    return Point<F>{FieldOps<F>::one(), FieldOps<F>::one(),
                    FieldOps<F>::zero()};
}

// dbl-2009-l (same formulas as pairing.py CurvePoint.double)
template <class F>
static void pt_double(Point<F> &o, const Point<F> &p) {
    using Ops = FieldOps<F>;
    if (pt_is_inf(p) || Ops::is_zero(p.y)) { o = pt_inf<F>(); return; }
    F A, B, C, t, D, E, FF, X3, Y3, Z3, e8;
    Ops::sqr(A, p.x);
    Ops::sqr(B, p.y);
    Ops::sqr(C, B);
    Ops::add(t, p.x, B);
    Ops::sqr(t, t);
    Ops::sub(t, t, A);
    Ops::sub(D, t, C);
    Ops::add(D, D, D);
    Ops::add(E, A, A);
    Ops::add(E, E, A);
    Ops::sqr(FF, E);
    Ops::add(t, D, D);
    Ops::sub(X3, FF, t);
    Ops::add(e8, C, C);
    Ops::add(e8, e8, e8);
    Ops::add(e8, e8, e8);
    Ops::sub(t, D, X3);
    Ops::mul(Y3, E, t);
    Ops::sub(Y3, Y3, e8);
    Ops::mul(Z3, p.y, p.z);
    Ops::add(Z3, Z3, Z3);
    o.x = X3; o.y = Y3; o.z = Z3;
}

template <class F>
static void pt_add(Point<F> &o, const Point<F> &p, const Point<F> &q) {
    using Ops = FieldOps<F>;
    if (pt_is_inf(p)) { o = q; return; }
    if (pt_is_inf(q)) { o = p; return; }
    F Z1Z1, Z2Z2, U1, U2, S1, S2, t;
    Ops::sqr(Z1Z1, p.z);
    Ops::sqr(Z2Z2, q.z);
    Ops::mul(U1, p.x, Z2Z2);
    Ops::mul(U2, q.x, Z1Z1);
    Ops::mul(t, p.y, q.z);
    Ops::mul(S1, t, Z2Z2);
    Ops::mul(t, q.y, p.z);
    Ops::mul(S2, t, Z1Z1);
    if (Ops::eq(U1, U2)) {
        if (Ops::eq(S1, S2)) { pt_double(o, p); return; }
        o = pt_inf<F>();
        return;
    }
    F H, I, J, r, V, X3, Y3, Z3;
    Ops::sub(H, U2, U1);
    Ops::add(I, H, H);
    Ops::sqr(I, I);
    Ops::mul(J, H, I);
    Ops::sub(r, S2, S1);
    Ops::add(r, r, r);
    Ops::mul(V, U1, I);
    Ops::sqr(X3, r);
    Ops::sub(X3, X3, J);
    Ops::add(t, V, V);
    Ops::sub(X3, X3, t);
    Ops::sub(t, V, X3);
    Ops::mul(Y3, r, t);
    Ops::mul(t, S1, J);
    Ops::add(t, t, t);
    Ops::sub(Y3, Y3, t);
    Ops::add(Z3, p.z, q.z);
    Ops::sqr(Z3, Z3);
    Ops::sub(Z3, Z3, Z1Z1);
    Ops::sub(Z3, Z3, Z2Z2);
    Ops::mul(Z3, Z3, H);
    o.x = X3; o.y = Y3; o.z = Z3;
}

template <class F>
static void pt_mul(Point<F> &o, const Point<F> &p, const uint64_t k[4]) {
    Point<F> out = pt_inf<F>(), base = p;
    for (int i = 0; i < 4; i++) {
        uint64_t w = k[i];
        for (int b = 0; b < 64; b++) {
            if (w & 1) pt_add(out, out, base);
            pt_double(base, base);
            w >>= 1;
        }
    }
    o = out;
}

// Pippenger bucket multiexp: window size picked from n, buckets per
// window accumulated with one add per term, then the classic running-sum
// collapse. ~256/c adds per term vs ~384 point ops for naive per-term mul.
template <class F>
static void pt_multiexp(Point<F> &out, const Point<F> *pts,
                        const uint64_t (*ks)[4], size_t n) {
    int c = n < 4 ? 2 : (n < 32 ? 4 : (n < 256 ? 6 : (n < 2048 ? 8 : 12)));
    int nwin = (256 + c - 1) / c;
    size_t nbuckets = ((size_t)1 << c) - 1;
    std::vector<Point<F>> buckets(nbuckets);
    Point<F> total = pt_inf<F>();
    for (int w = nwin - 1; w >= 0; --w) {
        if (w != nwin - 1)
            for (int d = 0; d < c; ++d) pt_double(total, total);
        for (size_t b = 0; b < nbuckets; ++b) buckets[b] = pt_inf<F>();
        for (size_t i = 0; i < n; ++i) {
            uint64_t digit = 0;
            for (int j = 0; j < c; ++j) {
                int bb = w * c + j;
                if (bb < 256 && ((ks[i][bb / 64] >> (bb % 64)) & 1))
                    digit |= (uint64_t)1 << j;
            }
            if (digit)
                pt_add(buckets[digit - 1], buckets[digit - 1], pts[i]);
        }
        Point<F> run = pt_inf<F>(), sum = pt_inf<F>();
        for (size_t b = nbuckets; b-- > 0;) {
            pt_add(run, run, buckets[b]);
            pt_add(sum, sum, run);
        }
        pt_add(total, total, sum);
    }
    out = total;
}

// Fixed-base window table (the reference pypairing's wNAF `preprocess()`
// role, pairing/src/wnaf.rs): nwin = ceil(256/w) windows of (2^w - 1)
// precomputed multiples; a table multiply is adds only, no doubles.
template <class F>
static void pt_precompute(Point<F> *table, const Point<F> &p, int w) {
    Point<F> base = p;
    int nwin = (256 + w - 1) / w;
    int m = (1 << w) - 1;
    for (int j = 0; j < nwin; ++j) {
        Point<F> acc = pt_inf<F>();
        for (int e = 1; e <= m; ++e) {
            pt_add(acc, acc, base);
            table[(size_t)j * m + e - 1] = acc;
        }
        for (int d = 0; d < w; ++d) pt_double(base, base);
    }
}

template <class F>
static void pt_mul_table(Point<F> &out, const Point<F> *table,
                         const uint64_t k[4], int w) {
    int nwin = (256 + w - 1) / w;
    int m = (1 << w) - 1;
    Point<F> acc = pt_inf<F>();
    for (int j = 0; j < nwin; ++j) {
        uint64_t digit = 0;
        for (int b = 0; b < w; ++b) {
            int bb = j * w + b;
            if (bb < 256 && ((k[bb / 64] >> (bb % 64)) & 1))
                digit |= (uint64_t)1 << b;
        }
        if (digit)
            pt_add(acc, acc, table[(size_t)j * m + digit - 1]);
    }
    out = acc;
}

template <class F>
static void pt_affine(F &ax, F &ay, const Point<F> &p) {
    using Ops = FieldOps<F>;
    F zi, zi2, zi3;
    Ops::inv(zi, p.z);
    Ops::sqr(zi2, zi);
    Ops::mul(zi3, zi2, zi);
    Ops::mul(ax, p.x, zi2);
    Ops::mul(ay, p.y, zi3);
}

// scalar reduction mod r (schoolbook, scalars are 32 bytes)
static void scalar_mod_r(uint64_t out[4], const uint64_t in[4]) {
    // r ~ 2^254.86, so a 256-bit input needs at most 4 subtractions
    uint64_t t[4];
    memcpy(t, in, 32);
    for (int rep = 0; rep < 5; rep++) {
        int ge = 1;
        for (int i = 3; i >= 0; i--) {
            if (t[i] < BLS_R_ORDER[i]) { ge = 0; break; }
            if (t[i] > BLS_R_ORDER[i]) break;
        }
        if (!ge) break;
        u128 borrow = 0;
        for (int i = 0; i < 4; i++) {
            u128 d = (u128)t[i] - BLS_R_ORDER[i] - borrow;
            t[i] = (uint64_t)d;
            borrow = (d >> 64) & 1;
        }
    }
    memcpy(out, t, 32);
}

// ---------------------------------------------------------------------------
// Pairing (algorithm-identical to pairing.py: untwist to E(Fq12), generic
// Miller loop with affine line evaluations, fast final exponentiation)
// ---------------------------------------------------------------------------

struct PtFq12 {
    Fq12 x, y;
    bool inf;
};

static void fq12_from_fq2(Fq12 &o, const Fq2 &v, int power) {
    o = fq12_zero();
    o.c[power] = v;
}

static void load_fq12_const(Fq12 &o, const uint64_t *limbs) {
    for (int i = 0; i < 6; i++) {
        memcpy(o.c[i].a.l, limbs + i * 12, 48);
        memcpy(o.c[i].b.l, limbs + i * 12 + 6, 48);
    }
}

// sparse multiply: f * (s0 + s3 t^3 + s5 t^5) — the only shape a Miller
// line takes in this basis (see slot derivation in pairing_impl)
static void fq12_mul_sparse035(Fq12 &o, const Fq12 &f, const Fq2 &s0,
                               const Fq2 &s3, const Fq2 &s5) {
    Fq2 acc[6];
    for (int i = 0; i < 6; i++) acc[i] = fq2_zero();
    Fq2 xi = fq2_xi();
    const Fq2 *coef[3] = {&s0, &s3, &s5};
    const int pos[3] = {0, 3, 5};
    for (int ci = 0; ci < 3; ci++) {
        if (fq2_is_zero(*coef[ci])) continue;
        for (int j = 0; j < 6; j++) {
            Fq2 t;
            fq2_mul(t, f.c[j], *coef[ci]);
            int k = pos[ci] + j;
            if (k >= 6) {
                fq2_mul(t, t, xi);
                k -= 6;
            }
            fq2_add(acc[k], acc[k], t);
        }
    }
    for (int i = 0; i < 6; i++) o.c[i] = acc[i];
}

// g^x for unitary g (x = -|x| is the negative BLS parameter): power by
// |x| then conjugate (frob^6 inverts unitary elements)
static void fe_pow_x(Fq12 &o, const Fq12 &g) {
    Fq12 r = fq12_one(), base = g;
    uint64_t w = BLS_X_ABS;
    while (w) {
        if (w & 1) fq12_mul(r, r, base);
        fq12_sqr(base, base);
        w >>= 1;
    }
    fq12_frob(o, r, 6);
}

static void final_exponentiation(Fq12 &o, const Fq12 &f) {
    // easy part: f^((q^6-1)(q^2+1)) — unitary afterwards
    Fq12 f1, f2, inv;
    fq12_frob(f1, f, 6);
    fq12_inv(inv, f);
    fq12_mul(f1, f1, inv);
    fq12_frob(f2, f1, 2);
    fq12_mul(f2, f2, f1);

    // hard part via the x-chain (pairing.py:546-561 lambda decomposition):
    //   m  = f2^(x-1);  a3 = m^(x-1) = f2^l3;  a2 = a3^x = f2^l2
    //   a1 = a2^x * a3^-1 = f2^l1;  a0 = a1^x * f2^3 = f2^l0
    Fq12 m, t, a3, a2, a1, a0, c;
    fe_pow_x(t, f2);
    fq12_frob(c, f2, 6);
    fq12_mul(m, t, c);
    fe_pow_x(t, m);
    fq12_frob(c, m, 6);
    fq12_mul(a3, t, c);
    fe_pow_x(a2, a3);
    fe_pow_x(t, a2);
    fq12_frob(c, a3, 6);
    fq12_mul(a1, t, c);
    fe_pow_x(t, a1);
    Fq12 f2sq, f2cu;
    fq12_sqr(f2sq, f2);
    fq12_mul(f2cu, f2sq, f2);
    fq12_mul(a0, t, f2cu);

    Fq12 r1, r2, r3;
    fq12_frob(r1, a1, 1);
    fq12_frob(r2, a2, 2);
    fq12_frob(r3, a3, 3);
    fq12_mul(o, a0, r1);
    fq12_mul(o, o, r2);
    fq12_mul(o, o, r3);
}

static void pairing_impl(Fq12 &o, const Point<Fq> &P, const Point<Fq2> &Q) {
    if (pt_is_inf(P) || pt_is_inf(Q)) { o = fq12_one(); return; }
    // Slot-coefficient Miller loop. Untwisting maps (x', y') on E'(Fq2)
    // to (x'/xi * t^4, y'/xi * t^3) in E(Fq12) (w^-2 = t^4/xi,
    // w^-3 = t^3/xi). Writing T = (Tx t^4, Ty t^3) and P = (Px, Py) over
    // Fq, the affine group law closes on the slot coefficients:
    //   tangent: L = 3 Tx^2 / (2 Ty);  addition: L = (Qy-Ty)/((Qx-Tx) xi)
    //   Nx = L^2 xi - (Tx + other_x);  Ny = L (Tx - Nx) xi - Ty
    //   line(P) = Py + (L Tx xi - Ty) t^3 - (L Px) t^5   (slots {0,3,5})
    // so the whole loop runs in Fq2 with one Fq2 inversion per step and a
    // sparse Fq12 multiply into f.
    Fq2 qxa, qya, xi = fq2_xi(), xi_inv;
    pt_affine(qxa, qya, Q);
    fq2_inv(xi_inv, xi);
    Fq2 Qx, Qy, Tx, Ty;
    fq2_mul(Qx, qxa, xi_inv);
    fq2_mul(Qy, qya, xi_inv);
    Tx = Qx;
    Ty = Qy;

    Fq pxa, pya;
    pt_affine(pxa, pya, P);
    Fq2 Px = {pxa, FQ_ZERO}, Py = {pya, FQ_ZERO};

    Fq12 f = fq12_one();
    int top = 63;
    while (!((BLS_X_ABS >> top) & 1)) top--;
    for (int i = top - 1; i >= 0; i--) {
        fq12_sqr(f, f);
        // tangent step: L = 3Tx^2/(2Ty)
        Fq2 L, num, den, t;
        fq2_sqr(num, Tx);
        fq2_add(t, num, num);
        fq2_add(num, t, num);
        fq2_add(den, Ty, Ty);
        fq2_inv(den, den);
        fq2_mul(L, num, den);
        // line BEFORE moving T: slots (Py, L*Tx*xi - Ty, -L*Px)
        Fq2 s3, s5;
        fq2_mul(t, L, Tx);
        fq2_mul(t, t, xi);
        fq2_sub(s3, t, Ty);
        fq2_mul(s5, L, Px);
        fq2_neg(s5, s5);
        fq12_mul_sparse035(f, f, Py, s3, s5);
        // T = 2T
        Fq2 L2, Nx, Ny;
        fq2_sqr(L2, L);
        fq2_mul(L2, L2, xi);
        fq2_sub(Nx, L2, Tx);
        fq2_sub(Nx, Nx, Tx);
        fq2_sub(t, Tx, Nx);
        fq2_mul(Ny, L, t);
        fq2_mul(Ny, Ny, xi);
        fq2_sub(Ny, Ny, Ty);
        Tx = Nx;
        Ty = Ny;
        if ((BLS_X_ABS >> i) & 1) {
            // addition step: L = (Qy - Ty) / ((Qx - Tx) * xi)
            fq2_sub(num, Qy, Ty);
            fq2_sub(den, Qx, Tx);
            fq2_mul(den, den, xi);
            fq2_inv(den, den);
            fq2_mul(L, num, den);
            fq2_mul(t, L, Tx);
            fq2_mul(t, t, xi);
            fq2_sub(s3, t, Ty);
            fq2_mul(s5, L, Px);
            fq2_neg(s5, s5);
            fq12_mul_sparse035(f, f, Py, s3, s5);
            fq2_sqr(L2, L);
            fq2_mul(L2, L2, xi);
            fq2_sub(Nx, L2, Tx);
            fq2_sub(Nx, Nx, Qx);
            fq2_sub(t, Tx, Nx);
            fq2_mul(Ny, L, t);
            fq2_mul(Ny, Ny, xi);
            fq2_sub(Ny, Ny, Ty);
            Tx = Nx;
            Ty = Ny;
        }
    }
    final_exponentiation(o, f);
}

// ---------------------------------------------------------------------------
// C ABI. Fq as 48-byte LE (plain, not Montgomery); points affine + flag.
// ---------------------------------------------------------------------------

static void fq_load(Fq &o, const uint8_t *b) {
    Fq plain;
    for (int i = 0; i < 6; i++) {
        uint64_t w = 0;
        for (int j = 7; j >= 0; j--) w = (w << 8) | b[i * 8 + j];
        plain.l[i] = w;
    }
    fq_to_mont(o, plain);
}

static void fq_store(uint8_t *b, const Fq &m) {
    Fq plain;
    fq_from_mont(plain, m);
    for (int i = 0; i < 6; i++) {
        uint64_t w = plain.l[i];
        for (int j = 0; j < 8; j++) {
            b[i * 8 + j] = (uint8_t)w;
            w >>= 8;
        }
    }
}

// G1: 97 bytes = x(48) | y(48) | inf(1).  G2: 193 = x.a|x.b|y.a|y.b|inf.
static void g1_load(Point<Fq> &p, const uint8_t *b) {
    if (b[96]) { p = pt_inf<Fq>(); return; }
    fq_load(p.x, b);
    fq_load(p.y, b + 48);
    p.z = fq_one();
}

static void g1_store(uint8_t *b, const Point<Fq> &p) {
    if (pt_is_inf(p)) {
        memset(b, 0, 97);
        b[96] = 1;
        return;
    }
    Fq ax, ay;
    pt_affine(ax, ay, p);
    fq_store(b, ax);
    fq_store(b + 48, ay);
    b[96] = 0;
}

static void g2_load(Point<Fq2> &p, const uint8_t *b) {
    if (b[192]) { p = pt_inf<Fq2>(); return; }
    fq_load(p.x.a, b);
    fq_load(p.x.b, b + 48);
    fq_load(p.y.a, b + 96);
    fq_load(p.y.b, b + 144);
    p.z = fq2_one();
}

static void g2_store(uint8_t *b, const Point<Fq2> &p) {
    if (pt_is_inf(p)) {
        memset(b, 0, 193);
        b[192] = 1;
        return;
    }
    Fq2 ax, ay;
    pt_affine(ax, ay, p);
    fq_store(b, ax.a);
    fq_store(b + 48, ax.b);
    fq_store(b + 96, ay.a);
    fq_store(b + 144, ay.b);
    b[192] = 0;
}

static void load_scalar(uint64_t k[4], const uint8_t *s) {
    uint64_t raw[4];
    for (int i = 0; i < 4; i++) {
        uint64_t w = 0;
        for (int j = 7; j >= 0; j--) w = (w << 8) | s[i * 8 + j];
        raw[i] = w;
    }
    scalar_mod_r(k, raw);
}

extern "C" {

void bls_g1_add(uint8_t *out, const uint8_t *a, const uint8_t *b) {
    Point<Fq> pa, pb, po;
    g1_load(pa, a);
    g1_load(pb, b);
    pt_add(po, pa, pb);
    g1_store(out, po);
}

void bls_g1_neg(uint8_t *out, const uint8_t *a) {
    Point<Fq> p;
    g1_load(p, a);
    Fq ny;
    fq_neg(ny, p.y);
    p.y = ny;
    g1_store(out, p);
}

void bls_g1_mul(uint8_t *out, const uint8_t *a, const uint8_t *scalar) {
    Point<Fq> p, o;
    uint64_t k[4];
    g1_load(p, a);
    load_scalar(k, scalar);
    pt_mul(o, p, k);
    g1_store(out, o);
}

void bls_g1_multiexp(uint8_t *out, const uint8_t *pts,
                     const uint8_t *scalars, int n) {
    std::vector<Point<Fq>> ps(n);
    std::vector<std::array<uint64_t, 4>> ks(n);
    for (int i = 0; i < n; i++) {
        g1_load(ps[i], pts + (size_t)i * 97);
        load_scalar(ks[i].data(), scalars + (size_t)i * 32);
    }
    Point<Fq> acc;
    pt_multiexp(acc, ps.data(),
                reinterpret_cast<const uint64_t(*)[4]>(ks.data()), n);
    g1_store(out, acc);
}

// Fixed-base tables: opaque in-memory blobs of raw Jacobian points.
// bls_g1_table_size(w) bytes; produce with precompute, use with mul_table.
int bls_g1_table_size(int w) {
    return (int)(((256 + w - 1) / w) * (((size_t)1 << w) - 1) *
                 sizeof(Point<Fq>));
}

void bls_g1_precompute(uint8_t *table, const uint8_t *pt, int w) {
    Point<Fq> p;
    g1_load(p, pt);
    pt_precompute(reinterpret_cast<Point<Fq> *>(table), p, w);
}

void bls_g1_mul_table(uint8_t *out, const uint8_t *table,
                      const uint8_t *scalar, int w) {
    uint64_t k[4];
    load_scalar(k, scalar);
    Point<Fq> acc;
    pt_mul_table(acc, reinterpret_cast<const Point<Fq> *>(table), k, w);
    g1_store(out, acc);
}

int bls_g2_table_size(int w) {
    return (int)(((256 + w - 1) / w) * (((size_t)1 << w) - 1) *
                 sizeof(Point<Fq2>));
}

void bls_g2_precompute(uint8_t *table, const uint8_t *pt, int w) {
    Point<Fq2> p;
    g2_load(p, pt);
    pt_precompute(reinterpret_cast<Point<Fq2> *>(table), p, w);
}

void bls_g2_mul_table(uint8_t *out, const uint8_t *table,
                      const uint8_t *scalar, int w) {
    uint64_t k[4];
    load_scalar(k, scalar);
    Point<Fq2> acc;
    pt_mul_table(acc, reinterpret_cast<const Point<Fq2> *>(table), k, w);
    g2_store(out, acc);
}

void bls_g2_add(uint8_t *out, const uint8_t *a, const uint8_t *b) {
    Point<Fq2> pa, pb, po;
    g2_load(pa, a);
    g2_load(pb, b);
    pt_add(po, pa, pb);
    g2_store(out, po);
}

void bls_g2_neg(uint8_t *out, const uint8_t *a) {
    Point<Fq2> p;
    g2_load(p, a);
    Fq2 ny;
    fq2_neg(ny, p.y);
    p.y = ny;
    g2_store(out, p);
}

void bls_g2_mul(uint8_t *out, const uint8_t *a, const uint8_t *scalar) {
    Point<Fq2> p, o;
    uint64_t k[4];
    g2_load(p, a);
    load_scalar(k, scalar);
    pt_mul(o, p, k);
    g2_store(out, o);
}

// Fq12 ABI: 576 bytes = 6 coeffs x (a 48 | b 48), plain LE
static void fq12_load_abi(Fq12 &o, const uint8_t *b) {
    for (int i = 0; i < 6; i++) {
        fq_load(o.c[i].a, b + (size_t)i * 96);
        fq_load(o.c[i].b, b + (size_t)i * 96 + 48);
    }
}

static void fq12_store_abi(uint8_t *b, const Fq12 &x) {
    for (int i = 0; i < 6; i++) {
        fq_store(b + (size_t)i * 96, x.c[i].a);
        fq_store(b + (size_t)i * 96 + 48, x.c[i].b);
    }
}

void bls_pairing(uint8_t *out, const uint8_t *g1, const uint8_t *g2) {
    Point<Fq> P;
    Point<Fq2> Q;
    g1_load(P, g1);
    g2_load(Q, g2);
    Fq12 e;
    pairing_impl(e, P, Q);
    fq12_store_abi(out, e);
}

void bls_fq12_mul(uint8_t *out, const uint8_t *a, const uint8_t *b) {
    Fq12 x, y, o;
    fq12_load_abi(x, a);
    fq12_load_abi(y, b);
    fq12_mul(o, x, y);
    fq12_store_abi(out, o);
}

void bls_fq12_inv(uint8_t *out, const uint8_t *a) {
    Fq12 x, o;
    fq12_load_abi(x, a);
    fq12_inv(o, x);
    fq12_store_abi(out, o);
}

void bls_fq12_pow(uint8_t *out, const uint8_t *a, const uint8_t *scalar) {
    Fq12 x, o;
    fq12_load_abi(x, a);
    uint64_t k[4];
    load_scalar(k, scalar);
    fq12_pow(o, x, k, 4);
    fq12_store_abi(out, o);
}

}  // extern "C"
