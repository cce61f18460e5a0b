// Host-side native field arithmetic for F_p, p = 1 + 407*2^119.
//
// This is the framework's native runtime component: the TPU-native
// equivalent of the reference's Rust L0/L1 layers (I320 wide integer +
// FieldElement, /root/reference/src/field/types/base.rs and field.rs) for
// the HOST side of the pipeline — trace generation (Rescue-Prime chains),
// verifier-side scalar math, and batch helpers. Device-side arithmetic
// lives in Pallas kernels (stark_anatomy_tpu/ops/field_pallas.py); this
// file covers the sequential host work those kernels cannot take.
//
// Representation: values are 16-byte little-endian (the framework's
// canonical encoding, stark_anatomy_tpu/utils/encoding.py), held
// internally as unsigned __int128. Multiplication is Montgomery REDC with
// R = 2^128 over 2x64-bit limbs; p = 1 + 407*2^119 gives p mod 2^64 = 1,
// so the per-limb Montgomery constant is p' = 2^64 - 1 and m*p folds to
// m + (m * (407*2^55) << 64) — one extra 64x64 multiply per REDC step
// (same structural trick as the device kernels, see ops/limbs.py).
//
// Build: g++ -O2 -shared -fPIC -o libfield128.so field128.cpp
// (loaded via ctypes from stark_anatomy_tpu/native/__init__.py; the
// Python fallback implements identical semantics).

#include <cstdint>
#include <cstring>
#include <cstddef>

typedef unsigned __int128 u128;
typedef std::uint64_t u64;
typedef std::uint8_t u8;

// p = 1 + 407*2^119
static const u128 P = ((u128)407 << 119) + 1;
static const u64 P_HI = (u64)(P >> 64);      // 407 * 2^55
// R^2 mod p, R = 2^128 (derivation: pow(2, 256, p); verified in tests
// against the Python oracle).
static const u64 R2_LO = 0x5bd53a7f0e778236ULL;
static const u64 R2_HI = 0xaaf4ad9a1a6aedc2ULL;

static inline u128 load128(const u8* src) {
    u128 v;
    std::memcpy(&v, src, 16);  // little-endian hosts only (x86/ARM)
    return v;
}

static inline void store128(u8* dst, u128 v) { std::memcpy(dst, &v, 16); }

static inline u128 add_mod(u128 a, u128 b) {
    // a, b < p < 2^128; a+b may wrap 2^128.
    u128 s = a + b;
    if (s < a || s >= P) s -= P;  // wrap implies s-P is the reduced value
    return s;
}

static inline u128 sub_mod(u128 a, u128 b) {
    return a >= b ? a - b : a + (P - b);
}

// Montgomery product: a * b * R^{-1} mod p (a, b < p).
static inline u128 mont_mul(u128 a, u128 b) {
    u64 a0 = (u64)a, a1 = (u64)(a >> 64);
    u64 b0 = (u64)b, b1 = (u64)(b >> 64);
    // 256-bit product t3..t0 via 64x64->128 partials.
    u128 p00 = (u128)a0 * b0;
    u128 p01 = (u128)a0 * b1;
    u128 p10 = (u128)a1 * b0;
    u128 p11 = (u128)a1 * b1;
    u64 t0 = (u64)p00;
    u128 mid = (p00 >> 64) + (u64)p01 + (u64)p10;
    u64 t1 = (u64)mid;
    u128 hi = (mid >> 64) + (p01 >> 64) + (p10 >> 64) + p11;  // fits: <= 2^128-1
    // REDC step i=0: m0 = t0 * p' mod 2^64, p' = 2^64 - 1 => m0 = -t0.
    // REDC step i=1 analogous; do both on the 2-limb view.
    // T += m0 * p; T >>= 64;  T += m1 * p; T >>= 64
    // with m*p = m + (m * P_HI << 64).
    u64 m0 = (u64)(0 - t0);
    // T_low limbs after += m0 * p:
    u128 c = (u128)t0 + m0;                 // low limb; result limb = 0
    u128 mp0 = (u128)m0 * P_HI;             // contributes at limb 1 and 2
    c = (c >> 64) + t1 + (u64)mp0;
    u64 u1 = (u64)c;                         // becomes the new low limb
    u128 carry_hi = (c >> 64) + (mp0 >> 64); // into limb 2
    u64 m1 = (u64)(0 - u1);
    u128 c2 = (u128)u1 + m1;                // low limb becomes zero
    u128 mp1 = (u128)m1 * P_HI;
    // Result = hi + carry_hi + carry(c2) + mp1, < 2p; track 2^128 wrap.
    u128 s1 = hi + carry_hi;
    bool ov = s1 < hi;
    u128 s2 = s1 + (c2 >> 64);
    ov |= s2 < s1;
    u128 res = s2 + mp1;
    ov |= res < s2;
    if (ov || res >= P) res -= P;  // wrapped res-P == value-p mod 2^128
    return res;
}

static inline u128 to_mont(u128 a) {
    u128 r2 = ((u128)R2_HI << 64) | R2_LO;
    return mont_mul(a, r2);
}

static inline u128 from_mont(u128 a) { return mont_mul(a, 1); }

static inline u128 mul_mod(u128 a, u128 b) { return mont_mul(to_mont(a), b); }

// 2^128 mod p == the Montgomery form of 1. p < 2^128 < 2p, so the wrapped
// two's-complement negation IS the reduced value.
static const u128 R_MOD = (u128)0 - P;

// Montgomery-domain exponentiation, 4-bit windows: ~127 squarings + ~31
// window products + 14 table products, every one a SINGLE REDC — the
// previous canonical-form ladder paid TWO REDCs per multiply (to_mont of
// one operand each time) for ~384 REDCs on the 127-bit trace-generation
// exponent; this is ~170. Same values (Montgomery representatives are
// canonical, < p).
static inline u128 mont_pow(u128 base_m, u128 exp) {
    if (!exp) return R_MOD;
    u128 tbl[16];
    tbl[0] = R_MOD;
    tbl[1] = base_m;
    for (int i = 2; i < 16; ++i) tbl[i] = mont_mul(tbl[i - 1], base_m);
    int hi_bit = 127;
    while (!((exp >> hi_bit) & 1)) --hi_bit;
    int w = (hi_bit / 4) * 4;
    u128 acc = tbl[(u64)(exp >> w) & 0xF];
    for (w -= 4; w >= 0; w -= 4) {
        acc = mont_mul(acc, acc);
        acc = mont_mul(acc, acc);
        acc = mont_mul(acc, acc);
        acc = mont_mul(acc, acc);
        u64 d = (u64)(exp >> w) & 0xF;
        if (d) acc = mont_mul(acc, tbl[d]);
    }
    return acc;
}

static inline u128 pow_mod(u128 base, u128 exp) {
    return from_mont(mont_pow(to_mont(base % P), exp));
}

extern "C" {

void felt_add_batch(const u8* a, const u8* b, u8* out, size_t n) {
    for (size_t i = 0; i < n; ++i)
        store128(out + 16 * i, add_mod(load128(a + 16 * i), load128(b + 16 * i)));
}

void felt_sub_batch(const u8* a, const u8* b, u8* out, size_t n) {
    for (size_t i = 0; i < n; ++i)
        store128(out + 16 * i, sub_mod(load128(a + 16 * i), load128(b + 16 * i)));
}

void felt_mul_batch(const u8* a, const u8* b, u8* out, size_t n) {
    for (size_t i = 0; i < n; ++i)
        store128(out + 16 * i, mul_mod(load128(a + 16 * i), load128(b + 16 * i)));
}

// out[i] = base[i] ^ exp (one shared 128-bit exponent).
void felt_pow_batch(const u8* base, const u8* exp16, u8* out, size_t n) {
    u128 e = load128(exp16);
    for (size_t i = 0; i < n; ++i)
        store128(out + 16 * i, pow_mod(load128(base + 16 * i), e));
}

// Fermat inverse; 0 maps to 0 (callers guard).
void felt_inv_batch(const u8* a, u8* out, size_t n) {
    u128 e = P - 2;
    for (size_t i = 0; i < n; ++i)
        store128(out + 16 * i, pow_mod(load128(a + 16 * i), e));
}

// out[i] = base ^ i for i < n (powers table).
void felt_powers(const u8* base16, u8* out, size_t n) {
    u128 b = load128(base16) % P;
    u128 cur = 1;
    for (size_t i = 0; i < n; ++i) {
        store128(out + 16 * i, cur);
        cur = mul_mod(cur, b);
    }
}

// Rescue-Prime chain trace (models/rescue_prime.py semantics):
//   state = [input, 0]; each permutation occupies rows_per_perm rows
//   (a power of two >= n_rounds): transition t applies round (t mod
//   rows_per_perm) when that residue is < n_rounds and copies the state
//   otherwise. The power-of-two alignment makes every AIR constant column
//   periodic with period rows_per_perm over the omicron domain, which is
//   what keeps the STARK verifier succinct (iop/stark.py).
// mds16/mds_inv16: 4 values row-major; consts16: 2*m*N values; out_rows:
// (K*rows_per_perm+1) * m * 16 bytes. alpha = 3; alpha_inv = 1/3 mod p-1.
void rescue_chain_trace(const u8* input16, u64 chain_length, u64 n_rounds,
                        u64 rows_per_perm, const u8* mds16, const u8* consts16,
                        const u8* alpha_inv16, u8* out_rows) {
    // The whole chain runs in MONTGOMERY form: constants/MDS convert once
    // up front, each row stores two from_mont conversions, and the
    // inverse-S-box exponent runs the windowed mont_pow — together ~2.2x
    // fewer REDC multiplies per row than the canonical-form loop
    // (mul_mod pays a to_mont per call). Row values are identical: every
    // op maps to the same mod-p value (tests/test_native.py pins the
    // rows against the Python oracle).
    const int m = 2;
    u128 mds[4];
    for (int i = 0; i < 4; ++i) mds[i] = to_mont(load128(mds16 + 16 * i));
    u128 ainv = load128(alpha_inv16);
    // consts are reused every rows_per_perm rows; pre-convert all 2*m*N.
    u64 n_consts = 2 * (u64)m * n_rounds;
    u128 consts_m[4 * 64];  // N <= 64 rounds covers every Rescue instance
    for (u64 i = 0; i < n_consts && i < 4 * 64; ++i)
        consts_m[i] = to_mont(load128(consts16 + 16 * i));
    u128 state[2] = {to_mont(load128(input16) % P), 0};
    store128(out_rows + 0, from_mont(state[0]));
    store128(out_rows + 16, from_mont(state[1]));
    u64 total = chain_length * rows_per_perm;
    for (u64 t = 0; t < total; ++t) {
        u64 r = t % rows_per_perm;
        u8* row_out = out_rows + 16 * (size_t)m * (t + 1);
        if (r >= n_rounds) {  // copy row (power-of-two padding)
            store128(row_out + 0, from_mont(state[0]));
            store128(row_out + 16, from_mont(state[1]));
            continue;
        }
        const u128* c1 = consts_m + 2 * m * r;
        const u128* c2 = consts_m + 2 * m * r + m;
        u128 cubed[2], mid[2];
        for (int i = 0; i < m; ++i) {
            u128 x = state[i];
            cubed[i] = mont_mul(mont_mul(x, x), x);
        }
        for (int i = 0; i < m; ++i) {
            u128 acc = add_mod(mont_mul(mds[2 * i], cubed[0]),
                               mont_mul(mds[2 * i + 1], cubed[1]));
            mid[i] = add_mod(acc, c1[i]);
        }
        u128 root[2];
        for (int i = 0; i < m; ++i) root[i] = mont_pow(mid[i], ainv);
        for (int i = 0; i < m; ++i) {
            u128 acc = add_mod(mont_mul(mds[2 * i], root[0]),
                               mont_mul(mds[2 * i + 1], root[1]));
            state[i] = add_mod(acc, c2[i]);
        }
        store128(row_out + 0, from_mont(state[0]));
        store128(row_out + 16, from_mont(state[1]));
    }
}

// One FRI fold round on canonical 16-byte values (iop/fri.py _host_tail):
//   out[i] = 2^{-1} * ((1 + a_i) * v[i] + (1 - a_i) * v[i + n/2]),
//   a_i = alpha * offset_inv * omega_inv^i.
// Exact same mod-p values as the Python big-int loop it replaces (the
// host tail was ~0.4s of pure-Python folding per prove at 2^20).
void fri_fold(const u8* values, u64 n, const u8* alpha16,
              const u8* offset_inv16, const u8* omega_inv16, u8* out) {
    u64 half = n / 2;
    u128 alpha_m = to_mont(load128(alpha16) % P);
    u128 dinv_m = to_mont(load128(offset_inv16) % P);
    u128 winv_m = to_mont(load128(omega_inv16) % P);
    u128 one_m = R_MOD;
    u128 inv2_m = to_mont((P + 1) / 2);
    for (u64 i = 0; i < half; ++i) {
        u128 au = mont_mul(alpha_m, dinv_m);
        u128 lo = to_mont(load128(values + 16 * i));
        u128 hi = to_mont(load128(values + 16 * (i + half)));
        u128 t = add_mod(mont_mul(add_mod(one_m, au), lo),
                         mont_mul(sub_mod(one_m, au), hi));
        store128(out + 16 * i, from_mont(mont_mul(inv2_m, t)));
        dinv_m = mont_mul(dinv_m, winv_m);
    }
}

// Rescue-Prime hash-chain OUTPUT only (no trace rows): the verifier-side
// boundary computation needs just the final state; same math as
// rescue_chain_trace without the row stores.
void rescue_chain_output(const u8* input16, u64 chain_length, u64 n_rounds,
                         const u8* mds16, const u8* consts16,
                         const u8* alpha_inv16, u8* out16) {
    const int m = 2;
    u128 mds[4];
    for (int i = 0; i < 4; ++i) mds[i] = to_mont(load128(mds16 + 16 * i));
    u128 ainv = load128(alpha_inv16);
    u64 n_consts = 2 * (u64)m * n_rounds;
    u128 consts_m[4 * 64];
    for (u64 i = 0; i < n_consts && i < 4 * 64; ++i)
        consts_m[i] = to_mont(load128(consts16 + 16 * i));
    u128 state[2] = {to_mont(load128(input16) % P), 0};
    for (u64 k = 0; k < chain_length; ++k) {
        for (u64 r = 0; r < n_rounds; ++r) {
            const u128* c1 = consts_m + 2 * m * r;
            const u128* c2 = consts_m + 2 * m * r + m;
            u128 cubed[2], mid[2], root[2];
            for (int i = 0; i < m; ++i) {
                u128 x = state[i];
                cubed[i] = mont_mul(mont_mul(x, x), x);
            }
            for (int i = 0; i < m; ++i)
                mid[i] = add_mod(add_mod(mont_mul(mds[2 * i], cubed[0]),
                                         mont_mul(mds[2 * i + 1], cubed[1])),
                                 c1[i]);
            for (int i = 0; i < m; ++i) root[i] = mont_pow(mid[i], ainv);
            for (int i = 0; i < m; ++i)
                state[i] = add_mod(add_mod(mont_mul(mds[2 * i], root[0]),
                                           mont_mul(mds[2 * i + 1], root[1])),
                                   c2[i]);
        }
    }
    store128(out16 + 0, from_mont(state[0]));
    store128(out16 + 16, from_mont(state[1]));
}

}  // extern "C"
