/* MiMC over the BN254 scalar field — the SNARK-friendly commitment hash
 * of the shrink/wrap layer (stark/machine_bn.py).
 *
 * The reference reaches its on-chain proof by re-committing the last
 * recursion layer with a hash the Groth16 circuit can afford (SP1's wrap
 * over BN254 / risc0's identity_p254); this kernel plays the same role:
 * 110-round x^5 MiMC in Miyaguchi-Preneel mode (identical to the Python
 * zktls_tpu.snark.wrap constants — round constants are injected from
 * Python at init so the two never drift).
 *
 * Field arithmetic: 4x64-limb Montgomery (CIOS).  The ctypes interface
 * uses PLAIN little-endian u64 limbs; conversion happens at the edges.
 */

#include <stdint.h>
#include <stddef.h>
#include <string.h>

typedef unsigned __int128 u128;
typedef uint64_t u64;

static const u64 MOD[4] = {0x43e1f593f0000001ULL, 0x2833e84879b97091ULL,
                           0xb85045b68181585dULL, 0x30644e72e131a029ULL};
static const u64 R2[4] = {0x1bb8e645ae216da7ULL, 0x53fe3ab1e35c59e3ULL,
                          0x8c49833d53bb8085ULL, 0x0216d0b17f4e44a5ULL};
#define N0_INV 0xc2e1f593efffffffULL

#define MIMC_ROUNDS 110
static u64 RC[MIMC_ROUNDS][4];   /* Montgomery form, set at init */
static int rc_ready = 0;

static int geq(const u64 a[4], const u64 b[4]) {
    for (int i = 3; i >= 0; i--) {
        if (a[i] > b[i]) return 1;
        if (a[i] < b[i]) return 0;
    }
    return 1;
}

static void sub_mod_if(u64 a[4]) {
    if (geq(a, MOD)) {
        u128 borrow = 0;
        for (int i = 0; i < 4; i++) {
            u128 d = (u128)a[i] - MOD[i] - borrow;
            a[i] = (u64)d;
            borrow = (d >> 64) & 1;
        }
    }
}

/* CIOS Montgomery multiplication: out = a*b*2^-256 mod MOD */
static void mont_mul(u64 out[4], const u64 a[4], const u64 b[4]) {
    u64 t[6] = {0, 0, 0, 0, 0, 0};
    for (int i = 0; i < 4; i++) {
        u128 carry = 0;
        for (int j = 0; j < 4; j++) {
            u128 cur = (u128)a[j] * b[i] + t[j] + carry;
            t[j] = (u64)cur;
            carry = cur >> 64;
        }
        u128 cur = (u128)t[4] + carry;
        t[4] = (u64)cur;
        t[5] = (u64)(cur >> 64);
        u64 m = t[0] * N0_INV;
        carry = 0;
        u128 c0 = (u128)m * MOD[0] + t[0];
        carry = c0 >> 64;
        for (int j = 1; j < 4; j++) {
            u128 cur2 = (u128)m * MOD[j] + t[j] + carry;
            t[j - 1] = (u64)cur2;
            carry = cur2 >> 64;
        }
        u128 cur3 = (u128)t[4] + carry;
        t[3] = (u64)cur3;
        t[4] = t[5] + (u64)(cur3 >> 64);
        t[5] = 0;
    }
    memcpy(out, t, 32);
    sub_mod_if(out);
}

static void add_mod(u64 out[4], const u64 a[4], const u64 b[4]) {
    u128 carry = 0;
    u64 t[4];
    for (int i = 0; i < 4; i++) {
        u128 s = (u128)a[i] + b[i] + carry;
        t[i] = (u64)s;
        carry = s >> 64;
    }
    /* values < MOD < 2^254, so no limb-4 overflow */
    memcpy(out, t, 32);
    sub_mod_if(out);
}

static void to_mont(u64 out[4], const u64 a[4]) { mont_mul(out, a, R2); }

static void from_mont(u64 out[4], const u64 a[4]) {
    static const u64 one[4] = {1, 0, 0, 0};
    mont_mul(out, a, one);
}

/* x^5 in Montgomery form */
static void pow5(u64 out[4], const u64 x[4]) {
    u64 x2[4], x4[4];
    mont_mul(x2, x, x);
    mont_mul(x4, x2, x2);
    mont_mul(out, x4, x);
}

/* P(m, k): x = m; rounds x <- (x + k + c)^5.  All Montgomery. */
static void mimc_perm(u64 out[4], const u64 m[4], const u64 k[4]) {
    u64 x[4], t[4];
    memcpy(x, m, 32);
    for (int r = 0; r < MIMC_ROUNDS; r++) {
        add_mod(t, x, k);
        add_mod(t, t, RC[r]);
        pow5(x, t);
    }
    memcpy(out, x, 32);
}

/* Miyaguchi-Preneel step: h' = P(m, h) + h + m (Montgomery) */
static void mp_step(u64 h[4], const u64 m[4]) {
    u64 p[4];
    mimc_perm(p, m, h);
    add_mod(p, p, h);
    add_mod(h, p, m);
}

/* ---- exported API (plain-form u64[4] little-endian limbs) ---- */

/* rc: MIMC_ROUNDS x 4 plain limbs */
int mimc_set_rc(const u64 *rc) {
    for (int r = 0; r < MIMC_ROUNDS; r++)
        to_mont(RC[r], rc + 4 * r);
    rc_ready = 1;
    return 0;
}

/* hash n rows of k field elements each: out[i] = MP-chain over row i.
 * elems: n*k*4 plain limbs; out: n*4 plain limbs. */
void mimc_hash_rows(const u64 *elems, size_t n, size_t k, u64 *out) {
    if (!rc_ready) return;
#ifdef _OPENMP
#pragma omp parallel for schedule(static)
#endif
    for (size_t i = 0; i < n; i++) {
        u64 h[4] = {0, 0, 0, 0};
        for (size_t j = 0; j < k; j++) {
            u64 m[4];
            to_mont(m, elems + 4 * (i * k + j));
            mp_step(h, m);
        }
        from_mont(out + 4 * i, h);
    }
}

/* compress n (left, right) digest pairs: out[i] = MP-chain over 2 elems.
 * pairs laid out [l0 r0 l1 r1 ...] as plain limbs. */
void mimc_compress_pairs(const u64 *pairs, size_t n, u64 *out) {
    mimc_hash_rows(pairs, n, 2, out);
}
