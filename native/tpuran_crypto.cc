// tpuran_crypto: 5G NR security algorithms (TS 33.501 / 33.401 Annex B).
//
// Native implementations of the NEA/NIA cipher & integrity families the
// reference provides in lib/security (s3g.cpp, zuc.cpp, security.cpp):
//   128-NEA1/NIA1  SNOW 3G  (UEA2/UIA2, ETSI/SAGE spec)
//   128-NEA2/NIA2  AES-128 CTR / CMAC
//   128-NEA3/NIA3  ZUC      (EEA3/EIA3, ETSI/SAGE spec)
//
// Written from the algorithm specifications; the S-box constant tables
// (published spec data) are supplied at runtime by the Python side from
// data/tables_security.npz via tpuran_crypto_init (the SNOW3G SQ table is
// re-derived mathematically there; the AES S-box is generated below).
//
// C ABI for ctypes (no pybind11 in this environment).

#include <cstdint>
#include <cstring>

namespace {

uint8_t SQ[256];        // SNOW3G S2 box (Dickson g49 + 0x25)
uint8_t SR[256];        // AES S-box (generated in init)
uint8_t ZS0[256];       // ZUC S0
uint8_t ZS1[256];       // ZUC S1
uint32_t ZEK[16];       // ZUC key-loading constants d_i
uint32_t MULA[256];     // SNOW3G MULalpha table
uint32_t DIVA[256];     // SNOW3G DIValpha table
bool g_ready = false;

// ----------------------------------------------------------- GF(2^8) bits
inline uint8_t mulx(uint8_t v, uint8_t c) {
  return (v & 0x80) ? static_cast<uint8_t>((v << 1) ^ c)
                    : static_cast<uint8_t>(v << 1);
}

uint8_t mulx_pow(uint8_t v, int i, uint8_t c) {
  while (i-- > 0) v = mulx(v, c);
  return v;
}

void make_aes_sbox() {
  // inverse via exponentiation chains is overkill; brute-force table once
  uint8_t inv[256] = {0};
  for (int a = 1; a < 256; ++a) {
    for (int b = 1; b < 256; ++b) {
      // carry-less multiply mod 0x11B
      uint32_t r = 0;
      for (int i = 0; i < 8; ++i)
        if ((b >> i) & 1) r ^= static_cast<uint32_t>(a) << i;
      for (int i = 15; i >= 8; --i)
        if ((r >> i) & 1) r ^= 0x11Bu << (i - 8);
      if (r == 1) {
        inv[a] = static_cast<uint8_t>(b);
        break;
      }
    }
  }
  for (int a = 0; a < 256; ++a) {
    uint8_t x = inv[a], r = 0x63;
    for (int i = 0; i < 5; ++i) {
      r ^= x;
      x = static_cast<uint8_t>((x << 1) | (x >> 7));
    }
    SR[a] = r;
  }
}

// ================================================================ SNOW 3G
// ETSI/SAGE SNOW 3G spec: LFSR s0..s15 (32-bit words) + FSM (R1,R2,R3).
struct Snow3G {
  uint32_t s[16];
  uint32_t r1, r2, r3;

  static uint32_t mul_alpha(uint8_t c) {
    return (static_cast<uint32_t>(mulx_pow(c, 23, 0xA9)) << 24) |
           (static_cast<uint32_t>(mulx_pow(c, 245, 0xA9)) << 16) |
           (static_cast<uint32_t>(mulx_pow(c, 48, 0xA9)) << 8) |
           mulx_pow(c, 239, 0xA9);
  }
  static uint32_t div_alpha(uint8_t c) {
    return (static_cast<uint32_t>(mulx_pow(c, 16, 0xA9)) << 24) |
           (static_cast<uint32_t>(mulx_pow(c, 39, 0xA9)) << 16) |
           (static_cast<uint32_t>(mulx_pow(c, 6, 0xA9)) << 8) |
           mulx_pow(c, 64, 0xA9);
  }
  // 32->32 S-boxes: byte substitution + MixColumn-style circulant [2 1 1 3]
  static uint32_t sbox32(uint32_t w, const uint8_t* box, uint8_t c) {
    uint8_t b0 = box[(w >> 24) & 0xff], b1 = box[(w >> 16) & 0xff];
    uint8_t b2 = box[(w >> 8) & 0xff], b3 = box[w & 0xff];
    uint8_t r0 = mulx(b0, c) ^ b1 ^ b2 ^ mulx(b3, c) ^ b3;
    uint8_t r1_ = mulx(b0, c) ^ b0 ^ mulx(b1, c) ^ b2 ^ b3;
    uint8_t r2_ = b0 ^ mulx(b1, c) ^ b1 ^ mulx(b2, c) ^ b3;
    uint8_t r3_ = b0 ^ b1 ^ mulx(b2, c) ^ b2 ^ mulx(b3, c);
    return (static_cast<uint32_t>(r0) << 24) |
           (static_cast<uint32_t>(r1_) << 16) |
           (static_cast<uint32_t>(r2_) << 8) | r3_;
  }

  static void make_alpha_tables() {
    for (int c = 0; c < 256; ++c) {
      MULA[c] = mul_alpha(static_cast<uint8_t>(c));
      DIVA[c] = div_alpha(static_cast<uint8_t>(c));
    }
  }

  uint32_t clock_fsm() {
    uint32_t f = (s[15] + r1) ^ r2;
    uint32_t r = r2 + (r3 ^ s[5]);
    r3 = sbox32(r2, SQ, 0x69);
    r2 = sbox32(r1, SR, 0x1B);
    r1 = r;
    return f;
  }
  void clock_lfsr(uint32_t f_init) {
    uint32_t v = ((s[0] << 8) & 0xFFFFFF00u) ^ MULA[(s[0] >> 24) & 0xff]
                 ^ s[2] ^ ((s[11] >> 8) & 0x00FFFFFFu) ^ DIVA[s[11] & 0xff]
                 ^ f_init;
    std::memmove(s, s + 1, 15 * sizeof(uint32_t));
    s[15] = v;
  }
  void init(const uint32_t k[4], const uint32_t iv[4]) {
    // k[3] = most-significant key word (first 4 key bytes)
    s[15] = k[3] ^ iv[0];
    s[14] = k[2];
    s[13] = k[1];
    s[12] = k[0] ^ iv[1];
    s[11] = ~k[3];
    s[10] = ~k[2] ^ iv[2];
    s[9] = ~k[1] ^ iv[3];
    s[8] = ~k[0];
    s[7] = k[3];
    s[6] = k[2];
    s[5] = k[1];
    s[4] = k[0];
    s[3] = ~k[3];
    s[2] = ~k[2];
    s[1] = ~k[1];
    s[0] = ~k[0];
    r1 = r2 = r3 = 0;
    for (int t = 0; t < 32; ++t) clock_lfsr(clock_fsm());
    clock_fsm();       // first FSM clock discarded
    clock_lfsr(0);
  }
  uint32_t next() {
    uint32_t f = clock_fsm();
    uint32_t z = f ^ s[0];
    clock_lfsr(0);
    return z;
  }
};

void load_key_words(const uint8_t* key, uint32_t k[4]) {
  // k[3] from key bytes 0..3 (MSW first), ... k[0] from bytes 12..15
  for (int i = 0; i < 4; ++i)
    k[3 - i] = (static_cast<uint32_t>(key[4 * i]) << 24) |
               (static_cast<uint32_t>(key[4 * i + 1]) << 16) |
               (static_cast<uint32_t>(key[4 * i + 2]) << 8) |
               key[4 * i + 3];
}

// GF(2^64) multiply, reduction byte c (x^64 feedback), for UIA2 EVAL.
uint64_t mul64(uint64_t v, uint64_t p, uint8_t c) {
  uint64_t r = 0;
  for (int i = 63; i >= 0; --i) {
    uint64_t top = r >> 63;
    r <<= 1;
    if (top) r ^= c;
    if ((p >> i) & 1) r ^= v;
  }
  return r;
}

// ================================================================ AES-128
struct Aes128 {
  uint32_t rk[44];
  static uint32_t sub_word(uint32_t w) {
    return (static_cast<uint32_t>(SR[(w >> 24) & 0xff]) << 24) |
           (static_cast<uint32_t>(SR[(w >> 16) & 0xff]) << 16) |
           (static_cast<uint32_t>(SR[(w >> 8) & 0xff]) << 8) | SR[w & 0xff];
  }
  explicit Aes128(const uint8_t* key) {
    for (int i = 0; i < 4; ++i)
      rk[i] = (static_cast<uint32_t>(key[4 * i]) << 24) |
              (static_cast<uint32_t>(key[4 * i + 1]) << 16) |
              (static_cast<uint32_t>(key[4 * i + 2]) << 8) | key[4 * i + 3];
    uint8_t rc = 1;
    for (int i = 4; i < 44; ++i) {
      uint32_t t = rk[i - 1];
      if (i % 4 == 0) {
        t = sub_word((t << 8) | (t >> 24)) ^ (static_cast<uint32_t>(rc) << 24);
        rc = mulx(rc, 0x1B);
      }
      rk[i] = rk[i - 4] ^ t;
    }
  }
  void encrypt(const uint8_t in[16], uint8_t out[16]) const {
    uint8_t st[16];
    for (int i = 0; i < 16; ++i)
      st[i] = in[i] ^ static_cast<uint8_t>(rk[i / 4] >> (24 - 8 * (i % 4)));
    for (int round = 1; round <= 10; ++round) {
      uint8_t t[16];
      // SubBytes + ShiftRows (column-major state: st[4c+r])
      for (int c = 0; c < 4; ++c)
        for (int r = 0; r < 4; ++r) t[4 * c + r] = SR[st[4 * ((c + r) % 4) + r]];
      if (round < 10) {  // MixColumns
        for (int c = 0; c < 4; ++c) {
          uint8_t a0 = t[4 * c], a1 = t[4 * c + 1], a2 = t[4 * c + 2],
                  a3 = t[4 * c + 3];
          st[4 * c] = mulx(a0, 0x1B) ^ mulx(a1, 0x1B) ^ a1 ^ a2 ^ a3;
          st[4 * c + 1] = a0 ^ mulx(a1, 0x1B) ^ mulx(a2, 0x1B) ^ a2 ^ a3;
          st[4 * c + 2] = a0 ^ a1 ^ mulx(a2, 0x1B) ^ mulx(a3, 0x1B) ^ a3;
          st[4 * c + 3] = mulx(a0, 0x1B) ^ a0 ^ a1 ^ a2 ^ mulx(a3, 0x1B);
        }
      } else {
        std::memcpy(st, t, 16);
      }
      for (int i = 0; i < 16; ++i)
        st[i] ^= static_cast<uint8_t>(rk[4 * round + i / 4]
                                      >> (24 - 8 * (i % 4)));
    }
    std::memcpy(out, st, 16);
  }
};

void cmac_double(uint8_t k[16]) {
  uint8_t carry = 0;
  for (int i = 15; i >= 0; --i) {
    uint8_t nc = k[i] >> 7;
    k[i] = static_cast<uint8_t>((k[i] << 1) | carry);
    carry = nc;
  }
  if (carry) k[15] ^= 0x87;
}

// ==================================================================== ZUC
struct Zuc {
  uint32_t s[16];     // 31-bit cells
  uint32_t r1, r2;

  static uint32_t add31(uint32_t a, uint32_t b) {
    uint32_t c = a + b;
    c = (c & 0x7FFFFFFF) + (c >> 31);
    return c;
  }
  static uint32_t rot31(uint32_t a, int k) {
    return ((a << k) | (a >> (31 - k))) & 0x7FFFFFFF;
  }
  static uint32_t rot32(uint32_t a, int k) { return (a << k) | (a >> (32 - k)); }
  static uint32_t l1(uint32_t x) {
    return x ^ rot32(x, 2) ^ rot32(x, 10) ^ rot32(x, 18) ^ rot32(x, 24);
  }
  static uint32_t l2(uint32_t x) {
    return x ^ rot32(x, 8) ^ rot32(x, 14) ^ rot32(x, 22) ^ rot32(x, 30);
  }
  static uint32_t sbox(uint32_t w) {
    return (static_cast<uint32_t>(ZS0[(w >> 24) & 0xff]) << 24) |
           (static_cast<uint32_t>(ZS1[(w >> 16) & 0xff]) << 16) |
           (static_cast<uint32_t>(ZS0[(w >> 8) & 0xff]) << 8) | ZS1[w & 0xff];
  }

  void lfsr_next(uint32_t u) {  // u = 0 in work mode, W>>1 in init mode
    uint32_t f = s[0];
    f = add31(f, rot31(s[0], 8));
    f = add31(f, rot31(s[4], 20));
    f = add31(f, rot31(s[10], 21));
    f = add31(f, rot31(s[13], 17));
    f = add31(f, rot31(s[15], 15));
    f = add31(f, u);
    if (f == 0) f = 0x7FFFFFFF;
    std::memmove(s, s + 1, 15 * sizeof(uint32_t));
    s[15] = f;
  }
  void bit_reorg(uint32_t x[4]) const {
    x[0] = ((s[15] & 0x7FFF8000u) << 1) | (s[14] & 0xFFFF);
    x[1] = ((s[11] & 0xFFFF) << 16) | (s[9] >> 15);
    x[2] = ((s[7] & 0xFFFF) << 16) | (s[5] >> 15);
    x[3] = ((s[2] & 0xFFFF) << 16) | (s[0] >> 15);
  }
  uint32_t f(const uint32_t x[4]) {
    uint32_t w = ((x[0] ^ r1) + r2);  // mod 2^32
    uint32_t w1 = r1 + x[1];
    uint32_t w2 = r2 ^ x[2];
    uint32_t u = l1((w1 << 16) | (w2 >> 16));
    uint32_t v = l2((w2 << 16) | (w1 >> 16));
    r1 = sbox(u);
    r2 = sbox(v);
    return w;
  }
  void init(const uint8_t k[16], const uint8_t iv[16]) {
    for (int i = 0; i < 16; ++i)
      s[i] = (static_cast<uint32_t>(k[i]) << 23) | (ZEK[i] << 8) | iv[i];
    r1 = r2 = 0;
    for (int t = 0; t < 32; ++t) {
      uint32_t x[4];
      bit_reorg(x);
      uint32_t w = f(x);
      lfsr_next(w >> 1);
    }
    uint32_t x[4];
    bit_reorg(x);
    f(x);          // discard
    lfsr_next(0);
  }
  uint32_t next() {
    uint32_t x[4];
    bit_reorg(x);
    uint32_t z = f(x) ^ x[3];
    lfsr_next(0);
    return z;
  }
};

inline void xor_keystream_word(uint8_t* data, int64_t nbytes, int64_t i,
                               uint32_t z) {
  for (int b = 0; b < 4; ++b) {
    int64_t idx = 4 * i + b;
    if (idx < nbytes) data[idx] ^= static_cast<uint8_t>(z >> (24 - 8 * b));
  }
}

void mask_tail(uint8_t* data, int64_t nbits) {
  if (nbits % 8) data[nbits / 8] &= static_cast<uint8_t>(0xFF00 >> (nbits % 8));
}

}  // namespace

extern "C" {

void tpuran_crypto_init(const uint8_t* sq, const uint8_t* zs0,
                        const uint8_t* zs1, const uint32_t* ekd) {
  std::memcpy(SQ, sq, 256);
  std::memcpy(ZS0, zs0, 256);
  std::memcpy(ZS1, zs1, 256);
  std::memcpy(ZEK, ekd, 16 * sizeof(uint32_t));
  make_aes_sbox();
  Snow3G::make_alpha_tables();
  g_ready = true;
}

int tpuran_crypto_ready() { return g_ready ? 1 : 0; }

// 128-NEA1: SNOW3G f8 keystream XORed in place over ceil(nbits/8) bytes.
void tpuran_nea1(const uint8_t* key, uint32_t count, uint32_t bearer,
                 uint32_t dir, uint8_t* data, int64_t nbits) {
  uint32_t k[4], iv[4];
  load_key_words(key, k);
  iv[3] = count;
  iv[2] = (bearer << 27) | ((dir & 1) << 26);
  iv[1] = iv[3];
  iv[0] = iv[2];
  Snow3G sg;
  sg.init(k, iv);
  int64_t nbytes = (nbits + 7) / 8;
  int64_t nwords = (nbits + 31) / 32;
  for (int64_t i = 0; i < nwords; ++i)
    xor_keystream_word(data, nbytes, i, sg.next());
  mask_tail(data, nbits);
}

// 128-NIA1: SNOW3G f9 (UIA2) with FRESH = bearer<<27.
uint32_t tpuran_nia1(const uint8_t* key, uint32_t count, uint32_t bearer,
                     uint32_t dir, const uint8_t* data, int64_t nbits) {
  uint32_t k[4], iv[4];
  load_key_words(key, k);
  uint32_t fresh = bearer << 27;
  iv[3] = count;
  iv[2] = fresh;
  iv[1] = count ^ ((dir & 1) << 31);
  iv[0] = fresh ^ ((dir & 1) << 15);
  Snow3G sg;
  sg.init(k, iv);
  uint32_t z[5];
  for (auto& w : z) w = sg.next();
  uint64_t p = (static_cast<uint64_t>(z[0]) << 32) | z[1];
  uint64_t q = (static_cast<uint64_t>(z[2]) << 32) | z[3];
  // EVAL over 64-bit blocks; D-1 = ceil(nbits/64) data blocks (last
  // zero-padded) + the length block M_D
  int64_t d_blocks = (nbits + 63) / 64;
  uint64_t eval = 0;
  int64_t nbytes = (nbits + 7) / 8;
  for (int64_t i = 0; i < d_blocks; ++i) {
    uint64_t m = 0;
    for (int b = 0; b < 8; ++b) {
      int64_t idx = 8 * i + b;
      uint8_t byte = (idx < nbytes) ? data[idx] : 0;
      if (8 * idx >= nbits) byte = 0;
      else if (8 * idx + 8 > nbits)
        byte &= static_cast<uint8_t>(0xFF00 >> (nbits % 8));
      m = (m << 8) | byte;
    }
    eval = mul64(eval ^ m, p, 0x1B);
  }
  eval ^= static_cast<uint64_t>(nbits);
  eval = mul64(eval, q, 0x1B);
  return static_cast<uint32_t>(eval >> 32) ^ z[4];
}

// 128-NEA2: AES-128 CTR (TS 33.401 B.1.3).
void tpuran_nea2(const uint8_t* key, uint32_t count, uint32_t bearer,
                 uint32_t dir, uint8_t* data, int64_t nbits) {
  Aes128 aes(key);
  uint8_t ctr[16] = {0};
  ctr[0] = static_cast<uint8_t>(count >> 24);
  ctr[1] = static_cast<uint8_t>(count >> 16);
  ctr[2] = static_cast<uint8_t>(count >> 8);
  ctr[3] = static_cast<uint8_t>(count);
  ctr[4] = static_cast<uint8_t>((bearer << 3) | ((dir & 1) << 2));
  int64_t nbytes = (nbits + 7) / 8;
  uint8_t ks[16];
  for (int64_t off = 0; off < nbytes; off += 16) {
    aes.encrypt(ctr, ks);
    for (int b = 0; b < 16 && off + b < nbytes; ++b) data[off + b] ^= ks[b];
    for (int i = 15; i >= 8; --i)
      if (++ctr[i] != 0) break;
  }
  mask_tail(data, nbits);
}

// 128-NIA2: AES-128 CMAC over COUNT||BEARER||DIR||0^26||MESSAGE.
uint32_t tpuran_nia2(const uint8_t* key, uint32_t count, uint32_t bearer,
                     uint32_t dir, const uint8_t* data, int64_t nbits) {
  Aes128 aes(key);
  uint8_t k1[16], k2[16];
  std::memset(k1, 0, 16);
  aes.encrypt(k1, k1);
  cmac_double(k1);
  std::memcpy(k2, k1, 16);
  cmac_double(k2);

  int64_t total_bits = 64 + nbits;
  int64_t total_bytes = (total_bits + 7) / 8;
  int64_t msg_bytes = (nbits + 7) / 8;
  auto get_byte = [&](int64_t i) -> uint8_t {
    if (i == 0) return static_cast<uint8_t>(count >> 24);
    if (i == 1) return static_cast<uint8_t>(count >> 16);
    if (i == 2) return static_cast<uint8_t>(count >> 8);
    if (i == 3) return static_cast<uint8_t>(count);
    if (i == 4) return static_cast<uint8_t>((bearer << 3) | ((dir & 1) << 2));
    if (i < 8) return 0;
    int64_t j = i - 8;
    if (j >= msg_bytes) return 0;
    uint8_t b = data[j];
    if (8 * j + 8 > nbits) b &= static_cast<uint8_t>(0xFF00 >> (nbits % 8));
    return b;
  };

  bool aligned = (total_bits % 128) == 0 && total_bits > 0;
  int64_t nblocks = aligned ? total_bits / 128 : total_bits / 128 + 1;
  uint8_t x[16] = {0}, blk[16];
  for (int64_t i = 0; i < nblocks; ++i) {
    std::memset(blk, 0, 16);
    for (int b = 0; b < 16; ++b)
      if (16 * i + b < total_bytes) blk[b] = get_byte(16 * i + b);
    if (i == nblocks - 1) {
      if (aligned) {
        for (int b = 0; b < 16; ++b) blk[b] ^= k1[b];
      } else {
        // 10* padding at bit position total_bits within this block
        int64_t bit_in_blk = total_bits - 128 * i;
        blk[bit_in_blk / 8] |= static_cast<uint8_t>(0x80 >> (bit_in_blk % 8));
        for (int b = 0; b < 16; ++b) blk[b] ^= k2[b];
      }
    }
    for (int b = 0; b < 16; ++b) blk[b] ^= x[b];
    aes.encrypt(blk, x);
  }
  return (static_cast<uint32_t>(x[0]) << 24) |
         (static_cast<uint32_t>(x[1]) << 16) |
         (static_cast<uint32_t>(x[2]) << 8) | x[3];
}

// 128-NEA3: ZUC EEA3.
void tpuran_nea3(const uint8_t* key, uint32_t count, uint32_t bearer,
                 uint32_t dir, uint8_t* data, int64_t nbits) {
  uint8_t iv[16];
  iv[0] = static_cast<uint8_t>(count >> 24);
  iv[1] = static_cast<uint8_t>(count >> 16);
  iv[2] = static_cast<uint8_t>(count >> 8);
  iv[3] = static_cast<uint8_t>(count);
  iv[4] = static_cast<uint8_t>((bearer << 3) | ((dir & 1) << 2));
  iv[5] = iv[6] = iv[7] = 0;
  for (int i = 0; i < 8; ++i) iv[8 + i] = iv[i];
  Zuc z;
  z.init(key, iv);
  int64_t nbytes = (nbits + 7) / 8;
  int64_t nwords = (nbits + 31) / 32;
  for (int64_t i = 0; i < nwords; ++i)
    xor_keystream_word(data, nbytes, i, z.next());
  mask_tail(data, nbits);
}

// 128-NIA3: ZUC EIA3.
uint32_t tpuran_nia3(const uint8_t* key, uint32_t count, uint32_t bearer,
                     uint32_t dir, const uint8_t* data, int64_t nbits) {
  uint8_t iv[16];
  iv[0] = static_cast<uint8_t>(count >> 24);
  iv[1] = static_cast<uint8_t>(count >> 16);
  iv[2] = static_cast<uint8_t>(count >> 8);
  iv[3] = static_cast<uint8_t>(count);
  iv[4] = static_cast<uint8_t>(bearer << 3);
  iv[5] = iv[6] = iv[7] = 0;
  iv[8] = iv[0] ^ static_cast<uint8_t>((dir & 1) << 7);
  iv[9] = iv[1];
  iv[10] = iv[2];
  iv[11] = iv[3];
  iv[12] = iv[4];
  iv[13] = iv[5];
  iv[14] = iv[6] ^ static_cast<uint8_t>((dir & 1) << 7);
  iv[15] = iv[7];
  Zuc zg;
  zg.init(key, iv);
  int64_t nwords = (nbits + 31) / 32 + 2;  // L = ceil(LENGTH/32) + 2
  uint32_t* z = new uint32_t[nwords];
  for (int64_t i = 0; i < nwords; ++i) z[i] = zg.next();
  auto get_word = [&](int64_t bit) -> uint32_t {
    int64_t wi = bit / 32, sh = bit % 32;
    if (sh == 0) return z[wi];
    return (z[wi] << sh) | (z[wi + 1] >> (32 - sh));
  };
  uint32_t t = 0;
  for (int64_t i = 0; i < nbits; ++i)
    if ((data[i / 8] >> (7 - i % 8)) & 1) t ^= get_word(i);
  t ^= get_word(nbits);
  uint32_t mac = t ^ z[nwords - 1];
  delete[] z;
  return mac;
}

// Raw AES-128 block encrypt (for tests / KDF composition).
void tpuran_aes128_encrypt(const uint8_t* key, const uint8_t* in,
                           uint8_t* out) {
  Aes128 aes(key);
  aes.encrypt(in, out);
}

}  // extern "C"
