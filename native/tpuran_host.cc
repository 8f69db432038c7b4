// tpuran_host: native host-side runtime primitives.
//
// The TPU owns the compute path (JAX/XLA/Pallas); this library covers the
// host runtime duties the reference implements in C++ (lib/srsvec bit
// packing, lib/phy/upper/channel_coding CRC LUT calculators,
// lib/phy/upper/sequence_generators pseudo_random_generator, and the
// lower-PHY slot timing loop) where Python-per-byte work would dominate:
// MAC-side transport block marshalling, PCAP/testvector IO, and precise
// slot ticking.
//
// C ABI for ctypes (no pybind11 in this environment).

#include <chrono>
#include <cstdint>
#include <cstring>
#include <thread>

extern "C" {

// ---------------------------------------------------------------- bit ops
// Pack bits (one byte per bit, MSB-first) into bytes.
void tpuran_pack_bits(const uint8_t* bits, uint8_t* bytes, int64_t nof_bits) {
  int64_t nof_bytes = nof_bits / 8;
  for (int64_t i = 0; i < nof_bytes; ++i) {
    const uint8_t* b = bits + i * 8;
    bytes[i] = static_cast<uint8_t>((b[0] << 7) | (b[1] << 6) | (b[2] << 5) |
                                    (b[3] << 4) | (b[4] << 3) | (b[5] << 2) |
                                    (b[6] << 1) | b[7]);
  }
  int64_t rem = nof_bits % 8;
  if (rem) {
    uint8_t acc = 0;
    const uint8_t* b = bits + nof_bytes * 8;
    for (int64_t j = 0; j < rem; ++j) acc |= b[j] << (7 - j);
    bytes[nof_bytes] = acc;
  }
}

void tpuran_unpack_bits(const uint8_t* bytes, uint8_t* bits,
                        int64_t nof_bits) {
  for (int64_t i = 0; i < nof_bits; ++i)
    bits[i] = (bytes[i / 8] >> (7 - (i % 8))) & 1;
}

// ------------------------------------------------------------------- CRC
// Generic MSB-first table-driven CRC over packed bytes (Sarwate),
// polynomial given without the leading term, register width <= 32.
static void make_table(uint32_t poly, int width, uint32_t* table) {
  uint32_t top = 1u << (width - 1);
  uint32_t mask = (width == 32) ? 0xffffffffu : ((1u << width) - 1);
  for (int i = 0; i < 256; ++i) {
    uint32_t r = static_cast<uint32_t>(i) << (width - 8);
    for (int b = 0; b < 8; ++b) r = (r & top) ? ((r << 1) ^ poly) : (r << 1);
    table[i] = r & mask;
  }
}

// CRC of nof_bits bits stored MSB-first in packed bytes.
uint32_t tpuran_crc(const uint8_t* bytes, int64_t nof_bits, uint32_t poly,
                    int width) {
  static thread_local uint32_t table[256];
  static thread_local uint32_t cached_poly = 0;
  static thread_local int cached_width = 0;
  if (cached_poly != poly || cached_width != width) {
    make_table(poly, width, table);
    cached_poly = poly;
    cached_width = width;
  }
  uint32_t mask = (width == 32) ? 0xffffffffu : ((1u << width) - 1);
  uint32_t top = 1u << (width - 1);
  uint32_t r = 0;
  int64_t full = (width >= 8) ? nof_bits / 8 : 0;  // byte LUT needs w>=8
  for (int64_t i = 0; i < full; ++i)
    r = ((r << 8) ^ table[((r >> (width - 8)) ^ bytes[i]) & 0xff]) & mask;
  for (int64_t i = full * 8; i < nof_bits; ++i) {
    uint32_t bit = (bytes[i / 8] >> (7 - (i % 8))) & 1;
    uint32_t fb = ((r & top) ? 1u : 0u) ^ bit;
    r = (r << 1) & mask;
    if (fb) r ^= poly;
  }
  return r & mask;
}

// ------------------------------------------------------------- Gold seq
// TS 38.211 §5.2.1 Gold sequence, bits written one-per-byte.
void tpuran_gold_sequence(uint32_t cinit, int64_t offset, int64_t length,
                          uint8_t* out) {
  const int64_t nc = 1600;
  // advance both LFSRs with 64-bit word state (31-bit registers)
  uint32_t x1 = 1;            // x1 init
  uint32_t x2 = cinit & 0x7fffffff;
  auto step31 = [](uint32_t x, uint32_t fb) {
    // one step: new bit from taps, shift right (bit i holds x(n+i))
    return (x >> 1) | (fb << 30);
  };
  for (int64_t n = 0; n < nc + offset; ++n) {
    uint32_t f1 = ((x1 >> 3) ^ x1) & 1;
    uint32_t f2 = ((x2 >> 3) ^ (x2 >> 2) ^ (x2 >> 1) ^ x2) & 1;
    x1 = step31(x1, f1);
    x2 = step31(x2, f2);
  }
  for (int64_t n = 0; n < length; ++n) {
    out[n] = static_cast<uint8_t>((x1 ^ x2) & 1);
    uint32_t f1 = ((x1 >> 3) ^ x1) & 1;
    uint32_t f2 = ((x2 >> 3) ^ (x2 >> 2) ^ (x2 >> 1) ^ x2) & 1;
    x1 = step31(x1, f1);
    x2 = step31(x2, f2);
  }
}

// ------------------------------------------------------------ slot clock
// Precise periodic ticker: sleeps until the n-th tick boundary from the
// given origin (ns since epoch, CLOCK_MONOTONIC); returns the tick index
// actually reached (skips count as missed slots — the caller heals like
// cell_scheduler.cpp:86-94 in the reference).
int64_t tpuran_wait_tick(int64_t origin_ns, int64_t period_ns,
                         int64_t last_tick) {
  using clock = std::chrono::steady_clock;
  int64_t now_ns = std::chrono::duration_cast<std::chrono::nanoseconds>(
                       clock::now().time_since_epoch())
                       .count();
  int64_t next = last_tick + 1;
  int64_t due = origin_ns + next * period_ns;
  if (due > now_ns) {
    std::this_thread::sleep_for(std::chrono::nanoseconds(due - now_ns));
    return next;
  }
  // behind schedule: report the tick we're actually at
  return (now_ns - origin_ns) / period_ns;
}

int64_t tpuran_now_ns() {
  using clock = std::chrono::steady_clock;
  return std::chrono::duration_cast<std::chrono::nanoseconds>(
             clock::now().time_since_epoch())
      .count();
}

}  // extern "C"
