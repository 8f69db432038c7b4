"""Native host library (C++/ctypes) parity with the JAX/numpy paths."""
import numpy as np
import pytest

from srsran_project_23_5_tpu.ops import crc as crc_jnp
from srsran_project_23_5_tpu.ops import gold as gold_jnp
from srsran_project_23_5_tpu.utils import native

pytestmark = pytest.mark.skipif(not native.available(),
                                reason="no native toolchain")


def test_pack_unpack_parity():
    rng = np.random.default_rng(0)
    bits = rng.integers(0, 2, 1003).astype(np.uint8)
    assert np.array_equal(native.pack_bits(bits), np.packbits(bits))
    assert np.array_equal(native.unpack_bits(np.packbits(bits), 1003), bits)


@pytest.mark.parametrize("name,poly,width", [
    ("crc24A", 0x864CFB, 24), ("crc24B", 0x800063, 24),
    ("crc24C", 0xB2B117, 24), ("crc16", 0x1021, 16),
    ("crc11", 0x621, 11), ("crc6", 0x21, 6)])
def test_crc_parity(name, poly, width):
    rng = np.random.default_rng(1)
    bits = rng.integers(0, 2, 517).astype(np.uint8)
    got = native.crc(bits, poly, width)
    ref_bits = crc_jnp.crc_np(bits.astype(np.int8), name)
    assert got == int("".join(map(str, ref_bits)), 2)


def test_gold_parity():
    for cinit, length, off in [(0x12345, 700, 37), (1, 100, 0),
                               (0x7FFFFFFF, 256, 1000)]:
        assert np.array_equal(native.gold_sequence(cinit, length, off),
                              gold_jnp.gold_sequence_np(cinit, length, off))


def test_slot_ticker_monotonic():
    t = native.SlotTicker(period_ns=1_000_000)
    ticks = [t.wait_next() for _ in range(4)]
    assert ticks == sorted(ticks)
    assert ticks[-1] >= 3
