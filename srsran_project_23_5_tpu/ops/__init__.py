from . import bits, crc, gold, modulation  # noqa: F401
