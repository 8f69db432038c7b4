from . import code, decoder, encoder, rate_match  # noqa: F401
