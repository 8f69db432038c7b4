from . import graphs, encoder, decoder, rate_match, segmentation  # noqa: F401
