from . import constants, ldpc_params, numerology, tbs  # noqa: F401
