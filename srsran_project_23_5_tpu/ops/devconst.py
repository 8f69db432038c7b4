"""Device-safe complex constants.

The axon TPU backend cannot materialize complex64 host constants or
host→device complex transfers (UNIMPLEMENTED; some paths hang the device
tunnel).  Every complex-valued host table must therefore enter a jitted
program as two float32 planes recombined on device with `lax.complex` —
float constants embed fine.  (r3's proven TPU programs built all complex
data on device; round 4's PUCCH/PRACH/SSB/precoding tables made the
hazard reachable.)
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def const_c64(arr) -> jnp.ndarray:
    """Host complex array → device complex64 via float32 planes."""
    a = np.ascontiguousarray(np.asarray(arr, np.complex64))
    return jax.lax.complex(jnp.asarray(a.real.copy()),
                           jnp.asarray(a.imag.copy()))
