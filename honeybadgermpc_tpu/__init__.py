"""honeybadgermpc_tpu — a TPU-native asynchronous MPC framework.

A ground-up redesign of HoneyBadgerMPC's capabilities for TPU hardware:
GF(p) arithmetic runs as limb-decomposed Montgomery kernels under XLA/Pallas,
the n-party network is a JAX device mesh with ICI collectives, and protocols
are batched synchronous-iteration programs instead of asyncio object graphs.
"""

__version__ = "0.1.0"

from .elliptic_curve import Subgroup  # noqa: F401
from .field import GF, GFElement  # noqa: F401
from .ops.fparray import FpArray  # noqa: F401
