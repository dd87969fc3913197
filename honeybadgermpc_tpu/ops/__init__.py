from .fparray import FpArray  # noqa: F401
from .limbs import L, P, W  # noqa: F401
