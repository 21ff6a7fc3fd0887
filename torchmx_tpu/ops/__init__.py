"""MX compute ops: matmul / linear / attention building blocks.

The simulated (dequantize-then-dot) implementations here are the numerics
reference; the Pallas fused kernels (``ops.pallas_*``) plug in behind the
same signatures, selected by ``TORCHMX_QUANTIZE_BACKEND``.
"""

from .fallbacks import fallback_counts, reset_fallback_counts  # noqa: F401
from .matmul import mx_dynamic_matmul, mx_linear, mx_matmul  # noqa: F401
from .quantize import mx_fake_quantize  # noqa: F401
