"""torchmx_tpu — a TPU-native OCP MX (Microscaling) quantization framework.

A from-scratch JAX/XLA/Pallas implementation with the capabilities of
rain-neuromorphics/torchmx: bit-exact MX quantization (MXFP8/6/4, MXINT8,
E8M0 block scales), an ``MXArray`` pytree tensor abstraction, MX matmul /
linear / attention ops (simulated + fused Pallas TPU kernels), quantized
Llama / Qwen2 model families, a model-surgery quantization API, and
mesh-sharded multi-chip execution.
"""

from . import checkpoint, config, dtypes, env_variables, packing, utils  # noqa: F401
from .config import MXConfig, QAttentionConfig, QLinearConfig  # noqa: F401
from .mx_array import MXArray, fake_quantize, quantize_mx, dequantize_mx  # noqa: F401
from .ops import mx_linear, mx_matmul  # noqa: F401
from .utils import introspect  # noqa: F401

__version__ = "0.1.0"
