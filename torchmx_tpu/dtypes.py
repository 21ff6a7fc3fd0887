"""Element dtype registry for OCP MX (Microscaling) formats.

This is the single source of truth for the bit-layout metadata of every element
format supported by the framework: max representable value, largest binade
(``max_pow2``), exponent bias and field widths.  The numeric constants are
contract constants of the OCP MX-v1.0 spec and match the reference
implementation (rain-neuromorphics/torchmx ``torchmx/dtypes.py:9-183``).

Unlike the reference (which maps to ``torch.dtype``), each entry here carries
an optional ``jnp_dtype`` used when a native JAX/XLA dtype exists for the
format (fp8, int8).  Sub-byte formats (fp6/fp4) have no native dtype and are
stored as ``uint8`` payloads (fp4 nibble-packed, see ``packing.py``).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Optional

import jax.numpy as jnp
import ml_dtypes
import numpy as np


@dataclasses.dataclass(frozen=True, repr=False)
class DType:
    """Bit-layout description of a floating-point / integer element format."""

    name: str
    # The maximum value representable by the dtype.
    max: float
    # The largest power of 2 representable (largest binade).
    max_pow2: int
    # Exponent bias.
    exponent_bias: int
    # Number of exponent bits.
    exponent_bits: int
    # Number of mantissa bits.
    mantissa_bits: int
    # Whether the format encodes NaN.
    has_nan: bool
    # Whether the format encodes +/-inf.
    has_inf: bool
    # Native JAX dtype when one exists (e.g. jnp.float8_e4m3fn, jnp.int8).
    jnp_dtype: Optional[Any] = None

    def __repr__(self) -> str:
        return self.name

    @property
    def total_bits(self) -> int:
        """Sign + exponent + mantissa width in bits."""
        return 1 + self.exponent_bits + self.mantissa_bits


# --- Supported MX element dtypes (reference dtypes.py:34-92) ---------------

float8_e4m3 = DType(
    name="float8_e4m3",
    max=448.0,
    max_pow2=8,
    exponent_bias=7,
    exponent_bits=4,
    mantissa_bits=3,
    has_nan=True,
    has_inf=False,
    jnp_dtype=jnp.float8_e4m3fn,
)

float6_e3m2 = DType(
    name="float6_e3m2",
    max=28.0,
    max_pow2=4,
    exponent_bias=3,
    exponent_bits=3,
    mantissa_bits=2,
    has_nan=False,
    has_inf=False,
    jnp_dtype=None,
)

float6_e2m3 = DType(
    name="float6_e2m3",
    max=7.5,
    max_pow2=2,
    exponent_bias=1,
    exponent_bits=2,
    mantissa_bits=3,
    has_nan=False,
    has_inf=False,
    jnp_dtype=None,
)

float4_e2m1 = DType(
    name="float4_e2m1",
    max=6.0,
    max_pow2=2,
    exponent_bias=1,
    exponent_bits=2,
    mantissa_bits=1,
    has_nan=False,
    has_inf=False,
    jnp_dtype=None,
)

int8 = DType(
    name="int8",
    max=127.0,
    max_pow2=6,
    exponent_bias=0,
    exponent_bits=0,
    mantissa_bits=7,
    has_nan=False,
    has_inf=False,
    jnp_dtype=jnp.int8,
)

# --- High-precision helper dtypes (reference dtypes.py:94-140) -------------

float64 = DType(
    name="float64",
    max=float(np.finfo(np.float64).max),
    max_pow2=1023,
    exponent_bias=1023,
    exponent_bits=11,
    mantissa_bits=52,
    has_nan=True,
    has_inf=True,
    jnp_dtype=jnp.float64,
)

float32 = DType(
    name="float32",
    max=float(np.finfo(np.float32).max),
    max_pow2=127,
    exponent_bias=127,
    exponent_bits=8,
    mantissa_bits=23,
    has_nan=True,
    has_inf=True,
    jnp_dtype=jnp.float32,
)

bfloat16 = DType(
    name="bfloat16",
    max=float(ml_dtypes.finfo(ml_dtypes.bfloat16).max),
    max_pow2=127,
    exponent_bias=127,
    exponent_bits=8,
    mantissa_bits=7,
    has_nan=True,
    has_inf=True,
    jnp_dtype=jnp.bfloat16,
)

# 22-bit float with an fp32 exponent range: used to emulate reduced-precision
# hardware accumulators (reference dtypes.py:131-140).
float22_e8m13 = DType(
    name="float22_e8m13",
    max=2.0**127 * (2.0 - 2.0**-13),
    max_pow2=127,
    exponent_bias=127,
    exponent_bits=8,
    mantissa_bits=13,
    has_nan=True,
    has_inf=True,
    jnp_dtype=None,
)

# --- Registry tuples (reference dtypes.py:143-161) --------------------------

SUPPORTED_ELEM_DTYPES = (
    float8_e4m3,
    float6_e3m2,
    float6_e2m3,
    float4_e2m1,
    int8,
)

SUPPORTED_FP_ELEM_DTYPES = (
    float8_e4m3,
    float6_e3m2,
    float6_e2m3,
    float4_e2m1,
)

STR_TO_SUPPORTED_ELEM_DTYPE = {d.name: d for d in SUPPORTED_ELEM_DTYPES}

# --- E8M0 scale dtype (OCP spec section 5.4.1; reference dtypes.py:163-183) -
#   * bias: 127
#   * supported exponent range: -127 .. 127
#   * infinities: N/A
#   * NaN: 0b11111111
#   * zeros: N/A

e8m0 = DType(
    name="e8m0",
    max=2.0**127,
    max_pow2=127,
    exponent_bias=127,
    exponent_bits=8,
    mantissa_bits=0,
    has_nan=True,
    has_inf=False,
    jnp_dtype=None,
)

E8M0_EXPONENT_NAN_VAL = 255
