"""Generic emulated cast to arbitrary (e, m) float formats.

Used to simulate reduced-precision hardware accumulators (e.g. fp22_e8m13)
on top of fp32/fp64 math.  Deliberately non-OCP: preserves inf/NaN and is
saturating.  Mirrors the reference semantics
(rain-neuromorphics/torchmx ``torchmx/custom_float_cast.py:6-121``).
"""

from __future__ import annotations

import jax.numpy as jnp


def _get_min_norm(exponent_bits: int) -> float:
    """Minimum normal magnitude for a format with ``exponent_bits`` exponent bits."""
    emin = 2 - (2 ** (exponent_bits - 1))
    return 0 if exponent_bits == 0 else 2.0**emin


def _round_mantissa(mantissa: jnp.ndarray, round_mode: str = "round_to_even") -> jnp.ndarray:
    """Round scaled-up mantissas: truncate or round-half-to-even."""
    if round_mode == "truncate":
        return jnp.sign(mantissa) * jnp.floor(jnp.abs(mantissa))
    if round_mode == "round_to_even":
        abs_m = jnp.abs(mantissa)
        # Ties at .5 below an odd integer: floor(abs + 0.5) overshoots by 1.
        even_mask = ((abs_m - 0.5) % 2 == 0).astype(mantissa.dtype)
        return jnp.sign(mantissa) * (jnp.floor(abs_m + 0.5) - even_mask)
    raise ValueError(f"Invalid rounding mode: {round_mode}")


def hp_to_floatx(
    hp_data: jnp.ndarray,
    exponent_bits: int,
    mantissa_bits: int,
    max_normal: float,
    round_mode: str = "round_to_even",
    keep_subnormals: bool = True,
) -> jnp.ndarray:
    """Quantize fp32/fp64 values to a custom (e, m) format, in-place of dtype.

    Notes:
        * inf/NaN pass through unchanged (the target is assumed to encode them);
        * values beyond ``max_normal`` saturate to ``sign * max_normal``
          (OCP "saturating mode");
        * with ``keep_subnormals=False`` magnitudes below the min normal flush
          to zero.
    """
    assert hp_data.dtype in (jnp.float32, jnp.float64), f"Invalid dtype: {hp_data.dtype}"
    assert round_mode in ("truncate", "round_to_even"), f"Invalid round mode: {round_mode}"

    if not keep_subnormals:
        min_norm = _get_min_norm(exponent_bits)
        hp_data = jnp.where(jnp.abs(hp_data) < min_norm, 0.0, hp_data)

    # floor(log2(|x|)); the +1.0-at-zero trick keeps log2 finite for x == 0.
    unbiased_exponent = jnp.floor(
        jnp.log2(jnp.abs(hp_data) + (hp_data == 0).astype(hp_data.dtype))
    )
    target_min_exponent = -(2 ** (exponent_bits - 1)) + 2
    unbiased_exponent = jnp.clip(unbiased_exponent, min=target_min_exponent)

    # Scale so `mantissa_bits` bits land in the integer part, round, scale back.
    mantissa = hp_data / jnp.exp2(unbiased_exponent) * (2**mantissa_bits)
    rounded = _round_mantissa(mantissa, round_mode)
    out = rounded / (2**mantissa_bits) * jnp.exp2(unbiased_exponent)

    out = jnp.where(jnp.abs(hp_data) > max_normal, jnp.sign(hp_data) * max_normal, out)
    out = jnp.where(jnp.isinf(hp_data), hp_data, out)
    return out
