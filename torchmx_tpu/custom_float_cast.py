"""Generic emulated cast to arbitrary (e, m) float formats — bit-exact.

Used to simulate reduced-precision hardware accumulators (e.g. fp22_e8m13)
on top of fp32 math.  Deliberately non-OCP: preserves inf/NaN and is
saturating.  Semantics follow the reference
(rain-neuromorphics/torchmx ``torchmx/custom_float_cast.py:6-121``), but the
implementation is pure integer bit manipulation: XLA's ``log2``/``exp2`` are
polynomial approximations (inexact even at integer points) and XLA flushes
fp32 subnormals in arithmetic, so the reference's float-arithmetic recipe
cannot be made bit-exact under XLA.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from .mx_quantization import leading_one_position


def _get_min_norm(exponent_bits: int) -> float:
    """Minimum normal magnitude for a format with ``exponent_bits`` exponent bits."""
    emin = 2 - (2 ** (exponent_bits - 1))
    return 0 if exponent_bits == 0 else 2.0**emin


def _rne_shift(value: jnp.ndarray, shift: jnp.ndarray) -> jnp.ndarray:
    """Drop ``shift`` low bits with round-to-nearest-even (shift clipped to [0, 31])."""
    shift = jnp.clip(shift, 0, 31)
    sh1 = jnp.maximum(shift - 1, 0)
    half_minus_1 = jnp.where(shift > 0, (1 << sh1) - 1, 0)
    keep_lsb = jnp.where(shift > 0, (value >> shift) & 1, 0)
    return (value + keep_lsb + half_minus_1) >> shift


def _compose_f32(q: jnp.ndarray, t: jnp.ndarray) -> jnp.ndarray:
    """Exact fp32 magnitude bits of ``q * 2**t`` (q: int32 >= 0, value
    f32-representable; q <= 2^24, t >= -149)."""
    pos = leading_one_position(q, 25)
    e_out = pos + t
    # Normal fp32 output.
    shift_up = jnp.clip(23 - pos, 0, 31)
    mant = (q << shift_up) & 0x7FFFFF
    normal_bits = ((e_out + 127) << 23) | mant
    # Subnormal fp32 output: bits = q << (t + 149) (exact when representable).
    sub_sh = t + 149
    sub_bits = jnp.where(
        sub_sh >= 0,
        q << jnp.clip(sub_sh, 0, 31),
        q >> jnp.clip(-sub_sh, 0, 31),
    )
    bits = jnp.where(e_out >= -126, normal_bits, sub_bits)
    return jnp.where(q == 0, 0, bits)


def hp_to_floatx(
    hp_data: jnp.ndarray,
    exponent_bits: int,
    mantissa_bits: int,
    max_normal: float,
    round_mode: str = "round_to_even",
    keep_subnormals: bool = True,
) -> jnp.ndarray:
    """Quantize fp32 values onto a custom (e, m) float grid, staying in fp32.

    Notes:
        * inf/NaN pass through unchanged (the target is assumed to encode them);
        * values beyond ``max_normal`` saturate to ``sign * max_normal``
          (OCP "saturating mode");
        * with ``keep_subnormals=False`` magnitudes below the min normal flush
          to zero;
        * ``round_mode``: ``"round_to_even"`` or ``"truncate"`` (toward zero).
    """
    if hp_data.dtype == jnp.float64:
        # f64 inputs are handled at f32 precision (the emulation targets have
        # at most fp32 range/precision).
        hp_data = hp_data.astype(jnp.float32)
    assert hp_data.dtype == jnp.float32, f"Invalid dtype: {hp_data.dtype}"
    assert round_mode in ("truncate", "round_to_even"), f"Invalid round mode: {round_mode}"

    mb = mantissa_bits
    min_exp = 2 - (2 ** (exponent_bits - 1))  # min normal unbiased exponent

    u32 = jax.lax.bitcast_convert_type(hp_data, jnp.uint32)
    sign_bit = (u32 & jnp.uint32(0x80000000)).astype(jnp.uint32)
    mag = (u32 & 0x7FFFFFFF).astype(jnp.int32)
    E = (mag >> 23) & 0xFF
    M = mag & 0x7FFFFF

    # Normalized 24-bit significand and binade exponent, exact for both
    # normal and subnormal fp32 inputs.
    p = leading_one_position(M, 23)
    sig_sub = M << jnp.clip(23 - p, 0, 31)
    sig = jnp.where(E == 0, sig_sub, (1 << 23) | M)
    e = jnp.where(E == 0, p - 149, E - 127)

    shift_n = 23 - mb

    def reduce_sig(extra_shift):
        total = shift_n + extra_shift
        if round_mode == "truncate":
            return sig >> jnp.clip(total, 0, 31)
        return _rne_shift(sig, total)

    # Normal-output path (e >= min_exp): carry from rounding bumps e.
    q_n = reduce_sig(jnp.zeros_like(e))
    carry = q_n >= (1 << (mb + 1))
    q_n = jnp.where(carry, q_n >> 1, q_n)
    e_n = jnp.where(carry, e + 1, e)
    t_n = e_n - mb  # value = q_n * 2^t_n  (q_n in [2^mb, 2^(mb+1)))

    # Subnormal-output path (e < min_exp): extra per-lane shift; value grid is
    # multiples of 2^(min_exp - mb).
    q_s = reduce_sig(min_exp - e)
    t_s = jnp.full_like(e, min_exp - mb)

    use_sub = e < min_exp
    q = jnp.where(use_sub, q_s, q_n)
    t = jnp.where(use_sub, t_s, t_n)
    out_mag = _compose_f32(q, t)

    # Saturation (positive-float ordering == integer ordering on magnitudes).
    max_bits = int(
        np.asarray(np.float32(max_normal)).view(np.uint32)
    )
    out_mag = jnp.where(mag > max_bits, max_bits, out_mag)

    # inf/NaN pass-through.
    out_mag = jnp.where(E == 255, mag, out_mag)

    # Optional subnormal flush on the *input* magnitude.
    if not keep_subnormals:
        min_norm = _get_min_norm(exponent_bits)
        min_bits = int(np.asarray(np.float32(min_norm)).view(np.uint32))
        out_mag = jnp.where(mag < min_bits, 0, out_mag)

    # Zero input -> signed zero.
    out_mag = jnp.where(mag == 0, 0, out_mag)

    out_bits = sign_bit | out_mag.astype(jnp.uint32)
    return jax.lax.bitcast_convert_type(out_bits, jnp.float32)
