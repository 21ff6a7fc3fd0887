"""Bit-exact OCP MX quantization numerics, in pure jnp.

This module is the numerics contract of the framework: everything else (the
Pallas kernels, the fused matmuls, the layers) must agree with these functions
bit-for-bit.  It provides two independently-implemented quantizers that are
**bit-identical by contract** (cross-checked over the whole bf16 domain in
tests):

* :func:`quantize_mx_with_e8m0_shared_exponent_hw_exact` — a pure integer
  bit-manipulation pipeline (normalize bf16 subnormals, exponent rebase,
  round-to-nearest-even with sticky bits, saturation / underflow handling).
  This mirrors the hardware datapath and doubles as the specification.
* :func:`quantize_mx_with_e8m0_shared_exponent_simulated` — an fp32
  divide-clamp-cast pipeline using our own RNE element casts (the reference
  delegates these to torchao; we implement them from the IEEE-754 bit level).

Semantics follow the reference (rain-neuromorphics/torchmx
``torchmx/mx_quantization_utils.py``) with one deliberate deviation: for
blocks whose E8M0 scale is NaN (input block contains inf/NaN), **both** paths
emit an all ``+0`` payload.  The reference's hw-exact path
(``mx_quantization_utils.py:387``) lets the output-subnormal construction
overwrite the NaN-block zeroing for elements with bf16 exponent in
``[248 - mantissa_bits, 248]``, diverging from its simulated path and from its
own special-values tests (``tests/test_mx_tensor.py:105-161``, which expect
all-zero payloads).  We apply underflow/NaN zeroing last, making the two
implementations bit-identical everywhere.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

from . import dtypes
from .packing import pack_uint4, unpack_uint4

Array = jax.Array


def n_ones(n: int) -> int:
    """A python int with ``n`` low bits set, e.g. ``n_ones(3) == 0b111``."""
    return (1 << n) - 1


# ---------------------------------------------------------------------------
# Bit-field extraction
# ---------------------------------------------------------------------------


def unpack_bfloat16(x: Array, dtype=jnp.uint8) -> Tuple[Array, Array, Array]:
    """Extract (sign, exponent, mantissa) bit-fields from a bfloat16 array.

    Mirrors reference ``mx_quantization_utils.py:16-48``.

    Returns arrays of ``dtype`` (default uint8): sign in {0,1}, the biased
    8-bit exponent, and the 7-bit mantissa.
    """
    assert x.dtype == jnp.bfloat16, f"x must be bfloat16, got {x.dtype}"
    bits = jax.lax.bitcast_convert_type(x, jnp.uint16).astype(jnp.int32)
    sign = (bits >> 15) & 0x1
    exponent = (bits >> dtypes.bfloat16.mantissa_bits) & 0xFF
    mantissa = bits & 0x7F
    return sign.astype(dtype), exponent.astype(dtype), mantissa.astype(dtype)


def unpack_fp32(x: Array) -> Tuple[Array, Array, Array]:
    """Extract (sign, exponent, mantissa) from float32 (reference ``:51-69``)."""
    assert x.dtype == jnp.float32
    bits = jax.lax.bitcast_convert_type(x, jnp.uint32).astype(jnp.int64)
    sign = ((bits >> 31) & 0x1).astype(jnp.uint8)
    exponent = ((bits >> 23) & 0xFF).astype(jnp.uint8)
    mantissa = (bits & 0x7FFFFF).astype(jnp.int32)
    return sign, exponent, mantissa


def unpack_fp64(x: Array) -> Tuple[Array, Array, Array]:
    """Extract (sign, exponent, mantissa) from float64 (reference ``:72-90``).

    Requires jax x64 mode for the int64 mantissa.
    """
    assert x.dtype == jnp.float64
    bits = jax.lax.bitcast_convert_type(x, jnp.uint64)
    sign = ((bits >> 63) & 0x1).astype(jnp.uint8)
    exponent = ((bits >> 52) & 0x7FF).astype(jnp.int16)
    mantissa = (bits & jnp.uint64(0xFFFFFFFFFFFFF)).astype(jnp.int64)
    return sign, exponent, mantissa


# ---------------------------------------------------------------------------
# Rounding helpers
# ---------------------------------------------------------------------------


def round_to_even(mantissa: Array, mantissa_shift) -> Array:
    """Drop ``mantissa_shift`` low bits of ``mantissa`` with round-half-to-even.

    ``mantissa_shift`` may be a scalar or a per-element array; shifts are
    clamped to [1, 25] (lanes with out-of-range shifts are always masked out
    by the callers).  Mirrors reference ``mx_quantization_utils.py:149-215``.
    """
    mantissa = mantissa.astype(jnp.int32)
    shift_in = jnp.asarray(mantissa_shift, dtype=jnp.int32)
    shift = jnp.clip(shift_in, 1, 25)

    reduced = mantissa >> shift
    remainder = mantissa & ((1 << shift) - 1)
    round_bit = remainder >> (shift - 1)

    # Round up iff the round bit is set AND (the kept part is odd OR any
    # sticky bits remain below the round bit).
    odd = (reduced & 1) == 1
    sticky = (remainder & ((1 << (shift - 1)) - 1)) != 0
    round_up = (round_bit > 0) & (odd | sticky)
    rounded = reduced + round_up.astype(jnp.int32)
    # shift <= 0 keeps the mantissa unchanged.
    return jnp.where(shift_in <= 0, mantissa, rounded)


def leading_one_position(mantissa: Array, mantissa_size: int = 7) -> Array:
    """Position of the leading 1 bit (LSB = 0); -1 if no bit set.

    Mirrors reference ``mx_quantization_utils.py:227-250``.
    """
    mantissa = mantissa.astype(jnp.int32)
    pos = jnp.full_like(mantissa, -1)
    for i in range(mantissa_size - 1, -1, -1):
        hit = ((mantissa & (1 << i)) != 0) & (pos == -1)
        pos = jnp.where(hit, i, pos)
    return pos


# ---------------------------------------------------------------------------
# E8M0 shared scale
# ---------------------------------------------------------------------------


def get_e8m0_shared_exponent(data_hp: Array, elem_dtype: dtypes.DType) -> Array:
    """Biased E8M0 shared exponent per block (block = last axis).

    ``shared = clamp(max_biased_exp - elem_dtype.max_pow2, 0, 254)``; blocks
    whose max exponent is 255 (inf/NaN present) get the E8M0 NaN encoding 255
    ("saturation mode").  Mirrors reference ``mx_quantization_utils.py:502-558``.

    Args:
        data_hp: bf16 or f32 array shaped ``(..., block_size)``.
        elem_dtype: target element dtype.

    Returns:
        uint8 array shaped ``(...)`` (last axis reduced).
    """
    assert data_hp.dtype in (jnp.bfloat16, jnp.float32), f"{data_hp.dtype} unsupported"
    assert (
        elem_dtype in dtypes.SUPPORTED_ELEM_DTYPES
    ), f"Unsupported dtype {elem_dtype}. Supported: {dtypes.SUPPORTED_ELEM_DTYPES}"

    if data_hp.dtype == jnp.bfloat16:
        bits = jax.lax.bitcast_convert_type(data_hp, jnp.uint16).astype(jnp.int32)
        exponent = (bits >> dtypes.bfloat16.mantissa_bits) & 0xFF
    else:
        bits = jax.lax.bitcast_convert_type(data_hp, jnp.uint32).astype(jnp.int32)
        exponent = (bits >> dtypes.float32.mantissa_bits) & 0xFF

    max_exponent = jnp.max(exponent, axis=-1)

    e8m0_max_biased = dtypes.e8m0.exponent_bias + dtypes.e8m0.max_pow2  # 254
    shared = jnp.clip(max_exponent - elem_dtype.max_pow2, 0, e8m0_max_biased)
    shared = jnp.where(
        max_exponent == dtypes.E8M0_EXPONENT_NAN_VAL,
        dtypes.E8M0_EXPONENT_NAN_VAL,
        shared,
    )
    return shared.astype(jnp.uint8)


def get_fp_scale(shared_exp_e8m0: Array) -> Array:
    """fp32 scale ``2**(e - 127)`` from the biased E8M0 exponent; 255 -> NaN.

    Mirrors reference ``mx_quantization_utils.py:415-432``.  Computed by bit
    assembly (not ``2**x``) so every binade including 2^-127 (an fp32
    subnormal) is exact.

    .. warning:: ``e == 0`` yields an fp32 **subnormal** (2^-127), which TPU
       arithmetic flushes to zero.  The quantize/dequantize datapaths never
       multiply by this value directly — they use :func:`pow2_split_factors`
       so every factor is an fp32 normal.
    """
    e = shared_exp_e8m0.astype(jnp.int32)
    # Normal binades 2^(e-127) for e in [1, 254]: assemble exponent field.
    normal = jax.lax.bitcast_convert_type((e << 23).astype(jnp.uint32), jnp.float32)
    # e == 0 -> 2^-127 (fp32 subnormal 0x00400000).
    subnormal = jax.lax.bitcast_convert_type(jnp.uint32(0x00400000), jnp.float32)
    scale = jnp.where(e == 0, subnormal, normal)
    return jnp.where(e == dtypes.E8M0_EXPONENT_NAN_VAL, jnp.nan, scale)


def _exp2i(e: Array) -> Array:
    """Exact fp32 ``2**e`` for integer ``e`` in the normal range [-126, 127],
    assembled from the exponent bit-field."""
    return jax.lax.bitcast_convert_type(((e + 127) << 23).astype(jnp.uint32), jnp.float32)


def pow2_split_factors(unbiased_exp: Array) -> Tuple[Array, Array]:
    """Split ``2**unbiased_exp`` into two fp32-normal factors ``(s1, s2)``.

    ``unbiased_exp`` may span [-252, 252] (int32); each factor's exponent is
    in [-126, 126] so both are fp32 normals.  Multiplying a value by ``s1``
    then ``s2`` applies the full power of two without ever materializing an
    fp32 subnormal scale — required because XLA flushes subnormal arithmetic
    operands/results to zero on TPU (and on CPU) where the reference's
    torch backend does not (it multiplies by ``2^(e-127)`` directly,
    ``mx_tensor.py:157-162``).
    """
    h1 = unbiased_exp >> 1  # arithmetic shift = floor division
    h2 = unbiased_exp - h1
    return _exp2i(h1), _exp2i(h2)


def bf16_to_f32_flush_safe(x: Array) -> Tuple[Array, Array]:
    """Exact fp32 view of bf16 values with subnormal lanes pre-scaled by 2^64.

    bf16 subnormals (all below 2^-126) are also fp32 subnormals, which XLA
    arithmetic flushes to zero.  This converts via integer bit ops:

      * normal / zero / inf / NaN lanes: fp32 bits = bf16 bits << 16 (exact);
      * subnormal lanes: the mantissa is normalized by its leading-one
        position ``p`` and the value is represented as
        ``1.f * 2^(p - 133 + 64)`` — an fp32 normal equal to ``x * 2^64``.

    Returns ``(values_f32, prescale_exp)`` where ``prescale_exp`` is 64 on the
    pre-scaled lanes and 0 elsewhere; callers must subtract it from any
    power-of-two exponent they subsequently apply.
    """
    assert x.dtype == jnp.bfloat16
    bits = jax.lax.bitcast_convert_type(x, jnp.uint16).astype(jnp.int32)
    sign = (bits >> 15) & 0x1
    e = (bits >> 7) & 0xFF
    m = bits & 0x7F
    subnormal = (e == 0) & (m > 0)

    p = leading_one_position(m)
    norm_mant = (m << jnp.clip(7 - p, 0, 8)) & 0x7F
    norm_exp = p - 133 + 64 + 127  # biased fp32 exponent of x * 2^64

    exp32 = jnp.where(subnormal, norm_exp, e)
    mant32 = jnp.where(subnormal, norm_mant, m) << 16
    f32_bits = ((sign << 31) | (exp32 << 23) | mant32).astype(jnp.uint32)
    values = jax.lax.bitcast_convert_type(f32_bits, jnp.float32)
    prescale = jnp.where(subnormal, 64, 0)
    return values, prescale


# ---------------------------------------------------------------------------
# Hardware-exact quantizer (integer datapath; the specification)
# ---------------------------------------------------------------------------


def quantize_mx_with_e8m0_shared_exponent_hw_exact(
    data_hp: Array,
    elem_dtype: dtypes.DType,
    shared_exponent: Array,
    orig_shape: Optional[Sequence[int]] = None,
) -> Array:
    """Hardware-exact MX element cast: pure integer ops on bf16 bit-fields.

    Pipeline (reference ``mx_quantization_utils.py:253-412``):
      1. normalize bf16 subnormal inputs via leading-one search;
      2. rebase the exponent: ``new_exp = bf16_exp - shared_exp + elem_bias``;
      3. round-to-nearest-even (constant shift for normals; per-element shift
         with sticky-bit construction for output subnormals);
      4. mantissa-overflow carry into the exponent;
      5. saturation to max-normal (fp8_e4m3: S.1111.111 is NaN, so max is
         0b1111110 and ``exp==15 & mant==7`` also saturates);
      6. underflow / zero / NaN-scale lanes -> +/-0 (applied **last**, see
         module docstring for the NaN-block deviation from the reference);
      7. reassemble sign/exponent/mantissa; nibble-pack fp4.

    Args:
        data_hp: bf16 input, any shape.
        elem_dtype: a supported fp element dtype (int8 has no hw-exact path,
            reference ``mx_tensor.py:80-90``).
        shared_exponent: uint8 biased E8M0 exponents, broadcastable to
            ``data_hp.shape``.
        orig_shape: optional reshape applied before fp4 packing.

    Returns:
        uint8 payload (fp4: two codes per byte, high nibble first).
    """
    assert data_hp.dtype == jnp.bfloat16, "Only bfloat16 is supported"
    assert shared_exponent.dtype == jnp.uint8, "shared_exponent must be uint8"
    assert (
        elem_dtype in dtypes.SUPPORTED_FP_ELEM_DTYPES
    ), f"Unsupported dtype {elem_dtype}. Supported: {dtypes.SUPPORTED_FP_ELEM_DTYPES}"

    mb = elem_dtype.mantissa_bits
    eb = elem_dtype.exponent_bits

    sign, bf16_exponent, bf16_mantissa = unpack_bfloat16(data_hp, dtype=jnp.int32)
    shared = jnp.broadcast_to(shared_exponent, data_hp.shape).astype(jnp.int32)
    nan_scale = shared == dtypes.E8M0_EXPONENT_NAN_VAL
    sign = jnp.where(nan_scale, 0, sign)

    zeros_mask = (bf16_exponent == 0) & (bf16_mantissa == 0)

    # Step 1: normalize bf16 subnormal inputs.
    subnormal_in = (bf16_exponent == 0) & (~zeros_mask)
    leading_one = leading_one_position(bf16_mantissa)
    left_shift = jnp.clip(7 - leading_one, 0, 8)
    normalized_exponent = -(6 - leading_one)
    normalized_mantissa = (bf16_mantissa << left_shift) & 0x7F
    bf16_mantissa = jnp.where(subnormal_in, normalized_mantissa, bf16_mantissa)
    bf16_exponent = jnp.where(subnormal_in, normalized_exponent, bf16_exponent)

    # Step 2: rebase the exponent onto the shared scale.
    new_exponent = bf16_exponent - shared + elem_dtype.exponent_bias

    # Step 3: mantissa rounding.
    # 3.1 normals: constant shift 7 - mb.
    rounded_normal = round_to_even(bf16_mantissa, dtypes.bfloat16.mantissa_bits - mb)
    rounded_mantissa = jnp.where(new_exponent > 0, rounded_normal, 0)

    # 3.2 output subnormals: -mb <= new_exp <= 0.  Build a reduced mantissa
    # with an explicit leading one, 3 MSBs, and a sticky bit, then RNE-shift
    # by a per-element amount.
    output_subnormal = (new_exponent <= 0) & (new_exponent >= -mb) & (~zeros_mask)
    msbs3 = bf16_mantissa >> 4
    sticky = (bf16_mantissa & 0xF) != 0
    subnormalized = (1 << 6) | (msbs3 << 3) | (sticky.astype(jnp.int32) << 2)
    mantissa_shift = dtypes.bfloat16.mantissa_bits - mb - new_exponent
    rounded_sub = round_to_even(subnormalized, mantissa_shift)
    rounded_mantissa = jnp.where(output_subnormal, rounded_sub, rounded_mantissa)

    # 3.3 mantissa overflow carries into the exponent.
    overflow = rounded_mantissa > n_ones(mb)
    rounded_mantissa = jnp.where(overflow, 0, rounded_mantissa)
    new_exponent = jnp.where(overflow, new_exponent + 1, new_exponent)

    # 3.4 refresh the subnormal mask after the carry.
    output_subnormal = (new_exponent <= 0) & (new_exponent >= -mb) & (~zeros_mask)

    # Masks for final assembly.
    underflow = (new_exponent < -mb) | nan_scale | zeros_mask
    saturation = new_exponent > n_ones(eb)
    max_normal_magnitude = n_ones(mb + eb)
    if elem_dtype == dtypes.float8_e4m3:
        # S.1111.111 encodes NaN: 448 is S.1111.110, and a rounding result of
        # exp==15 & mant==7 must also saturate (reference ``:377-382``).
        saturation = saturation | ((new_exponent == 15) & (rounded_mantissa == 7))
        max_normal_magnitude = 0b1111_110

    normal = ~(saturation | underflow | output_subnormal)

    z = jnp.where(output_subnormal, rounded_mantissa, 0)
    z = jnp.where(
        normal,
        (jnp.clip(new_exponent, 1, n_ones(eb)) << mb) | rounded_mantissa,
        z,
    )
    z = jnp.where(saturation, max_normal_magnitude, z)
    # Underflow / zero / NaN-scale zeroing applied last (see module docstring).
    z = jnp.where(underflow, 0, z)

    y = ((sign << (mb + eb)) | z).astype(jnp.uint8)

    if orig_shape is not None:
        y = y.reshape(orig_shape)
    if elem_dtype == dtypes.float4_e2m1:
        y = pack_uint4(y)
    return y


# ---------------------------------------------------------------------------
# Element casts (fp32 -> fpX with RNE), replacing the torchao delegation
# ---------------------------------------------------------------------------


def f32_to_fpx_unpacked(x: Array, elem_dtype: dtypes.DType) -> Array:
    """Cast finite fp32 values to an (e, m) micro-float, RNE, one code per byte.

    Implements the IEEE-754 narrowing at the bit level: mantissa RNE with
    carry into the exponent for normal outputs, RNE of the extended
    significand against the target ulp for subnormal outputs, sign-preserving
    underflow to zero.  Inputs must be finite and pre-clamped to
    ``+/- elem_dtype.max`` (as done by the simulated quantizer); the cast
    additionally saturates defensively.  This is our from-scratch replacement
    for torchao's ``f32_to_f4_unpacked`` / ``f32_to_f6_*_unpacked`` kernels
    (reference ``mx_quantization_utils.py:4-8, 479-488``) and also covers fp8.
    """
    assert x.dtype == jnp.float32
    mb = elem_dtype.mantissa_bits
    eb = elem_dtype.exponent_bits
    bias = elem_dtype.exponent_bias

    u32 = jax.lax.bitcast_convert_type(x, jnp.uint32)
    bits = (u32 & 0x7FFFFFFF).astype(jnp.int32)  # magnitude bits
    sign = (u32 >> 31).astype(jnp.int32)

    exp_f32 = (bits >> 23) & 0xFF
    e_unbiased = exp_f32 - 127
    min_normal_exp = 1 - bias

    # --- normal-output path: RNE on the combined (exp|mantissa) field so a
    # mantissa carry propagates into the exponent naturally.
    shift_n = 23 - mb
    field = bits  # (E << 23) | M
    rounded_field = (
        field + ((field >> shift_n) & 1) + ((1 << (shift_n - 1)) - 1)
    ) >> shift_n
    # Rebias: output exponent field = E - 127 + bias.
    exp_out = (rounded_field >> mb) - 127 + bias
    normal_code = (exp_out << mb) | (rounded_field & n_ones(mb))

    # --- subnormal-output path: q = RNE(significand / 2^shift_s) where the
    # target ulp is 2^(min_normal_exp - mb).
    mant_ext = (1 << 23) | (bits & 0x7FFFFF)
    shift_s = jnp.clip((23 - mb) + (min_normal_exp - e_unbiased), 1, 25)
    q = (mant_ext + ((mant_ext >> shift_s) & 1) + ((1 << shift_s) >> 1) - 1) >> shift_s
    subnormal_code = q  # q == 2^mb naturally encodes the min normal.

    is_subnormal_out = e_unbiased < min_normal_exp
    code = jnp.where(is_subnormal_out, subnormal_code, normal_code)
    # fp32 subnormal or zero inputs underflow to zero for every MX format
    # (target min subnormal is >= 2^-9 >> 2^-126).
    code = jnp.where(exp_f32 == 0, 0, code)

    # Defensive saturation (inputs are pre-clamped to +/- max).
    if elem_dtype == dtypes.float8_e4m3:
        max_code = 0b1111_110
    else:
        max_code = n_ones(mb + eb)
    code = jnp.clip(code, 0, max_code)

    return ((sign << (mb + eb)) | code).astype(jnp.uint8)


# ---------------------------------------------------------------------------
# Simulated quantizer (fp32 divide path)
# ---------------------------------------------------------------------------


def quantize_mx_with_e8m0_shared_exponent_simulated(
    data_hp: Array,
    elem_dtype: dtypes.DType,
    shared_exponent: Array,
    orig_shape: Optional[Sequence[int]] = None,
) -> Array:
    """Simulated MX quantization: fp32 divide by the scale, clamp, RNE cast.

    Steps (reference ``mx_quantization_utils.py:435-499``):
      1. fp32 scale from the biased shared exponent (NaN for 255);
      2. fp32 divide + clamp to ``+/- elem_dtype.max``; NaN lanes (NaN-scale
         blocks) flush to +0;
      3. RNE cast to the element format (our own bit-level casts; int8 via
         round-half-even).

    Returns uint8 payload (int8: int8), fp4 nibble-packed.
    """
    assert (
        elem_dtype in dtypes.SUPPORTED_ELEM_DTYPES
    ), f"Unsupported dtype {elem_dtype}. Supported: {dtypes.SUPPORTED_ELEM_DTYPES}"

    # Divide by 2^(e-127) as two multiplications by fp32-normal factors, with
    # bf16-subnormal inputs normalized in the integer domain (XLA flushes
    # fp32 subnormal operands; see pow2_split_factors /
    # bf16_to_f32_flush_safe).  NaN scales (e == 255) propagate.
    if data_hp.dtype == jnp.bfloat16:
        data_f32, prescale = bf16_to_f32_flush_safe(data_hp)
    else:
        data_f32 = data_hp.astype(jnp.float32)
        prescale = jnp.zeros(data_f32.shape, jnp.int32)
    e = shared_exponent.astype(jnp.int32)
    inv1, inv2 = pow2_split_factors((127 - e) - prescale)
    inv1 = jnp.where(e == dtypes.E8M0_EXPONENT_NAN_VAL, jnp.nan, inv1)
    data_norm = (data_f32 * inv1) * inv2
    data_norm = jnp.clip(data_norm, -elem_dtype.max, elem_dtype.max)
    data_norm = jnp.where(jnp.isnan(data_norm), 0.0, data_norm)

    if orig_shape is not None:
        data_norm = data_norm.reshape(orig_shape)

    if elem_dtype == dtypes.int8:
        # jnp.round is round-half-to-even, matching torch.round.
        return jnp.round(data_norm).astype(jnp.int8)

    data_lp = f32_to_fpx_unpacked(data_norm, elem_dtype)
    if elem_dtype == dtypes.float4_e2m1:
        data_lp = pack_uint4(data_lp)
    return data_lp


# ---------------------------------------------------------------------------
# Dequantization
# ---------------------------------------------------------------------------


def dequantize_to_dtype(
    data_lp: Array,
    elem_dtype: dtypes.DType,
    target_dtype,
    packing_dim: int = -1,
    is_packed_fp4: bool = True,
) -> Array:
    """Decode fp8/6/4 codes (uint8) to ``target_dtype`` via exact bf16 math.

    Every fp8/6/4 value is exactly representable in bfloat16, so the
    reconstruction ``(-1)^s * 2^(e') * (1?.m)`` is exact.  fp8_e4m3's
    S.1111.111 decodes to NaN.  Mirrors reference
    ``mx_quantization_utils.py:93-146`` (which uses the native fp8 view for
    fp8; we use the generic path + explicit NaN handling, bit-identically).
    """
    assert (
        elem_dtype in dtypes.SUPPORTED_FP_ELEM_DTYPES
    ), f"Unsupported dtype {elem_dtype}. Supported: {dtypes.SUPPORTED_FP_ELEM_DTYPES}"
    assert data_lp.dtype == jnp.uint8, "Input tensor must be uint8"

    if is_packed_fp4 and elem_dtype == dtypes.float4_e2m1:
        data_lp = unpack_uint4(data_lp, packing_dim)

    mb = elem_dtype.mantissa_bits
    eb = elem_dtype.exponent_bits
    code = data_lp.astype(jnp.int32)

    exp_field = (code >> mb) & n_ones(eb)
    mantissa = code & n_ones(mb)
    sign = code >> (mb + eb)

    sign_bf16 = (1 - 2 * sign).astype(jnp.bfloat16)
    mantissa_bf16 = mantissa.astype(jnp.bfloat16) / (2**mb)
    mantissa_bf16 = jnp.where(exp_field == 0, mantissa_bf16, 1 + mantissa_bf16)
    exponent = jnp.where(exp_field == 0, 1, exp_field) - elem_dtype.exponent_bias
    # Exact bit-assembled power of two (jnp.exp2 is a polynomial approximation
    # under XLA and not guaranteed exact even at integer points).
    two_pow = _exp2i(exponent).astype(jnp.bfloat16)
    y = sign_bf16 * two_pow * mantissa_bf16

    if elem_dtype == dtypes.float8_e4m3:
        y = jnp.where((exp_field == 15) & (mantissa == 7), jnp.bfloat16(jnp.nan), y)

    return y.astype(target_dtype)
