"""Pallas TPU block-quantize kernels (the ``quantize_mx`` backend).

One fused pass over the tensor: bitcast, per-32-block max-exponent, E8M0
scale, hardware-exact RNE element cast — and, for the fake-quantize variant,
the decode back to bf16 — all in VMEM.  The XLA simulation path spends ~10x
the HBM traffic on the same computation (the blockwise reshape/reduce breaks
elementwise fusion).

Layout: MX blocks run along the last (lane) dim, but Mosaic cannot reduce or
broadcast over 32-lane groups (lane-dim reshapes are unsupported shape
casts), so the kernels operate on the **transposed** tensor with K on
sublanes, where group reduce/broadcast are free sublane reshapes.  Wrappers
insert the XLA transposes (a transpose costs one HBM round trip — still ~5x
cheaper than the XLA quantize path).

Numerics: identical to the hw-exact quantizer
(``mx_quantization.quantize_mx_with_e8m0_shared_exponent_hw_exact``) — the
same normalization / RNE / saturation pipeline, reusing its helpers — which
is bit-identical to the simulated path by the framework's contract.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .. import dtypes
from ..mx_quantization import leading_one_position, n_ones, round_to_even
from .pallas_matmul import decode_codes_to_bf16, decode_int8_to_bf16

BLOCK = 32


from .backend import interpret as _interpret


def _block_scale_sublane(exp: jnp.ndarray, max_pow2: int) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Per-32-sublane-block biased E8M0 scale.

    exp: (bk, bm) int32 biased bf16 exponents ->
    returns (se_blocks (bk//32, bm), se_full (bk, bm)).
    """
    bk, bm = exp.shape
    nb = bk // BLOCK
    emax = jnp.max(exp.reshape(nb, BLOCK, bm), axis=1)  # (nb, bm)
    se = jnp.clip(emax - max_pow2, 0, 254)
    se = jnp.where(emax == 255, 255, se)
    se_full = jnp.broadcast_to(se[:, None, :], (nb, BLOCK, bm)).reshape(bk, bm)
    return se, se_full


def _cast_hw_exact(sign, exponent, mantissa, se_full, elem_dtype: dtypes.DType):
    """The hw-exact element cast on unpacked bf16 fields (all int32).

    Same pipeline as ``quantize_mx_with_e8m0_shared_exponent_hw_exact``
    (normalize input subnormals, rebase exponent, RNE with sticky bits,
    overflow carry, saturation, underflow last)."""
    mb = elem_dtype.mantissa_bits
    eb = elem_dtype.exponent_bits

    nan_scale = se_full == dtypes.E8M0_EXPONENT_NAN_VAL
    sign = jnp.where(nan_scale, 0, sign)
    zeros_mask = (exponent == 0) & (mantissa == 0)

    subnormal_in = (exponent == 0) & (~zeros_mask)
    leading_one = leading_one_position(mantissa)
    left_shift = jnp.clip(7 - leading_one, 0, 8)
    mantissa = jnp.where(subnormal_in, (mantissa << left_shift) & 0x7F, mantissa)
    exponent = jnp.where(subnormal_in, -(6 - leading_one), exponent)

    new_exponent = exponent - se_full + elem_dtype.exponent_bias

    rounded = jnp.where(new_exponent > 0, round_to_even(mantissa, 7 - mb), 0)
    output_subnormal = (new_exponent <= 0) & (new_exponent >= -mb) & (~zeros_mask)
    msbs3 = mantissa >> 4
    sticky = ((mantissa & 0xF) != 0).astype(jnp.int32)
    subnormalized = (1 << 6) | (msbs3 << 3) | (sticky << 2)
    rounded_sub = round_to_even(subnormalized, 7 - mb - new_exponent)
    rounded = jnp.where(output_subnormal, rounded_sub, rounded)

    overflow = rounded > n_ones(mb)
    rounded = jnp.where(overflow, 0, rounded)
    new_exponent = jnp.where(overflow, new_exponent + 1, new_exponent)
    output_subnormal = (new_exponent <= 0) & (new_exponent >= -mb) & (~zeros_mask)

    underflow = (new_exponent < -mb) | nan_scale | zeros_mask
    saturation = new_exponent > n_ones(eb)
    max_normal = n_ones(mb + eb)
    if elem_dtype == dtypes.float8_e4m3:
        saturation = saturation | ((new_exponent == 15) & (rounded == 7))
        max_normal = 0b1111_110

    normal = ~(saturation | underflow | output_subnormal)
    z = jnp.where(output_subnormal, rounded, 0)
    z = jnp.where(normal, (jnp.clip(new_exponent, 1, n_ones(eb)) << mb) | rounded, z)
    z = jnp.where(saturation, max_normal, z)
    z = jnp.where(underflow, 0, z)
    return (sign << (mb + eb)) | z


def _cast_int8(xT_bf16, se_full):
    """Simulated int8 cast: x / 2^(se-127) with RNE, like the jnp path.

    bf16-subnormal inputs go through the flush-safe conversion (XLA
    arithmetic flushes fp32 subnormal operands to zero on both CPU and TPU),
    keeping the kernel bit-identical to the jnp quantizer."""
    from ..mx_quantization import bf16_to_f32_flush_safe

    xf, prescale = bf16_to_f32_flush_safe(xT_bf16)
    shift = 127 - se_full - prescale  # divide by scale, undo the 2^64 prescale
    inv = jax.lax.bitcast_convert_type(
        (((shift >> 1) + 127) << 23).astype(jnp.uint32), jnp.float32
    )
    inv2 = jax.lax.bitcast_convert_type(
        ((shift - (shift >> 1)) + 127 << 23).astype(jnp.uint32),
        jnp.float32,
    )
    norm = (xf * inv) * inv2
    norm = jnp.clip(norm, -127.0, 127.0)
    norm = jnp.where(jnp.isnan(norm), 0.0, norm)
    return jnp.round(norm).astype(jnp.int32)


def _unpack_bf16_fields(xT):
    bits = jax.lax.bitcast_convert_type(xT, jnp.uint16).astype(jnp.int32)
    sign = (bits >> 15) & 1
    exponent = (bits >> 7) & 0xFF
    mantissa = bits & 0x7F
    return sign, exponent, mantissa


def _quantize_kernel(xT_ref, scale_ref, codes_ref, *, elem_name: str):
    elem = dtypes.STR_TO_SUPPORTED_ELEM_DTYPE[elem_name]
    xT = xT_ref[:]
    sign, exponent, mantissa = _unpack_bf16_fields(xT)
    se, se_full = _block_scale_sublane(exponent, elem.max_pow2)
    scale_ref[:] = se.astype(jnp.uint8)
    if elem == dtypes.int8:
        codes_ref[:] = _cast_int8(xT, se_full).astype(jnp.int8)
    else:
        codes = _cast_hw_exact(sign, exponent, mantissa, se_full, elem)
        codes_ref[:] = codes.astype(jnp.uint8)


def _fq_magic_cast(x_bf16, se_full, elem_dtype: dtypes.DType):
    """Float-path fake-quantize: round ``x`` to the MX grid in the original
    domain with the fp32 magic-number RNE trick.

    Quantize-then-dequantize collapses algebraically: the scale ``2^(se-127)``
    is a power of two, so ``dequant(cast(clamp(x/scale))) * scale`` equals
    "clamp x to ±max*scale, then RNE-round to quantum ``2^Qe``" where

        Qe = max(e_eff - 127 - mb,  se + (1 - bias - mb) - 127)

    (``e_eff`` = effective biased bf16 exponent of x, normalizing bf16
    subnormals; the right arm is the element-subnormal quantum).  RNE at a
    power-of-two quantum is ``(|x| + M) - M`` with ``M = 1.5 * 2^(23+Qe)`` in
    fp32 (exact: ``|x|/2^Qe < 2^5``).  ~3x fewer VPU ops than the integer
    RNE pipeline; bit-identical to quantize+dequantize by the tests.

    ``se_full`` is the biased E8M0 scale broadcast to ``x.shape`` (int32).
    NaN-scale blocks (se == 255) decode to NaN, matching ``dequantize_mx``.

    Subnormal handling: fp32 magic-add arithmetic on bf16-subnormal inputs
    relies on the backend honoring fp32 subnormal operands.  Verified
    exhaustively (all 2^16 bf16 patterns, incl. all-subnormal blocks) against
    the quantize+dequantize reference on both CPU and TPU v5e hardware
    (``tools/check_fake_quantize_exhaustive.py``); re-run that check when
    targeting a new TPU generation.
    """
    mb = elem_dtype.mantissa_bits
    bits = jax.lax.bitcast_convert_type(x_bf16, jnp.uint16).astype(jnp.int32)
    sgn_hi = (bits & 0x8000) << 16  # f32 sign bit

    # Clamp threshold: elem.max * 2^(se-127) (inf when above the f32 range).
    frac = elem_dtype.max / (2.0**elem_dtype.max_pow2)
    tmant = int(round((frac - 1.0) * 2**23))
    t_field = se_full + elem_dtype.max_pow2
    t_bits = jnp.where(t_field >= 255, 0x7F800000, (t_field << 23) | tmant)
    t = jax.lax.bitcast_convert_type(t_bits.astype(jnp.uint32), jnp.float32)
    a = jnp.minimum(jnp.abs(x_bf16.astype(jnp.float32)), t)

    if elem_dtype == dtypes.int8:
        # Integer grid: the quantum is the scale itself.
        qe = se_full - 127
    else:
        e_x = (bits >> 7) & 0xFF
        man = bits & 0x7F
        sub_in = (e_x == 0) & (man != 0)
        e_eff = jnp.where(sub_in, leading_one_position(man) - 6, e_x)
        lsb_sub = 1 - elem_dtype.exponent_bias - mb
        qe = jnp.maximum(e_eff - 127 - mb, se_full + (lsb_sub - 127))

    # Keep the magic constant fp32-normal: pre-scale huge values by 2^-64.
    big = qe > 100
    qe_eff = qe - jnp.where(big, 64, 0)
    mg = jax.lax.bitcast_convert_type(
        (((qe_eff + 150) << 23) | 0x400000).astype(jnp.uint32), jnp.float32
    )
    a = jnp.where(big, a * jnp.float32(2.0**-64), a)
    r = (a + mg) - mg
    r = jnp.where(big, r * jnp.float32(2.0**64), r)

    if elem_dtype == dtypes.int8:
        # int8 has no signed zero: code 0 dequantizes to +0.
        sgn_hi = jnp.where(r == 0, 0, sgn_hi)
    y_bits = jax.lax.bitcast_convert_type(r, jnp.int32) | sgn_hi
    y = jax.lax.bitcast_convert_type(y_bits, jnp.float32).astype(jnp.bfloat16)
    return jnp.where(se_full == 255, jnp.bfloat16(jnp.nan), y)


def _fake_quantize_kernel(xT_ref, out_ref, *, elem_name: str):
    elem = dtypes.STR_TO_SUPPORTED_ELEM_DTYPE[elem_name]
    xT = xT_ref[:]
    _, exponent, _ = _unpack_bf16_fields(xT)
    _, se_full = _block_scale_sublane(exponent, elem.max_pow2)
    out_ref[:] = _fq_magic_cast(xT, se_full, elem)


def _fake_quantize_lane_kernel(x_ref, out_ref, *, elem_name: str):
    """Lane-layout fake-quantize: MX blocks along the last (lane) dim.

    The only cross-lane step is the per-32-block max-exponent; Mosaic cannot
    reduce over lane groups, so the tile is transposed in-kernel (no HBM
    round trips, unlike the XLA-transpose wrapper around the sublane kernel),
    reduced on sublanes, processed, and transposed back.
    """
    elem = dtypes.STR_TO_SUPPORTED_ELEM_DTYPE[elem_name]
    xT = x_ref[:].T  # (bk, bm)
    _, exponent, _ = _unpack_bf16_fields(xT)
    _, se_full = _block_scale_sublane(exponent, elem.max_pow2)
    out_ref[:] = _fq_magic_cast(xT, se_full, elem).T


def _tiles(K: int, R: int):
    # The scale output block is (bk/32, bm): Mosaic requires its sublane
    # count divisible by 8 (bk >= 256) OR equal to the full array dim
    # (bk == K) — a bk of 128 with K = 384 compiles the data block fine but
    # rejects the scale block.
    bk = next((c for c in (512, 256) if K % c == 0), None)
    if bk is None and 32 <= K <= 1024 and K % 32 == 0:
        bk = K  # full-dim block: any sublane count is legal
    bm = next((c for c in (512, 256, 128) if R % c == 0), None)
    if bk is None or bm is None:
        return None
    # The cast pipeline keeps ~8 int32 temporaries of the tile live; stay
    # well inside the 16MB VMEM budget (only bm may shrink: smaller bk
    # would break the scale-block rule above).
    while bk * bm > 128 * 1024 and bm > 128:
        bm //= 2
    return (bk, bm) if R % bm == 0 and K % bk == 0 else None


@functools.partial(jax.jit, static_argnames=("elem_name", "bk", "bm"))
def _quantize_2d(xT, elem_name, bk, bm):
    K, R = xT.shape
    out_dt = jnp.int8 if elem_name == "int8" else jnp.uint8
    kernel = functools.partial(_quantize_kernel, elem_name=elem_name)
    return pl.pallas_call(
        kernel,
        grid=(K // bk, R // bm),
        in_specs=[pl.BlockSpec((bk, bm), lambda i, j: (i, j), memory_space=pltpu.VMEM)],
        out_specs=(
            pl.BlockSpec((bk // BLOCK, bm), lambda i, j: (i, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((bk, bm), lambda i, j: (i, j), memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((K // BLOCK, R), jnp.uint8),
            jax.ShapeDtypeStruct((K, R), out_dt),
        ),
        interpret=_interpret(),
    )(xT)


@functools.partial(jax.jit, static_argnames=("elem_name", "bm", "bk"))
def _fake_quantize_lane_2d(x2, elem_name, bm, bk):
    R, K = x2.shape
    kernel = functools.partial(_fake_quantize_lane_kernel, elem_name=elem_name)
    return pl.pallas_call(
        kernel,
        grid=(R // bm, K // bk),
        in_specs=[pl.BlockSpec((bm, bk), lambda i, j: (i, j), memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((bm, bk), lambda i, j: (i, j), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((R, K), jnp.bfloat16),
        interpret=_interpret(),
    )(x2)


def _lane_tiles(R: int, K: int):
    # TPU block rule: minor dim divisible by 128 (or the full dim), second-
    # minor divisible by 8 (or the full dim).
    bm = next((c for c in (256, 128, 512, 64, 32, 16, 8) if R % c == 0), None)
    bk = next(
        (c for c in (512, 256, 1024, 128, 64, 32) if K % c == 0 and (c % 128 == 0 or c == K)),
        None,
    )
    return None if bm is None or bk is None else (bm, bk)


@functools.partial(jax.jit, static_argnames=("elem_name", "bk", "bm"))
def _fake_quantize_2d(xT, elem_name, bk, bm):
    K, R = xT.shape
    kernel = functools.partial(_fake_quantize_kernel, elem_name=elem_name)
    return pl.pallas_call(
        kernel,
        grid=(K // bk, R // bm),
        in_specs=[pl.BlockSpec((bk, bm), lambda i, j: (i, j), memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((bk, bm), lambda i, j: (i, j), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((K, R), jnp.bfloat16),
        interpret=_interpret(),
    )(xT)


def quantize_mx_pallas(x: jax.Array, elem_dtype_name: str, block_size: int = BLOCK):
    """Pallas backend for ``quantize_mx`` (same contract: last-dim blocks,
    returns (scale (..., K/32) u8, codes (..., K))).  fp4 packing is applied
    outside the kernel.  Returns None if the shape is ineligible."""
    if block_size != BLOCK or x.dtype != jnp.bfloat16 or x.shape[-1] % BLOCK:
        return None
    lead = x.shape[:-1]
    K = x.shape[-1]
    R = 1
    for d in lead:
        R *= d
    x2 = x.reshape(R, K)
    t = _tiles(K, R)
    if t is None:
        return None
    bk, bm = t
    scaleT, codesT = _quantize_2d(x2.T, elem_dtype_name, bk, bm)
    scale = scaleT.T.reshape(*lead, K // BLOCK)
    codes = codesT.T.reshape(*lead, K)
    if elem_dtype_name == "float4_e2m1":
        from ..packing import pack_uint4

        codes = pack_uint4(codes)
    return scale, codes


def fake_quantize_pallas(x: jax.Array, elem_dtype_name: str, block_size: int = BLOCK):
    """One-pass MX quantize-dequantize roundtrip (bf16 -> bf16).

    The fast path for dynamic activation quantization: the fused matmul
    kernels consume bf16 activations, so the quantize->dequantize pair
    collapses into a single VMEM pass.  Returns None if ineligible.
    """
    if block_size != BLOCK or x.dtype != jnp.bfloat16 or x.shape[-1] % BLOCK:
        return None
    lead = x.shape[:-1]
    K = x.shape[-1]
    R = 1
    for d in lead:
        R *= d
    x2 = x.reshape(R, K)
    lt = _lane_tiles(R, K)
    if lt is not None:
        return _fake_quantize_lane_2d(x2, elem_dtype_name, *lt).reshape(x.shape)
    t = _tiles(K, R)
    if t is None:
        return None
    bk, bm = t
    yT = _fake_quantize_2d(x2.T, elem_dtype_name, bk, bm)
    return yT.T.reshape(x.shape)
